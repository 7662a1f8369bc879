"""Schema registry: the 20-table star schema the engine produces.

Re-declares, as Spark ``StructType``s, the target warehouse schema that the
reference declares as SQLAlchemy ORM models (reference:
ET-ETL-DWH-PY312/ETL/schema.py:1-498). Each ``TableSpec`` carries:

- ``schema``      — explicit StructType (never inferred),
- ``unique_key``  — the reference's unique-constraint columns; drives the
                    MERGE upsert (operators/upsert.py) exactly like the
                    reference's key discovery (ETL/utils.py:247-253),
- ``fks``         — join-key registry replacing SQLAlchemy relationship()
                    declarations (ETL/schema.py:349-357 etc.),
- ``kind``        — 'dim' (slowly-changing dictionary) vs 'fact'
                    (ETL/schema.py:12,294 comments). Dims are broadcast
                    candidates in every join the engine plans.

Type mapping (SURVEY.md §1.3): Integer→long (ids must survive 100 TB scale),
Float→double, Unicode→string, DateTime→timestamp, GUID→string(36), JSON→
typed struct/map where keys are known, raw JSON string otherwise.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import types as T


def _f(name: str, dtype: T.DataType, nullable: bool = True) -> T.StructField:
    return T.StructField(name, dtype, nullable)


S, L, I, D, B, TS = (T.StringType(), T.LongType(), T.IntegerType(),
                     T.DoubleType(), T.BooleanType(), T.TimestampType())

OVERLAPS = T.StructType([_f("client", D), _f("agent", D)])
SCORE_DETAILS = T.StructType([_f("automated_score", D), _f("manual_score", D)])
DURATION_DETAILS = T.MapType(S, D)


@dataclass(frozen=True)
class TableSpec:
    name: str
    kind: str                      # 'dim' | 'bridge' | 'fact'
    schema: T.StructType
    unique_key: tuple[str, ...]    # reference unique-constraint columns
    fks: dict[str, str] = field(default_factory=dict)  # col -> "table.col"
    update_cols: tuple[str, ...] = ()  # non-key cols updated on MERGE match


def _spec(name: str, kind: str, key: tuple[str, ...],
          fields: list[T.StructField], fks: dict[str, str] | None = None) -> TableSpec:
    schema = T.StructType(fields)
    non_key = tuple(f.name for f in fields if f.name not in key)
    return TableSpec(name, kind, schema, key, fks or {}, non_key)


TABLES: dict[str, TableSpec] = {}

def _register(spec: TableSpec) -> None:
    TABLES[spec.name] = spec


# --- Base dictionaries (dims) -- reference ETL/schema.py:12-291 ------------

_register(_spec("agents", "dim", ("id",), [
    _f("id", L, False), _f("name", S), _f("phone_number", S),
    _f("is_active", B), _f("deactivated_at", TS),
]))

_register(_spec("scorecards", "dim", ("id",), [
    _f("id", L, False), _f("name", S), _f("type", S), _f("na_behavior", S),
    _f("count_critical_scores", B), _f("is_automated", B),
    _f("is_protected", B), _f("is_default", B), _f("is_archived", B),
]))

_register(_spec("groups", "dim", ("id",), [
    _f("id", L, False), _f("name", S), _f("scorecard_id", L), _f("is_default", B),
], fks={"scorecard_id": "scorecards.id"}))

_register(_spec("agent_group_associations", "bridge",
                ("group_id", "agent_id", "start_dt"), [
    _f("group_id", L, False), _f("agent_id", L, False), _f("start_dt", TS),
], fks={"group_id": "groups.id", "agent_id": "agents.id"}))

_register(_spec("users", "dim", ("id",), [
    _f("id", L, False), _f("email", S), _f("is_active", B),
    _f("is_superuser", B), _f("full_name", S), _f("agent_id", L),
    _f("agent_group_id", L), _f("language", S), _f("uuid", S),
    _f("invite_expires", TS),
], fks={"agent_id": "agents.id", "agent_group_id": "groups.id"}))

_register(_spec("categories", "dim", ("id",), [
    _f("id", L, False), _f("name", S), _f("filter_data", S),
    _f("position", I), _f("created_at", TS), _f("updated_at", TS),
]))

_register(_spec("labels", "dim", ("id",), [
    _f("id", L, False), _f("text", S),
]))

_register(_spec("category_labels", "bridge", ("category_id", "label_id"), [
    _f("category_id", L, False), _f("label_id", L, False),
], fks={"category_id": "categories.id", "label_id": "labels.id"}))

_register(_spec("scorecard_categories", "dim", ("id", "scorecard_id"), [
    _f("id", L, False), _f("scorecard_id", L, False), _f("name", S),
    _f("sort_order", I),
], fks={"scorecard_id": "scorecards.id"}))

_register(_spec("scorecard_points", "dim", ("id", "scorecard_id"), [
    _f("id", L, False), _f("scorecard_id", L, False), _f("category_id", L),
    _f("name", S), _f("description", S), _f("sort_order", I),
    _f("critical", B), _f("max_score", I), _f("allow_partial_score", B),
], fks={"scorecard_id": "scorecards.id",
        "category_id": "scorecard_categories.id"}))

_register(_spec("tags", "dim", ("id",), [
    _f("id", L, False), _f("name", S), _f("type", S), _f("team_id", L),
    _f("is_archived", B), _f("archived_by_id", L), _f("archived_at", TS),
]))

_register(_spec("tag_labels", "bridge", ("tag_id", "label_id"), [
    _f("tag_id", L, False), _f("label_id", L, False),
], fks={"tag_id": "tags.id", "label_id": "labels.id"}))


# --- Fact tables -- reference ETL/schema.py:294-493 ------------------------

_register(_spec("sessions", "fact", ("id",), [
    _f("id", S, False),                  # 36-char GUID
    _f("type", S), _f("caller_id", S), _f("source", S),
    _f("language_code", S), _f("asr_size", S), _f("filename", S),
    _f("destination_id", S), _f("start_dt", TS), _f("direction", S),
    _f("agent_id", L), _f("group_id", L),
    _f("duration", D), _f("silence", D), _f("silence_percent", D),
    _f("agent_channel", I), _f("comments_count", I),
    _f("default_scorecard_id", L), _f("average_score", D),
    _f("is_processed", B),
    _f("overlaps_data", OVERLAPS),
    _f("duration_details", DURATION_DETAILS),
    _f("score_details", SCORE_DETAILS),
    _f("queue_name", S), _f("campaign_name", S), _f("term_reason", S),
    _f("waiting_time", I), _f("fcr", I), _f("csi", I), _f("nps", I),
    _f("list_id", I),
    _f("words_count_agent", I), _f("words_count_client", I),
    _f("words_count_both", I),
    _f("caller_prev_session_id", S),
    _f("additional_info", S),            # open-ended JSON kept raw
    _f("et_link", S), _f("start_date", S), _f("start_time", S),
], fks={"agent_id": "agents.id", "group_id": "groups.id",
        "default_scorecard_id": "scorecards.id",
        "caller_prev_session_id": "sessions.id"}))

_register(_spec("sessions_categories", "fact",
                ("session_id", "category_id", "is_verified"), [
    _f("session_id", S, False), _f("category_id", L, False),
    _f("is_verified", B),
], fks={"session_id": "sessions.id", "category_id": "categories.id"}))

_register(_spec("sessions_crm_statuses", "fact", ("session_id", "crm_status"), [
    _f("session_id", S, False), _f("crm_status", S),
], fks={"session_id": "sessions.id"}))

_register(_spec("sessions_reviewers", "fact", ("session_id", "reviewer_id"), [
    _f("session_id", S, False), _f("reviewer_id", L, False),
    _f("last_reviewed_at", TS),
], fks={"session_id": "sessions.id", "reviewer_id": "users.id"}))

_register(_spec("sessions_scores", "fact",
                ("session_id", "scorecard_id", "reviewer_id",
                 "scorecard_point_id"), [
    _f("session_id", S, False), _f("scorecard_id", L, False),
    _f("reviewer_id", L, False), _f("scorecard_point_id", L, False),
    _f("score", I), _f("comment", S),
], fks={"session_id": "sessions.id", "scorecard_id": "scorecards.id",
        "reviewer_id": "users.id",
        "scorecard_point_id": "scorecard_points.id"}))

_register(_spec("sessions_tags", "fact", ("session_id", "tag_id", "transcript_id"), [
    _f("session_id", S, False), _f("tag_id", L, False),
    _f("transcript_id", L, False), _f("score", D),
    _f("matched_corpus_text", S), _f("is_agent", B),
    _f("matched_query_text", S), _f("meta", S),
], fks={"session_id": "sessions.id", "tag_id": "tags.id"}))

_register(_spec("sessions_comments", "fact", ("session_id",), [
    _f("session_id", S, False), _f("author_id", L), _f("text", S),
], fks={"session_id": "sessions.id", "author_id": "users.id"}))

_register(_spec("sessions_summaries", "fact", ("session_id", "text"), [
    _f("session_id", S, False), _f("text", S),
], fks={"session_id": "sessions.id"}))

# The reference stubs this table out ("Not Implemented", schema.py:495-498)
# but fetches transcripts for real in get-summaries-to-file.py:72-82; the
# utterance-row shape feeds transcript_metrics (words_count_*/silence/
# duration recomputation, SURVEY §2.5).
_register(_spec("sessions_transcripts", "fact", ("session_id", "utterance_id"), [
    _f("session_id", S, False), _f("utterance_id", L, False),
    _f("channel", I), _f("start", D), _f("end", D), _f("text", S),
], fks={"session_id": "sessions.id"}))


def schema_of(table: str) -> T.StructType:
    return TABLES[table].schema


def unique_key_of(table: str) -> tuple[str, ...]:
    return TABLES[table].unique_key


def table_names() -> list[str]:
    return list(TABLES)
