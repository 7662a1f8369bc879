"""Derived-metric recomputation over the star schema (SURVEY §2.5).

The reference never computes these — they arrive precomputed from the API
as session columns (reference: ETL/schema.py:317-338). An engine that
*serves* the warehouse must be able to recompute them from the child fact
tables, both to validate the API's numbers and to backfill sessions the
API never re-delivers. Each derivation is a plain groupBy/pivot plan:
partial+final hash aggregation, shuffle keyed on session_id (GUID,
uniform — no skew), dims broadcast.

words_count_* and silence/duration derive from transcript utterances
(reference: sessions_transcripts, schema.py:495-498 — commented out,
"future") via :func:`transcript_metrics`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def recompute_average_score(scores: DataFrame,
                            points: DataFrame | None = None) -> DataFrame:
    """sessions.average_score (reference: ETL/schema.py:323).

    Unweighted mean of point scores per session; with ``points``
    (scorecard_points) supplied, also the max_score-weighted scorecard
    ratio — the "true scorecard math" variant (SURVEY §2.5 row 1).
    """
    out = (scores.groupBy("session_id")
           .agg(F.avg("score").alias("average_score")))
    if points is None:
        return out
    p = points.select(F.col("id").alias("scorecard_point_id"),
                      F.col("scorecard_id"), F.col("max_score"))
    weighted = (scores
                .join(F.broadcast(p), ["scorecard_point_id", "scorecard_id"])
                .groupBy("session_id")
                .agg((F.sum("score") / F.sum("max_score"))
                     .alias("weighted_score")))
    return out.join(weighted, "session_id", "left")


def recompute_score_details(scores: DataFrame,
                            scorecards: DataFrame) -> DataFrame:
    """sessions.score_details {automated_score, manual_score}
    (reference: ETL/schema.py:327): pivot on scorecards.is_automated."""
    sc = scorecards.select(F.col("id").alias("scorecard_id"), "is_automated")
    return (scores.join(F.broadcast(sc), "scorecard_id")
            .groupBy("session_id")
            .pivot("is_automated", [True, False])
            .agg(F.avg("score"))
            .withColumnRenamed("true", "automated_score")
            .withColumnRenamed("false", "manual_score"))


def recompute_comments_count(comments: DataFrame) -> DataFrame:
    """sessions.comments_count (reference: ETL/schema.py:321)."""
    return (comments.groupBy("session_id")
            .agg(F.count(F.lit(1)).alias("comments_count")))


def transcript_metrics(transcripts: DataFrame,
                       agent_channel: int | str = 0) -> DataFrame:
    """sessions.words_count_agent/client/both, silence, duration
    (reference: ETL/schema.py:317-319,331,336-338) recomputed from
    transcript utterances — the derivation SURVEY §2.5 specifies for the
    sessions_transcripts table the reference stubs out (schema.py:495-498).

    Input: (session_id, utterances array<struct<channel:int, start:double,
    end:double, text:string>>). ``agent_channel`` is a constant channel id
    or the NAME of a per-session column on ``transcripts`` (sessions carry
    their own agent_channel in the reference). One explode (narrow) + one
    shuffle on session_id; silence is the sum of positive gaps between
    consecutive utterances via a lag window over the running max end-time
    (robust to overlapping speech, which must not create negative gaps).
    """
    from pyspark.sql import Window

    per_session = isinstance(agent_channel, str)
    extra = [agent_channel] if per_session else []
    u = (transcripts.select("session_id", *extra,
                            F.explode("utterances").alias("u"))
         .select("session_id", *extra, F.col("u.channel").alias("channel"),
                 F.col("u.start").alias("start"), F.col("u.end").alias("end"),
                 F.size(F.split(F.trim(F.col("u.text")), r"\s+"))
                 .alias("n_words")))
    w = (Window.partitionBy("session_id").orderBy("start", "end")
         .rowsBetween(Window.unboundedPreceding, -1))
    gaps = u.withColumn("prev_end", F.max("end").over(w)) \
            .withColumn("gap", F.greatest(F.col("start") - F.col("prev_end"),
                                          F.lit(0.0)))
    agent_ch = F.col(agent_channel) if per_session else F.lit(agent_channel)
    agent_words = F.sum(F.when(F.col("channel") == agent_ch,
                               F.col("n_words")).otherwise(0))
    return (gaps.groupBy("session_id").agg(
        agent_words.alias("words_count_agent"),
        (F.sum("n_words") - agent_words).alias("words_count_client"),
        F.sum("n_words").alias("words_count_both"),
        F.coalesce(F.sum("gap"), F.lit(0.0)).alias("silence"),
        (F.max("end") - F.min("start")).alias("duration")))


def channel_map(df: DataFrame, id_col: str, key_col: str,
                value_col: str, out_col: str) -> DataFrame:
    """Per-id map column from (id, key, value) rows — the shape of
    sessions.duration_details / overlaps_data (reference:
    ETL/schema.py:325-326). map_from_entries(collect_list(struct))
    keyed on the id: one shuffle, map built JVM-side."""
    return (df.groupBy(id_col)
            .agg(F.map_from_entries(
                F.collect_list(F.struct(F.col(key_col), F.col(value_col))))
                .alias(out_col)))
