"""Filter-DSL → Catalyst ``Column`` compiler.

The reference's only query language is a URL filter DSL sent to the API
(reference: ET-ETL-DWH-PY312/ETL/Extract.py:34-46 builds
``date_range,{d1},{d2}||00:00,12:00``; Simplified-Scripts-Examples/
get-scores.py:24-28 uses ``reviewers,true``; run-et-etl.py:92,99-106 uses
``is_scored,manual`` and ``categories,{ids}|or``; stored category filters use
a wrapped form ``&&[tags,||and|2738|or]`` ETL/schema.py:150).

Grammar (superset of every instance in the reference):

    filter     := term ('±' term)*            # '±' = conjunction (AND)
    term       := '&&[' term_body ']' | term_body
    term_body  := name ',' args
    args       := date-range | value-list
    date-range := d1 ',' d2 ('||' HH:MM ',' HH:MM)?
    value-list := v (',' v)* ('|or' | '|and')?   # also '||and|v|or' stored form

Compilation targets plain Catalyst expressions, so Parquet/Delta predicate
pushdown and partition pruning apply automatically — the Spark-native
equivalent of the reference pushing the DSL string to its API server.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, functions as F

CONJ = "±"


@dataclass(frozen=True)
class Term:
    name: str
    values: tuple[str, ...]
    mode: str  # 'or' | 'and'
    time_range: tuple[str, str] | None = None  # for date_range terms


def parse_filter(dsl: str) -> list[Term]:
    """Parse a DSL string into conjunction terms."""
    terms: list[Term] = []
    for raw in filter(None, (t.strip() for t in dsl.split(CONJ))):
        # unwrap stored form '&&[...]'
        m = re.fullmatch(r"&&\[(.*)\]", raw)
        if m:
            raw = m.group(1)
        name, _, rest = raw.partition(",")
        name = name.strip()
        if name == "date_range":
            dates, _, times = rest.partition("||")
            d1, _, d2 = dates.partition(",")
            tr = None
            if times:
                t1, _, t2 = times.partition(",")
                tr = (t1.strip(), t2.strip())
            terms.append(Term("date_range", (d1.strip(), d2.strip()), "and", tr))
            continue
        mode = "or"
        if rest.endswith("|or"):
            rest = rest[:-3]
        elif rest.endswith("|and"):
            rest, mode = rest[:-4], "and"
        # stored variant 'tags,||and|2738|or' → separator '|' with noise tokens
        parts = [p for p in re.split(r"[|,]", rest) if p not in ("", "and", "or")]
        terms.append(Term(name, tuple(p.strip() for p in parts), mode))
    return terms


# Default mapping from DSL term name → column expression builder. Each entry
# takes the parsed Term and returns a Column predicate over the sessions
# (or any mapped) DataFrame.

def _date_range_pred(term: Term, col: str) -> Column:
    d1, d2 = term.values
    c = F.col(col)
    pred = c >= F.lit(f"{d1} 00:00:00").cast("timestamp")
    pred &= c <= F.lit(f"{d2} 23:59:59").cast("timestamp")
    if term.time_range:
        t1, t2 = term.time_range
        tod = F.date_format(c, "HH:mm")
        pred &= (tod >= F.lit(t1)) & (tod <= F.lit(t2))
    return pred


def compile_filter(dsl: str, column_map: dict[str, str] | None = None) -> Column:
    """Compile a DSL string into one conjunctive Catalyst predicate.

    ``column_map`` overrides the DSL-term → column binding; defaults follow
    the reference's sessions semantics:
      date_range → start_dt BETWEEN;  reviewers,true → size(reviewers)>0;
      is_scored,manual → score_details.manual_score IS NOT NULL;
      <field>,v1,v2|or → field IN (v1,v2).
    """
    cmap = {"date_range": "start_dt", "reviewers": "reviewers",
            "is_scored": "score_details", "categories": "category_id",
            "tags": "tag_id"}
    if column_map:
        cmap.update(column_map)

    pred: Column | None = None
    for term in parse_filter(dsl):
        col = cmap.get(term.name, term.name)
        if term.name == "date_range":
            p = _date_range_pred(term, col)
        elif term.name == "reviewers" and term.values in (("true",), ("false",)):
            p = F.size(F.col(col)) > 0
            if term.values == ("false",):
                p = ~p
        elif term.name == "is_scored":
            which = term.values[0] if term.values else "manual"
            if which == "manual":
                p = F.col(f"{col}.manual_score").isNotNull()
            elif which in ("auto", "automated"):
                p = F.col(f"{col}.automated_score").isNotNull()
            else:  # is_scored,true → any score present
                p = (F.col(f"{col}.manual_score").isNotNull()
                     | F.col(f"{col}.automated_score").isNotNull())
        else:
            vals = list(term.values)
            # numeric-looking lists compare as numbers so pushdown hits
            # typed parquet stats; otherwise compare as strings.
            if all(re.fullmatch(r"-?\d+", v) for v in vals):
                lits = [int(v) for v in vals]
            else:
                lits = vals
            if term.mode == "and" and len(lits) > 1:
                # '|and' over a scalar column is unsatisfiable; the
                # reference's AND semantics apply to multi-valued tags via
                # bridge tables (ETL/schema.py:150). Refuse rather than
                # silently degrading to OR/isin — route these through
                # sessions_matching_stored_filter instead.
                raise ValueError(
                    f"'{term.name},{','.join(term.values)}|and' needs "
                    "multi-valued (bridge) semantics; use "
                    "sessions_matching_stored_filter for '|and' terms")
            p = F.col(col).isin(lits)
        pred = p if pred is None else (pred & p)
    return pred if pred is not None else F.lit(True)


_BRIDGE_ID_COLS = {"tags": "tag_id", "categories": "category_id"}


def sessions_matching_stored_filter(sessions, filter_data: str, bridges: dict,
                                    id_col: str = "id"):
    """Evaluate a stored category ``filter_data`` DSL client-side
    (reference: ETL/schema.py:150 — e.g. ``'&&[tags,||and|2738|or]'``; the
    reference only ships these to its API and never evaluates them, SURVEY
    §2.2/§4).

    Each term over a multi-valued field becomes a semi-join against its
    bridge table (``bridges``: term name → bridge DataFrame with a
    ``session_id`` column): ``|or`` = session has ANY listed id, ``|and``
    = session has ALL listed ids (count-distinct-equals rewrite).
    Conjunction chains semi-joins — Catalyst freely reorders them, and at
    scale each semi-join is a broadcast of the (small) matching-key set.
    """
    from pyspark.sql import functions as _F

    for term in parse_filter(filter_data):
        bridge = bridges[term.name]
        col = _BRIDGE_ID_COLS.get(term.name, f"{term.name.rstrip('s')}_id")
        vals = [int(v) if re.fullmatch(r"-?\d+", v) else v for v in term.values]
        matching = bridge.filter(_F.col(col).isin(vals))
        if term.mode == "and" and len(vals) > 1:
            keys = (matching.groupBy("session_id")
                    .agg(_F.count_distinct(col).alias("_n"))
                    .filter(_F.col("_n") == len(vals))
                    .select("session_id"))
        else:
            keys = matching.select("session_id").distinct()
        sessions = sessions.join(
            keys, sessions[id_col] == keys["session_id"], "left_semi")
    return sessions


def compile_filter_sql(dsl: str, column_map: dict[str, str] | None = None) -> str:
    """ANSI-SQL rendering of the same predicate (for oracle parity tests)."""
    cmap = {"date_range": "start_dt"}
    if column_map:
        cmap.update(column_map)
    clauses: list[str] = []
    for term in parse_filter(dsl):
        col = cmap.get(term.name, term.name)
        if term.name == "date_range":
            d1, d2 = term.values
            c = f"({col} >= TIMESTAMP '{d1} 00:00:00' AND {col} <= TIMESTAMP '{d2} 23:59:59')"
            if term.time_range:
                t1, t2 = term.time_range
                c = c[:-1] + (f" AND strftime({col}, '%H:%M') >= '{t1}'"
                              f" AND strftime({col}, '%H:%M') <= '{t2}')")
            clauses.append(c)
        else:
            vals = term.values
            if all(re.fullmatch(r"-?\d+", v) for v in vals):
                inlist = ", ".join(vals)
            else:
                # DSL values are user input: double quotes so a value
                # containing ' cannot break (or inject into) the SQL —
                # the Column path (compile_filter) uses isin and needs
                # no escaping
                inlist = ", ".join("'" + v.replace("'", "''") + "'"
                                   for v in vals)
            clauses.append(f"{col} IN ({inlist})")
    return " AND ".join(clauses) if clauses else "TRUE"
