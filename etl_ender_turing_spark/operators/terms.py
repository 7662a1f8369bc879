"""Corpus term statistics: TF-IDF scoring and top-term extraction.

Extends the reference's per-document word counting
(ET-ETL-DWH-PY312/ETL/Transform.py words_count_* metrics) to
corpus-relative term weighting — the standard signal for keyword
extraction, near-topic clustering, and quality filtering in a
training-data pipeline.

Scale shape (100 TB):
- token explode is narrow (rows fan out, no shuffle);
- TF is one partial+final hash aggregation on (doc, term);
- DF reuses the TF result (a second, much smaller aggregation on term —
  vocabulary-sized, not corpus-sized);
- the corpus doc count rides a broadcast of a 1-row aggregate, not a
  driver-side ``.count()`` (keeps the whole thing one declarative plan);
- top-k per document is a window partitioned BY DOCUMENT — millions of
  small partitions, never a global sort.

Float parity with the oracle: a single ``ln`` + one ``round(·, 6)``
per output row, the same discipline as textstats ratios.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def tfidf_top_terms(df: DataFrame, k: int = 3, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Top-``k`` terms per document by TF-IDF.

    tfidf = tf · ln(N / df) over the lowercase whitespace token stream;
    ties broken by term (ascending) so results are deterministic and
    oracle-comparable. Output: (id, term, tf, tfidf).
    """
    toks = (df.select(F.col(id_col),
                      F.explode(F.split(F.lower(F.trim(F.col(text_col))),
                                        " ")).alias("term")))
    tf = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df_"))
    n_docs = df.agg(F.count("*").alias("n_docs"))
    scored = (tf.join(dfreq, "term")
              .join(F.broadcast(n_docs))
              .withColumn("tfidf",
                          F.round(F.col("tf") *
                                  F.log(F.col("n_docs") / F.col("df_")), 6)))
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("term"))
    return (scored.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k)
            .select(id_col, "term", "tf", "tfidf"))


def tfidf_top_terms_sql(table: str, k: int = 3, text_col: str = "text",
                        id_col: str = "doc_id") -> str:
    return f"""
WITH toks AS (
  SELECT {id_col},
         unnest(string_split(lower(trim({text_col})), ' ')) AS term
  FROM {table}
),
tf AS (
  SELECT {id_col}, term, count(*) AS tf FROM toks GROUP BY 1, 2
),
dfreq AS (
  SELECT term, count(*) AS df_ FROM tf GROUP BY 1
),
n AS (SELECT count(*) AS n_docs FROM {table}),
scored AS (
  SELECT {id_col}, term, tf,
         ROUND(tf * ln(n_docs * 1.0 / df_), 6) AS tfidf
  FROM tf JOIN dfreq USING (term) CROSS JOIN n
)
SELECT {id_col}, term, tf, tfidf
FROM (SELECT *, row_number() OVER (PARTITION BY {id_col}
                                   ORDER BY tfidf DESC, term) AS rn
      FROM scored)
WHERE rn <= {k}
"""
