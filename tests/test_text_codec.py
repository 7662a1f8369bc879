"""unicode_to_utf8 parity (reference ETL/utils.py:208-213)."""

from etl_ender_turing_spark.functions.text_codec import unicode_to_utf8


def test_unicode_escape_decode(spark):
    rows = [
        ("Caf\\u00e9", "Café"),              # \uXXXX escape
        ("line\\nbreak", "line\nbreak"),     # control escape
        ("plain ascii", "plain ascii"),      # passthrough
        ("уже utf8 ✓", "уже utf8 ✓"),        # already-decoded non-latin
        (None, None),                        # null passthrough
    ]
    df = spark.createDataFrame([(a,) for a, _ in rows], "s string")
    got = [r.d for r in df.select(unicode_to_utf8("s").alias("d")).collect()]
    assert got == [e for _, e in rows]


def test_nfc_normalize_composes_and_passes_nulls(spark):
    from pyspark.sql import functions as F

    from etl_ender_turing_spark.functions.text_codec import nfc_normalize
    rows = [(1, "cafe\u0301"), (2, "caf\u00e9"), (3, "\ufb01le"),
            (4, None)]
    df = spark.createDataFrame(rows, "i long, s string")
    got = {r.i: r.n for r in
           df.select("i", nfc_normalize("s").alias("n")).collect()}
    assert got[1] == got[2] == "caf\u00e9"   # decomposed composes
    assert got[3] == "\ufb01le"         # ligature NOT folded (NFKC)
    assert got[4] is None
    # the dedup consequence: canonical-equivalent texts now hash equal
    h = df.filter(F.col("s").isNotNull()).select(
        F.md5(nfc_normalize("s")).alias("h")).collect()
    assert h[0].h == h[1].h
