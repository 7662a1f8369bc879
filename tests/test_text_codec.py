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
