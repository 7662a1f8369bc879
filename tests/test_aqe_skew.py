"""AQE skew-join handling: the session defaults really do split skewed
partitions at runtime — the engine's first line of defense for skewed
join keys at 100 TB (salting, operators/skew.py, is the fallback for
skewed *aggregation* keys, which AQE cannot split)."""

from pyspark.sql import functions as F

_CONFS = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1MB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "256KB",
    "spark.sql.adaptive.coalescePartitions.minPartitionSize": "64KB",
}


def test_aqe_splits_skewed_join(spark):
    old = {k: spark.conf.get(k, None) for k in _CONFS}
    for k, v in _CONFS.items():
        spark.conf.set(k, v)
    try:
        # 95% of left rows share key 1 -> one monster shuffle partition
        left = spark.range(0, 500_000).select(
            F.when(F.col("id") % 20 != 0, F.lit(1))
             .otherwise(F.col("id") % 1000).alias("k"),
            F.col("id").alias("v"))
        right = spark.range(0, 1000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w"))
        j = left.join(right, "k")
        assert j.count() == 500_000
        j.collect()
        final = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in final, final[:800]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
