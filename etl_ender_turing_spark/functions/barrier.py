"""Switchable lineage-cut barrier — the single place operators cut a
multi-consumer (or iterative) plan.

Why a barrier at all: Spark has no cross-consumer common-subexpression
elimination, so a frame feeding several branches re-executes its whole
upstream tree once per consumer, and iterative loops grow the logical
plan (and Catalyst re-analysis time) per round. The engine's operators
therefore break such plans at explicit points.

Why it must be switchable: ``DataFrame.localCheckpoint`` is the right
local/benchmark barrier (one materialization, plan truncated, blocks
GC-scoped to the frame) but stores its blocks UNREPLICATED on
executors. On a real cluster any executor loss — including a
dynamic-allocation decommission, which the Spark docs explicitly warn
breaks local checkpoints — makes the data unrecoverable and fails the
job instead of recomputing (r12 ADVICE / VERDICT item 4). At 100 TB
the same cut point is a storage-backed stage materialization: write
the frame to the cluster's checkpoint/staging storage and read it
back, exactly what a production pipeline does between stages.

``lineage_cut(df)`` picks the mode from the session conf
``spark.etl.lineageCut.mode``:

- ``local`` (default): ``localCheckpoint(eager=...)``.
- ``storage``: write parquet under ``spark.etl.lineageCut.dir`` (or
  ``spark.sql.warehouse.dir``/_lineage_cuts) and read it back — a
  fault-tolerant barrier whose files a lost executor re-reads. Always
  eager by construction; re-run recomputes from the written files.
- ``none``: return ``df`` unchanged (debugging / tiny inputs where
  recompute beats materialization — the bpe._merge_rounds finding).

The conf is read per call, so a cluster deployment flips every barrier
site at once via ``get_spark(extra_conf={"spark.etl.lineageCut.mode":
"storage", ...})`` with no operator changes.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame

_MODE_CONF = "spark.etl.lineageCut.mode"
_DIR_CONF = "spark.etl.lineageCut.dir"


def lineage_cut(df: DataFrame, eager: bool = False) -> DataFrame:
    """Cut ``df``'s lineage per the session's barrier mode (see module
    docstring). ``eager`` only affects ``local`` mode: an eager cut
    materializes now (iterative loops want the barrier job to run
    inside the round), a lazy one on first action."""
    spark = df.sparkSession
    mode = spark.conf.get(_MODE_CONF, "local")
    if mode == "none":
        return df
    if mode == "storage":
        base = spark.conf.get(_DIR_CONF, None)
        if not base:
            wh = spark.conf.get("spark.sql.warehouse.dir")
            base = wh.rstrip("/") + "/_lineage_cuts"
        path = f"{base}/cut-{uuid.uuid4().hex}"
        df.write.mode("overwrite").parquet(path)
        return spark.read.parquet(path)
    return df.localCheckpoint(eager=eager)
