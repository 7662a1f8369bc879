"""Table maintenance: small-file compaction.

Streaming sinks and incremental MERGE rewrites leave parquet tables with
thousands of KB-sized files; at 100 TB the scan cost becomes dominated by
file-open overhead and the NameNode/listing pressure, not bytes. Periodic
compaction rewrites a table (or one partition of it) into
~``target_mb``-sized files.

Atomicity: the rewrite lands in a sibling temp directory and swaps in via
two renames — readers either see the old file set or the new one, never a
half-written mix (same discipline as upsert_parquet's staged rewrite).
"""

from __future__ import annotations

import math
import os
import shutil
import uuid


def table_file_stats(path: str) -> tuple[int, int]:
    """(n_data_files, total_bytes) for a parquet directory tree."""
    n, total = 0, 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                n += 1
                total += os.path.getsize(os.path.join(root, f))
    return n, total


def compact_parquet(spark, path: str, target_mb: int = 128) -> dict:
    """Rewrite ``path`` into ceil(total_bytes / target_mb) files.

    Uses ``coalesce`` (narrow — no shuffle: existing partitions are
    concatenated) sized from the CURRENT on-disk bytes, so a table that
    accreted 10 000 micro-files from streaming epochs collapses to a
    handful of scan-efficient files in one pass. Returns before/after
    file counts and bytes; row count is preserved (asserted by the
    caller's tests, and cheap to re-verify at any scale via count()).
    """
    n_before, bytes_before = table_file_stats(path)
    n_target = max(1, math.ceil(bytes_before / (target_mb * 1024 * 1024)))
    df = spark.read.parquet(path)
    tmp = f"{path.rstrip('/')}__compact_{uuid.uuid4().hex[:8]}"
    df.coalesce(n_target).write.mode("overwrite").parquet(tmp)
    old = f"{path.rstrip('/')}__old_{uuid.uuid4().hex[:8]}"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    n_after, bytes_after = table_file_stats(path)
    return {"files_before": n_before, "files_after": n_after,
            "bytes_before": bytes_before, "bytes_after": bytes_after}
