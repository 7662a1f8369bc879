"""Table maintenance: small-file compaction.

Streaming sinks and incremental MERGE rewrites leave parquet tables with
thousands of KB-sized files; at 100 TB the scan cost becomes dominated by
file-open overhead and the NameNode/listing pressure, not bytes. Periodic
compaction rewrites a table (or one partition of it) into
~``target_mb``-sized files.

Atomicity: the rewrite lands in a sibling temp directory and swaps in via
two renames. Readers never see a half-written MIX of old and new files,
but the swap is NOT atomic as a whole: between the two renames the table
path briefly does not exist, so a concurrent reader can fail with
path-not-found. A failure during the second rename restores the original
directory (see compact_parquet), so the table is never lost — but run
compaction only when no query is mid-scan (e.g. between streaming
micro-batches, as run_api_stream_sync does, where the foreachBatch hook
is the only reader/writer). On object stores (S3/GCS) directory rename
is not atomic AT ALL — copy+delete per object — so this local-FS swap
does not transfer; use a transactional table format (Delta/Iceberg,
upsert_delta) or a manifest-pointer swap there instead.
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
    try:
        os.rename(tmp, path)
    except BaseException:
        # second rename failed: put the original back so the table is
        # never stranded at the __old_ path (crash between the renames
        # still loses only the COMPACTION, not the data — recovery is
        # "rename __old_* back"; see the module docstring for the
        # concurrent-reader and object-store caveats)
        os.rename(old, path)
        raise
    shutil.rmtree(old)
    n_after, bytes_after = table_file_stats(path)
    return {"files_before": n_before, "files_after": n_after,
            "bytes_before": bytes_before, "bytes_after": bytes_after}
