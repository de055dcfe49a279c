"""Small-file compaction — the maintenance job every streaming sink
needs.

Each micro-batch append writes its own parquet files; after a week a
streaming table is millions of kilobyte-sized files and every reader
pays file-open latency, footer parsing, and scheduler overhead per
file instead of per row group (the classic small-files problem — at
100 TB the NAMENODE/listing cost alone can dominate a scan).

Compaction rewrites a directory into ~target-sized files. Design
choices encoded here:

- file count is computed from the table's ACTUAL on-disk bytes, not
  row counts — compression ratios vary too much across tables for a
  rows-per-file heuristic;
- the rewrite uses coalesce() when shrinking (no shuffle — partitions
  are concatenated) and repartitionByRange on sort keys when the
  caller wants clustering restored (one shuffle, buys back min/max
  pruning the tiny appends destroyed; see operators/layout.py for the
  multi-column Z-order variant);
- the swap reuses the engine's tmp-dir + rename discipline: readers
  of the old files are never raced, a crash leaves the original
  intact.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def dir_stats(path: str) -> "tuple[int, int]":
    """(n_parquet_files, total_bytes) for a parquet directory."""
    n, total = 0, 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                n += 1
                total += os.path.getsize(os.path.join(root, f))
    return n, total


def compact_parquet_dir(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_cols: "list[str] | None" = None,
) -> "tuple[int, int]":
    """Rewrite `path` into ceil(bytes / target_file_bytes) files.
    Returns (files_before, files_after). sort_cols: restore range
    clustering on these columns during the rewrite (adds one shuffle;
    without it compaction is a shuffle-free coalesce)."""
    local = path[len("file:") :] if path.startswith("file:") else path
    before, total = dir_stats(local)
    if before == 0:
        return 0, 0
    n_files = max(1, -(-total // target_file_bytes))
    df = spark.read.parquet(path)
    if sort_cols:
        out = df.repartitionByRange(n_files, *[F.col(c) for c in sort_cols])
        out = out.sortWithinPartitions(*sort_cols)
    else:
        out = df.coalesce(n_files)
    tmp, old = local + ".compact-tmp", local + ".compact-old"
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(old, ignore_errors=True)
    out.write.mode("overwrite").parquet(tmp)
    os.rename(local, old)
    os.rename(tmp, local)
    shutil.rmtree(old, ignore_errors=True)
    after, _ = dir_stats(local)
    return before, after
