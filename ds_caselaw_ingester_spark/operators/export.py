"""Training-data export: deterministic global shuffle into balanced,
reproducible parquet shards.

A training run wants its corpus in (a) random order — adjacent documents
must not correlate, or batches see topic runs — and (b) a FIXED random
order: re-exporting the same corpus must produce byte-stable shards so
runs are reproducible and resumable. `df.orderBy(rand())` fails (b) and
`repartition(n)` fails both (round-robin from whatever order the scan
produced).

The Spark-first answer is the same hash-gate trick the sampling
operators use: shuffle key = md5(id). It is uniform (so range
partitioning by it balances shards), deterministic (same corpus ->
same order, any cluster, any partitioning), and data-independent (no
correlation with any real attribute — exactly what "random order"
means operationally).

Plan shape: repartitionByRange on the hash (one range-exchange; Spark
samples the key distribution to cut balanced ranges) + sortWithin-
Partitions (no second exchange) -> file i holds the i-th contiguous
hash range, rows sorted within. At 100 TB this is one pass over the
corpus, and shard count = task count is chosen for the trainer
(~dataset_bytes / shard_size), not inherited from upstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def shuffled_shards(df: DataFrame, id_col: str, num_shards: int) -> DataFrame:
    """The exported frame: `_shuffle_key` = md5 of the id, range-
    partitioned into num_shards and sorted within each shard. Exposed
    separately from the write so tests (and resumable exporters) can
    reason about the frame."""
    if num_shards <= 0:
        raise ValueError(f"num_shards must be positive, got {num_shards}")
    keyed = df.withColumn("_shuffle_key", F.md5(F.col(id_col).cast("string")))
    return keyed.repartitionByRange(num_shards, "_shuffle_key").sortWithinPartitions(
        "_shuffle_key"
    )


def export_shuffled(
    df: DataFrame, id_col: str, out_dir: str, num_shards: int
) -> None:
    """Write the shuffled corpus as num_shards parquet files. The
    shuffle key column is kept in the output: it is the resume cursor
    (a restarted consumer seeks to the last key it saw) and the
    proof-of-order for audits."""
    shuffled_shards(df, id_col, num_shards).write.mode("overwrite").parquet(out_dir)
