"""Bucketed storage layout — pre-paying the join/aggregation shuffle at
write time.

At 100 TB the dominant cost of a fact-fact join (orders ⋈ lineitem,
documents ⋈ annotations) is shuffling BOTH sides on the join key every
time the join runs. Bucketing moves that shuffle to the WRITE: rows are
hash-distributed into a fixed number of buckets by key once, and every
subsequent equi-join or aggregation on that key reads co-located
buckets with NO exchange on the bucketed side — the classic
write-once/join-many trade of a warehouse fact table. (Z-order,
operators/layout.py, is the complementary trade: it buys row-group
PRUNING for range predicates; bucketing buys exchange-free JOINS.)

Spark specifics this module encodes:
- bucket metadata lives in the catalog, so bucketed data must be
  written with ``saveAsTable`` (a path-only parquet write silently
  drops the bucket spec — reads plan a full shuffle again). The tables
  here are EXTERNAL (explicit ``path``) so tests and local runs control
  the storage location; on a cluster the catalog is the metastore.
- both sides of a join must agree on the bucket count for a
  bucket-local join; mismatched counts shuffle the smaller-bucketed
  side only (Spark can coalesce/repartition buckets when
  ``spark.sql.bucketing.coalesceBucketsInJoin.enabled`` is on).
- one-side-bucketed joins shuffle ONLY the unbucketed side — already a
  halving of shuffle volume for the common big-fact ⋈ growing-delta
  shape.
- ``sortBy`` within buckets additionally enables sort-merge joins to
  skip their per-task sort (and gives parquet row-group min/max
  locality on the sort key).

The number of buckets is a capacity decision: target files of
~128-512 MB after compression (buckets × files-per-partition is the
file count; too many buckets = small-file problem, too few = task-level
parallelism cap, since one bucket is one task in a bucket-local join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_cols: "list[str]",
    num_buckets: int,
    sort_cols: "list[str] | None" = None,
    mode: str = "overwrite",
) -> None:
    """Write df as an external bucketed parquet table registered in the
    session catalog. In overwrite mode an existing table's stale
    catalog entry is dropped first (saveAsTable would otherwise refuse
    or, worse, keep the old bucket spec). In append mode the entry is
    KEPT so Spark validates the incoming bucket spec against the
    registered one — dropping it would let an append with a different
    bucket count re-register a new spec over files hashed under the old
    one, silently corrupting bucket-local joins."""
    spark = df.sparkSession
    if mode == "overwrite" and spark.catalog.tableExists(table):
        spark.sql(f"DROP TABLE IF EXISTS {table}")
    writer = (
        df.write.mode(mode)
        .format("parquet")
        .option("path", path)
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back through the catalog (NOT
    spark.read.parquet(path) — a raw path read has no bucket metadata
    and re-plans the shuffle the layout already paid for)."""
    return spark.table(table)
