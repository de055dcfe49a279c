"""Table catalog over the driver's parquet test tables.

Reads are plain ``spark.read.parquet`` so Catalyst gets full predicate
pushdown / column pruning into the scan — at 100 TB the scan is the
dominant cost and pruning unused columns (especially wide text/binary
columns on ``documents``) is the single biggest win.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any realistic scale factor
# (TPC-H region/nation are constant-size; customer/supplier grow slowly).
BROADCAST_TABLES = frozenset({"region", "nation", "supplier"})


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table. Column pruning happens automatically when the
    caller selects a subset; never ``select('*')`` into a wide pipeline.

    ``events.ts`` is parquet TIMESTAMP(NANOS), which Spark only reads via
    the nanosAsLong legacy conf (as raw int64 nanos). We truncate to a
    microsecond TimestampType — the same truncation DuckDB applies — so
    event-time semantics agree across engines.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/events.parquet")
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Register the tables as temp views for the SQL API path."""
    for name in names:
        table(spark, sf_dir, name).createOrReplaceTempView(name)


def spread(df: DataFrame, *key_cols: str) -> DataFrame:
    """Repartition a small input across all cores before an explode-heavy
    stage. A compact parquet file arrives as 1-2 partitions; the
    downstream explode (shingles, n-grams, tokens) then runs on 1-2 cores.
    One cheap shuffle of the small pre-explode rows buys full parallelism
    for the expensive expansion. On a real cluster large inputs already
    arrive well-partitioned — this guards the small-file edge, it doesn't
    replace source partitioning."""
    n = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n, *key_cols) if key_cols else df.repartition(n)
