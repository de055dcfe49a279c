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
    caller selects a subset; never ``select('*')`` into a wide pipeline."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Register the tables as temp views for the SQL API path."""
    for name in names:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
