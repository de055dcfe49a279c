"""Query registry: every operator the engine claims, as a (Spark callable,
DuckDB oracle SQL) pair over the driver's parquet tables.

Contract (driver harness, /root/repo/__spark_entry__.py): the Spark
callable takes (spark, sf_dir) and returns a DataFrame; the oracle SQL is
ANSI SQL DuckDB runs over the same parquet registered as views. The driver
compares row-count + schema + order-insensitive value hash, sorting
columns by name — so column names AND value bit-patterns must agree.

Portability rules used throughout (enforced by tests/test_oracle_parity.py):
- hashes: md5 (identical hex output both engines); never xxhash/crc/uuid
- doubles that went through arithmetic: ROUND(x, n) in both engines;
  raw parquet doubles may pass through unrounded
- timestamps: rendered to strings (UTC) or reduced to tz-invariant values
- arrays: joined to strings after an explicit sort
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None -> driver records weaker rows-only check
    doc: str = ""
    survey_ops: tuple[str, ...] = field(default_factory=tuple)  # SURVEY.md §2 ids


_REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None,
    doc: str = "",
    survey_ops: tuple[str, ...] = (),
) -> Callable[[Callable[[SparkSession, str], DataFrame]], Callable[[SparkSession, str], DataFrame]]:
    def deco(fn: Callable[[SparkSession, str], DataFrame]) -> Callable[[SparkSession, str], DataFrame]:
        _REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc, survey_ops=survey_ops)
        return fn

    return deco


def all_specs() -> dict[str, QuerySpec]:
    # Import side-effect registration here to avoid circular imports.
    from ds_caselaw_ingester_spark.plans import queries  # noqa: F401

    return dict(_REGISTRY)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in all_specs().items() if spec.oracle is not None}
