"""Local re-implementation of the driver's correctness gate: run a Spark
query and its DuckDB oracle side-by-side on the same parquet and compare
row count, column names, and an order-insensitive value multiset.

Used by tests/test_oracle_parity.py (and ad-hoc while developing) so that
a parity break is caught *before* the driver's per-round check.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import duckdb
from pyspark.sql import SparkSession

from ds_caselaw_ingester_spark.sources.catalog import TABLES


@dataclass
class ParityResult:
    name: str
    ok: bool
    detail: str
    spark_rows: int
    oracle_rows: int


def _canon(v: object) -> object:
    """Canonicalize a cell for multiset comparison (mirror of an
    order-insensitive value hash)."""
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # repr keeps full double precision; identical bits -> identical repr
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return tuple(_canon(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _canon(x)) for k, x in v.items()))
    return v


def _rows_to_multiset(cols: list[str], rows: list[tuple]) -> dict:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out: dict = {}
    for r in rows:
        key = tuple(_canon(r[i]) for i in order)
        out[key] = out.get(key, 0) + 1
    return out


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def check_query(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    fn,
    oracle: str | None,
) -> ParityResult:
    sdf = fn(spark, sf_dir)
    spark_cols = list(sdf.columns)
    spark_rows = [tuple(r) for r in sdf.collect()]

    if oracle is None:
        ok = True  # rows-only check
        return ParityResult(name, ok, "rows-only (no oracle)", len(spark_rows), -1)

    # close the per-call connection: a 50-query sweep otherwise leaks 50
    # in-memory DuckDB instances (file handles + buffers) until GC
    con = duckdb_connection(sf_dir)
    try:
        res = con.execute(oracle)
        oracle_cols = [d[0] for d in res.description]
        oracle_rows = res.fetchall()
    finally:
        con.close()

    if sorted(spark_cols) != sorted(oracle_cols):
        return ParityResult(
            name,
            False,
            f"column mismatch: spark={sorted(spark_cols)} oracle={sorted(oracle_cols)}",
            len(spark_rows),
            len(oracle_rows),
        )
    if len(spark_rows) != len(oracle_rows):
        return ParityResult(
            name, False, "row-count mismatch", len(spark_rows), len(oracle_rows)
        )
    ms, mo = _rows_to_multiset(spark_cols, spark_rows), _rows_to_multiset(oracle_cols, oracle_rows)
    if ms != mo:
        only_s = [k for k in ms if ms[k] != mo.get(k, 0)][:3]
        only_o = [k for k in mo if mo[k] != ms.get(k, 0)][:3]
        return ParityResult(
            name,
            False,
            f"value mismatch; sample spark-only={only_s} oracle-only={only_o}",
            len(spark_rows),
            len(oracle_rows),
        )
    return ParityResult(name, True, "ok", len(spark_rows), len(oracle_rows))
