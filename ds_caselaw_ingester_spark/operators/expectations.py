"""Table expectations — declarative data-quality checks compiled into
ONE aggregation pass.

An ingest pipeline at 100 TB cannot afford one scan per assertion; the
point of this module is that every row-level expectation (null-ness,
set membership, range, regex, uniqueness) compiles to an aggregate
expression over the SAME scan: N checks = one job, one pass, a handful
of scalars to the driver. Referential checks are the exception — they
are anti-joins by nature (one keyed job per relation, broadcast when
the parent's key set is small).

Shape notes:
- row checks: sum(violation indicator) — partial-aggregated map-side,
  so the shuffle carries one partial row per partition however many
  checks are attached;
- uniqueness: count(col) - count(DISTINCT col) in the same aggregation
  (Spark plans multi-distinct with expand — still one pass over the
  scan, at the cost of an expand factor; use approx_unique for a
  sketch-based bound when exactness isn't required);
- the report is a small DataFrame so it can be unioned across tables,
  written next to the data, or asserted on in tests/CI.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    name: str
    column: str
    # aggregate expression -> violation count (long)
    violations: Column


def not_null(col: str) -> Check:
    return Check("not_null", col, F.sum(F.col(col).isNull().cast("long")))


def in_set(col: str, allowed: "list") -> Check:
    # A None in `allowed` (the natural "nulls are fine" spelling) must
    # mean exactly that — fed to isin it poisons the check instead: IN
    # with a NULL element is three-valued, ~NULL is NULL, and sum()
    # skips NULLs, so every out-of-set value went UNCOUNTED and the
    # audit green-lit bad columns. Split the None out: it only widens
    # the already-null-tolerant contract.
    non_null = [v for v in allowed if v is not None]
    c = F.col(col)
    bad = (
        (~c.isin(*non_null)) & c.isNotNull()
        if non_null
        else c.isNotNull()  # only None allowed: every value violates
    )
    return Check("in_set", col, F.sum(bad.cast("long")))


def between(col: str, lo, hi) -> Check:
    c = F.col(col)
    bad = ((c < F.lit(lo)) | (c > F.lit(hi))) & c.isNotNull()
    return Check("between", col, F.sum(bad.cast("long")))


def matches(col: str, pattern: str) -> Check:
    c = F.col(col)
    bad = (~c.rlike(pattern)) & c.isNotNull()
    return Check("matches", col, F.sum(bad.cast("long")))


def unique(col: str) -> Check:
    return Check(
        "unique", col, F.count(F.col(col)) - F.count_distinct(F.col(col))
    )


def approx_unique(col: str, rsd: float = 0.02) -> Check:
    """Sketch-based uniqueness bound: violation estimate = count -
    approx_count_distinct. Negative estimates (sketch overshoot on
    truly-unique columns) clamp to 0; use `unique` when the answer must
    be exact."""
    est = F.count(F.col(col)) - F.approx_count_distinct(F.col(col), rsd)
    return Check("approx_unique", col, F.greatest(est, F.lit(0)))


def audit_table(df: DataFrame, checks: "list[Check]", table: str = "") -> DataFrame:
    """Run every check in one aggregation pass. Returns
    (table, check, column, violations, total_rows, passed)."""
    if not checks:
        raise ValueError("audit_table: no checks supplied")
    aggs = [F.count(F.lit(1)).alias("_total")] + [
        F.coalesce(c.violations, F.lit(0)).cast("long").alias(f"_c{i}")
        for i, c in enumerate(checks)
    ]
    row = df.agg(*aggs).collect()[0]
    total = int(row["_total"])
    spark = df.sparkSession
    report = [
        (table, c.name, c.column, int(row[f"_c{i}"]), total, int(row[f"_c{i}"]) == 0)
        for i, c in enumerate(checks)
    ]
    return spark.createDataFrame(
        report, "table string, check string, column string, "
        "violations long, total_rows long, passed boolean"
    )


def referential(
    child: DataFrame,
    fk: str,
    parent: DataFrame,
    pk: str,
    table: str = "",
) -> DataFrame:
    """FK integrity in ONE keyed job: left join the parent's distinct
    keys and count rows + orphans in the same aggregation — a separate
    child.count() would rescan the whole fact table just for the
    denominator. Spark broadcasts the parent's key side when small
    (dims), shuffles co-located otherwise — at 100 TB bucket both sides
    on the key like any other fact join."""
    p = parent.select(F.col(pk).alias(fk)).distinct().withColumn(
        "_pk_hit", F.lit(True)
    )
    row = (
        child.select(fk)
        .join(p, fk, "left")
        .select(
            F.count("*").alias("total"),
            F.count_if(
                F.col(fk).isNotNull() & F.col("_pk_hit").isNull()
            ).alias("orphans"),
        )
        .collect()[0]
    )
    orphans, total = int(row["orphans"]), int(row["total"])
    spark = child.sparkSession
    return spark.createDataFrame(
        [(table, "referential", fk, orphans, total, orphans == 0)],
        "table string, check string, column string, "
        "violations long, total_rows long, passed boolean",
    )
