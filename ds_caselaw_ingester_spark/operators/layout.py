"""Data-layout optimization for scan pruning: Z-order (Morton-curve)
clustering of a table's files so that *multi-dimensional* range
predicates skip row groups via parquet min/max statistics.

Why this exists: sorting a 100 TB table by one column gives perfect
min/max pruning on that column and none on any other. Interleaving the
bits of two or three filter columns into one Morton key and
range-partitioning + sorting the write by that key makes every output
file a small hyper-rectangle in the combined key space — a predicate on
EITHER dimension (or both) overlaps only the files whose rectangle
intersects it. This is the same layout idea Delta/Iceberg expose as
`OPTIMIZE ZORDER BY`; here it is plain DataFrame code over plain
parquet, engine-verifiable by reading the footers back.

Everything is a JVM-side column expression (bit shifts and masks inside
whole-stage codegen — no UDFs), so the clustering write costs one range
shuffle + local sorts, exactly what a single-column sort costs.

Scale notes:
- `repartitionByRange` samples the z-key to pick balanced file bounds —
  skew in the raw columns becomes file-count skew, not task skew.
- The z-key is computed from FIXED per-column (lo, hi) domains supplied
  by the caller (one cheap agg if unknown). Fixed domains keep the key
  stable across incremental writes, so later-arriving files tile the
  same space rather than reshuffling old bounds.
- Values outside [lo, hi] clamp to the edge cells: pruning stays
  CORRECT (footer stats are computed from actual values), only the
  clamped cells' selectivity degrades.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _quantize(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Map a numeric column into [0, 2^bits) by fixed min-max scaling,
    clamped at the edges (out-of-domain values land in edge cells)."""
    cells = (1 << bits) - 1
    scaled = (col.cast("double") - F.lit(float(lo))) / F.lit(float(hi - lo))
    q = F.floor(scaled * F.lit(float(cells + 1))).cast("long")
    return F.greatest(F.lit(0), F.least(F.lit(cells), q))


def zorder_key(
    cols: list[Column], domains: list[tuple[float, float]], bits: int = 16
) -> Column:
    """Morton key: quantize each column to `bits` bits over its fixed
    (lo, hi) domain, then interleave the bits round-robin (dimension 0
    gets the lowest bit of each group). Pure shift/or expression tree —
    ndims * bits terms, all inside codegen."""
    if len(cols) != len(domains):
        raise ValueError("one (lo, hi) domain per column required")
    if not 1 <= bits * len(cols) <= 63:
        raise ValueError(f"ndims*bits must fit a signed long, got {bits * len(cols)}")
    for lo, hi in domains:
        # a degenerate/reversed domain divides by <= 0: every value maps
        # to NaN/Inf and the edge clamp silently collapses the dimension
        # to one cell — the caller pays the z-order shuffle for nothing.
        # Fail fast like the bits check above.
        if not float(lo) < float(hi):
            raise ValueError(f"domain (lo, hi) must satisfy lo < hi, got ({lo}, {hi})")
    qs = [
        _quantize(c, lo, hi, bits) for c, (lo, hi) in zip(cols, domains)
    ]
    ndims = len(qs)
    key = F.lit(0).cast("long")
    for b in range(bits):
        for d, q in enumerate(qs):
            bit = F.shiftright(q, b).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(
                F.shiftleft(bit, b * ndims + d)
            )
    return key


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    domains: list[tuple[float, float]],
    num_files: int,
    bits: int = 16,
) -> None:
    """Write `df` as parquet clustered on the Morton key of `cols`:
    range-partition into `num_files` z-key slices (sampled, balanced),
    sort each slice, write. Each output file covers a contiguous z-range
    = a small hyper-rectangle of the filter columns, so its footer
    min/max on EVERY clustered column is tight."""
    z = zorder_key([F.col(c) for c in cols], domains, bits)
    (
        df.withColumn("_z", z)
        .repartitionByRange(num_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def rowgroups_overlapping(
    path: str, predicates: dict[str, tuple[float, float]]
) -> tuple[int, int]:
    """Footer-only pruning measurement: (overlapping, total) row groups
    whose [min, max] stats intersect EVERY (lo, hi) predicate range.
    This is exactly the skipping decision a scan makes from parquet
    statistics — reading footers, never data pages."""
    import glob
    import os

    import pyarrow.parquet as pq

    files = (
        sorted(glob.glob(os.path.join(path, "*.parquet")))
        if os.path.isdir(path)
        else [path]
    )
    total = kept = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        for rg in range(md.num_row_groups):
            total += 1
            g = md.row_group(rg)
            ok = True
            for col, (lo, hi) in predicates.items():
                st = g.column(names[col]).statistics
                if st is None or not st.has_min_max:
                    continue  # no stats -> cannot skip
                if st.max < lo or st.min > hi:
                    ok = False
                    break
            kept += ok
    return kept, total
