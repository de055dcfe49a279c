"""Z-order layout: the Morton key must be a correct bit interleave, and
a z-clustered write must let parquet min/max footer stats prune
row groups for predicates on EITHER clustered dimension — the property
a single-column sort cannot provide."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from ds_caselaw_ingester_spark.operators.layout import (
    rowgroups_overlapping,
    write_zordered,
    zorder_key,
)


def _py_morton(a: int, b: int, bits: int) -> int:
    out = 0
    for i in range(bits):
        out |= ((a >> i) & 1) << (2 * i)
        out |= ((b >> i) & 1) << (2 * i + 1)
    return out


def test_zorder_key_matches_pure_python_interleave(spark):
    rows = [(a, b) for a in range(0, 256, 17) for b in range(0, 256, 23)]
    df = spark.createDataFrame(rows, "a long, b long")
    # Identity domains: lo=0, hi=256 with 8 bits quantizes x -> x exactly.
    z = zorder_key([F.col("a"), F.col("b")], [(0, 256), (0, 256)], bits=8)
    got = {(r["a"], r["b"]): r["z"] for r in df.select("a", "b", z.alias("z")).collect()}
    for (a, b), zv in got.items():
        assert zv == _py_morton(a, b, 8), (a, b)


def test_zorder_key_clamps_out_of_domain(spark):
    df = spark.createDataFrame([(-5, 300)], "a long, b long")
    z = zorder_key([F.col("a"), F.col("b")], [(0, 256), (0, 256)], bits=8)
    [r] = df.select(z.alias("z")).collect()
    assert r["z"] == _py_morton(0, 255, 8)


def test_zorder_key_rejects_overflow_and_domain_mismatch(spark):
    with pytest.raises(ValueError):
        zorder_key([F.col("a"), F.col("b")], [(0, 1), (0, 1)], bits=32)
    with pytest.raises(ValueError):
        zorder_key([F.col("a")], [(0, 1), (0, 1)], bits=8)


def test_zordered_write_prunes_both_dimensions(spark, sf_dir, tmp_path):
    """Write events three ways — unclustered, sorted by ts only, and
    z-ordered on (ts, user_id) — then measure footer-stat row-group
    pruning for a small 2-D box predicate. The z-order layout must beat
    the unclustered one on BOTH single-dimension probes; the ts-sorted
    layout shows the asymmetry z-order removes (great on ts, no pruning
    on user_id)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id",
        # parquet ts arrives TIMESTAMP_NTZ; NTZ -> LTZ -> epoch long
        F.col("ts").cast("timestamp_ltz").cast("long").alias("ts"),
        "user_id",
    )
    lo_ts, hi_ts, lo_u, hi_u = ev.agg(
        F.min("ts"), F.max("ts"), F.min("user_id"), F.max("user_id")
    ).collect()[0]
    n_files = 16

    base = str(tmp_path / "plain")
    ev.repartition(n_files).write.mode("overwrite").parquet(base)
    bysort = str(tmp_path / "ts_sorted")
    ev.repartitionByRange(n_files, "ts").sortWithinPartitions("ts").write.mode(
        "overwrite"
    ).parquet(bysort)
    byz = str(tmp_path / "zorder")
    write_zordered(
        ev,
        byz,
        ["ts", "user_id"],
        [(lo_ts, hi_ts + 1), (lo_u, hi_u + 1)],
        num_files=n_files,
    )

    mid_ts = lo_ts + (hi_ts - lo_ts) // 2
    mid_u = lo_u + (hi_u - lo_u) // 2
    ts_box = {"ts": (mid_ts, mid_ts + (hi_ts - lo_ts) // 20)}
    u_box = {"user_id": (mid_u, mid_u + (hi_u - lo_u) // 20)}

    def frac(path, pred):
        kept, total = rowgroups_overlapping(path, pred)
        assert total >= n_files
        return kept / total

    # Both single-dimension probes prune meaningfully under z-order...
    assert frac(byz, ts_box) < 0.5 * frac(base, ts_box)
    assert frac(byz, u_box) < 0.5 * frac(base, u_box)
    # ...while the single-column sort layout cannot prune the OTHER dim.
    assert frac(bysort, u_box) > 0.9
    # And the combined 2-D box is sharper than either 1-D probe alone.
    both = dict(ts_box, **u_box)
    assert frac(byz, both) <= min(frac(byz, ts_box), frac(byz, u_box))
    # Correctness: the clustered copy still holds exactly the same rows.
    assert (
        spark.read.parquet(byz).orderBy("event_id").collect()
        == ev.orderBy("event_id").collect()
    )


def test_degenerate_domain_raises(spark):
    """Review regression: lo >= hi silently collapsed the dimension to
    one cell (NaN/Inf through the edge clamp) — the z-order shuffle
    bought no pruning with no error. Fail fast instead."""
    import pytest
    from pyspark.sql import functions as F

    from ds_caselaw_ingester_spark.operators.layout import zorder_key

    with pytest.raises(ValueError, match="lo < hi"):
        zorder_key([F.col("x"), F.col("y")], [(5.0, 5.0), (0.0, 1.0)])
