"""Cardinality sketches (operators/sketches.py) vs DuckDB oracles.

Gate doctrine (same as the registry's): KMV is bit-exact cross-engine
— sketch arrays, saturation fallback, AND the floor()ed estimator are
compared with plain equality against DuckDB running the documented
oracle SQL. HLL's integer internals (registers, harmonic sum S, zero
buckets, raw-estimate floor) are compared exactly; only `est_distinct`
— whose linear-counting branch calls ln() — gets a 1e-9 relative
tolerance (libm last-ulp doctrine, see the module docstring).

These operators live outside the 50-slot driver registry (the driver
records at most 50 CORRECTNESS rows — tests/test_registry_contract.py)
so this file IS their oracle gate, following the SURVEY.md §8 rotation
convention of pytest-resident DuckDB gates.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from ds_caselaw_ingester_spark.operators.sketches import (
    TWO_52,
    _alpha,
    hash52,
    hll_distinct,
    hll_registers,
    hll_union,
    kmv_distinct,
    kmv_sketch,
    kmv_union,
)

SF = "/root/testdata/sf0.01"


def _con(sf_dir: str = SF):
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'")
    return con


def _planted(spark, n: int, label: str = "g", offset: int = 0):
    """n distinct string values 'v{offset}..v{offset+n-1}', one group."""
    return spark.range(n).select(
        F.lit(label).alias("grp"),
        F.concat(F.lit("v"), (F.col("id") + offset).cast("string")).alias("val"),
    )


# ---------------------------------------------------------------------------
# hash primitives
# ---------------------------------------------------------------------------


def test_hash52_matches_duckdb(spark):
    vals = ["", "a", "hello", "Ünïcødé ☂", "123", "v99999", "\t x "]
    got = (
        spark.createDataFrame([(v,) for v in vals], ["v"])
        .select("v", hash52(F.col("v")).alias("h"))
        .collect()
    )
    con = duckdb.connect()
    for row in got:
        (want,) = con.sql(
            "SELECT CAST(('0x' || substr(md5(?),1,13)) AS BIGINT)", params=[row["v"]]
        ).fetchone()
        assert row["h"] == want, row["v"]
        assert 0 <= row["h"] < TWO_52


def test_parameter_guards(spark):
    df = _planted(spark, 1)
    with pytest.raises(ValueError):
        kmv_sketch(df, ["grp"], "val", k=1001)  # beyond WindowGroupLimit pushdown
    with pytest.raises(ValueError):
        hll_registers(df, ["grp"], "val", p=7)  # not hex-digit aligned


# ---------------------------------------------------------------------------
# KMV: exact DuckDB oracle
# ---------------------------------------------------------------------------


def _kmv_oracle_sql(k: int, value_expr: str = "CAST(user_id AS VARCHAR)") -> str:
    numer = float((k - 1) * TWO_52)
    return f"""
WITH h AS (
  SELECT event_type, CAST(('0x' || substr(md5({value_expr}),1,13)) AS BIGINT) AS h52
  FROM events WHERE user_id IS NOT NULL
), d AS (SELECT DISTINCT event_type, h52 FROM h),
r AS (SELECT event_type, h52,
             row_number() OVER (PARTITION BY event_type ORDER BY h52) AS rn
      FROM d)
SELECT event_type, CAST(COUNT(*) AS INT) AS n_hashes,
  CASE WHEN COUNT(*) < {k} OR MAX(CASE WHEN rn={k} THEN h52 END) <= 0 THEN COUNT(*)
  ELSE CAST(FLOOR({numer!r} / CAST(MAX(CASE WHEN rn={k} THEN h52 END) AS DOUBLE)) AS BIGINT)
  END AS est_distinct
FROM r WHERE rn <= {k}
GROUP BY event_type ORDER BY event_type
"""


@pytest.mark.parametrize("k", [16, 64])
def test_kmv_distinct_matches_duckdb_exactly(spark, k):
    """Both regimes on real data: k=16 saturates (estimator branch),
    k=64 doesn't at sf0.01 (exact-count branch) — both must agree with
    DuckDB with plain equality, floor()ed estimate included."""
    ev = spark.read.parquet(f"{SF}/events.parquet")
    got = [
        (r["event_type"], r["n_hashes"], r["est_distinct"])
        for r in kmv_distinct(ev, ["event_type"], "user_id", k=k)
        .orderBy("event_type")
        .collect()
    ]
    con = _con()
    want = con.sql(_kmv_oracle_sql(k)).fetchall()
    assert got == [tuple(w) for w in want]
    # both branches must actually be exercised across the two params
    if k == 16:
        assert all(n >= k for _, n, _ in got)


def test_kmv_sketch_array_matches_duckdb(spark):
    """The sketch itself (not just the estimate) is the mergeable
    artifact a 100 TB rollup stores — pin its exact content."""
    k = 32
    ev = spark.read.parquet(f"{SF}/events.parquet")
    got = {
        r["event_type"]: r["kmv"]
        for r in kmv_sketch(ev, ["event_type"], "user_id", k=k).collect()
    }
    con = _con()
    want_rows = con.sql(f"""
WITH h AS (
  SELECT event_type, CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)),1,13)) AS BIGINT) AS h52
  FROM events WHERE user_id IS NOT NULL
), d AS (SELECT DISTINCT event_type, h52 FROM h),
r AS (SELECT event_type, h52,
             row_number() OVER (PARTITION BY event_type ORDER BY h52) AS rn
      FROM d)
SELECT event_type, list(h52 ORDER BY h52) FROM r WHERE rn <= {k} GROUP BY event_type
""").fetchall()
    assert got == {t: lst for t, lst in want_rows}


def test_kmv_union_of_parts_equals_sketch_of_whole(spark):
    """Mergeability — THE property that makes this a sketch: daily
    sketches fold to the monthly sketch without touching raw data."""
    k = 128
    whole = _planted(spark, 5000)
    parts = [
        whole.filter(F.length("val") % 2 == i) for i in (0, 1)
    ]
    part_sketches = kmv_sketch(parts[0], ["grp"], "val", k=k).unionByName(
        kmv_sketch(parts[1], ["grp"], "val", k=k)
    )
    merged = kmv_union(part_sketches, ["grp"], k=k).collect()
    direct = kmv_sketch(whole, ["grp"], "val", k=k).collect()
    assert len(merged) == len(direct) == 1
    assert merged[0]["kmv"] == direct[0]["kmv"]


def test_kmv_partitioning_invariance(spark):
    df = _planted(spark, 3000)
    a = kmv_distinct(df.repartition(1), ["grp"], "val", k=64).collect()
    b = kmv_distinct(df.repartition(13), ["grp"], "val", k=64).collect()
    assert [r.asDict() for r in a] == [r.asDict() for r in b]


def test_kmv_accuracy_on_planted_cardinalities(spark):
    """Relative error within 3 standard errors (3/sqrt(k-2)) on planted
    cardinalities well past saturation. Deterministic given md5."""
    k = 256
    bound = 3.0 / (k - 2) ** 0.5
    for n in (2_000, 20_000):
        est = kmv_distinct(_planted(spark, n), ["grp"], "val", k=k).collect()[0][
            "est_distinct"
        ]
        assert abs(est - n) / n < bound, (n, est)


def test_kmv_plan_is_one_exchange_with_window_group_limit(spark):
    """The scale shape: rank<=k pruned BELOW the single group exchange
    (partial WindowGroupLimit), so map tasks ship at most k hashes per
    group — the map-side combine that makes this a sketch."""
    ev = spark.read.parquet(f"{SF}/events.parquet")
    plan = (
        kmv_sketch(ev, ["event_type"], "user_id", k=64)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Partial" in plan.split("Exchange hashpartitioning")[-1], plan
    # the Partial WindowGroupLimit must sit BELOW the exchange (the
    # substring after the exchange is the map side of the plan text)
    assert "WindowGroupLimit" in plan
    assert plan.count("Exchange hashpartitioning") <= 2  # rank + final agg share the key


# ---------------------------------------------------------------------------
# HLL: integer-exact internals, tolerance-gated estimate
# ---------------------------------------------------------------------------


def _hll_oracle(con, p: int, value_expr: str = "CAST(user_id AS VARCHAR)"):
    nhex = p // 4
    m = 1 << p
    const = _alpha(m) * float(m) * float(m) * float(1 << 53)
    return con.sql(f"""
WITH hx AS (
  SELECT event_type,
         CAST(('0x' || substr(md5({value_expr}),1,{nhex})) AS BIGINT) AS j,
         CAST(('0x' || substr(md5({value_expr}),{nhex + 1},13)) AS BIGINT) AS w
  FROM events WHERE user_id IS NOT NULL
), reg AS (
  SELECT event_type, j,
         MAX(CASE WHEN w = 0 THEN 53 ELSE 53 - length(bin(w)) END) AS M
  FROM hx GROUP BY event_type, j
), fold AS (
  SELECT event_type,
         SUM((CAST(1 AS BIGINT) << (53 - M)))
           + (({m} - COUNT(*)) * (CAST(1 AS BIGINT) << 53)) AS S,
         CAST({m} - COUNT(*) AS BIGINT) AS zero_buckets
  FROM reg GROUP BY event_type
)
SELECT event_type, S, zero_buckets,
  CAST(FLOOR({const!r} / CAST(S AS DOUBLE)) AS BIGINT) AS est_raw_floor,
  CAST(FLOOR(CASE WHEN {const!r} / CAST(S AS DOUBLE) <= 2.5 * {m}
                   AND zero_buckets > 0
             THEN {float(m)!r} * ln({float(m)!r} / CAST(zero_buckets AS DOUBLE))
             ELSE {const!r} / CAST(S AS DOUBLE) END) AS BIGINT) AS est_distinct
FROM fold ORDER BY event_type
""").fetchall()


def test_hll_registers_match_duckdb_exactly(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    got = {
        (r["event_type"], r["j"]): r["M"]
        for r in hll_registers(ev, ["event_type"], "user_id", p=8).collect()
    }
    con = _con()
    want = con.sql("""
WITH hx AS (
  SELECT event_type,
         CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)),1,2)) AS BIGINT) AS j,
         CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)),3,13)) AS BIGINT) AS w
  FROM events WHERE user_id IS NOT NULL
)
SELECT event_type, j, MAX(CASE WHEN w = 0 THEN 53 ELSE 53 - length(bin(w)) END)
FROM hx GROUP BY event_type, j
""").fetchall()
    assert got == {(t, j): m for t, j, m in want}


def test_hll_estimate_matches_duckdb(spark):
    """S / zero_buckets / est_raw_floor: exact equality. est_distinct:
    1e-9 relative (the ln() column)."""
    ev = spark.read.parquet(f"{SF}/events.parquet")
    got = (
        hll_distinct(ev, ["event_type"], "user_id", p=8)
        .orderBy("event_type")
        .collect()
    )
    con = _con()
    want = _hll_oracle(con, p=8)
    assert len(got) == len(want)
    for g, (t, s, z, raw, est) in zip(got, want):
        assert (g["event_type"], g["S"], g["zero_buckets"], g["est_raw_floor"]) == (
            t,
            s,
            z,
            raw,
        )
        assert abs(g["est_distinct"] - est) <= max(1, abs(est)) * 1e-9


def test_hll_union_of_parts_equals_registers_of_whole(spark):
    whole = _planted(spark, 4000)
    parts = [whole.filter(F.length("val") % 2 == i) for i in (0, 1)]
    merged = hll_union(
        hll_registers(parts[0], ["grp"], "val", p=8).unionByName(
            hll_registers(parts[1], ["grp"], "val", p=8)
        ),
        ["grp"],
    )
    direct = hll_registers(whole, ["grp"], "val", p=8)
    as_map = lambda df: {(r["grp"], r["j"]): r["M"] for r in df.collect()}
    assert as_map(merged) == as_map(direct)


def test_hll_accuracy_on_planted_cardinalities(spark):
    """p=8 (m=256): ~1.04/sqrt(m) = 6.5% standard error; assert within
    3 sigma across three decades of cardinality. Deterministic."""
    bound = 3 * 1.04 / 16.0
    for n in (100, 5_000, 50_000):
        est = hll_distinct(_planted(spark, n), ["grp"], "val", p=8).collect()[0][
            "est_distinct"
        ]
        assert abs(est - n) / n < bound, (n, est)


def test_hll_small_range_uses_linear_counting(spark):
    """n=10 at m=256 must take the linear-counting branch and land much
    closer than the raw estimator would."""
    row = hll_distinct(_planted(spark, 10), ["grp"], "val", p=8).collect()[0]
    assert row["zero_buckets"] > 0
    assert abs(row["est_distinct"] - 10) <= 2


# ---------------------------------------------------------------------------
# Sampled quantiles + two-pass heavy hitters
# ---------------------------------------------------------------------------

GATE = "CAST(('0x' || substr(md5(CAST({key} AS VARCHAR)),1,13)) AS BIGINT) / 16.0^13 < {rate!r}"


def test_sampled_quantiles_match_duckdb_exactly(spark):
    from ds_caselaw_ingester_spark.operators.sketches import sampled_quantiles

    rate, qs = 0.5, [0.0, 0.25, 0.5, 0.9, 1.0]
    ev = spark.read.parquet(f"{SF}/events.parquet")
    got = sorted(
        (r["event_type"], r["q"], r["value"], r["sample_n"])
        for r in sampled_quantiles(
            ev, ["event_type"], "value", "event_id", qs, rate
        ).collect()
    )
    con = _con()
    gate = GATE.format(key="event_id", rate=rate)
    want = sorted(
        tuple(r)
        for r in con.sql(f"""
WITH s AS (
  SELECT event_type, value, event_id FROM events
  WHERE value IS NOT NULL AND {gate}
), ranked AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
         CAST(count(*) OVER (PARTITION BY event_type) AS INT) AS sample_n
  FROM s
)
SELECT event_type, q, value, sample_n
FROM ranked, (SELECT CAST(unnest({[float(q) for q in qs]!r}) AS DOUBLE) AS q)
WHERE rn = GREATEST(1, CEIL(q * sample_n))
""").fetchall()
    )
    assert got == want
    assert len(got) == 5 * 5  # every (event_type, q) pair produced one row


def test_sampled_quantiles_partitioning_and_merge_invariance(spark):
    """The gate is a pure row predicate, so union-of-part-samples IS
    the sample of the union — quantiles recomputed after an append
    equal quantiles over the whole."""
    from ds_caselaw_ingester_spark.operators.sketches import sampled_quantiles

    ev = spark.read.parquet(f"{SF}/events.parquet")
    out = lambda df: sorted(
        map(tuple, sampled_quantiles(
            df, ["event_type"], "value", "event_id", [0.5, 0.95], 0.3
        ).collect())
    )
    whole = out(ev)
    assert out(ev.repartition(17)) == whole
    halves = ev.where("event_id % 2 = 0").unionByName(ev.where("event_id % 2 = 1"))
    assert out(halves) == whole


def test_sampled_quantiles_accuracy_on_planted_uniform(spark):
    """Median of hash-ordered uniform ids at rate 0.1 lands within a
    few sampling sigmas of the true median. Deterministic."""
    from ds_caselaw_ingester_spark.operators.sketches import sampled_quantiles

    n = 50_000
    df = spark.range(n).select(
        F.lit("g").alias("grp"), F.col("id").cast("double").alias("v"),
        F.col("id").alias("key"),
    )
    rows = sampled_quantiles(df, ["grp"], "v", "key", [0.5], 0.1).collect()
    assert len(rows) == 1
    # quantile sigma ~ sqrt(q(1-q)/m)*n with m = sample size
    m = rows[0]["sample_n"]
    sigma = (0.25 / m) ** 0.5 * n
    assert abs(rows[0]["value"] - n / 2) < 4 * sigma, (rows[0], sigma)


def test_heavy_hitters_match_duckdb_and_exact_counts(spark):
    """Planted heavy keys over a long uniform tail: every reported
    count must equal the exact groupBy count (no false positives by
    construction), every planted heavy key must be found, and the
    DuckDB replay of both passes must match bit-for-bit."""
    from ds_caselaw_ingester_spark.operators.sketches import heavy_hitters

    spark_df = (
        spark.range(20_000)
        .select(
            F.col("id").alias("key"),
            F.when(F.col("id") % 4 == 0, F.concat(F.lit("hot"), (F.col("id") % 3).cast("string")))
            .otherwise(F.concat(F.lit("cold"), F.col("id").cast("string")))
            .alias("val"),
        )
    )
    rate, min_count, safety = 0.05, 500, 0.5
    got = [tuple(r) for r in heavy_hitters(
        spark_df, "val", "key", min_count, rate, safety
    ).collect()]
    exact = {
        r["val"]: r["count"]
        for r in spark_df.groupBy("val").count().filter(F.col("count") >= min_count).collect()
    }
    assert {v: c for v, c in got} == exact  # all 3 hot keys, exact counts
    assert len(got) == 3

    con = duckdb.connect()
    con.register("t", spark_df.toPandas())
    gate = GATE.format(key="key", rate=rate)
    want = [tuple(r) for r in con.sql(f"""
WITH cand AS (
  SELECT val FROM t WHERE {gate}
  GROUP BY val HAVING count(*) >= {safety * rate * min_count!r}
)
SELECT val, count(*) AS count FROM t
WHERE val IN (SELECT val FROM cand)
GROUP BY val HAVING count(*) >= {min_count}
ORDER BY count DESC, val
""").fetchall()]
    assert got == want


def test_heavy_hitters_candidate_join_is_broadcast(spark):
    from ds_caselaw_ingester_spark.operators.sketches import heavy_hitters

    ev = spark.read.parquet(f"{SF}/events.parquet")
    plan = (
        heavy_hitters(ev, "event_type", "event_id", 10, rate=0.5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


# ---------------------------------------------------------------------------
# Hypothesis: any-Unicode cross-engine agreement via a pure-Python model
# ---------------------------------------------------------------------------


def _py_h52(v: str) -> int:
    import hashlib

    return int(hashlib.md5(v.encode("utf-8")).hexdigest()[:13], 16)


def test_sketches_match_python_model_on_adversarial_unicode(spark):
    """KMV sketch content and HLL registers against an independent
    hashlib model over hypothesis-generated any-Unicode values (one
    Spark job per example; surrogates excluded — not encodable)."""
    import hashlib  # noqa: F401  (model dependency, imported above)

    from hypothesis import given, settings
    from hypothesis import strategies as st

    texts = st.lists(
        st.text(
            alphabet=st.characters(blacklist_categories=("Cs",)), max_size=25
        ),
        min_size=1,
        max_size=30,
        unique=True,
    )

    @settings(max_examples=12, deadline=None)
    @given(vals=texts)
    def prop(vals):
        k, p = 8, 4
        df = spark.createDataFrame([(v,) for v in vals], ["v"]).withColumn(
            "grp", F.lit("g")
        )
        got_kmv = kmv_sketch(df, ["grp"], "v", k=k).collect()[0]["kmv"]
        want_kmv = sorted({_py_h52(v) for v in vals})[:k]
        assert got_kmv == want_kmv

        got_reg = {
            r["j"]: r["M"]
            for r in hll_registers(df, ["grp"], "v", p=p).collect()
        }
        want_reg: dict[int, int] = {}
        for v in vals:
            hx = __import__("hashlib").md5(v.encode("utf-8")).hexdigest()
            j, w = int(hx[:1], 16), int(hx[1:14], 16)
            rho = 53 if w == 0 else 53 - w.bit_length()
            want_reg[j] = max(want_reg.get(j, 0), rho)
        assert got_reg == want_reg

    prop()


def test_degenerate_and_overflow_parameters_are_refused(spark):
    """Review-found guards: k below the estimator's sane floor, k past
    the WindowGroupLimit pushdown in the MERGE path too, the p values
    whose integer harmonic sum would overflow a long, out-of-range
    quantiles, and a vacuous heavy-hitter sample threshold."""
    from ds_caselaw_ingester_spark.operators.sketches import (
        heavy_hitters,
        hll_estimate,
        sampled_quantiles,
    )

    df = _planted(spark, 4)
    with pytest.raises(ValueError):
        kmv_sketch(df, ["grp"], "val", k=4)  # k=1 would estimate 0; <8 refused
    sk = kmv_sketch(df, ["grp"], "val", k=8)
    with pytest.raises(ValueError):
        kmv_union(sk, ["grp"], k=1500)  # same silent-shuffle hazard as sketch
    with pytest.raises(ValueError, match="overflow"):
        hll_registers(df, ["grp"], "val", p=12)  # (m-1)*2^53 > 2^63-1
    with pytest.raises(ValueError, match="overflow"):
        hll_estimate(hll_registers(df, ["grp"], "val", p=8), ["grp"], p=12)
    with pytest.raises(ValueError, match="quantiles"):
        sampled_quantiles(df, ["grp"], "val", "val", [0.5, 1.01], 0.5)
    with pytest.raises(ValueError, match="prune nothing"):
        heavy_hitters(df, "val", "val", min_count=10, rate=0.05, safety=0.5)


def test_kmv_intersection_matches_duckdb_and_truth(spark):
    """Planted overlap: A = v0..v4999, B = v2500..v7499 (true
    intersection 2500, union 7500). The estimate must match the
    DuckDB replay of the merged-sketch rule bit-for-bit and land
    within a loose 3-sigma-ish band of the truth."""
    from ds_caselaw_ingester_spark.operators.sketches import (
        kmv_intersection_estimate,
    )

    k = 512
    a_raw, b_raw = _planted(spark, 5000), _planted(spark, 5000, offset=2500)
    got = kmv_intersection_estimate(
        kmv_sketch(a_raw, ["grp"], "val", k=k),
        kmv_sketch(b_raw, ["grp"], "val", k=k),
        ["grp"],
        k=k,
    ).collect()
    assert len(got) == 1
    r = r0 = got[0]

    con = duckdb.connect()
    numer = float((k - 1) * TWO_52)
    (want_union, want_inter) = con.sql(f"""
WITH ha AS (SELECT DISTINCT CAST(('0x' || substr(md5('v' || CAST(i AS VARCHAR)),1,13)) AS BIGINT) AS h
            FROM range(0, 5000) t(i)),
     hb AS (SELECT DISTINCT CAST(('0x' || substr(md5('v' || CAST(i AS VARCHAR)),1,13)) AS BIGINT) AS h
            FROM range(2500, 7500) t(i)),
     u AS (SELECT h FROM ha UNION SELECT h FROM hb),
     r AS (SELECT h, (h IN (SELECT h FROM ha) AND h IN (SELECT h FROM hb)) AS inboth,
                  row_number() OVER (ORDER BY h) AS rn
           FROM u),
     topk AS (SELECT * FROM r WHERE rn <= {k}),
     agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS msize,
                    CAST(SUM(CASE WHEN inboth THEN 1 ELSE 0 END) AS BIGINT) AS matches,
                    MAX(CASE WHEN rn = {k} THEN h END) AS hk
             FROM topk)
SELECT CASE WHEN msize < {k} OR hk <= 0 THEN msize
       ELSE CAST(FLOOR({numer!r} / CAST(hk AS DOUBLE)) AS BIGINT) END AS est_union,
       CAST(FLOOR(CAST(matches AS DOUBLE) / CAST(msize AS DOUBLE)
                  * CAST(CASE WHEN msize < {k} OR hk <= 0 THEN msize
                         ELSE CAST(FLOOR({numer!r} / CAST(hk AS DOUBLE)) AS BIGINT) END AS DOUBLE))
            AS BIGINT) AS est_intersection
FROM agg
""").fetchone()
    assert (r0["est_union"], r0["est_intersection"]) == (want_union, want_inter)
    assert abs(r["est_union"] - 7500) / 7500 < 0.2
    assert abs(r["est_intersection"] - 2500) / 2500 < 0.3, r
