"""Mergeable cardinality sketches: KMV (k-minimum-values) and
HyperLogLog distinct-count estimation.

Why these exist (100 TB rationale): exact distinct counting shuffles
every distinct (group, value) pair — `events_distinct_users_salted`
(plans/queries_etl.py) is that exact path with skew defense, and it is
the right tool when the answer must be exact. At 100 TB the right tool
for "distinct users per X" dashboards is a bounded-size, MERGEABLE
sketch: constant bytes per group per partition regardless of corpus
size, folded map-side (the KMV top-k is pruned before the exchange by
WindowGroupLimit; the HLL register fold is an ordinary partial max), and
unions of sketches ARE sketches of the union — daily sketches roll up
to monthly without re-reading a byte of data.

The reference has no aggregation operators at all beyond row counts
(SURVEY.md §2.4, §2.8 "absent operator categories"); this module is
part of the §2.9 extension family mandated by BASELINE.json.

Determinism doctrine (same as dedup.py): every hash bottoms out in md5
— bit-identical in any engine, no xxhash/murmur dependency. Both
sketches read the digest as hex text:

- KMV keeps the k smallest DISTINCT 52-bit hash prefixes. 52 bits (13
  hex chars), not 64, so every hash value is exactly representable in
  an IEEE double and the estimator `(k-1) * 2^52 / h_k` is a single
  correctly-rounded division of two exact doubles — the floor()ed
  result is bit-identical across Spark, DuckDB, and Python, which is
  what lets the estimate itself (not just the sketch) carry a DuckDB
  oracle (tests/test_sketches.py).
- HLL buckets on the first p bits and takes the leading-zero rank of
  the NEXT 52 bits via minimal-width bin(): rho = 53 - bitlen(w),
  with rho = 53 when w = 0. bin() is minimal-width in both Spark and
  DuckDB, so every register value is integer-exact cross-engine. The
  harmonic sum is kept in INTEGER form S = sum(2^(53 - M_j)) (max
  2^61 for m = 256 — fits a long), so the only floating step is one
  constant multiply and one divide of exact inputs; the raw estimate's
  floor is cross-engine exact. The small-range linear-counting branch
  needs ln(), whose last ulp is NOT guaranteed identical between
  libm implementations, so `est_distinct` is gated with a 1e-9
  relative tolerance in pytest while every integer column is exact.

Shuffle budget:
- kmv_sketch: ONE exchange on the group keys. The dense_rank <= k
  filter is pushed below the exchange as a partial WindowGroupLimit
  (plan-pinned in tests), so each map task ships at most k distinct
  hash values per group it has seen, not its full value stream.
- hll_registers: ONE exchange of at most m register rows per group
  (partial max runs map-side like any agg).
- Merges (kmv_union / hll_union) operate on sketch-sized frames only.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

TWO_52 = 1 << 52  # hash domain size; exact in a double
_BIG = 1 << 53  # 2^53: empty-bucket term in the integer harmonic sum


def hash52(value: Column) -> Column:
    """First 52 bits of md5(value) as a non-negative long — the shared
    repo-wide primitive (operators/sampling.py hash52_long; one
    definition so replay formulas cannot fork).

    The value is cast to string first; integer and string columns
    format identically in Spark and DuckDB ('123'). Callers hashing
    float columns should pre-format them explicitly — float-to-string
    rendering is NOT engine-portable.
    """
    from ds_caselaw_ingester_spark.operators.sampling import hash52_long

    return hash52_long(value.cast("string"))


def _check_k(k: int) -> None:
    """Shared KMV bound: 8 <= k <= 1000. The upper bound is
    spark.sql.optimizer.windowGroupLimitThreshold's default — beyond it
    the partial top-k pushdown silently stops firing and the "sketch"
    ships every hash through the shuffle. The lower bound keeps the
    (k-1)/h_k estimator out of its degenerate zone (k=1 estimates 0
    for every saturated group; the 1/sqrt(k-2) standard error is
    undefined below k=3 and useless below ~8)."""
    if not 8 <= k <= 1000:
        raise ValueError(f"k must be in [8, 1000], got {k}")


def _alpha(m: int) -> float:
    """Standard HLL bias-correction constant (Flajolet et al. 2007)."""
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


# ---------------------------------------------------------------------------
# KMV
# ---------------------------------------------------------------------------


def kmv_sketch(
    df: DataFrame, group_cols: Sequence[str], value_col: str, k: int = 256
) -> DataFrame:
    """Per-group KMV sketch: sorted array of the k smallest distinct
    52-bit hash values of `value_col` (nulls excluded — null ordering
    differs between engines, so nulls never reach the rank).

    dense_rank (not row_number) so duplicate values share a rank and
    the k survivors are k DISTINCT hashes; Spark pushes the rank<=k
    filter below the exchange as a partial WindowGroupLimit (pinned
    Partial-below-Exchange in tests), which is the map-side combine
    that makes this a sketch rather than a distinct: each task emits
    the rows of at most its k smallest distinct hashes per group.

    Honest boundary — the partial limit bounds RANKS, not rows:
    duplicates of a surviving hash all pass it. With cardinality >> k
    (the sketch's use case) a hot value's hash lands among a task's k
    smallest only with probability ~k/task_cardinality, so leakage is
    negligible; but for a group whose TRUE cardinality is at or below
    k, every row passes and the "sketch" shuffles the whole group.
    Low-cardinality + heavily-duplicated columns (flags, enums) should
    use exact countDistinct, whose partial agg dedups map-side — the
    sketch buys nothing below k by definition.

    Output: group_cols + `kmv` array<long> ascending, size <= k.
    """
    _check_k(k)
    w = Window.partitionBy(*group_cols).orderBy("h52")
    ranked = (
        df.filter(F.col(value_col).isNotNull())
        .select(*group_cols, hash52(F.col(value_col)).alias("h52"))
        .withColumn("dr", F.dense_rank().over(w))
        .filter(F.col("dr") <= k)
    )
    return ranked.groupBy(*group_cols).agg(
        F.sort_array(F.collect_set("h52")).alias("kmv")
    )


def kmv_estimate(sketch_df: DataFrame, k: int) -> DataFrame:
    """Attach `n_hashes` and `est_distinct` to a kmv_sketch frame.

    Saturated sketch: est = floor((k-1) * 2^52 / h_k) — one division of
    two exactly-representable doubles ((k-1)*2^52 has <= 10 significant
    bits; h_k < 2^52), so the floor is cross-engine bit-exact.
    Unsaturated (fewer than k distinct hashes seen): the sketch IS the
    distinct set (modulo 52-bit collisions) — est = n_hashes.
    h_k = 0 (probability 2^-52 per group) falls back to n_hashes.
    """
    numer = float((k - 1) * TWO_52)  # exact: small-int * power of two
    n = F.size("kmv")
    # try_element_at: NULL (not an ANSI error) when the sketch holds
    # fewer than k hashes — the when() below never reads it then.
    hk = F.try_element_at("kmv", F.lit(k))
    est = F.floor(F.lit(numer) / hk.cast("double")).cast("long")
    return sketch_df.select(
        "*",
        n.alias("n_hashes"),
        F.when((n < k) | (hk <= 0), n.cast("long")).otherwise(est).alias("est_distinct"),
    )


def kmv_distinct(
    df: DataFrame, group_cols: Sequence[str], value_col: str, k: int = 256
) -> DataFrame:
    """Per-group approximate distinct count via KMV. Standard error is
    ~1/sqrt(k-2) relative (k=256 → ~6%). Returns group_cols +
    n_hashes + est_distinct (the `kmv` array is dropped — this is the
    dashboard-shaped result)."""
    return kmv_estimate(kmv_sketch(df, group_cols, value_col, k), k).drop("kmv")


def kmv_union(
    sketch_df: DataFrame, group_cols: Sequence[str], k: int
) -> DataFrame:
    """Fold many KMV sketches per group into one: union the hash sets,
    keep the k smallest. Input rows are sketches (e.g. one per day);
    output is one sketch per group, identical to sketching the unioned
    raw data (pinned in tests). Explode + re-rank keeps the plan the
    same WindowGroupLimit shape as kmv_sketch — bounded at k rows per
    input sketch either side of the exchange (same k guard too: past
    the pushdown threshold the merge would silently ship every hash)."""
    _check_k(k)
    w = Window.partitionBy(*group_cols).orderBy("h52")
    ranked = (
        sketch_df.select(*group_cols, F.explode("kmv").alias("h52"))
        .withColumn("dr", F.dense_rank().over(w))
        .filter(F.col("dr") <= k)
    )
    return ranked.groupBy(*group_cols).agg(
        F.sort_array(F.collect_set("h52")).alias("kmv")
    )


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------


def hll_registers(
    df: DataFrame, group_cols: Sequence[str], value_col: str, p: int = 8
) -> DataFrame:
    """Per-(group, bucket) HLL register: M = max over values of the
    leading-zero rank of the 52 bits following the bucket bits.

    p must be 4 or 8: hex-digit aligned so the bucket is a plain
    substring of the digest in both engines, AND small enough that
    hll_estimate's integer harmonic sum stays in a long — the empty-
    bucket total (m - n)·2^53 reaches 2^(p+53), which overflows int64
    from p=11 up (p=12's 4095·2^53 ≈ 3.7e19 > 2^63−1; under ANSI that
    is a loud ARITHMETIC_OVERFLOW, without it silent garbage). Callers
    needing better than p=8's ~6.5% sigma should use kmv_distinct
    (k=1000 → ~3.2%) rather than a wider HLL. Registers for buckets no
    value hashed into are absent (not zero) — hll_estimate accounts for
    them arithmetically, keeping this frame at most m rows per group.

    Output: group_cols + `j` (bucket, [0, 2^p)) + `M` (rank, [1, 53]).
    """
    if p not in (4, 8):
        raise ValueError(
            f"p must be 4 or 8 (hex-digit aligned; integer-sum overflow past 10), got {p}"
        )
    nhex = p // 4
    digest = F.md5(F.col(value_col).cast("string"))
    j = F.conv(F.substring(digest, 1, nhex), 16, 10).cast("int")
    w = F.conv(F.substring(digest, nhex + 1, 13), 16, 10).cast("long")
    # rho = 1 + (number of leading zeros in the 52-bit window)
    #     = 53 - bitlen(w); bin() is minimal-width in Spark AND DuckDB,
    #     and bin(0) is '0' (length 1, NOT bitlen 0) so w=0 is special-
    #     cased to the max rank rather than trusting length(bin()).
    rho = F.when(w == 0, F.lit(53)).otherwise(53 - F.length(F.bin(w)))
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(*group_cols, j.alias("j"), rho.alias("rho"))
        .groupBy(*group_cols, "j")
        .agg(F.max("rho").alias("M"))
    )


def hll_estimate(
    reg_df: DataFrame, group_cols: Sequence[str], p: int = 8
) -> DataFrame:
    """Fold registers to one row per group with the HLL estimate.

    The harmonic sum is computed in INTEGER form:
        S = sum_present(2^(53 - M_j)) + (m - n_present) * 2^53
    (every term and the total fit a long for the allowed p <= 8;
    wider HLLs would overflow — see hll_registers), so
        raw = alpha_m * m^2 * 2^53 / S
    has exactly one rounding-sensitive step — the final double multiply/
    divide of values both engines derive identically. `est_raw_floor`
    is therefore cross-engine exact. `est_distinct` applies the
    standard small-range correction (linear counting m*ln(m/V) when
    raw <= 2.5m and V empty buckets exist), which involves ln() — exact
    integer inputs, but the last ulp of ln differs between libm
    implementations, hence the tolerance gate on this one column.
    """
    if p not in (4, 8):
        raise ValueError(
            f"p must be 4 or 8 (integer-sum overflow past 10), got {p}"
        )
    m = 1 << p
    const = _alpha(m) * float(m) * float(m) * float(_BIG)
    folded = reg_df.groupBy(*group_cols).agg(
        (
            F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 53 - M)"))
            + (m - F.count("*")) * F.lit(_BIG)
        ).alias("S"),
        (m - F.count("*")).cast("long").alias("zero_buckets"),
    )
    raw = F.lit(const) / F.col("S").cast("double")
    linear = F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("zero_buckets").cast("double"))
    return folded.select(
        *group_cols,
        "S",
        "zero_buckets",
        F.floor(raw).cast("long").alias("est_raw_floor"),
        F.floor(
            F.when((raw <= 2.5 * m) & (F.col("zero_buckets") > 0), linear).otherwise(raw)
        )
        .cast("long")
        .alias("est_distinct"),
    )


def hll_distinct(
    df: DataFrame, group_cols: Sequence[str], value_col: str, p: int = 8
) -> DataFrame:
    """Per-group approximate distinct count via HLL. Standard error is
    ~1.04/sqrt(m) relative (p=8 → ~6.5%) at 2^p longs of state per
    group — the fixed-size counterpart to kmv_distinct's fixed-k."""
    return hll_estimate(hll_registers(df, group_cols, value_col, p), group_cols, p)


def hll_union(reg_df: DataFrame, group_cols: Sequence[str]) -> DataFrame:
    """Fold many groups' register sets into one register set per
    (re-grouped) key: register-wise max. Sketch-of-union == union-of-
    sketches (pinned in tests); this is the rollup path — month =
    max-merge of days, cluster = max-merge of executors."""
    return reg_df.groupBy(*group_cols, "j").agg(F.max("M").alias("M"))


def kmv_intersection_estimate(
    a_df: DataFrame,
    b_df: DataFrame,
    group_cols: Sequence[str],
    k: int,
) -> DataFrame:
    """Per-group set-overlap estimate from two KMV sketches (Beyer et
    al. 2007 / KMV θ-sketch rule): join the two sketch frames on the
    group keys, take the k smallest hashes of the UNION, count how many
    of those are present in BOTH sketches (array ops — this frame is
    sketch-sized, the originals are never touched), then

        est_intersection = (matches / |union-topk|) * est(union-topk)

    The Jaccard-style ratio and the union estimate come from the same
    merged sketch, so the arithmetic is counts + one double multiply/
    divide chain of exactly-representable inputs — cross-engine
    deterministic like kmv_estimate (floor()ed; DuckDB replay in
    tests). "How many users did corpus A and corpus B share" at 100 TB
    becomes a join of two kilobyte-sized frames.

    Output: group_cols + est_a + est_b + est_union + est_intersection.
    """
    _check_k(k)
    a = kmv_estimate(a_df, k).select(
        *group_cols,
        F.col("kmv").alias("kmv_a"),
        F.col("est_distinct").alias("est_a"),
    )
    b = kmv_estimate(b_df, k).select(
        *group_cols,
        F.col("kmv").alias("kmv_b"),
        F.col("est_distinct").alias("est_b"),
    )
    joined = a.join(b, list(group_cols), "inner")
    merged = F.slice(
        F.array_sort(F.array_union("kmv_a", "kmv_b")), 1, k
    )
    both = F.size(F.array_intersect(merged, F.array_intersect("kmv_a", "kmv_b")))
    msize = F.size(merged)
    hk = F.try_element_at(merged, F.lit(k))
    numer = float((k - 1) * TWO_52)
    est_union = F.when(
        (msize < k) | (hk <= 0), msize.cast("long")
    ).otherwise(F.floor(F.lit(numer) / hk.cast("double")).cast("long"))
    return joined.select(
        *group_cols,
        "est_a",
        "est_b",
        est_union.alias("est_union"),
        F.floor(
            both.cast("double") / msize.cast("double") * est_union.cast("double")
        )
        .cast("long")
        .alias("est_intersection"),
    )


# ---------------------------------------------------------------------------
# Sampled quantiles and two-pass heavy hitters
# ---------------------------------------------------------------------------


def sampled_quantiles(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    key_col: str,
    quantiles: Sequence[float],
    rate: float = 0.01,
) -> DataFrame:
    """Per-group approximate quantiles: EXACT type-1 quantiles (order
    statistic at ceil(q*n), ties broken by key) of a deterministic
    md5-gated row sample (operators/sampling.py hash_sample).

    Why not approx_percentile: Spark's sketch is seed/partitioning-
    sensitive and not engine-replayable; this operator is a pure
    function of the data — reruns, repartitionings, and a DuckDB
    replay of the same two steps all produce identical rows (pinned in
    tests). Error comes only from sampling (~1/sqrt(rate*n) quantile
    noise), which the caller prices via `rate`.

    Scale shape: the gate is a map-side scan filter (rows cut to ~rate
    BEFORE the one exchange on the group key), so the sort that ranks
    the sample is sample-sized, not data-sized. Merge story: the gate
    is a pure row predicate, so the union of two partitions' samples
    IS the sample of the union — recomputing quantiles after a corpus
    append only re-sorts the (still sample-sized) gated rows.

    Output: group_cols + q + value (the sampled quantile) + sample_n.
    """
    from ds_caselaw_ingester_spark.operators.sampling import hash_sample

    if not 0.0 < rate <= 1.0:
        raise ValueError(f"rate must be in (0, 1], got {rate}")
    bad_q = [q for q in quantiles if not 0.0 <= float(q) <= 1.0]
    if bad_q:
        # out-of-range q would silently return the group minimum
        # (q < 0: target clamps to 1) or silently drop the row
        # (q > 1: target exceeds sample_n, nothing matches)
        raise ValueError(f"quantiles must be in [0, 1], got {bad_q}")
    sample = hash_sample(
        df.filter(F.col(value_col).isNotNull()).select(
            *group_cols, value_col, key_col
        ),
        key_col,
        rate,
    )
    w = Window.partitionBy(*group_cols).orderBy(value_col, key_col)
    wn = Window.partitionBy(*group_cols)
    ranked = sample.select(
        *group_cols,
        F.col(value_col).alias("value"),
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wn).alias("sample_n"),
    )
    qlits = F.array(*[F.lit(float(q)) for q in quantiles])
    exploded = ranked.select(
        "*", F.explode(qlits).alias("q")
    )
    target = F.greatest(F.lit(1), F.ceil(F.col("q") * F.col("sample_n")))
    return exploded.filter(F.col("rn") == target).select(
        *group_cols, "q", "value", "sample_n"
    )


def heavy_hitters(
    df: DataFrame,
    value_col: str,
    key_col: str,
    min_count: int,
    rate: float = 0.05,
    safety: float = 0.5,
) -> DataFrame:
    """Values with EXACT frequency >= min_count, found without a
    full-cardinality groupBy: sample-pass candidates, exact-pass verify.

    Pass 1 counts the md5-gated row sample (sample-sized shuffle) and
    keeps values whose sampled count >= safety * rate * min_count.
    Pass 2 semi-joins the full data against the (broadcast) candidate
    set and counts EXACTLY, filtering >= min_count — so there are NO
    false positives, and the reported counts are exact. A value at or
    above min_count is missed only if its Binomial(count, rate) sample
    dips below the safety margin (Chernoff-small; lower `safety` or
    raise `rate` to price it). Deterministic end to end — the DuckDB
    replay of both passes matches bit-for-bit (tests).

    This is the hot-key census that feeds skew defense: run it on a
    join/agg key, hand the result to operators/skew.py-style salting
    (only the reported keys need salts). At 100 TB the full-cardinality
    exact groupBy this replaces is the single most expensive shuffle a
    key census could take; both passes here shuffle only sample-sized
    or candidate-matched rows.

    Output: value (original column name) + count (exact), descending.
    """
    from ds_caselaw_ingester_spark.operators.sampling import hash_sample

    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    if not 0.0 < rate <= 1.0:
        raise ValueError(f"rate must be in (0, 1], got {rate}")
    bar = safety * rate * min_count
    if bar < 1.0:
        # bar < 1 keeps every value that appears even ONCE in the
        # sample: the candidate set approaches the full cardinality
        # and gets force-broadcast — driver OOM at exactly the scale
        # this operator exists for. Refuse rather than degrade.
        raise ValueError(
            f"safety*rate*min_count = {bar:.3g} < 1: the sample pass "
            "would prune nothing (candidate set ~ full cardinality, "
            "force-broadcast). Raise rate, min_count, or safety."
        )
    base = df.filter(F.col(value_col).isNotNull()).select(value_col, key_col)
    candidates = (
        hash_sample(base, key_col, rate)
        .groupBy(value_col)
        .count()
        .filter(F.col("count") >= bar)
        .select(value_col)
    )
    return (
        base.join(F.broadcast(candidates), value_col, "left_semi")
        .groupBy(value_col)
        .count()
        .filter(F.col("count") >= min_count)
        .orderBy(F.desc("count"), value_col)
    )
