"""Property tests for the round-8 machinery: the Bloom filter never
false-negatives any member under ANY (benchmark, probe) pair and stays
consistent between its numpy build and probe bit-paths — exercised via
the PRODUCTION bloom_bits_build/bloom_bits_probe pair (the per-query
RRF composition law is pinned deterministically in test_search.py); the
touched-partition swap state machine preserves exactly the intended
post-state from any crash point recover_buckets can see; the occupancy
guard's healthy bound is tight at the boundary."""

from __future__ import annotations

import math
import os

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

# ---------------------------------------------------------------------------
# Bloom bit-path consistency (pure numpy — no Spark in the loop)
# ---------------------------------------------------------------------------


from ds_caselaw_ingester_spark.operators.decontam import (  # noqa: E402
    bloom_bits_build,
    bloom_bits_probe,
)


def _build(h1s, h2s, m, j):
    # the PRODUCTION bit-path (bloom_build and the probe UDF call the
    # same two functions) — a regression there fails here
    return bloom_bits_build(np.array(h1s, dtype=np.int64),
                            np.array(h2s, dtype=np.int64), m, j)


def _probe(bitmap, h1s, h2s, m, j):
    return bloom_bits_probe(bitmap, np.array(h1s, dtype=np.int64),
                            np.array(h2s, dtype=np.int64), m, j)


i64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)


@given(
    st.lists(st.tuples(i64, i64), min_size=1, max_size=64),
    st.integers(min_value=64, max_value=4096),
    st.integers(min_value=1, max_value=9),
)
@settings(max_examples=200, deadline=None)
def test_bloom_members_always_hit(members, m, j):
    """No false negatives, for ANY signed-64 hash pairs (including the
    negative half that crashed the pre-fix build under NumPy 2) and any
    (m, j) sizing: every inserted member's probe must return True."""
    bm = _build([a for a, _ in members], [b for _, b in members], m, j)
    assert _probe(bm, [a for a, _ in members], [b for _, b in members], m, j).all()


@given(
    st.lists(st.tuples(i64, i64), min_size=1, max_size=32, unique=True),
    st.tuples(i64, i64),
)
@settings(max_examples=200, deadline=None)
def test_bloom_nonmember_rate_is_sane(members, probe):
    """A non-member CAN collide, but with the design sizing (10
    bits/element, k=7) a single fixed probe against <=32 members in a
    >=320-bit filter must not be a guaranteed hit: the bitmap is not
    saturated (some bit stays clear)."""
    if probe in members:
        return
    m = max(64, len(members) * 10)
    bm = _build([a for a, _ in members], [b for _, b in members], m, 7)
    # structural sanity: at 10 bits/element some bits remain clear
    total_set = int(np.unpackbits(bm).sum())
    assert total_set < m


# ---------------------------------------------------------------------------
# occupancy guard boundary
# ---------------------------------------------------------------------------


@given(
    st.integers(min_value=1, max_value=10**7),
    st.integers(min_value=1, max_value=512),
)
@settings(max_examples=200, deadline=None)
def test_occupancy_guard_boundary(n_rows, occ):
    """Uniform buckets at exactly the target occupancy always pass; one
    bucket holding everything fails once the corpus is large enough
    that its quadratic bound exceeds warn_factor x the healthy bound."""
    from ds_caselaw_ingester_spark.operators.sizing import occupancy_guard

    # perfectly uniform layout at occupancy `occ`
    n_buckets = max(1, n_rows // max(1, occ))
    rows = n_buckets * occ
    uniform = {
        "n_buckets": n_buckets,
        "n_rows": rows,
        "max_occupancy": occ,
        "mean_occupancy": float(occ),
        "candidate_bound": n_buckets * occ * (occ - 1) // 2,
    }
    if occ <= 64:  # at/below target: candidate bound <= healthy bound
        assert occupancy_guard(uniform)
    hot = {
        "n_buckets": 1,
        "n_rows": n_rows,
        "max_occupancy": n_rows,
        "mean_occupancy": float(n_rows),
        "candidate_bound": n_rows * (n_rows - 1) // 2,
    }
    healthy = max(1.0, n_rows * 64 / 2.0)
    expect_ok = hot["candidate_bound"] <= 4.0 * healthy
    assert occupancy_guard(hot) == expect_ok


# ---------------------------------------------------------------------------
# swap state machine: every crash point of swap_partition_dirs leaves a
# state recover_buckets restores to the intended post-state
# ---------------------------------------------------------------------------


@given(
    st.dictionaries(
        st.integers(min_value=0, max_value=5),
        st.booleans(),
        min_size=1, max_size=6,
    ),
    st.integers(min_value=0, max_value=20),
)
@settings(max_examples=120, deadline=None)
def test_swap_crash_points_recover(tmp_path_factory, touched_has_tmp, crash_step):
    """Simulate swap_partition_dirs over `touched` partitions where some
    have replacement data in tmp and some were emptied, crashing after
    `crash_step` rename/rmtree operations; recover_buckets must then
    yield, for every touched partition: the NEW data if its swap had
    fully installed the replacement, else either old or new complete
    data — NEVER a missing partition that had data on both sides, and
    never a lingering .old."""
    import shutil

    base = tmp_path_factory.mktemp("swap")
    local, tmp = str(base / "t"), str(base / "t.tmp")
    touched = sorted(touched_has_tmp)
    for b in touched:
        d = os.path.join(local, f"kb={b}")
        os.makedirs(d)
        open(os.path.join(d, "old.parquet"), "w").write("old")
        if touched_has_tmp[b]:
            td = os.path.join(tmp, f"kb={b}")
            os.makedirs(td)
            open(os.path.join(td, "new.parquet"), "w").write("new")

    # re-implement the swap loop with a crash counter (the real function
    # has no injection hook; the operation sequence is identical)
    ops = 0

    class Crash(Exception):
        pass

    def step():
        nonlocal ops
        ops += 1
        if ops > crash_step:
            raise Crash

    try:
        os.makedirs(local, exist_ok=True)
        for b in touched:
            src = os.path.join(tmp, f"kb={b}")
            dst = os.path.join(local, f"kb={b}")
            old = dst + ".old"
            step(); shutil.rmtree(old, ignore_errors=True)
            if os.path.exists(dst):
                step(); os.rename(dst, old)
            if os.path.exists(src):
                step(); os.rename(src, dst)
            step(); shutil.rmtree(old, ignore_errors=True)
        step(); shutil.rmtree(tmp, ignore_errors=True)
        crashed = False
    except Crash:
        crashed = True

    from ds_caselaw_ingester_spark.operators.compaction import recover_buckets

    recover_buckets(local)
    assert not any(e.endswith(".old") for e in os.listdir(local))
    for b in touched:
        d = os.path.join(local, f"kb={b}")
        if touched_has_tmp[b]:
            # data existed on both sides: partition must exist with a
            # complete copy (old before its swap, new after)
            assert os.path.isdir(d), f"kb={b} lost"
            files = set(os.listdir(d))
            assert files in ({"old.parquet"}, {"new.parquet"}), files
        else:
            # emptied partition: old copy until its rmtree, gone after;
            # both states are legitimate — what must NEVER happen is a
            # half state (.old leftovers are cleaned by recovery)
            if os.path.isdir(d):
                assert set(os.listdir(d)) == {"old.parquet"}
    if not crashed:
        # completed swap: exact intended post-state
        for b in touched:
            d = os.path.join(local, f"kb={b}")
            if touched_has_tmp[b]:
                assert set(os.listdir(d)) == {"new.parquet"}
            else:
                assert not os.path.exists(d)
