"""PCA for embedding columns — the standard pre-quantization transform
of a production ANN/dedup stack (OPQ-style rotation, dimensionality
reduction before PQ/IVF, whitening for cosine search).

Why this belongs in a 100 TB engine: every embedding operator here
(similarity.py, pq.py, semdedup.py, decontam.py) pays per-dimension
cost in its hot joins; trimming 64 dims to 16 with ~all the variance
cuts the dot-product flops, the shuffled bytes, and the PQ codebook
size by 4× with a measured, testable recall trade (see
tests/test_pca.py's recall measurement — the repo's rule that only a
recall number proves a lossy transform retrieves).

Scale + determinism design (the part worth reading):

- **Fit is ONE corpus pass with order-independent state.** The d×d
  scatter matrix and the d-vector sum are accumulated as INTEGER
  partial sums of micro-rounded products (each x_i·x_j is rounded to
  `_SCALE` fixed-point and cast to int64 before summing). Integer
  addition commutes exactly, so the result is bit-identical for ANY
  partition count, row order, or executor scheduling — the same
  convention the BM25/RRF/DSIR sums use, lifted to matrix form. A
  float sum here would make the fitted components (and every
  downstream code/cell assignment) partitioning-dependent.
- **Accumulation is Arrow-batched numpy** (mapInPandas): per batch one
  X^T·X GEMM on the rounded int64 matrix — d²/2 work per row done at
  BLAS speed, never a per-(i,j) explode (d=64 would mean 4096 shuffled
  rows per vector relationally). Each partition emits ONE row of
  partial sums — plus extra flush rows whenever the tracked exact
  overflow bound (rows × max-product) approaches int64, so the
  accumulator can never silently wrap; the driver combines the rows
  with Python ints. Driver state is O(d²) (64×64 = 32 KB),
  independent of corpus size.
- **Eigendecomposition runs on the driver** over the tiny d×d
  covariance (numpy.linalg.eigh — deterministic for a fixed input
  matrix; the input is exact integers scaled back, so it IS fixed).
  Components are rounded to `round_components` decimals and sign-fixed
  (largest-|loading| entry made positive) so the replay oracle and the
  engine agree bit-for-bit.
- **Projection is map-side** (one select over F.aggregate dot
  products with the components as plan literals — no UDF, no shuffle,
  whole-stage codegen). `center=False` (default) skips the mean
  subtraction so projection stays a pure linear map — the right
  setting before cosine scoring, where re-centering changes the
  metric; PQ/IVF pipelines that want max variance capture pass
  center=True and accept the affine map.

Reference scope note: the reference has no vector operations at all
(SURVEY.md §2.8); this extends the §2.9 embedding family
(BASELINE.json mandate) like pq.py/semdedup.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SCALE = 1_000_000.0  # fixed-point micro-rounding, the repo-wide constant

# int64 overflow headroom for the scatter accumulator: no accumulated
# entry is ever allowed to reach this (see pca_fit's flush logic).
# Module-level so tests can shrink it to force the flush path.
_INT64_SAFE = 2**62


def pca_fit(
    vectors: DataFrame,
    vec_col: str,
    dim: int,
    k: int,
    center: bool = False,
    round_components: int = 6,
) -> dict:
    """Fit the top-k principal components of `vec_col` (array<double>,
    length `dim`) in one corpus pass. Returns
    {"components": [[...k rows of dim floats...]], "mean": [...],
    "explained": [k variance ratios], "center": bool} — plain JSON-able
    state, small enough to broadcast as plan literals.

    Engine-exact determinism: the scatter/sum accumulators are integer
    fixed-point (see module docstring), so the same corpus yields the
    same components under any partitioning — pinned by the numpy
    replay in tests/test_pca.py."""
    import numpy as np

    if not 1 <= k <= dim:
        raise ValueError(f"k must be in [1, {dim}], got {k}")

    n_out = dim * dim + dim + 1  # scatter + sum + count

    # Overflow safety: an exact Python-int bound (rows_added ×
    # max_per_row_product) is tracked and the partials are FLUSHED to an
    # output row before any accumulated entry could cross _INT64_SAFE.
    # The driver combine uses Python ints, so any number of flush rows
    # sum exactly — flushing preserves bit-identical order-independence.
    # Captured at call time so tests can monkeypatch the module constant.
    safe = _INT64_SAFE

    def _partials(batches):
        import numpy as _np
        import pandas as _pd

        acc = _np.zeros(n_out, dtype=_np.int64)
        count = 0
        bound = 0  # Python int: exact upper bound on any scatter entry
        for pdf in batches:
            if not len(pdf):
                continue
            col = pdf.iloc[:, 0]
            if col.isna().any():
                raise ValueError(
                    f"pca_fit: column {vec_col!r} contains NULL vectors; "
                    "filter them out before fitting"
                )
            lens = {len(v) for v in col}
            if lens != {dim}:
                raise ValueError(
                    f"pca_fit: expected vectors of length {dim} in "
                    f"{vec_col!r}, got lengths {sorted(lens)[:5]}"
                )
            x = _np.stack(col.to_numpy())
            # micro-round the INPUTS once; integer products of rounded
            # inputs are exact, and their int64 sums commute — the
            # whole accumulator is order-independent.
            xi = _np.rint(x * _SCALE).astype(_np.int64)
            # Per-row product bound: one x_i·x_j entry is at most
            # (max|xi|)². If a SINGLE row's product would wrap int64, no
            # amount of flushing helps — the fixed-point scale is wrong
            # for this data; fail loudly instead of corrupting components.
            m = int(_np.abs(xi).max())
            per_row = m * m
            if per_row >= safe:
                raise ValueError(
                    f"pca_fit: input magnitude too large for fixed-point "
                    f"accumulation (max|x| ≈ {m / _SCALE:.3g}); rescale "
                    f"the vectors (e.g. L2-normalize) before fitting"
                )
            start = 0
            while start < len(xi):
                room = (
                    (safe - 1 - bound) // per_row if per_row else len(xi)
                )
                if room < 1:
                    # accumulator is at its exactness bound — emit a
                    # partial row and reset; the driver sums rows exactly
                    acc[-1] = count
                    yield _pd.DataFrame({"acc": [acc.tolist()]})
                    acc = _np.zeros(n_out, dtype=_np.int64)
                    count = 0
                    bound = 0
                    continue
                sub = xi[start : start + room]
                acc[: dim * dim] += (sub.T @ sub).reshape(-1)
                acc[dim * dim : dim * dim + dim] += sub.sum(axis=0)
                count += len(sub)
                bound += per_row * len(sub)
                start += len(sub)
        acc[-1] = count
        yield _pd.DataFrame({"acc": [acc.tolist()]})

    rows = (
        vectors.select(F.col(vec_col).cast("array<double>"))
        .mapInPandas(_partials, "acc array<long>")
        .collect()
    )
    total = [0] * n_out  # Python ints: exact at any corpus size
    for r in rows:
        for i, v in enumerate(r["acc"]):
            total[i] += v
    n = int(total[-1])
    if n < 2:
        raise ValueError(f"pca_fit needs >= 2 vectors, got {n}")
    # scatter of the ROUNDED inputs, scaled back: products carry
    # _SCALE², sums carry _SCALE
    scatter = np.array(total[: dim * dim], dtype=np.float64).reshape(
        dim, dim
    ) / (_SCALE * _SCALE)
    s1 = np.array(total[dim * dim : dim * dim + dim], dtype=np.float64) / _SCALE
    mean = s1 / n
    if center:
        cov = (scatter - np.outer(mean, s1)) / (n - 1)
    else:
        cov = scatter / (n - 1)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T  # k × dim
    # deterministic sign: make each component's largest-|loading|
    # coordinate positive (eigh's sign is arbitrary)
    for i in range(k):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i][j] < 0:
            comps[i] = -comps[i]
    comps = np.round(comps, round_components)
    ev = vals[order]
    denom = float(vals.sum()) or 1.0
    return {
        "components": [[float(x) for x in row] for row in comps],
        "mean": [float(round(m, round_components)) for m in mean],
        "explained": [float(round(v / denom, 6)) for v in ev],
        "center": bool(center),
    }


def _dot_literal(vec: Column, weights: "list[float]") -> Column:
    """Σ vec[i]·w_i as a zip_with/aggregate fold with the weights as a
    plan-literal array — JVM-side, codegen'd, no UDF."""
    warr = F.array(*[F.lit(float(w)) for w in weights])
    return F.aggregate(
        F.zip_with(vec, warr, lambda a, b: a * b),
        F.lit(0.0),
        lambda s, x: s + x,
    )


def pca_project(
    df: DataFrame,
    vec_col: str,
    model: dict,
    out_col: str = "pca_vec",
    round_digits: int = 6,
) -> DataFrame:
    """Map-side projection onto the fitted components: adds `out_col`
    (array<double>, length k). Pure projection — no shuffle, no UDF;
    the k×dim component matrix rides the plan as literals (k·dim
    doubles — trivially broadcastable far beyond d=64). Rounded so
    downstream engines replay identical codes."""
    comps = model["components"]
    v = F.col(vec_col).cast("array<double>")
    if model.get("center"):
        mean = model["mean"]
        v = F.zip_with(
            v,
            F.array(*[F.lit(float(m)) for m in mean]),
            lambda a, b: a - b,
        )
    return df.withColumn(
        out_col,
        F.array(*[F.round(_dot_literal(v, c), round_digits) for c in comps]),
    )
