"""Benchmark decontamination: flag corpus documents that share any word
n-gram with an evaluation/benchmark set.

The standard pre-training hygiene pass (the GPT-3/PaLM-style n-gram
overlap check): a training corpus must not contain verbatim chunks of
the benchmarks it will be evaluated on. Spark-first shape:

- The benchmark side is small by construction (eval suites are KBs-MBs
  against a 100 TB corpus) -> its DISTINCT n-gram set is broadcast;
  the corpus side is a map-side explode + broadcast hash semi-probe.
  The corpus never shuffles: the only aggregation groups the MATCHING
  (doc, gram) rows — bounded by contamination volume, not corpus size.
- Gram width n=8 words is the usual published choice (wide enough that
  coincidental overlap is negligible, narrow enough to catch partial
  quotes); callers tune it per suite.
- Exactness: the flag is a set-membership test, no hashing involved —
  gram strings join directly, so there are no false positives to argue
  about. At extreme benchmark sizes, `decontaminate_bloom` swaps the
  broadcast for a Bloom pre-probe (+ confirming join by default, so the
  output stays exact); the corpus-side plan shape is unchanged.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ds_caselaw_ingester_spark.operators.textstats import tokens, word_ngrams


def benchmark_ngrams(
    benchmark: DataFrame, text_col: str, n: int = 8
) -> DataFrame:
    """DISTINCT word n-grams of the benchmark set: one small frame
    (column `gram`), intended for broadcast."""
    tok = tokens(F.col(text_col))
    grams = F.when(F.size(tok) >= n, word_ngrams(tok, n)).otherwise(
        F.array().cast("array<string>")
    )
    return (
        benchmark.select(F.explode(grams).alias("gram")).distinct()
    )


def _doc_grams(docs: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """One (id, gram) row per n-gram OCCURRENCE of each document —
    the corpus-side frame both decontamination variants probe. Shared
    so the exact and bloom paths can never drift apart on the
    short-document rule or the gram construction (their equivalence is
    a pinned contract, tests/test_decontam.py)."""
    tok = tokens(F.col(text_col))
    grams = F.when(F.size(tok) >= n, word_ngrams(tok, n)).otherwise(
        F.array().cast("array<string>")
    )
    return docs.select(F.col(id_col), F.explode(grams).alias("gram"))


def _verdict(docs: DataFrame, hits: DataFrame, id_col: str) -> DataFrame:
    """(id, n_contaminated_grams, is_contaminated) for EVERY document —
    the left-join + zero-fill tail shared by both variants."""
    return (
        docs.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce(
                F.col("n_contaminated_grams"), F.lit(0).cast("long")
            ).alias("n_contaminated_grams"),
            (F.coalesce(F.col("n_contaminated_grams"), F.lit(0)) > 0).alias(
                "is_contaminated"
            ),
        )
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    bench_text_col: str | None = None,
    n: int = 8,
) -> DataFrame:
    """Per-document contamination verdict: (id, n_contaminated_grams,
    is_contaminated) for EVERY input document. Documents shorter than n
    tokens have no n-grams and are clean by definition.

    n_contaminated_grams counts the document's n-gram OCCURRENCES that
    appear in the benchmark set (multiset count — a doc quoting the same
    benchmark line twice scores 2), which is the removal-priority signal
    the published pipelines sort on.
    """
    bench = F.broadcast(
        benchmark_ngrams(benchmark, bench_text_col or text_col, n)
    )
    hits = (
        _doc_grams(docs, id_col, text_col, n)
        .join(bench, "gram")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_contaminated_grams"))
    )
    return _verdict(docs, hits, id_col)


# ---------------------------------------------------------------------------
# Bloom-filter pre-probe — the extreme-benchmark-size escape hatch the
# decontaminate docstring promises.
# ---------------------------------------------------------------------------

_BLOOM_SALT = "bloom:h2"


def _gram_hash_cols(gram):
    """The two 64-bit hashes Kirsch-Mitzenmacher double hashing derives
    every probe position from (g_i = h1 + i*h2 mod m, "Less Hashing,
    Same Performance", 2006). Computed JVM-SIDE on both the build and
    probe paths — the one way to guarantee the two sides hash
    identically without a Python xxhash implementation."""
    return (
        F.xxhash64(gram).alias("_h1"),
        F.xxhash64(gram, F.lit(_BLOOM_SALT)).alias("_h2"),
    )


def bloom_bits_build(h1, h2, m: int, j: int):
    """Set the j double-hash positions of every (h1, h2) pair in a fresh
    m-bit bitmap (numpy uint8 array). h1/h2: SIGNED int64 arrays — they
    are reinterpreted as uint64 (a direct uint64 conversion of negative
    Python ints raises OverflowError under NumPy >= 2.0). The ONE
    bit-path implementation: bloom_build, the probe UDF, and the
    property tests all call this pair, so build and probe can never
    drift (tests/test_round8_property.py)."""
    import numpy as np

    a = np.asarray(h1, dtype=np.int64).astype(np.uint64)
    b = np.asarray(h2, dtype=np.int64).astype(np.uint64)
    bitmap = np.zeros((m + 7) // 8, dtype=np.uint8)
    for i in range(j):
        # uint64 wraparound is fine: both sides compute the identical
        # sequence, which is all a Bloom position needs
        idx = (a + np.uint64(i) * b) % np.uint64(m)
        np.bitwise_or.at(bitmap, (idx >> np.uint64(3)).astype(np.int64),
                         np.uint8(1) << (idx & np.uint64(7)).astype(np.uint8))
    return bitmap


def bloom_bits_probe(bitmap, h1, h2, m: int, j: int):
    """Boolean array: all j positions set for each (h1, h2) pair.
    Signed-int64 inputs, same reinterpretation as bloom_bits_build."""
    import numpy as np

    bm = np.asarray(bitmap, dtype=np.uint8)
    a = np.asarray(h1, dtype=np.int64).astype(np.uint64)
    b = np.asarray(h2, dtype=np.int64).astype(np.uint64)
    hit = np.ones(len(a), dtype=bool)
    for i in range(j):
        idx = (a + np.uint64(i) * b) % np.uint64(m)
        hit &= (bm[(idx >> np.uint64(3)).astype(np.int64)]
                >> (idx & np.uint64(7)).astype(np.uint8)) & 1 > 0
    return hit


def bloom_build(
    benchmark: DataFrame,
    text_col: str,
    n: int = 8,
    bits_per_element: int = 10,
    _grams: "DataFrame | None" = None,
) -> "tuple[bytes, int, int]":
    """(bitmap, m_bits, n_hashes) over the benchmark's distinct n-grams.

    10 bits/element with k = round(ln2 * 10) = 7 hashes gives ~1% false
    positives — the standard sizing. The transfer is BENCHMARK-sized
    and Arrow-batched (two int64 columns, 16 bytes per distinct gram —
    never the gram strings, never driver-side Row objects): eval suites
    are MBs-GBs against a 100 TB corpus, and the resulting bitmap is
    ~1.25 bytes/gram — an order of magnitude under the per-executor
    hash-table a broadcast join would build from the gram strings.

    _grams: a precomputed benchmark_ngrams frame (decontaminate_bloom
    passes its checkpointed one so the benchmark tokenizes once)."""
    import math

    grams = _grams if _grams is not None else benchmark_ngrams(
        benchmark, text_col, n
    )
    hashed = grams.select(*_gram_hash_cols(F.col("gram")))
    tbl = hashed.toArrow()  # Arrow columns -> numpy, no Row objects
    h1 = tbl.column("_h1").to_numpy(zero_copy_only=False)
    h2 = tbl.column("_h2").to_numpy(zero_copy_only=False)
    n_grams = max(1, len(h1))
    m = max(64, n_grams * bits_per_element)
    j = max(1, round(math.log(2) * bits_per_element))
    return bloom_bits_build(h1, h2, m, j).tobytes(), m, j


def decontaminate_bloom(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    bench_text_col: "str | None" = None,
    n: int = 8,
    bits_per_element: int = 10,
    confirm: bool = True,
) -> DataFrame:
    """`decontaminate` with a Bloom pre-probe on the corpus side — for
    benchmark sets too large to broadcast as a join hash-table.

    The corpus's (doc, gram) rows are filtered MAP-SIDE by a
    ~1.25-byte/gram bitmap (numpy-vectorized bit tests in one
    Arrow-batched pandas UDF over the two JVM-computed xxhash64s); only
    the ~contamination + ~1% false-positive survivors reach anything
    downstream. confirm=True (default) then re-joins the survivors
    against the exact gram set, so the OUTPUT IS EXACTLY
    `decontaminate`'s — the bloom is purely a scan-side prefilter that
    keeps the shuffle bounded by contamination volume even when the
    corpus is dirty and the benchmark huge. confirm=False skips the
    join and accepts the ~1% PER-GRAM false-positive rate (never false
    negatives: every truly contaminated gram passes its own bits).
    CAUTION — the per-gram rate COMPOUNDS per document: a clean
    800-gram document is 800 independent ~1% trials, so its chance of
    a false is_contaminated flag approaches 1 (measured at sf1: 23,942
    flagged vs the true 10,860 — BENCH_SF1.md r8). confirm=False is
    for gram-level prefiltering or count-tolerant weighting, NEVER for
    doc-level drop decisions on long documents; either keep the
    confirming join or size bits_per_element for the DOCUMENT-level
    target: optimal-bloom FPR ≈ 0.6185^bits, so holding the DOC-level
    rate needs ~1.44·log2(avg_grams_per_doc) extra bits on top of the
    per-gram sizing (~10 + 1.44·log2(800) ≈ 24 bits for 800-gram docs
    at a ~1% doc-level target).

    Scale shape: the bitmap broadcasts once per executor
    (sc.broadcast); the corpus never shuffles un-filtered rows; the
    confirming join's probe side is survivor-sized. With confirm=True
    the benchmark gram frame is localCheckpointed so the benchmark
    tokenize + distinct runs ONCE, feeding both the bitmap build and
    the confirming join (distinct-gram-sized executor storage,
    MEMORY_AND_DISK).
    """
    from pyspark.sql.functions import pandas_udf

    spark = docs.sparkSession
    bench_grams = benchmark_ngrams(benchmark, bench_text_col or text_col, n)
    if confirm:
        bench_grams = bench_grams.localCheckpoint(eager=True)
    bitmap_bytes, m, j = bloom_build(
        benchmark, bench_text_col or text_col, n, bits_per_element,
        _grams=bench_grams,
    )
    bc = spark.sparkContext.broadcast(bitmap_bytes)

    @pandas_udf("boolean")
    def _might_contain(h1: pd.Series, h2: pd.Series) -> pd.Series:
        import numpy as np

        bm = np.frombuffer(bc.value, dtype=np.uint8)
        return pd.Series(
            bloom_bits_probe(
                bm, h1.to_numpy(dtype=np.int64), h2.to_numpy(dtype=np.int64),
                m, j,
            )
        )

    survivors = (
        _doc_grams(docs, id_col, text_col, n)
        .select(id_col, "gram", *_gram_hash_cols(F.col("gram")))
        .where(_might_contain(F.col("_h1"), F.col("_h2")))
    )
    if confirm:
        # deliberately hint-free: if the gram set were broadcastable we
        # would not need the bloom — the confirming join shuffles
        # benchmark grams + survivors on `gram` (both bounded: benchmark
        # size and contamination volume), never the unfiltered corpus.
        # AQE still broadcasts it when it is actually small.
        survivors = survivors.join(bench_grams, "gram")
    hits = survivors.groupBy(id_col).agg(
        F.count("*").alias("n_contaminated_grams")
    )
    return _verdict(docs, hits, id_col)


# ---------------------------------------------------------------------------
# Semantic decontamination — embedding-cosine overlap with a benchmark
# ---------------------------------------------------------------------------

def semantic_decontam(
    corpus: DataFrame,
    bench: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bench_id_col: str = "vec_id",
    bench_vec_col: str = "embedding",
    round_digits: int = 6,
    method: str = "auto",
) -> DataFrame:
    """Flag corpus rows whose embedding is near-identical to any
    benchmark embedding (paraphrase-level contamination that the n-gram
    checks above cannot see — the semantic complement of
    ``decontaminate``, same role as the SemDeDup-style eval-overlap
    filters).

    Returns (id_col, nearest_bench_id, max_cos, contaminated): the
    best-matching benchmark row (rounded-cosine max, bench-id-ascending
    tie-break — the repo's deterministic argmax convention), and
    contaminated = max_cos >= threshold.

    Scale: the benchmark side is small by construction (eval suites),
    the corpus is not. Both paths stream the corpus exactly once with
    NO corpus shuffle wider than a groupBy on id:

    - ``pairs`` (<= ~256 bench rows): broadcast nested-loop join +
      one (id)-keyed min(struct) aggregation — all JVM expressions,
      DuckDB-replayable (the oracle gate in tests/test_decontam.py).
    - ``matmul``: one float64 BLAS matmul per Arrow batch against the
      broadcast benchmark matrix (the _ivf_assign_matmul dispatch
      lesson: plan-literal folds die past a few hundred vectors, BLAS
      does 1000x1M in seconds). Tie-break replayed with a stable
      argsort over the same rounded scores.

    Zero-norm embeddings: cosine is undefined, and the naive division
    is WORSE than undefined here — Spark 4's default ANSI mode raises
    DIVIDE_BY_ZERO (killing the whole run on one bad vector), and had
    it produced NaN instead, Spark orders NaN above every double so
    NaN >= threshold is TRUE and the doc would be falsely flagged.
    The contract is therefore explicit: pairs with either norm zero are
    skipped; a corpus doc with no defined cosine at all comes back as
    (NULL, NULL, contaminated=false) via the spine join.
    """
    if method not in ("auto", "pairs", "matmul"):
        raise ValueError(f"unknown method {method!r}")
    b = bench.select(
        F.col(bench_id_col).alias("_bid"), F.col(bench_vec_col).alias("_bvec")
    )
    if method == "auto":
        method = "pairs" if b.limit(257).count() <= 256 else "matmul"

    c = corpus.select(F.col(id_col), F.col(vec_col).alias("_cvec"))
    if method == "pairs":
        from ds_caselaw_ingester_spark.operators.similarity import (
            dot_product,
            l2_norm,
        )

        bn = b.withColumn("_bnorm", l2_norm(F.col("_bvec")))
        cn = c.withColumn("_cnorm", l2_norm(F.col("_cvec")))
        scored = cn.join(F.broadcast(bn)).select(
            id_col,
            "_bid",
            # zero-norm guard: undefined pairs yield NULL and are
            # dropped below, never an ANSI DIVIDE_BY_ZERO or a NaN
            F.when(
                (F.col("_cnorm") > 0) & (F.col("_bnorm") > 0),
                F.round(
                    dot_product(F.col("_cvec"), F.col("_bvec"))
                    / (F.col("_cnorm") * F.col("_bnorm")),
                    round_digits,
                ),
            ).alias("_cos"),
        )
        best = (
            scored.where(F.col("_cos").isNotNull())
            .groupBy(id_col)
            .agg(
                F.min(
                    F.struct(
                        (-F.col("_cos")).alias("neg"), F.col("_bid").alias("bid")
                    )
                ).alias("_t")
            )
            .select(
                id_col,
                F.col("_t.bid").alias("nearest_bench_id"),
                (-F.col("_t.neg")).alias("max_cos"),
            )
        )
    else:
        import numpy as np
        from pyspark.sql import types as T

        rows = b.collect()
        if not rows:
            raise ValueError("empty benchmark set")
        rows = sorted(rows, key=lambda r: r["_bid"])
        bmat = np.array([list(r["_bvec"]) for r in rows], dtype=np.float64)
        bnorm = np.sqrt((bmat * bmat).sum(axis=1))
        # bench ids keep their NATIVE type (string ids crashed the old
        # int() coercion the moment auto tipped past 256 bench rows)
        bids = [r["_bid"] for r in rows]
        bc = corpus.sparkSession.sparkContext.broadcast((bmat, bnorm, bids))
        id_field = [f for f in c.schema.fields if f.name == id_col]
        bid_type = b.schema["_bid"].dataType
        schema = T.StructType(
            id_field
            + [
                T.StructField("nearest_bench_id", bid_type),
                T.StructField("max_cos", T.DoubleType()),
            ]
        )

        def _score(batches):
            import pandas as pd

            m, n, ids = bc.value
            live = n > 0  # zero-norm bench columns can never win
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                # NULL embeddings: np.stack would crash on None — treat
                # them exactly like zero-norm (no defined cosine), the
                # pairs path's behavior for the same row
                null_mask = pdf["_cvec"].isna().to_numpy()
                if null_mask.all():
                    out = pdf[[id_col]].copy()
                    out["nearest_bench_id"] = pd.array(
                        [None] * len(pdf), dtype="object"
                    )
                    out["max_cos"] = pd.array([None] * len(pdf), dtype="Float64")
                    yield out
                    continue
                filled = pdf["_cvec"].copy()
                dim = len(next(x for x in filled if x is not None))
                filled[null_mask] = pd.Series(
                    [[0.0] * dim] * int(null_mask.sum()),
                    index=filled.index[null_mask],
                )
                v = np.stack(filled.to_numpy()).astype(np.float64)
                vn = np.sqrt((v * v).sum(axis=1))
                vn = np.where(null_mask, 0.0, vn)  # null == undefined
                denom = vn[:, None] * n[None, :]
                with np.errstate(divide="ignore", invalid="ignore"):
                    s = np.round(np.where(denom > 0, (v @ m.T) / denom, -np.inf),
                                 round_digits)
                # stable argmax on -s: ties keep column order, which is
                # bench-id ascending (rows sorted above) — the pairs
                # path's struct-min tie-break exactly
                top = np.argsort(-s, axis=1, kind="stable")[:, 0]
                defined = (vn > 0) & live.any()
                out = pdf[[id_col]].copy()
                out["nearest_bench_id"] = pd.array(
                    [ids[t] if ok else None for t, ok in zip(top, defined)],
                    dtype="object",
                )
                # nullable Float64, NOT np.nan in a float64 column: NaN
                # survives Arrow as NaN, and Spark orders NaN above
                # every double — the >= threshold flag would fire
                out["max_cos"] = pd.array(
                    [
                        float(s[i, t]) if ok else None
                        for i, (t, ok) in enumerate(zip(top, defined))
                    ],
                    dtype="Float64",
                )
                yield out

        # matmul already emits one row per corpus doc — no spine join
        best = c.mapInPandas(_score, schema)
        return best.select(
            id_col,
            "nearest_bench_id",
            "max_cos",
            F.coalesce(
                F.col("max_cos") >= F.lit(threshold), F.lit(False)
            ).alias("contaminated"),
        )

    # pairs path dropped undefined cosines above; the spine join brings
    # back docs with no defined cosine at all — unflagged, NULL-scored
    return (
        corpus.select(id_col)
        .join(best, id_col, "left")
        .select(
            id_col,
            "nearest_bench_id",
            "max_cos",
            F.coalesce(
                F.col("max_cos") >= F.lit(threshold), F.lit(False)
            ).alias("contaminated"),
        )
    )
