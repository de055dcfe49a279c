"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
NeurIPS, "Data Selection for Language Models via Importance
Resampling"; published algorithm only, no implementation consulted).

Given a huge RAW corpus and a small TARGET sample (the distribution
you want more of — a benchmark's train split, a curated seed set),
DSIR keeps the raw documents whose hashed-n-gram profile looks most
target-like:

  1. featurize: every word unigram and bigram, hashed into B buckets
     (the paper's 10k-bucket bag-of-hashed-ngrams);
  2. fit two smoothed multinomials over the buckets — p̂ (target) and
     q̂ (raw);
  3. weight: log w(z) = Σ_b count_b(z) · (log p̂_b − log q̂_b);
  4. resample: Gumbel top-k over log w (equivalent to sampling without
     replacement ∝ w), with the Gumbel noise derived from the
     document's content hash so the selection is a pure function of
     the data — rerun-, partitioning-, and engine-stable.

Spark-first scale shape (the part that matters at 100 TB):
- featurize is ONE scan: tokenize map-side, explode 2L−1 grams/doc,
  hash to a bucket id, and groupBy(id, bucket) with map-side combine —
  the only corpus-sized shuffle, and its key space is bounded by
  B × n_docs.
- each fitted distribution is a ≤ B-row aggregate (B defaults to
  10 000); the log-ratio table is therefore tiny and BROADCAST-joined
  onto the per-doc bucket counts — scoring adds no shuffle beyond the
  featurize groupBy.
- the final top-k is orderBy().limit(k): Spark plans TakeOrdered
  (per-partition heaps + driver merge of k rows), never a global sort.

Determinism/parity conventions (the repo's): md5-derived bucket ids
and Gumbel uniforms (`('0x' || substr(md5(x), 1, 13))::BIGINT` replays
in DuckDB); the per-bucket log-ratio is micro-rounded to an integer
once, per-doc scores are exact BIGINT dot products summed in any
order; the top-k RANKS on the 4-dp-rounded score (ties break by id) so
Spark, Python, and DuckDB — whose ORDER BY binds the round() output
alias — select identical sets at rounding boundaries.
DuckDB oracle + pure-Python replay in tests/test_dsir.py.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ds_caselaw_ingester_spark.operators.sampling import (
    hash_bucket,
    hash_fraction_open,
)
from ds_caselaw_ingester_spark.operators.textstats import tokens, word_ngrams

_MICRO = 1_000_000

DSIR_BUCKETS = 10_000  # the paper's feature dimension


def hashed_ngram_counts(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    num_buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """(id, bucket, cnt): word unigram + bigram counts hashed into
    `num_buckets`. One explode + one (id, bucket) groupBy; documents
    with no tokens contribute no rows (score 0 downstream, matching
    the paper — an empty doc carries no evidence either way)."""
    from ds_caselaw_ingester_spark.sources.catalog import spread_if_narrow

    # Production entry for an UNSEEN frame (serves dsir_select and both
    # featurize inputs of dsir_logratios): the tokenize + n-gram explode
    # below touches every byte, so a single-file corpus planning as 1-2
    # partitions would serialise it on 1-2 cores. No-op on an already-
    # wide scan; results are partitioning-invariant (pinned in
    # tests/test_catalog_events.py::test_dsir_entries_narrow_equals_wide).
    docs = spread_if_narrow(docs, id_col)
    # tokenize to an ATTRIBUTE first: the concat and the n-gram builder
    # then share one tokenizer evaluation per doc (word_ngrams is also
    # internally let-bound — see its docstring for the interpreter trap)
    toked = docs.select(F.col(id_col), tokens(F.col(text_col)).alias("_toks"))
    feats = F.concat(F.col("_toks"), word_ngrams(F.col("_toks"), 2))
    return (
        toked.select(F.col(id_col), F.explode(feats).alias("_feat"))
        .select(F.col(id_col), hash_bucket(F.col("_feat"), num_buckets).alias("bucket"))
        .groupBy(id_col, "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def bucket_totals(features: DataFrame) -> DataFrame:
    """(bucket, n): corpus-wide bucket counts from a featurized frame —
    a ≤ B-row aggregate (the multinomial's sufficient statistics)."""
    return features.groupBy("bucket").agg(F.sum("cnt").alias("n"))


def dsir_logratios(
    target_feats: DataFrame,
    raw_feats: DataFrame,
    num_buckets: int = DSIR_BUCKETS,
    alpha: float = 1.0,
) -> tuple[DataFrame, int]:
    """Per-bucket micro-rounded importance log-ratio table.

    Returns (ratios, floor_micro): `ratios` is (bucket, r_micro) for
    every bucket seen in EITHER distribution, where
    r_micro = round((ln p̂_b − ln q̂_b) · 1e6) under add-alpha
    smoothing (p̂_b = (c_b + α) / (C + αB)); `floor_micro` is the same
    quantity for a bucket absent from both tables — the value scoring
    must substitute when a raw doc hits a bucket with no ratio row
    (possible when q̂ was fitted on a subsample).

    The two totals are collected (two scalars); the ratio table itself
    stays a DataFrame so callers can broadcast-join it. Rounding the
    ratio ONCE per bucket — not per doc-bucket pair — is what makes the
    per-doc dot product an exact integer sum, shuffle-order-stable.
    """
    # localCheckpoint the two ≤B-row totals: each is read twice below
    # (scalar sum + ratio join), and without it each read re-aggregates
    # its corpus-sized featurize input from scratch
    tb = bucket_totals(target_feats).localCheckpoint()
    rb = bucket_totals(raw_feats).localCheckpoint()
    ct = tb.agg(F.sum("n")).collect()[0][0] or 0
    cq = rb.agg(F.sum("n")).collect()[0][0] or 0
    denom_t = float(ct) + alpha * num_buckets
    denom_q = float(cq) + alpha * num_buckets
    # ln((c_t + a)/Dt) - ln((c_q + a)/Dq), micro-rounded HALF-even is
    # avoided: Python round() is banker's — use int(floor(x + 0.5))
    # HALF_UP to match Spark's ROUND/DuckDB's round() on the same expr
    ratios = (
        tb.withColumnRenamed("n", "n_t")
        .join(rb.withColumnRenamed("n", "n_q"), "bucket", "full")
        .select(
            "bucket",
            F.floor(
                (
                    F.log(
                        (F.coalesce(F.col("n_t"), F.lit(0)) + F.lit(alpha))
                        / F.lit(denom_t)
                    )
                    - F.log(
                        (F.coalesce(F.col("n_q"), F.lit(0)) + F.lit(alpha))
                        / F.lit(denom_q)
                    )
                )
                * F.lit(_MICRO)
                + F.lit(0.5)
            )
            .cast("long")
            .alias("r_micro"),
        )
    )
    floor_micro = int(
        math.floor(
            (math.log(alpha / denom_t) - math.log(alpha / denom_q)) * _MICRO + 0.5
        )
    )
    return ratios, floor_micro


def dsir_logweights(
    raw_feats: DataFrame,
    ratios: DataFrame,
    floor_micro: int,
    id_col: str,
) -> DataFrame:
    """(id, logw): per-document importance log-weight — the integer
    dot product count · r_micro summed per doc, descaled once. The
    ratio table is ≤ B rows → broadcast hash join; the groupBy(id)
    reuses the featurize frame's key prefix."""
    return (
        raw_feats.join(F.broadcast(ratios), "bucket", "left")
        .select(
            F.col(id_col),
            (
                F.col("cnt") * F.coalesce(F.col("r_micro"), F.lit(floor_micro))
            ).alias("_m"),
        )
        .groupBy(id_col)
        .agg((F.sum("_m") / F.lit(float(_MICRO))).alias("logw"))
    )


def gumbel_noise(key: Column) -> Column:
    """Deterministic standard-Gumbel draw from a content hash:
    g = −ln(−ln(u)) with u = hash_fraction_open(key) ∈ (0, 1) strictly,
    so both logs are finite. Replays in DuckDB/Python digit-for-digit
    (the shared 13-hex-md5 convention in operators/sampling.py)."""
    return -F.log(-F.log(hash_fraction_open(key)))


def dsir_select(
    docs: DataFrame,
    target_docs: DataFrame,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = DSIR_BUCKETS,
    alpha: float = 1.0,
) -> DataFrame:
    """End-to-end DSIR: keep the k raw documents with the largest
    logw + Gumbel(md5(id)) — sampling-without-replacement ∝ w, made
    reproducible by hash-derived noise (the paper samples with RNG;
    a pipeline that must be re-runnable cannot).

    Returns (id, logw, score) for the k selected docs, score rounded
    4 dp at the boundary (ties broken by id ascending). Documents with
    no tokens score 0 + noise — they compete at the smoothed prior,
    not auto-win or auto-lose.

    Scale: two featurize scans (target is small), one B-row broadcast
    join, one TakeOrdered(k). No corpus-sized shuffle beyond the
    per-doc bucket groupBy.
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    # persist: the featurized corpus feeds BOTH the q̂ fit and the
    # scoring dot product — without the cache the corpus-sized
    # tokenize/explode/groupBy runs twice
    raw_feats = hashed_ngram_counts(docs, id_col, text_col, num_buckets).persist()
    try:
        tgt_feats = hashed_ngram_counts(
            target_docs, id_col, text_col, num_buckets
        )
        ratios, floor_micro = dsir_logratios(
            tgt_feats, raw_feats, num_buckets, alpha
        )
        weights = dsir_logweights(raw_feats, ratios, floor_micro, id_col)
        scored = (
            docs.select(id_col)
            .join(weights, id_col, "left")
            .select(
                id_col,
                F.coalesce(F.col("logw"), F.lit(0.0)).alias("logw"),
                (
                    F.coalesce(F.col("logw"), F.lit(0.0))
                    + gumbel_noise(F.col(id_col))
                ).alias("_score"),
            )
        )
        # eager k-row checkpoint: materialize the selection NOW so the
        # cache can be released before returning (the result is k rows —
        # checkpointing it costs nothing at any scale)
        # rank on the ROUNDED score: DuckDB's ORDER BY binds the
        # round(...,4) output alias, so ranking the raw double here
        # would tie-break 4-dp-equal scores differently across engines
        return (
            scored.select(
                id_col,
                F.round("logw", 4).alias("logw"),
                F.round("_score", 4).alias("score"),
            )
            .orderBy(F.desc("score"), F.asc(id_col))
            .limit(k)
            .localCheckpoint()
        )
    finally:
        raw_feats.unpersist()
