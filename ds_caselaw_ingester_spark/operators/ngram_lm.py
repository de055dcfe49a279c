"""Word-level interpolated bigram LM — the KenLM-shaped perplexity
filter (Wenzek et al. 2020, CCNet, score documents with an n-gram LM
and drop/bucket the high-perplexity tail; Jelinek-Mercer interpolation
per Chen & Goodman 1998 — published algorithms only).

operators/unigram_lm.py scores documents under a SUBWORD-piece unigram
model (its own trained vocab); this module is the word-level n-gram
complement: fit token bigram statistics on a reference corpus, score
any corpus by

  p(w | prev) = λ · (c(prev, w) + α) / (c(prev) + αV)
              + (1 − λ) · (c(w) + α) / (N + αV)

with V = |train vocab| + 1 (one reserved unseen type) and a per-doc
BOS context (`<s>`), then ppl = exp(−Σ ln p / n_tokens).

Spark-first shape — everything is DataFrame joins, NO Python in the
hot path (contrast the unigram module's sanctioned Viterbi mapInPandas;
bigram lookup is pure relational):
- fit: ONE window shuffle on the doc id (lag() pairs each token with
  its predecessor), then vocab-sized aggregates: bigram counts,
  context counts (a re-aggregation of the bigram table, not a second
  corpus pass), unigram counts. Two scalars (N, V) reach the driver.
- score: the same lag window, then three LEFT joins against the count
  tables. The tables are vocab-sized, not corpus-sized — Spark
  broadcasts them when small and sort-merges when not; hot contexts
  ("the") skew the join keys, which AQE's skew-join handles at scale.
- per-token log-probs are micro-rounded to integers
  (floor(x·1e6 + 0.5), the repo's convention) so the per-doc sum is
  exact and shuffle-order-stable; ppl rounds 4 dp at the boundary.

DuckDB oracle (same lag + joins in SQL) and a pure-Python replay in
tests/test_ngram_lm.py. Zero-token documents keep n_tokens = 0 and a
NULL ppl — callers decide, matching unigram_perplexity's contract.
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ds_caselaw_ingester_spark.operators.textstats import tokens

_MICRO = 1_000_000


class BigramLM(NamedTuple):
    """Fitted model: count tables stay DataFrames (vocab-sized, join-
    or broadcast-able); only two scalars live on the driver."""

    unigrams: DataFrame  # (token, n)
    bigrams: DataFrame  # (prev, token, n)
    contexts: DataFrame  # (prev, n) — includes the BOS context
    n_tokens: int  # N: total training tokens
    vocab_size: int  # V: distinct training tokens + 1 (unseen type)


def _with_prev(docs: DataFrame, id_col: str, text_col: str, bos: str) -> DataFrame:
    """(id, prev, token) per token position; prev of the first token is
    the BOS sentinel. One shuffle (the per-doc window)."""
    tok = docs.select(
        F.col(id_col),
        F.posexplode(tokens(F.col(text_col))).alias("_pos", "token"),
    )
    w = Window.partitionBy(id_col).orderBy("_pos")
    return tok.select(
        F.col(id_col),
        F.lag("token", 1, bos).over(w).alias("prev"),
        "token",
    )


def bigram_fit(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bos: str = "<s>",
) -> BigramLM:
    """Fit bigram/unigram/context counts on a reference corpus. The
    BOS sentinel must not collide with a real token (tokens here are
    whitespace-split, so any string with whitespace or angle brackets
    outside the corpus alphabet is safe — callers with exotic corpora
    pass their own)."""
    pairs = _with_prev(docs, id_col, text_col, bos).persist()
    try:
        # localCheckpoint: materialize the vocab-sized tables NOW, while
        # `pairs` is cached — otherwise every later score run re-derives
        # the whole fit window from the corpus scan, three times over
        bigrams = (
            pairs.groupBy("prev", "token").agg(F.count("*").alias("n"))
        ).localCheckpoint()
        # context totals re-aggregate the bigram table (vocab-sized),
        # not the corpus; BOS rides along as an ordinary context
        contexts = bigrams.groupBy("prev").agg(F.sum("n").alias("n"))
        unigrams = (
            pairs.groupBy("token").agg(F.count("*").alias("n"))
        ).localCheckpoint()
        stats = unigrams.agg(
            F.coalesce(F.sum("n"), F.lit(0)).alias("N"),
            F.count("*").alias("types"),
        ).collect()[0]
        return BigramLM(
            unigrams=unigrams,
            bigrams=bigrams,
            contexts=contexts,
            n_tokens=int(stats["N"]),
            vocab_size=int(stats["types"]) + 1,
        )
    finally:
        pairs.unpersist()


def bigram_perplexity(
    docs: DataFrame,
    model: BigramLM,
    id_col: str = "doc_id",
    text_col: str = "text",
    lam: float = 0.75,
    alpha: float = 1.0,
    bos: str = "<s>",
) -> DataFrame:
    """Per-document interpolated-bigram perplexity:
    (id, n_tokens, total_logprob, ppl). total_logprob is the micro-
    rounded integer sum descaled once; ppl = round(exp(−lp/n), 4),
    NULL for zero-token docs."""
    if not 0.0 <= lam <= 1.0:
        raise ValueError(f"lam must be in [0, 1], got {lam}")
    if alpha <= 0.0:
        raise ValueError(f"alpha must be positive, got {alpha}")
    V = float(model.vocab_size)
    N = float(model.n_tokens)
    scored = (
        _with_prev(docs, id_col, text_col, bos)
        .join(
            model.bigrams.select("prev", "token", F.col("n").alias("_nb")),
            ["prev", "token"],
            "left",
        )
        .join(
            model.contexts.select("prev", F.col("n").alias("_nc")),
            "prev",
            "left",
        )
        .join(
            model.unigrams.select("token", F.col("n").alias("_nu")),
            "token",
            "left",
        )
    )
    p2 = (F.coalesce(F.col("_nb"), F.lit(0)) + F.lit(alpha)) / (
        F.coalesce(F.col("_nc"), F.lit(0)) + F.lit(alpha) * F.lit(V)
    )
    p1 = (F.coalesce(F.col("_nu"), F.lit(0)) + F.lit(alpha)) / (
        F.lit(N) + F.lit(alpha) * F.lit(V)
    )
    lp_micro = F.floor(
        F.log(F.lit(lam) * p2 + F.lit(1.0 - lam) * p1) * F.lit(_MICRO) + F.lit(0.5)
    ).cast("long")
    agg = (
        scored.select(F.col(id_col), lp_micro.alias("_m"))
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            (F.sum("_m") / F.lit(float(_MICRO))).alias("total_logprob"),
        )
    )
    return (
        docs.select(id_col)
        .join(agg, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_tokens"), F.lit(0).cast("long")).alias("n_tokens"),
            F.coalesce(F.col("total_logprob"), F.lit(0.0)).alias("total_logprob"),
            F.when(
                F.col("n_tokens") > 0,
                F.round(F.exp(-F.col("total_logprob") / F.col("n_tokens")), 4),
            ).alias("ppl"),
        )
    )
