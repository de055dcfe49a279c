"""Corpus snapshot comparison — the dataset-versioning ops a recurring
pipeline runs between two crawls/drops of "the same" corpus:

- corpus_diff: row-level added / removed / changed / unchanged by
  content hash — the audit artifact for "what did this refresh touch".
- vocab_shift: token-level relative-frequency drift (smoothed log2
  ratio per token) — the distribution-shift signal that catches a
  changed upstream filter or a new boilerplate source before training.
- js_divergence: one scalar summarizing the shift — Jensen-Shannon
  divergence (base 2, so it lives in [0, 1]) between the two unigram
  distributions. JSD is symmetric and finite at zero counts, which is
  exactly why it's the standard corpus-drift metric where KL blows up.

Spark-first scale shape:
- corpus_diff hashes map-side and full-outer-joins on the id — ONE
  shuffle per side, text never moves (only id + 32-byte hash).
- vocab_shift / js_divergence aggregate each corpus to a vocab-sized
  (token, n) table — corpus-wide work is one tokenize+explode+groupBy
  per side — then full-outer-join the two small tables. The JSD sum is
  micro-rounded per token (nano here: 1e9 — the value is O(1), not
  O(corpus)) and summed as integers, shuffle-order-stable.

Determinism/parity: md5 content hashes, the repo's rounding
conventions; DuckDB oracles + a pure-Python JSD replay in
tests/test_snapshot.py.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ds_caselaw_ingester_spark.operators.textstats import tokens

_NANO = 1_000_000_000


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, status, old_hash, new_hash) with status in
    {'added', 'removed', 'changed', 'unchanged'}. Hashes are md5 of the
    raw text (byte-identity, not semantic identity — near-dup detection
    is the dedup family's job).

    Presence comes from explicit per-side markers, NOT hash nullity: a
    document with NULL text hashes to NULL, and classifying on the hash
    would report it 'added' no matter which snapshot it is in
    (review-found). Two NULL-text rows compare as unchanged (null-safe
    equality) — both snapshots agree the content is absent."""
    from ds_caselaw_ingester_spark.sources.catalog import spread_if_narrow

    # Production entry: the map-side md5 runs BEFORE the join's
    # exchange, on the input's own partitioning — widen a single-file
    # snapshot so hashing the whole corpus isn't a 1-2-core stage.
    old = spread_if_narrow(old, id_col)
    new = spread_if_narrow(new, id_col)
    o = old.select(
        F.col(id_col),
        F.md5(F.col(text_col)).alias("old_hash"),
        F.lit(True).alias("_in_old"),
    )
    n = new.select(
        F.col(id_col),
        F.md5(F.col(text_col)).alias("new_hash"),
        F.lit(True).alias("_in_new"),
    )
    return o.join(n, id_col, "full").select(
        id_col,
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(F.col("old_hash").eqNullSafe(F.col("new_hash")), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
        .alias("status"),
        "old_hash",
        "new_hash",
    )


def token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(token, n) — the unigram sufficient statistics, one scan."""
    from ds_caselaw_ingester_spark.sources.catalog import spread_if_narrow

    # Production entry for an UNSEEN frame (serves vocab_shift and
    # js_divergence, both sides): the tokenize+explode touches every
    # byte — widen a 1-2-partition single-file snapshot, no-op
    # otherwise. Keyless round-robin; counts are placement-invariant.
    docs = spread_if_narrow(docs)
    return (
        docs.select(F.explode(tokens(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
    )


def vocab_shift(
    old: DataFrame,
    new: DataFrame,
    text_col: str = "text",
    alpha: float = 0.5,
    round_digits: int = 4,
) -> DataFrame:
    """Per-token drift: (token, n_old, n_new, log2_ratio) where
    log2_ratio = log2( ((n_new + α)/(N_new + αV)) /
                       ((n_old + α)/(N_old + αV)) ),
    V = |union vocab|. Positive = the token grew. The smoothing keeps
    appeared/vanished tokens finite (they are exactly the interesting
    rows). Totals are two collected scalars; everything else is the
    vocab-sized full-outer join."""
    oc = token_counts(old, text_col)
    nc = token_counts(new, text_col)
    joined = (
        oc.withColumnRenamed("n", "n_old")
        .join(nc.withColumnRenamed("n", "n_new"), "token", "full")
        .select(
            "token",
            F.coalesce(F.col("n_old"), F.lit(0)).alias("n_old"),
            F.coalesce(F.col("n_new"), F.lit(0)).alias("n_new"),
        )
        .localCheckpoint()  # read 3x below (two sums + the ratio scan)
    )
    tot = joined.agg(
        F.sum("n_old").alias("no"), F.sum("n_new").alias("nn"), F.count("*").alias("v")
    ).collect()[0]
    if not tot["v"]:
        raise ValueError("vocab_shift needs at least one token across the corpora")
    d_old = float(tot["no"]) + alpha * float(tot["v"])
    d_new = float(tot["nn"]) + alpha * float(tot["v"])
    return joined.select(
        "token",
        "n_old",
        "n_new",
        F.round(
            F.log2(
                ((F.col("n_new") + F.lit(alpha)) / F.lit(d_new))
                / ((F.col("n_old") + F.lit(alpha)) / F.lit(d_old))
            ),
            round_digits,
        ).alias("log2_ratio"),
    )


def js_divergence(
    old: DataFrame,
    new: DataFrame,
    text_col: str = "text",
    round_digits: int = 6,
) -> float:
    """Jensen-Shannon divergence (base 2, in [0, 1]) between the two
    corpora's unigram distributions. No smoothing — JSD is finite at
    zero counts (the 0·log0 terms vanish); an empty corpus raises,
    because a distribution over nothing isn't one.

    Per-token contributions are nano-rounded integers summed in any
    order — the scalar replays bit-for-bit in Python/DuckDB."""
    return js_divergence_counts(
        token_counts(old, text_col), token_counts(new, text_col), round_digits
    )


def js_divergence_counts(
    oc: DataFrame, nc: DataFrame, round_digits: int = 6
) -> float:
    """JSD from two already-aggregated (token, n) count tables — the
    core js_divergence delegates to, exposed for callers that MAINTAIN
    counts instead of re-scanning a corpus (the streaming drift monitor
    updates a running table per micro-batch and compares it to a fixed
    reference without ever re-reading the stream's history)."""
    joined = (
        oc.withColumnRenamed("n", "n_old")
        .join(nc.withColumnRenamed("n", "n_new"), "token", "full")
        .select(
            F.coalesce(F.col("n_old"), F.lit(0)).alias("n_old"),
            F.coalesce(F.col("n_new"), F.lit(0)).alias("n_new"),
        )
        .localCheckpoint()
    )
    tot = joined.agg(
        F.sum("n_old").alias("no"), F.sum("n_new").alias("nn")
    ).collect()[0]
    if not tot["no"] or not tot["nn"]:
        raise ValueError("js_divergence needs two non-empty corpora")
    no, nn = float(tot["no"]), float(tot["nn"])
    p = F.col("n_old") / F.lit(no)
    q = F.col("n_new") / F.lit(nn)
    m = (p + q) / F.lit(2.0)
    # 0·log2(0/m) := 0 — the when() guards realize the limit exactly
    contrib = (
        F.when(F.col("n_old") > 0, F.lit(0.5) * p * F.log2(p / m)).otherwise(F.lit(0.0))
        + F.when(F.col("n_new") > 0, F.lit(0.5) * q * F.log2(q / m)).otherwise(
            F.lit(0.0)
        )
    )
    nano = F.floor(contrib * F.lit(_NANO) + F.lit(0.5)).cast("long")
    total = joined.agg(F.sum(nano).alias("s")).collect()[0]["s"]
    return round(float(total) / _NANO, round_digits)


def py_js_divergence(
    old_texts: "list[str]", new_texts: "list[str]", round_digits: int = 6
) -> float:
    """Pure-Python replay of js_divergence (same tokenization via
    py_tokens, same nano-rounding) for the parity tests."""
    from ds_caselaw_ingester_spark.operators.textstats import py_tokens

    def counts(texts):
        c: dict[str, int] = {}
        for t in texts:
            for w in py_tokens(t):
                c[w] = c.get(w, 0) + 1
        return c

    co, cn = counts(old_texts), counts(new_texts)
    no, nn = sum(co.values()), sum(cn.values())
    if not no or not nn:
        raise ValueError("js_divergence needs two non-empty corpora")
    total = 0
    for w in set(co) | set(cn):
        p = co.get(w, 0) / no
        q = cn.get(w, 0) / nn
        m = (p + q) / 2.0
        contrib = (0.5 * p * math.log2(p / m) if p else 0.0) + (
            0.5 * q * math.log2(q / m) if q else 0.0
        )
        total += int(math.floor(contrib * _NANO + 0.5))
    return round(total / _NANO, round_digits)
