"""Corpus mixing for training-data assembly: given per-source target
weights and a global token budget, emit a deterministic blend — each
source down-sampled or epoch-repeated (up-sampled) so its share of the
output tokens matches its weight.

This is the "data mixture" step every LLM training pipeline runs after
curation (e.g. 60% web / 30% code / 10% reference, repeated as needed):
sources with more data than their share get a reproducible subsample;
sources with less get whole-corpus repeats plus a fractional remainder.

Spark-first shape:
- ONE tiny aggregation (per-source token totals — |sources| rows) is
  collected to the driver to compute per-source replication rates; the
  collect is bounded by the number of sources, never the corpus.
- The blend itself is pure map-side work: full epochs come from
  `explode(sequence(...))` (each row emits its own repeat count — no
  join, no shuffle), and the fractional remainder is a content-hash
  Bernoulli gate (operators/sampling.py `hash_fraction` — rerun-,
  partitioning- and engine-stable). A 100 TB mix is therefore a single
  scan with a filter+explode, prunable and pushdown-friendly.
- Epoch-salted hashing: the fractional epoch's keep-decision hashes
  (id, epoch) so repeated epochs of one document are independent
  Bernoulli draws, not the same rows every epoch.

Determinism: the output is a pure function of (data, weights, budget) —
reruns and engine ports pick identical rows, which is what makes the
mixture auditable (the DuckDB oracle in plans/queries_text.py replays
it exactly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ds_caselaw_ingester_spark.operators.sampling import hash_fraction


def mixture_rates(
    totals: dict[str, int], weights: dict[str, float], token_budget: int
) -> dict[str, float]:
    """Per-source replication rate: rate_s = budget * w_s / tokens_s,
    with weights normalized over the sources that actually have tokens.
    A rate above 1 means up-sampling (full repeats + fractional
    remainder).

    Zero-token sources are excluded BEFORE normalization (and logged):
    keeping their weight in the denominator but dropping them from the
    output would silently shrink the blend below token_budget by their
    weight share — their budget is redistributed over the sources that
    can absorb it instead."""
    if token_budget <= 0:
        raise ValueError(f"token_budget must be positive, got {token_budget}")
    present = {s: w for s, w in weights.items() if totals.get(s, 0) > 0}
    empty = [s for s in weights if s not in present]
    if empty:
        import logging

        logging.getLogger(__name__).warning(
            "mixture_rates: weighted source(s) %s have no tokens; their "
            "weight share is renormalized over the remaining sources",
            empty,
        )
    wsum = sum(present.values())
    if wsum <= 0:
        raise ValueError(
            "no weighted source has any tokens (weights/corpus mismatch)"
        )
    return {
        s: (token_budget * (w / wsum)) / totals[s] for s, w in present.items()
    }


def mix_corpus(
    docs: DataFrame,
    id_col: str,
    source_col: str,
    token_col: str,
    weights: dict[str, float],
    token_budget: int,
    max_rate: float = 100.0,
) -> DataFrame:
    """Deterministic weighted blend of `docs` (one row per kept
    document-epoch, original columns + `epoch` starting at 0). Sources
    absent from `weights` are dropped. Expected output tokens per source
    = budget * normalized weight (exact in expectation; the Bernoulli
    remainder makes it exact only asymptotically — documented, and the
    right trade: an exact-knapsack cut would need a global sort).

    max_rate caps accidental explosion (a tiny source with a big weight
    would otherwise repeat millions of times); hitting it raises.
    """
    from ds_caselaw_ingester_spark.sources.catalog import spread_if_narrow

    # Production entry for an UNSEEN frame: the epoch-explode below
    # replicates every kept row rate-many times — on a 1-2-partition
    # single-file corpus that expansion (and the upsampled write that
    # usually follows) serialises on 1-2 cores. No-op when already wide;
    # the blend is partitioning-invariant (hash-derived Bernoulli).
    docs = spread_if_narrow(docs, id_col)
    agg = (
        docs.where(F.col(source_col).isin(list(weights)))
        .groupBy(source_col)
        .agg(F.sum(F.col(token_col)).alias("_tok"))
        .collect()
    )
    # sum() over an all-NULL token column is NULL — treat as zero tokens
    totals = {r[0]: int(r[1]) if r[1] is not None else 0 for r in agg}
    rates = mixture_rates(totals, weights, token_budget)
    over = {s: r for s, r in rates.items() if r > max_rate}
    if over:
        raise ValueError(f"replication rate exceeds max_rate={max_rate}: {over}")

    # rate -> CASE expression keyed on source (|sources| branches).
    rate_col = F.lit(None).cast("double")
    for s, r in rates.items():
        rate_col = F.when(F.col(source_col) == s, F.lit(r)).otherwise(rate_col)

    base = docs.where(F.col(source_col).isin(list(rates))).withColumn(
        "_rate", rate_col
    )
    # Full epochs 0..floor(rate)-1 unconditionally, plus epoch
    # floor(rate) gated at the fractional remainder. sequence(0, n)
    # always has n+1 entries; the last entry is the gated one.
    n_full = F.floor(F.col("_rate")).cast("long")
    frac = F.col("_rate") - n_full
    out = (
        base.withColumn("epoch", F.explode(F.sequence(F.lit(0), n_full)))
        .where(
            (F.col("epoch") < n_full)
            | (
                hash_fraction(
                    F.concat_ws("#", F.col(id_col).cast("string"), F.col("epoch"))
                )
                < frac
            )
        )
        .drop("_rate")
    )
    return out
