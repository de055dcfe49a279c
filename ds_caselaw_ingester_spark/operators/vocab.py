"""Corpus vocabulary statistics: global token frequencies and top-k
vocabulary extraction — the seed step for BPE-style tokenizer training
and data-driven stopword discovery.

Spark-first shape: explode tokens, aggregate (token, doc) partials
first — the map-side combine collapses each document's repeated tokens
before anything shuffles — then roll up per token. The top-k is
orderBy().limit(), which Spark plans as TakeOrderedAndProject
(per-partition heap + single merge), never a full sort shuffle of the
vocabulary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ds_caselaw_ingester_spark.operators.textstats import tokens


def token_frequencies(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(token, n_occurrences, n_docs) over the whole corpus. Two
    aggregations: (token, doc) first — partial aggregation combines a
    document's repeated tokens map-side, so the big shuffle carries one
    row per DISTINCT (token, doc), not one per occurrence — then the
    per-token rollup (count of docs = count of rows, occurrences = sum)."""
    from ds_caselaw_ingester_spark.sources.catalog import spread_if_narrow

    # Production entry for an UNSEEN frame (serves vocab_topk): the
    # tokenize+explode touches every byte — widen a 1-2-partition
    # single-file corpus, no-op otherwise.
    docs = spread_if_narrow(docs, id_col)
    tok = docs.select(
        F.col(id_col).alias("_doc"), F.explode(tokens(F.col(text_col))).alias("token")
    )
    per_doc = tok.groupBy("token", "_doc").agg(F.count("*").alias("_n"))
    return per_doc.groupBy("token").agg(
        F.sum("_n").alias("n_occurrences"),
        F.count("*").alias("n_docs"),
    )


def vocab_topk(docs: DataFrame, id_col: str, text_col: str, k: int) -> DataFrame:
    """Top-k vocabulary by occurrence count (ties broken by token
    ascending for deterministic output): (token, n_occurrences, n_docs)."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    freqs = token_frequencies(docs, id_col, text_col)
    return freqs.orderBy(F.desc("n_occurrences"), F.asc("token")).limit(k)
