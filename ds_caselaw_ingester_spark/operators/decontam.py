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
  about. (At extreme benchmark sizes, swap the broadcast for a
  bloom-filter pre-probe + confirming join; the corpus-side plan shape
  is unchanged.)
"""

from __future__ import annotations

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
    tok = tokens(F.col(text_col))
    grams = F.when(F.size(tok) >= n, word_ngrams(tok, n)).otherwise(
        F.array().cast("array<string>")
    )
    doc_grams = docs.select(F.col(id_col), F.explode(grams).alias("gram"))
    hits = (
        doc_grams.join(bench, "gram")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_contaminated_grams"))
    )
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
