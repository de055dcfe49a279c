"""Corpus health report — one frame summarizing what every curation
decision needs to know, computed in as few passes as the metrics allow.

Before running a 100 TB curation job you want its dials calibrated:
how big is the corpus, how long are documents, how much of it is
exact-duplicate, how skewed are the sources. This composite answers
those with TWO jobs over the corpus (one row-level aggregation pass +
one exact-dup aggregation, which needs its own hash groupBy) and
returns a slim (metric, value) frame that unions across corpora and
writes next to the data.

Every metric is a number (DOUBLE) so the frame stays uniform; counts
are exact, the duplicate rate is exact (hash groupBy — swap in
approx_count_distinct at scales where the distinct shuffle hurts and
a ±2% answer steers the same decision).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ds_caselaw_ingester_spark.operators.textstats import (
    alpha_ratio,
    content_hash,
    token_count,
)


def corpus_report(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    corpus: str = "",
    langid_model=None,
    min_lang_p: float = 0.5,
) -> DataFrame:
    """(corpus, metric, value) with metrics:
    n_docs, total_tokens, mean_tokens, p50_tokens, p95_tokens,
    mean_alpha_ratio, short_doc_frac (< 16 tokens),
    exact_dup_frac (docs whose normalized text hash repeats),
    distinct_texts.

    langid_model (optional, round 10): a trained quality_clf langid
    (feature="char") adds `lang_pass_frac` (share of docs scoring >=
    min_lang_p — the fraction the curation gate would KEEP) and
    `mean_lang_p`. The dial to read before enabling the gate: a
    surprising lang_pass_frac means the threshold, the training set,
    or the corpus is not what you thought — caught at report time,
    not as a silent 40% corpus drop in the curation run. One extra
    doc-keyed aggregation pass (score_quality)."""
    t = F.col(text_col)
    ntok = token_count(t)
    base = docs.select(
        F.col(id_col).alias("_id"),
        ntok.alias("_ntok"),
        alpha_ratio(t).alias("_alpha"),
        content_hash(t).alias("_h"),
    )
    row = base.agg(
        F.count("*").alias("n_docs"),
        F.sum("_ntok").cast("double").alias("total_tokens"),
        F.avg("_ntok").alias("mean_tokens"),
        F.expr("percentile_approx(_ntok, 0.5)").cast("double").alias("p50_tokens"),
        F.expr("percentile_approx(_ntok, 0.95)").cast("double").alias("p95_tokens"),
        F.avg("_alpha").alias("mean_alpha_ratio"),
        F.avg((F.col("_ntok") < 16).cast("double")).alias("short_doc_frac"),
    ).collect()[0]
    # NULL-text rows are excluded from the duplicate stats: content_hash
    # of NULL is NULL, and grouping them would count every missing-text
    # doc as a "duplicate" of the others and all of them as ONE distinct
    # text — inflating exactly the dial curation thresholds are
    # calibrated from. They still count in n_docs/short_doc_frac above.
    dup = (
        base.where(F.col("_h").isNotNull())
        .groupBy("_h")
        .agg(F.count("*").alias("c"))
        .agg(
            F.coalesce(F.sum(F.col("c") - 1), F.lit(0)).cast("double").alias("dups"),
            F.count("*").cast("double").alias("distinct_texts"),
        )
        .collect()[0]
    )
    n = float(row["n_docs"]) or 1.0
    metrics = [
        ("n_docs", float(row["n_docs"])),
        ("total_tokens", float(row["total_tokens"] or 0.0)),
        ("mean_tokens", float(row["mean_tokens"] or 0.0)),
        ("p50_tokens", float(row["p50_tokens"] or 0.0)),
        ("p95_tokens", float(row["p95_tokens"] or 0.0)),
        ("mean_alpha_ratio", float(row["mean_alpha_ratio"] or 0.0)),
        ("short_doc_frac", float(row["short_doc_frac"] or 0.0)),
        ("exact_dup_frac", float(dup["dups"]) / n),
        ("distinct_texts", float(dup["distinct_texts"])),
    ]
    if langid_model is not None:
        from ds_caselaw_ingester_spark.operators.quality_clf import (
            score_quality,
        )

        lang = score_quality(docs, langid_model, id_col, text_col).agg(
            F.avg(
                (F.col("quality_p") >= F.lit(min_lang_p)).cast("double")
            ).alias("pass_frac"),
            F.avg("quality_p").alias("mean_p"),
        ).collect()[0]
        metrics += [
            ("lang_pass_frac", float(lang["pass_frac"] or 0.0)),
            ("mean_lang_p", float(lang["mean_p"] or 0.0)),
        ]
    spark = docs.sparkSession
    return spark.createDataFrame(
        [(corpus, m, v) for m, v in metrics],
        "corpus string, metric string, value double",
    )
