"""Corpus report: exact metrics on a constructed corpus, sane values on
the real table, and an empty corpus yields zeros instead of raising."""

from __future__ import annotations

from ds_caselaw_ingester_spark.operators.report import corpus_report
from ds_caselaw_ingester_spark.sources.catalog import table


def _metrics(df):
    return {r["metric"]: r["value"] for r in df.collect()}


def test_constructed_corpus_exact_values(spark):
    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lam mu nu xi omicron pi"),                      # 16 tokens
        (2, "alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lam mu nu xi omicron pi"),                      # exact dup of 1
        (3, "tiny doc"),                                     # short
        (4, "1 2 3 4 5 6 7 8 9 10 11 12 13 14 15 16 17 18"), # numeric, 18 toks
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    m = _metrics(corpus_report(docs, corpus="unit"))
    assert m["n_docs"] == 4.0
    assert m["total_tokens"] == 16 + 16 + 2 + 18
    assert m["short_doc_frac"] == 0.25
    # one repeated text: 1 duplicate over 4 docs, 3 distinct texts
    assert m["exact_dup_frac"] == 0.25
    assert m["distinct_texts"] == 3.0
    assert 0.0 < m["mean_alpha_ratio"] < 1.0


def test_real_table_is_sane_and_unionable(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    rep = corpus_report(docs, corpus="documents")
    m = _metrics(rep)
    assert m["n_docs"] == docs.count()
    assert m["p50_tokens"] <= m["p95_tokens"]
    assert 0.0 <= m["exact_dup_frac"] <= 1.0
    # frames union across corpora (the multi-source dashboard shape)
    both = rep.unionAll(corpus_report(docs.limit(10), corpus="sample"))
    assert both.where("corpus = 'sample'").count() == 9


def test_empty_corpus_reports_zeros(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    m = _metrics(corpus_report(empty))
    assert m["n_docs"] == 0.0 and m["exact_dup_frac"] == 0.0


def test_null_text_docs_do_not_inflate_dup_stats(spark):
    """Review regression: NULL-text docs grouped under the NULL hash
    counted as duplicates of each other. They must be excluded from
    exact_dup_frac / distinct_texts (still counted in n_docs)."""
    from ds_caselaw_ingester_spark.operators.report import corpus_report

    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta"), (3, None), (4, None), (5, None)],
        "doc_id long, text string",
    )
    m = {r["metric"]: r["value"] for r in corpus_report(docs).collect()}
    assert m["n_docs"] == 5.0
    assert m["exact_dup_frac"] == 0.0   # no true duplicates
    assert m["distinct_texts"] == 2.0


def test_report_langid_metrics(spark):
    """langid_model adds lang_pass_frac / mean_lang_p, replayed exactly
    with py_score; metrics absent without a model (back-compat)."""
    from ds_caselaw_ingester_spark.operators.quality_clf import (
        py_score,
        train_quality_classifier,
    )
    from ds_caselaw_ingester_spark.operators.report import corpus_report

    train = spark.createDataFrame(
        [(0, "the report shows steady growth across the region", 1),
         (1, "researchers published the findings after careful review", 1),
         (100, "der bericht zeigt ein stetiges wachstum in der region", 0),
         (101, "die forscher veroeffentlichten die ergebnisse", 0)],
        "doc_id long, text string, label int",
    )
    model = train_quality_classifier(train, dim=1 << 12, iters=8, feature="char")
    texts = [
        "the council approved the plan after a short debate today",
        "measurements were taken daily throughout the study period",
        "der rat genehmigte den plan nach einer kurzen aussprache",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rep = {
        r["metric"]: r["value"]
        for r in corpus_report(docs, langid_model=model, min_lang_p=0.5).collect()
    }
    ps = [py_score(t, model) for t in texts]
    assert rep["lang_pass_frac"] == sum(p >= 0.5 for p in ps) / len(ps)
    assert abs(rep["mean_lang_p"] - sum(ps) / len(ps)) < 1e-9
    assert 0.0 < rep["lang_pass_frac"] < 1.0  # non-vacuous split
    plain = {r["metric"] for r in corpus_report(docs).collect()}
    assert "lang_pass_frac" not in plain
