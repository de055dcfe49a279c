"""Language-identification gate (r9 verdict queue #2): the hashed
char-n-gram logistic classifier — the fastText-langid architecture on
the repo's replay-exact trainer — trained on a planted multilingual
corpus, exposed through apply_quality_gates, fingerprinted by the
streaming sink, and partitioning-invariant inside curate_corpus."""

from __future__ import annotations

from pyspark.sql import functions as F

from ds_caselaw_ingester_spark.operators.curation import (
    apply_quality_gates,
    curate_corpus,
)
from ds_caselaw_ingester_spark.operators.quality_clf import (
    QualityModel,
    py_replay_train,
    py_score,
    score_quality,
    train_quality_classifier,
)

# planted bilingual corpus: label 1 = target language (English-like),
# label 0 = pseudo-German (distinct char 1-3-gram profile: umlauts,
# ß, sch/ der/ ung patterns)
ENGLISH = [
    "the report shows steady growth across the whole region this year",
    "researchers published the findings after careful peer review",
    "a committee will examine the evidence and issue guidance",
    "these results suggest the method works well in practice",
    "the survey covered thousands of households across the country",
    "new measurements confirm the earlier estimate within error",
]
GERMANIC = [
    "der bericht zeigt ein stetiges wachstum in der ganzen region",
    "die forscher veröffentlichten die ergebnisse nach sorgfältiger prüfung",
    "ein ausschuss wird die beweise prüfen und leitlinien herausgeben",
    "diese ergebnisse zeigen dass die methode gut funktioniert",
    "die umfrage erfasste tausende haushalte im ganzen land",
    "neue messungen bestätigen die frühere schätzung",
]
HELDOUT_EN = [
    "the council approved the plan after a short debate",
    "measurements were taken daily throughout the study period",
]
HELDOUT_DE = [
    "der rat genehmigte den plan nach einer kurzen aussprache",
    "messungen wurden während der gesamten studie täglich durchgeführt",
]

DIM = 1 << 12


def _train_rows():
    return [(i, t, 1) for i, t in enumerate(ENGLISH)] + [
        (100 + i, t, 0) for i, t in enumerate(GERMANIC)
    ]


def _train(spark) -> QualityModel:
    rows = _train_rows()
    docs = spark.createDataFrame(rows, "doc_id long, text string, label int")
    return train_quality_classifier(
        docs, dim=DIM, iters=8, lr=2.0, feature="char"
    )


def test_char_training_is_replay_exact(spark):
    """Engine weights == pure-Python replay bit-for-bit, with char
    features — the same contract the word-feature trainer pins."""
    model = _train(spark)
    replay = py_replay_train(_train_rows(), dim=DIM, iters=8, lr=2.0, feature="char")
    assert model.feature == "char"
    assert model.bias == replay.bias
    assert model.weights == replay.weights


def test_scoring_matches_python_replay_and_separates(spark):
    """Held-out scores equal py_score exactly, and the classifier
    separates the languages on documents it never saw."""
    model = _train(spark)
    unseen = HELDOUT_EN + HELDOUT_DE
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(unseen)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["quality_p"] for r in score_quality(df, model).collect()}
    for i, t in enumerate(unseen):
        assert got[i] == py_score(t, model), (i, t)
    en = [got[i] for i in range(len(HELDOUT_EN))]
    de = [got[len(HELDOUT_EN) + i] for i in range(len(HELDOUT_DE))]
    assert min(en) > 0.5 > max(de), (en, de)


def test_gate_keep_set_matches_python_replay(spark):
    """The judge's done-criterion: apply_quality_gates(langid_model=...)
    keep set over a mixed corpus == {docs whose py_score clears the
    threshold}, computed independently."""
    model = _train(spark)
    mixed = [(i, t) for i, t in enumerate(HELDOUT_EN + HELDOUT_DE + ENGLISH[:2] + GERMANIC[:2])]
    df = spark.createDataFrame(mixed, "doc_id long, text string")
    kept = {
        r["doc_id"]
        for r in apply_quality_gates(
            df, "doc_id", "text", langid_model=model, min_lang_p=0.5
        ).collect()
    }
    want = {i for i, t in mixed if py_score(t, model) >= 0.5}
    assert kept == want
    # and the gate actually separates on this corpus (non-vacuous)
    assert kept and kept != {i for i, _ in mixed}


def test_curate_corpus_with_langid_is_partitioning_invariant(spark):
    """curate_corpus with the langid gate enabled: foreign documents
    produce no chunks, and the output is identical under different
    input partitionings (the composite's standing contract)."""
    model = _train(spark)
    rows = [(i, t) for i, t in enumerate(HELDOUT_EN + ENGLISH)] + [
        (200 + i, t) for i, t in enumerate(HELDOUT_DE + GERMANIC)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    def run(df):
        out = curate_corpus(
            df,
            min_tokens=4,
            min_alpha_ratio=0.3,
            chunk_tokens=16,
            overlap=4,
            langid_model=model,
            min_lang_p=0.5,
        )
        return {
            (r["doc_id"], r["chunk_index"], r["chunk_text"])
            for r in out.collect()
        }

    c1 = run(docs.repartition(1))
    c7 = run(docs.repartition(7))
    assert c1 == c7 and c1
    ids = {doc_id for doc_id, _, _ in c1}
    assert ids and all(i < 200 for i in ids), sorted(ids)


def test_sink_fingerprint_pins_langid(spark):
    """The streaming sink's gate fingerprint must change when the
    langid model or its threshold changes, and a char model must not
    collide with a word model of identical weights; pre-existing
    word-only fingerprints stay valid across the upgrade (feature only
    enters the digest when non-default)."""
    from ds_caselaw_ingester_spark.streaming.curation_sink import (
        _quality_fingerprint,
    )

    w = {3: 0.25, 7: -0.5}
    char_m = QualityModel(dim=16, bias=0.1, weights=w, feature="char")
    word_m = QualityModel(dim=16, bias=0.1, weights=w, feature="word")
    base = _quality_fingerprint({"langid_model": char_m})
    assert base is not None
    assert base != _quality_fingerprint({"langid_model": char_m, "min_lang_p": 0.7})
    assert base != _quality_fingerprint({"langid_model": word_m})
    # a langid gate is not a quality gate: same model, different slot
    assert base != _quality_fingerprint({"quality_model": char_m})
    # upgrade safety: the word-model digest ignores the new field, so
    # sidecars written before the feature field existed still match
    legacy_equivalent = QualityModel(dim=16, bias=0.1, weights=w)
    assert _quality_fingerprint({"quality_model": word_m}) == _quality_fingerprint(
        {"quality_model": legacy_equivalent}
    )
