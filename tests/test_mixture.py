"""Unit semantics of the corpus-mixture operator (the oracle-parity
replay lives in test_oracle_parity.py): rate arithmetic, guard rails,
and the realized token shares landing near the target weights."""

from __future__ import annotations

import pytest

from ds_caselaw_ingester_spark.operators.mixture import mix_corpus, mixture_rates


def test_mixture_rates_normalizes_over_present_sources():
    rates = mixture_rates({"a": 100, "b": 300}, {"a": 1.0, "b": 1.0, "c": 8.0}, 200)
    # c is absent from the corpus: weights renormalize over {a, b}.
    assert rates == {"a": (200 * 0.5) / 100, "b": (200 * 0.5) / 300}


def test_mixture_rates_guards():
    with pytest.raises(ValueError):
        mixture_rates({"a": 10}, {"a": 1.0}, 0)
    with pytest.raises(ValueError):
        mixture_rates({"a": 10}, {"b": 1.0}, 100)


def test_mix_corpus_max_rate_raises(spark):
    df = spark.createDataFrame([(1, "tiny", 2)], "id long, src string, tok long")
    with pytest.raises(ValueError, match="max_rate"):
        mix_corpus(df, "id", "src", "tok", {"tiny": 1.0}, 10_000, max_rate=100.0)


def test_mix_corpus_realized_shares_near_weights(spark):
    rows = [(i, "a" if i % 5 else "b", 100) for i in range(300)]
    df = spark.createDataFrame(rows, "id long, src string, tok long")
    weights = {"a": 0.5, "b": 0.5}
    out = mix_corpus(df, "id", "src", "tok", weights, 20_000).collect()
    tok = {"a": 0, "b": 0}
    for r in out:
        tok[r["src"]] += 100
    total = sum(tok.values())
    # Bernoulli remainder: expected exact, realized within a loose band.
    assert abs(tok["a"] / total - 0.5) < 0.1, tok
    assert 0.8 * 20_000 < total < 1.2 * 20_000, total
    # Epoch numbering: source b has 1/5 of rows but half the budget ->
    # rate ≈ 1.67 -> repeats exist and epochs are dense from 0.
    b_epochs = {r["epoch"] for r in out if r["src"] == "b"}
    assert 0 in b_epochs and 1 in b_epochs


def test_zero_token_source_weight_is_renormalized(spark):
    """Review regression: a weighted source with zero tokens previously
    kept its weight share in the denominator while being dropped from
    the output — the blend silently shrank below token_budget. Its
    share now redistributes over the sources that have tokens."""
    from ds_caselaw_ingester_spark.operators.mixture import mixture_rates

    rates = mixture_rates(
        {"a": 0, "b": 1000}, {"a": 0.5, "b": 0.5}, token_budget=500
    )
    assert set(rates) == {"b"}
    # b absorbs the full budget: 500 * 1.0 / 1000
    assert abs(rates["b"] - 0.5) < 1e-12


def test_all_null_token_source_treated_as_empty_not_crash(spark):
    from ds_caselaw_ingester_spark.operators.mixture import mix_corpus

    docs = spark.createDataFrame(
        [(1, "a", None), (2, "b", 100)],
        "doc_id long, src string, n_tokens int",
    )
    out = mix_corpus(
        docs, "doc_id", "src", "n_tokens",
        weights={"a": 0.5, "b": 0.5}, token_budget=100,
    )
    rows = out.collect()
    assert rows and all(r["src"] == "b" for r in rows)
