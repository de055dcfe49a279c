"""Interpolated bigram LM (operators/ngram_lm.py): DuckDB oracle
parity on the real parquet (fit on a subcorpus, score everything —
exercising the OOV/unseen-context smoothing paths), a pure-Python
replay, and the contract edges."""

from __future__ import annotations

import math

import duckdb
import pytest

from ds_caselaw_ingester_spark.operators.ngram_lm import (
    bigram_fit,
    bigram_perplexity,
)

from tests.conftest import SF_SMOKE as SF_DIR
LAM, ALPHA = 0.75, 1.0

ORACLE = f"""
WITH raw AS (SELECT doc_id, text FROM documents),
fit AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0),
ft AS (SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS toks FROM fit),
fpos AS (
  SELECT doc_id, i, toks[i] AS token FROM ft,
       unnest(generate_series(1, len(toks))) AS t(i)
),
fpair AS (
  SELECT doc_id, lag(token, 1, '<s>') OVER (PARTITION BY doc_id ORDER BY i) AS prev, token
  FROM fpos
),
big AS (SELECT prev, token, count(*) AS nb FROM fpair GROUP BY 1, 2),
ctx AS (SELECT prev, sum(nb) AS nc FROM big GROUP BY 1),
uni AS (SELECT token, count(*) AS nu FROM fpair GROUP BY 1),
stats AS (SELECT (SELECT coalesce(sum(nu), 0) FROM uni) AS N,
                 (SELECT count(*) FROM uni) + 1 AS V),
rt AS (SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS toks FROM raw),
rpos AS (
  SELECT doc_id, i, toks[i] AS token FROM rt,
       unnest(generate_series(1, len(toks))) AS t(i)
),
rpair AS (
  SELECT doc_id, lag(token, 1, '<s>') OVER (PARTITION BY doc_id ORDER BY i) AS prev, token
  FROM rpos
),
lp AS (
  SELECT rpair.doc_id,
         CAST(floor(ln({LAM!r} * ((coalesce(big.nb, 0) + {ALPHA!r})
                                  / (coalesce(ctx.nc, 0) + {ALPHA!r} * stats.V))
                     + {1.0 - LAM!r} * ((coalesce(uni.nu, 0) + {ALPHA!r})
                                  / (stats.N + {ALPHA!r} * stats.V)))
                    * 1000000 + 0.5) AS BIGINT) AS m
  FROM rpair
  LEFT JOIN big ON rpair.prev = big.prev AND rpair.token = big.token
  LEFT JOIN ctx ON rpair.prev = ctx.prev
  LEFT JOIN uni ON rpair.token = uni.token, stats
),
agg AS (
  SELECT doc_id, count(*) AS n_tokens, sum(m) / 1000000.0 AS total_logprob
  FROM lp GROUP BY 1
)
SELECT raw.doc_id,
       coalesce(agg.n_tokens, 0) AS n_tokens,
       coalesce(agg.total_logprob, 0.0) AS total_logprob,
       CASE WHEN coalesce(agg.n_tokens, 0) > 0
            THEN round(exp(-agg.total_logprob / agg.n_tokens), 4) END AS ppl
FROM raw LEFT JOIN agg USING (doc_id)
ORDER BY doc_id
"""


def test_bigram_ppl_matches_duckdb_oracle(spark):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF_DIR}/documents.parquet')"
    )
    want = con.execute(ORACLE).fetchall()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    model = bigram_fit(docs.where("doc_id % 3 = 0"))
    got = [
        (r["doc_id"], r["n_tokens"], r["total_logprob"], r["ppl"])
        for r in bigram_perplexity(docs, model).orderBy("doc_id").collect()
    ]
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g[0] == w[0] and g[1] == w[1]
        assert g[2] == pytest.approx(w[2], abs=1e-9)
        assert (g[3] is None) == (w[3] is None)
        if g[3] is not None:
            assert g[3] == pytest.approx(w[3], abs=1e-9)


# ---- pure-Python replay --------------------------------------------


def _py_ppl(fit_docs, score_docs, lam=LAM, alpha=ALPHA):
    big, ctx, uni = {}, {}, {}
    for t in fit_docs.values():
        toks = t.split()
        prev = "<s>"
        for w in toks:
            big[(prev, w)] = big.get((prev, w), 0) + 1
            uni[w] = uni.get(w, 0) + 1
            prev = w
    for (p, _), n in big.items():
        ctx[p] = ctx.get(p, 0) + n
    N = sum(uni.values())
    V = len(uni) + 1
    out = {}
    for i, t in score_docs.items():
        toks = t.split()
        if not toks:
            out[i] = (0, 0.0, None)
            continue
        m = 0
        prev = "<s>"
        for w in toks:
            p2 = (big.get((prev, w), 0) + alpha) / (ctx.get(prev, 0) + alpha * V)
            p1 = (uni.get(w, 0) + alpha) / (N + alpha * V)
            m += int(math.floor(math.log(lam * p2 + (1 - lam) * p1) * 1e6 + 0.5))
            prev = w
        lp = m / 1e6
        out[i] = (len(toks), lp, round(math.exp(-lp / len(toks)), 4))
    return out


def test_bigram_ppl_matches_pure_python(spark):
    fit = {1: "the cat sat on the mat", 2: "the dog sat on the mat"}
    score = {
        10: "the cat sat on the mat",  # in-distribution: low ppl
        11: "mat the on sat cat the",  # shuffled: same unigrams, bad bigrams
        12: "zebra quark flux",  # fully OOV
        13: "",  # empty
    }
    fd = spark.createDataFrame(list(fit.items()), "doc_id long, text string")
    sd = spark.createDataFrame(list(score.items()), "doc_id long, text string")
    model = bigram_fit(fd)
    got = {
        r["doc_id"]: (r["n_tokens"], r["total_logprob"], r["ppl"])
        for r in bigram_perplexity(sd, model).collect()
    }
    want = _py_ppl(fit, score)
    for i in score:
        assert got[i][0] == want[i][0]
        assert got[i][1] == pytest.approx(want[i][1], abs=1e-9)
        assert (got[i][2] is None) == (want[i][2] is None)
        if got[i][2] is not None:
            assert got[i][2] == pytest.approx(want[i][2], abs=1e-9)
    # the LM must rank: in-distribution < shuffled < OOV
    assert got[10][2] < got[11][2] < got[12][2]


def test_bigram_ppl_partitioning_invariance(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(80)
    model = bigram_fit(docs)
    a = sorted(map(tuple, bigram_perplexity(docs, model).collect()))
    model2 = bigram_fit(docs.repartition(7))
    b = sorted(map(tuple, bigram_perplexity(docs.repartition(5), model2).collect()))
    assert a == b


def test_bigram_ppl_param_validation(spark):
    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    model = bigram_fit(docs)
    with pytest.raises(ValueError, match="lam"):
        bigram_perplexity(docs, model, lam=1.5)
    with pytest.raises(ValueError, match="alpha"):
        bigram_perplexity(docs, model, alpha=0.0)
