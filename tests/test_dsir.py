"""DSIR importance resampling (operators/dsir.py): DuckDB oracle
parity on the real parquet, a pure-Python replay of the whole chain
(tokenize → hashed n-grams → smoothed log-ratios → Gumbel top-k) on a
hand-built corpus, and the determinism/edge contracts."""

from __future__ import annotations

import hashlib
import math
from decimal import ROUND_HALF_UP, Decimal

import duckdb
import pytest

from ds_caselaw_ingester_spark.operators.dsir import (
    DSIR_BUCKETS,
    dsir_logratios,
    dsir_select,
    hashed_ngram_counts,
)

from tests.conftest import SF_SMOKE as SF_DIR
K = 50

# target = every 37th doc: a "looks like this" seed set drawn from the
# same corpus, so selected docs should skew toward its vocabulary
ORACLE = f"""
WITH raw AS (SELECT doc_id, text FROM documents),
tgt AS (SELECT doc_id, text FROM documents WHERE doc_id % 37 = 0),
rtok AS (SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS tok FROM raw),
ttok AS (SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS tok FROM tgt),
rfeat AS (
  SELECT doc_id, f FROM rtok, unnest(tok) AS u(f)
  UNION ALL
  SELECT doc_id, array_to_string(list_slice(tok, i, i + 1), ' ') AS f
  FROM rtok, unnest(generate_series(1, len(tok) - 1)) AS t(i)
  WHERE len(tok) >= 2
),
tfeat AS (
  SELECT doc_id, f FROM ttok, unnest(tok) AS u(f)
  UNION ALL
  SELECT doc_id, array_to_string(list_slice(tok, i, i + 1), ' ') AS f
  FROM ttok, unnest(generate_series(1, len(tok) - 1)) AS t(i)
  WHERE len(tok) >= 2
),
rcnt AS (
  SELECT doc_id, ('0x' || substr(md5(f), 1, 13))::BIGINT % {DSIR_BUCKETS} AS bucket,
         count(*) AS cnt
  FROM rfeat GROUP BY 1, 2
),
rtot AS (SELECT bucket, sum(cnt) AS n_q FROM rcnt GROUP BY 1),
ttot AS (
  SELECT ('0x' || substr(md5(f), 1, 13))::BIGINT % {DSIR_BUCKETS} AS bucket,
         count(*) AS n_t
  FROM tfeat GROUP BY 1
),
tots AS (
  SELECT (SELECT coalesce(sum(n_t), 0) FROM ttot) + 1.0 * {DSIR_BUCKETS} AS dt,
         (SELECT coalesce(sum(n_q), 0) FROM rtot) + 1.0 * {DSIR_BUCKETS} AS dq
),
ratios AS (
  SELECT coalesce(ttot.bucket, rtot.bucket) AS bucket,
         CAST(floor((ln((coalesce(n_t, 0) + 1.0) / tots.dt)
                     - ln((coalesce(n_q, 0) + 1.0) / tots.dq)) * 1000000 + 0.5)
              AS BIGINT) AS r_micro
  FROM ttot FULL JOIN rtot ON ttot.bucket = rtot.bucket, tots
),
weights AS (
  SELECT rcnt.doc_id, sum(rcnt.cnt * ratios.r_micro) / 1000000.0 AS logw
  FROM rcnt JOIN ratios USING (bucket) GROUP BY 1
),
scored AS (
  SELECT raw.doc_id,
         coalesce(weights.logw, 0.0) AS logw,
         coalesce(weights.logw, 0.0)
           - ln(-ln((('0x' || substr(md5(CAST(raw.doc_id AS VARCHAR)), 1, 13))::BIGINT + 0.5)
                    / 4503599627370496.0)) AS score
  FROM raw LEFT JOIN weights USING (doc_id)
)
SELECT doc_id, round(logw, 4) AS logw, round(score, 4) AS score
FROM scored ORDER BY score DESC, doc_id LIMIT {K}
"""


def _oracle_rows():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF_DIR}/documents.parquet')"
    )
    return con.execute(ORACLE).fetchall()


def test_dsir_select_matches_duckdb_oracle(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    tgt = docs.where("doc_id % 37 = 0")
    got = [
        (r["doc_id"], r["logw"], r["score"])
        for r in dsir_select(docs, tgt, K).collect()
    ]
    want = [(int(d), float(l), float(s)) for d, l, s in _oracle_rows()]
    assert got == want


def test_dsir_partitioning_invariance(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    tgt = docs.where("doc_id % 37 = 0")
    a = dsir_select(docs, tgt, 20).collect()
    b = dsir_select(docs.repartition(7), tgt.repartition(3), 20).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


# ---- pure-Python replay on a hand-built corpus --------------------


def _py_bucket(feat: str, num_buckets: int) -> int:
    return int(hashlib.md5(feat.encode()).hexdigest()[:13], 16) % num_buckets


def _py_feats(text: str, num_buckets: int) -> "dict[int, int]":
    toks = text.split()
    feats = toks + [" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)]
    out: dict[int, int] = {}
    for f in feats:
        b = _py_bucket(f, num_buckets)
        out[b] = out.get(b, 0) + 1
    return out


def _r4(x: float) -> float:
    """Spark ROUND replay: shortest-repr decimal HALF_UP — NOT Python
    round(), whose banker's/binary behavior diverges on .5 boundaries
    (the repo's documented replay convention; rounding now DETERMINES
    top-k membership, so the boundary cases are load-bearing)."""
    return float(Decimal(repr(x)).quantize(Decimal("0.0001"), rounding=ROUND_HALF_UP))


def _py_dsir(raw: "dict[int, str]", tgt: "list[str]", k: int, num_buckets: int):
    rfeats = {i: _py_feats(t, num_buckets) for i, t in raw.items()}
    q: dict[int, int] = {}
    for f in rfeats.values():
        for b, c in f.items():
            q[b] = q.get(b, 0) + c
    p: dict[int, int] = {}
    for t in tgt:
        for b, c in _py_feats(t, num_buckets).items():
            p[b] = p.get(b, 0) + c
    dt = sum(p.values()) + 1.0 * num_buckets
    dq = sum(q.values()) + 1.0 * num_buckets
    r_micro = {
        b: int(
            math.floor(
                (
                    math.log((p.get(b, 0) + 1.0) / dt)
                    - math.log((q.get(b, 0) + 1.0) / dq)
                )
                * 1e6
                + 0.5
            )
        )
        for b in set(p) | set(q)
    }
    scored = []
    for i in raw:
        logw = sum(c * r_micro[b] for b, c in rfeats[i].items()) / 1e6
        h = int(hashlib.md5(str(i).encode()).hexdigest()[:13], 16)
        u = (h + 0.5) / 4503599627370496.0
        scored.append((i, _r4(logw), _r4(logw - math.log(-math.log(u)))))
    # rank on the ROUNDED score — the engine and the DuckDB oracle
    # (whose ORDER BY binds the round() alias) both do, so 4-dp ties
    # break by id identically in all three implementations
    scored.sort(key=lambda r: (-r[2], r[0]))
    return scored[:k]


def test_dsir_matches_pure_python_replay(spark):
    raw = {
        1: "the cat sat on the mat",
        2: "stock market prices fell sharply today",
        3: "the dog sat on the cat",
        4: "quarterly earnings beat market expectations",
        5: "a cat and a dog sat together",
        6: "",
        7: "central bank raises rates amid market turmoil",
    }
    tgt = ["the cat sat", "a cat and the dog sat"]
    B = 64  # tiny bucket space: forces hash collisions through both paths
    docs = spark.createDataFrame(list(raw.items()), "doc_id long, text string")
    tdf = spark.createDataFrame([(i, t) for i, t in enumerate(tgt)], "doc_id long, text string")
    got = [tuple(r) for r in dsir_select(docs, tdf, 4, num_buckets=B).collect()]
    assert got == _py_dsir(raw, tgt, 4, B)
    # the animal-sentence docs must outrank the finance ones on logw
    logw = {r[0]: r[1] for r in dsir_select(docs, tdf, 7, num_buckets=B).collect()}
    assert min(logw[1], logw[3], logw[5]) > max(logw[2], logw[4], logw[7])


def test_dsir_edges(spark):
    docs = spark.createDataFrame([(1, "a b"), (2, "")], "doc_id long, text string")
    tgt = spark.createDataFrame([(9, "a")], "doc_id long, text string")
    with pytest.raises(ValueError, match="k must be positive"):
        dsir_select(docs, tgt, 0)
    # the empty doc competes at logw = 0 (no evidence), never crashes
    rows = {r["doc_id"]: r for r in dsir_select(docs, tgt, 2, num_buckets=16).collect()}
    assert rows[2]["logw"] == 0.0 and rows[2]["score"] is not None


def test_logratio_floor_used_when_q_is_subsampled(spark):
    """A raw bucket absent from BOTH fitted tables (q̂ trained on a
    subsample) must score at the floor, not null out."""
    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta")], "doc_id long, text string"
    )
    fit_sample = docs.where("doc_id = 1")  # q̂ never sees doc 2's grams
    tgt = spark.createDataFrame([(9, "alpha")], "doc_id long, text string")
    # B=257: the smallest bucket space where none of doc 2's grams
    # collide with a fitted bucket (delta/beta collide for B <= 128)
    B = 257
    tf = hashed_ngram_counts(tgt, "doc_id", "text", B)
    qf = hashed_ngram_counts(fit_sample, "doc_id", "text", B)
    ratios, floor_micro = dsir_logratios(tf, qf, B)
    from ds_caselaw_ingester_spark.operators.dsir import dsir_logweights

    full = hashed_ngram_counts(docs, "doc_id", "text", B)
    w = {r["doc_id"]: r["logw"] for r in dsir_logweights(full, ratios, floor_micro, "doc_id").collect()}
    # doc 2's three grams all unseen by both fits -> exactly 3 floors
    assert w[2] == pytest.approx(3 * floor_micro / 1e6)
