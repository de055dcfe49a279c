"""Property tests for the curation operators (chunking, sampling)
against pure-Python models, over hypothesis-generated corpora and
parameters. Each example batches every document into ONE Spark job."""

from __future__ import annotations

import hashlib

from hypothesis import given, settings
from hypothesis import strategies as st

from ds_caselaw_ingester_spark.operators.chunking import chunk_documents
from ds_caselaw_ingester_spark.operators.sampling import hash_sample

# words without whitespace; documents join them with single spaces so the
# whitespace tokenizer round-trips exactly
WORD = st.text(alphabet="abcxyz09", min_size=1, max_size=5)
DOC = st.lists(WORD, min_size=0, max_size=40)


def _py_chunks(words: list[str], chunk: int, overlap: int):
    stride = chunk - overlap
    out = []
    for idx, s in enumerate(range(0, len(words), stride)):
        out.append((idx, " ".join(words[s : s + chunk]), len(words[s : s + chunk])))
    return out


@settings(max_examples=20, deadline=None)
@given(
    docs=st.lists(DOC, min_size=1, max_size=6),
    chunk=st.integers(min_value=1, max_value=12),
    overlap_frac=st.integers(min_value=0, max_value=11),
)
def test_chunking_matches_python_model(spark, docs, chunk, overlap_frac):
    overlap = overlap_frac % chunk  # valid overlap in [0, chunk)
    df = spark.createDataFrame(
        [(i, " ".join(words)) for i, words in enumerate(docs)],
        "doc_id long, text string",
    )
    got = {
        (r.doc_id, r.chunk_index, r.chunk_text, r.n_chunk_tokens)
        for r in chunk_documents(df, "doc_id", "text", chunk, overlap).collect()
    }
    want = {
        (i, idx, text, n)
        for i, words in enumerate(docs)
        for (idx, text, n) in _py_chunks(words, chunk, overlap)
    }
    assert got == want


def _py_hash_keep(key: int, p: float) -> bool:
    h = hashlib.md5(str(key).encode()).hexdigest()
    return int(h[:13], 16) / float(16**13) < p


@settings(max_examples=20, deadline=None)
@given(
    keys=st.lists(st.integers(min_value=-(10**9), max_value=10**9), min_size=1, max_size=50, unique=True),
    p=st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
)
def test_hash_sample_matches_python_model(spark, keys, p):
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    got = {r.k for r in hash_sample(df, "k", p).collect()}
    want = {k for k in keys if _py_hash_keep(k, p)}
    assert got == want
