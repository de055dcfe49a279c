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


# --------------------------------------------------------- fused gate battery

# hostile words: unicode NBSP inside a token (JVM \s is ASCII so it
# stays), control chars below ' ' (the profiler's tuple-order edge),
# umlauts (non-ASCII scorer fallback), digits
_GATE_WORD = st.text(alphabet="abz09ü\x01 ", min_size=1, max_size=5)
_GATE_DOC = st.lists(_GATE_WORD, min_size=0, max_size=30)


@settings(max_examples=10, deadline=None)
@given(
    docs=st.lists(_GATE_DOC, min_size=1, max_size=8),
    rep=st.booleans(),
    seps=st.lists(st.sampled_from([" ", "\n", "\n\n", "\t"]), min_size=1,
                  max_size=4),
)
def test_fused_gate_battery_matches_python_replays(spark, docs, rep, seps):
    """apply_quality_gates' keep set over hypothesis corpora equals the
    AND of the pure-Python per-document replays (py_score twice,
    py_repetition_profile caps, py_doc_perplexity's NULL-keeps rule).
    The replays are pinned against the relational forms elsewhere
    (test_langid / test_repetition_property / test_unigram_lm), so this
    closes fused == relational over corpora hypothesis invents —
    unicode whitespace inside tokens, control chars, blank lines — not
    just the planted fusion corpus."""
    from ds_caselaw_ingester_spark.operators.curation import apply_quality_gates
    from ds_caselaw_ingester_spark.operators.quality_clf import (
        QualityModel,
        py_score,
    )
    from ds_caselaw_ingester_spark.operators.repetition import (
        py_repetition_profile,
    )
    from ds_caselaw_ingester_spark.operators.unigram_lm import py_doc_perplexity

    texts = []
    for words in docs:
        if rep and words:
            words = words * 3  # force repetition so the caps can trip
        sep_iter = (seps[i % len(seps)] for i in range(max(len(words) - 1, 0)))
        texts.append(
            "".join(w + next(sep_iter, "") for w in words[:-1]) + (words[-1] if words else "")
        )
    rows = [(i, t) for i, t in enumerate(texts)] + [(900, None), (901, "")]
    frame = spark.createDataFrame(rows, "doc_id long, text string")

    langid_m = QualityModel(
        dim=64, bias=0.05,
        weights={i: (0.6 if i % 2 else -0.7) for i in range(64)},
        feature="char", max_chars=32,
    )
    quality_m = QualityModel(
        dim=64, bias=-0.05,
        weights={i: (0.4 if i % 3 else -0.5) for i in range(64)},
    )
    caps = {"top_2gram_char_frac": 0.55, "dup_5gram_char_frac": 0.6}
    logp = {"a": -2.0, "b": -2.2, "z": -2.4, "0": -3.0, "9": -3.1,
            "ab": -1.7, "ü": -4.0, "\x01": -5.0, " ": -5.5}
    max_ppl = 40.0

    kept = {
        r["doc_id"]
        for r in apply_quality_gates(
            frame, "doc_id", "text",
            langid_model=langid_m, min_lang_p=0.45,
            repetition_caps=caps,
            quality_model=quality_m, min_quality_p=0.45,
            lm_logp=logp, max_ppl=max_ppl, lm_max_piece_len=2,
        ).collect()
    }

    def _keep(t) -> bool:
        t = t if isinstance(t, str) else ""
        if py_score(t, langid_m) < 0.45:
            return False
        prof = py_repetition_profile(t, (2,), (5,))
        if not all(prof[c] <= v for c, v in caps.items()):
            return False
        if py_score(t, quality_m) < 0.45:
            return False
        ppl = py_doc_perplexity(t, logp, 2)["ppl"]
        return ppl is None or ppl <= max_ppl

    want = {i for i, t in rows if _keep(t)}
    assert kept == want
