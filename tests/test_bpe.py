"""BPE merge learning: the Spark loop must reproduce a pure-Python
implementation of the published algorithm (Sennrich et al. 2016)
merge-for-merge, and segmentation must be lossless."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ds_caselaw_ingester_spark.operators.bpe import (
    END_OF_WORD,
    bpe_learn,
    bpe_segment,
    word_frequencies,
)
from ds_caselaw_ingester_spark.sources.catalog import spread, table

N_MERGES = 12


def _py_bpe(word_freqs: dict, num_merges: int):
    """Reference implementation, straight from the paper's description:
    count adjacent pairs weighted by word frequency, merge the max
    (count desc, pair lexicographic asc), repeat."""
    words = {
        tuple(list(w) + [END_OF_WORD]): f for w, f in word_freqs.items()
    }
    merges = []
    for _ in range(num_merges):
        counts: dict = {}
        for syms, f in words.items():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] = counts.get((syms[i], syms[i + 1]), 0) + f
        if not counts:
            break
        (a, b), n = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((a, b, n))
        new_words = {}
        for syms, f in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_words[tuple(out)] = new_words.get(tuple(out), 0) + f
        words = new_words
    return merges


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    return spread(
        table(spark, sf_dir, "documents").select("doc_id", "text"), "doc_id"
    )


def test_spark_merges_match_python_replay(spark, corpus):
    wf = word_frequencies(corpus, "text")
    got = bpe_learn(wf, N_MERGES)
    py = _py_bpe({r["word"]: r["freq"] for r in wf.collect()}, N_MERGES)
    assert got == py
    # counts must be non-increasing ONLY per symbol pool state — but the
    # first merge is always the globally most frequent adjacent pair
    assert got[0][2] == max(m[2] for m in got)


def test_segmentation_is_lossless_and_uses_merges(spark, corpus):
    wf = word_frequencies(corpus, "text")
    merges = bpe_learn(wf, N_MERGES)
    seg = bpe_segment(corpus.limit(30), "doc_id", "text", merges)
    rows = seg.collect()
    assert rows
    merged_symbols = {a + b for a, b, _ in merges}
    used = 0
    for r in rows:
        # concatenating the pieces reproduces token + end marker exactly
        assert "".join(r["pieces"]) == r["token"] + END_OF_WORD
        if any(p in merged_symbols for p in r["pieces"]):
            used += 1
    # the corpus the merges were learned on must actually compress
    assert used > len(rows) * 0.3, (used, len(rows))


def test_top_merge_is_reapplied_greedily_left_first(spark):
    """'aaaa' with merge (a,a) -> [aa, aa, </w>] (left-first pairing),
    the disambiguation the published algorithm fixes by construction."""
    df = spark.createDataFrame([("d", "aaaa aaa")], ["doc_id", "text"])
    wf = word_frequencies(df, "text")
    merges = bpe_learn(wf, 1)
    assert merges[0][:2] == ("a", "a")
    seg = {
        r["token"]: list(r["pieces"])
        for r in bpe_segment(df, "doc_id", "text", merges[:1]).collect()
    }
    assert seg["aaaa"] == ["aa", "aa", END_OF_WORD]
    assert seg["aaa"] == ["aa", "a", END_OF_WORD]


def test_marker_left_merge_does_not_crash(spark):
    """Regression: a merge whose LEFT symbol is the end-of-word marker
    forces evaluation of the lookahead at the array's last index; under
    Spark 4's default ANSI mode a plain element_at threw
    INVALID_ARRAY_INDEX_IN_ELEMENT_AT there. The merge simply never
    applies at the end (no next symbol) and segmentation stays
    lossless."""
    from ds_caselaw_ingester_spark.operators.bpe import (
        END_OF_WORD,
        bpe_segment,
    )

    df = spark.createDataFrame([("d", "x y x")], ["doc_id", "text"])
    rows = bpe_segment(df, "doc_id", "text", [(END_OF_WORD, "x", 1)]).collect()
    assert rows
    for r in rows:
        assert "".join(r["pieces"]) == r["token"] + END_OF_WORD


def test_fully_merged_word_does_not_crash_and_early_stop_reached(spark):
    """Regression (ADVICE r6): corpus 'a a a a b' — merge (a, </w>)
    wins round 1 and the word 'a' collapses to the single symbol
    'a</w>'. Round 2's pair explode previously built sequence(1, 0) =
    [1, 0] and element_at(syms, 0) threw under ANSI mode. Now
    single-symbol words contribute no pairs, the loop survives, and
    once EVERY word is one symbol the documented early stop fires."""
    df = spark.createDataFrame([("d", "a a a a b")], ["doc_id", "text"])
    wf = word_frequencies(df, "text")
    merges = bpe_learn(wf, 10)
    py = _py_bpe({r["word"]: r["freq"] for r in wf.collect()}, 10)
    assert merges == py
    # 'a' -> a</w>, 'b' -> b</w>: two merges exhaust every adjacent
    # pair, so the loop must stop early rather than run all 10 rounds
    assert len(merges) == 2
    assert merges[0][:2] == ("a", END_OF_WORD)


def test_arrow_segmentation_matches_expression_fold(spark, corpus):
    """bpe_segment_arrow (the constant-plan-depth scale path) must
    produce byte-identical segmentations to the expression-fold
    variant, and the auto dispatch must route large merge lists to
    it."""
    from ds_caselaw_ingester_spark.operators.bpe import bpe_segment_arrow

    wf = word_frequencies(corpus, "text")
    merges = bpe_learn(wf, N_MERGES)
    sample = corpus.limit(20)
    expr = {
        (r["doc_id"], r["token"], tuple(r["pieces"]))
        for r in bpe_segment(sample, "doc_id", "text", merges).collect()
    }
    arrow = {
        (r["doc_id"], r["token"], tuple(r["pieces"]))
        for r in bpe_segment_arrow(sample, "doc_id", "text", merges).collect()
    }
    assert expr == arrow and expr
    # dispatch: force the threshold below the merge count -> the plan
    # must contain the Python evaluator, not the expression fold
    routed = bpe_segment(sample, "doc_id", "text", merges, max_expr_merges=2)
    plan = routed._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan, plan
    got = {
        (r["doc_id"], r["token"], tuple(r["pieces"])) for r in routed.collect()
    }
    assert got == expr


def test_merge_export_roundtrip_drives_identical_segmentation(spark, corpus):
    """The merges.txt interchange form round-trips and the re-imported
    list segments identically — the loud hand-off to a real tokenizer
    runtime for the per-request path."""
    from ds_caselaw_ingester_spark.operators.bpe import (
        export_merges,
        import_merges,
    )

    wf = word_frequencies(corpus, "text")
    merges = bpe_learn(wf, N_MERGES)
    text = export_merges(merges)
    assert len(text.splitlines()) == len(merges)
    back = import_merges("#version: 0.2\n\n" + text)
    assert [(a, b) for a, b, _ in back] == [(a, b) for a, b, _ in merges]
    sample = corpus.limit(10)
    a = [tuple(r["pieces"]) for r in bpe_segment(sample, "doc_id", "text", merges).collect()]
    b = [tuple(r["pieces"]) for r in bpe_segment(sample, "doc_id", "text", back).collect()]
    assert a == b
