"""Gopher repetition-profile operator: hand-computed geometry on
synthetic documents (the real-corpus parity lives in the registered
repetition_profile oracle row — testdata documents carry no newlines, so
the line/paragraph branches are pinned HERE)."""

from __future__ import annotations

import pytest

from ds_caselaw_ingester_spark.operators.repetition import repetition_profile


def _rows(df):
    return {r["doc_id"]: r.asDict() for r in df.collect()}


def test_hand_computed_profile(spark):
    # doc 1: tokens a b c d e a b c d e x foo foo bar bar  (15 tokens,
    # 23 token chars); lines [long, foo, foo, 'bar bar']; paras
    # [first-three-lines, 'bar bar']; 'a b c d e' duplicated 5-gram.
    docs = spark.createDataFrame(
        [
            (1, "a b c d e a b c d e x\nfoo\nfoo\n\nbar bar"),
            (2, ""),
            (3, "one two three"),
        ],
        "doc_id long, text string",
    )
    got = _rows(repetition_profile(docs))
    d1 = got[1]
    assert d1["n_lines"] == 4 and d1["dup_line_frac"] == 0.25
    # dup line chars = len('foo') / (21 + 3 + 3 + 7)
    assert d1["dup_line_char_frac"] == round(3 / 34, 4)
    assert d1["n_paras"] == 2 and d1["dup_para_frac"] == 0.0
    # top 2-gram: 'a b' x2 (lexicographic tie-break among the four
    # count-2 grams), 2 chars -> 4/23
    assert d1["top_2gram_char_frac"] == round(4 / 23, 4)
    assert d1["top_3gram_char_frac"] == round(6 / 23, 4)
    assert d1["top_4gram_char_frac"] == round(8 / 23, 4)
    # 'a b c d e' occurs at positions 0 and 5 -> 10 covered tokens
    assert d1["dup_5gram_char_frac"] == round(10 / 23, 4)
    assert d1["dup_10gram_char_frac"] == 0.0

    # empty document survives with all-zero signals (ANSI-safe)
    d2 = got[2]
    assert d2["n_lines"] == 0 and d2["n_paras"] == 0
    assert all(
        d2[c] == 0.0 for c in d2 if c.endswith("_frac") or c.endswith("char_frac")
    )

    # no duplicates anywhere; top 3-gram covers the whole doc
    d3 = got[3]
    assert d3["top_3gram_char_frac"] == 1.0
    assert d3["dup_5gram_char_frac"] == 0.0


def test_overlapping_duplicate_grams_cover_once(spark):
    # 'x x x x x x' : every 5-gram is 'x x x x x' (duplicated); coverage
    # must count each token position ONCE -> frac 1.0, not > 1.
    docs = spark.createDataFrame([(1, "x x x x x x")], "doc_id long, text string")
    got = _rows(repetition_profile(docs))
    assert got[1]["dup_5gram_char_frac"] == 1.0
    # top 2-gram 'x x' occurs 5x, 2 chars each = 10 > 6 token chars:
    # the Gopher top-n metric deliberately counts occurrences, so the
    # fraction may exceed 1 on degenerate repetition (matches the
    # published definition; filters threshold well below 1).
    assert got[1]["top_2gram_char_frac"] == round(10 / 6, 4)


def test_paragraph_split_and_trim(spark):
    text = "para one\n\n  para one  \n\n\npara two"
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = _rows(repetition_profile(docs))
    # trimmed paragraphs: ['para one', 'para one', 'para two']
    assert got[1]["n_paras"] == 3
    assert got[1]["dup_para_frac"] == round(1 / 3, 4)
    assert got[1]["dup_para_char_frac"] == round(8 / 24, 4)


def test_validation(spark):
    docs = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        repetition_profile(docs, top_ns=(1, 2))
    with pytest.raises(ValueError):
        repetition_profile(docs, dup_ns=(5, 5))
