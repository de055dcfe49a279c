"""Paragraph-level boilerplate removal (dedup.common_paragraphs +
strip_common_paragraphs): DuckDB replay of the census, a pure-Python
replay of the cut, and the byte-preservation / empty-doc contracts."""

from __future__ import annotations

import duckdb
import pytest

from ds_caselaw_ingester_spark.operators.dedup import (
    common_paragraphs,
    strip_common_paragraphs,
)

FOOTER = "subscribe to our newsletter\nfor more updates"
BANNER = "this site uses cookies"

CORPUS = {
    1: f"{BANNER}\n\nreal content about alpha\n\n{FOOTER}",
    2: f"{BANNER}\n\ndifferent beta text here\n\n{FOOTER}",
    3: f"unique gamma document\n\n{FOOTER}",
    4: f"{BANNER}\n\n{FOOTER}",  # all boilerplate
    5: "delta only appears once",  # untouched
    6: "",  # no paragraphs
    7: "  spaced\n\n\npreserved   exactly  ",  # untouched: bytes kept
}


def _df(spark):
    return spark.createDataFrame(list(CORPUS.items()), "doc_id long, text string")


def _py_paras(text: str) -> list[str]:
    import re

    return [p for p in (x.strip(" ") for x in re.split(r"\n{2,}", text)) if p != ""]


def test_census_matches_duckdb(spark):
    got = sorted(
        (r["para_hash"], r["df"], r["para"])
        for r in common_paragraphs(_df(spark), "doc_id", "text").collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE docs(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?)", list(CORPUS.items()))
    want = sorted(
        map(
            tuple,
            con.execute(
                """
WITH paras AS (
  SELECT doc_id, p FROM (
    SELECT doc_id,
           unnest(list_filter(
             list_transform(string_split_regex(text, '\\n{2,}'), x -> trim(x, ' ')),
             x -> x <> '')) AS p
    FROM docs)
)
SELECT md5(p) AS para_hash, count(DISTINCT doc_id) AS df, min(p) AS para
FROM paras GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2
"""
            ).fetchall(),
        )
    )
    assert got == want
    # the census is exactly the two planted boilerplate paragraphs
    assert {p for _, _, p in got} == {FOOTER, BANNER}
    assert {d for _, d, _ in got} == {3, 4}  # banner df=3, footer df=4


def test_strip_matches_python_model(spark):
    docs = _df(spark)
    bl = common_paragraphs(docs, "doc_id", "text")
    got = {
        r["doc_id"]: (r["text"], r["n_paras_removed"])
        for r in strip_common_paragraphs(docs, "doc_id", "text", bl).collect()
    }
    removed = {FOOTER, BANNER}
    for i, t in CORPUS.items():
        paras = _py_paras(t)
        kept = [p for p in paras if p not in removed]
        n_rm = len(paras) - len(kept)
        if n_rm == 0:
            assert got[i] == (t, 0), i  # original BYTES, not re-normalized
        else:
            assert got[i] == ("\n\n".join(kept), n_rm), i
    # spot-pin the contracts
    assert got[4] == ("", 2)  # all boilerplate -> empty string, row kept
    assert got[6] == ("", 0)  # paragraph-free doc survives untouched
    assert got[7][0] == CORPUS[7]  # weird spacing preserved byte-for-byte
    assert got[1] == ("real content about alpha", 2)


def test_min_doc_freq_validation_and_threshold(spark):
    docs = _df(spark)
    with pytest.raises(ValueError, match="min_doc_freq"):
        common_paragraphs(docs, "doc_id", "text", min_doc_freq=1)
    # raising the threshold past a paragraph's df drops it from the census
    bl4 = common_paragraphs(docs, "doc_id", "text", min_doc_freq=4)
    assert {r["para"] for r in bl4.collect()} == {FOOTER}
