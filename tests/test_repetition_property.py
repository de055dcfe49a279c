"""Property test: repetition_profile agrees with an independent
pure-Python model of the documented definitions on arbitrary small
corpora (token soup with repeated phrases, newlines, blank lines)."""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

from hypothesis import given, settings
from hypothesis import strategies as st

from ds_caselaw_ingester_spark.operators.repetition import repetition_profile

WORDS = ["a", "bb", "ccc", "spam", "x"]


def _r4(x: float) -> float:
    return float(
        Decimal(repr(x)).quantize(Decimal("0.0001"), rounding=ROUND_HALF_UP)
    )


def _dup_stats(elems: list[str]) -> tuple[float, float]:
    n = len(elems)
    if n == 0:
        return 0.0, 0.0
    seen: set[str] = set()
    dups = dup_chars = 0
    for e in elems:
        if e in seen:
            dups += 1
            dup_chars += len(e)
        else:
            seen.add(e)
    chars = sum(len(e) for e in elems)
    return _r4(dups / n), (_r4(dup_chars / chars) if chars else 0.0)


def _py_profile(text: str) -> dict:
    toks = text.split() if text.split() else []
    tok_chars = sum(len(t) for t in toks)
    lines = [x for x in text.split("\n") if x != ""]
    # strip SPACES only: Spark's trim() (and DuckDB's) is space-only, so
    # a lone leading/trailing newline stays part of the paragraph text
    paras = [
        p for p in (s.strip(" ") for s in __import__("re").split(r"\n{2,}", text))
        if p != ""
    ]
    out: dict = {}
    out["n_lines"] = len(lines)
    out["dup_line_frac"], out["dup_line_char_frac"] = _dup_stats(lines)
    out["n_paras"] = len(paras)
    out["dup_para_frac"], out["dup_para_char_frac"] = _dup_stats(paras)
    for n in (2, 3, 4):
        grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
        if grams and tok_chars:
            best = min(
                ((-grams.count(g), g) for g in set(grams)),
            )
            top_chars = -best[0] * (len(best[1]) - (n - 1))
            out[f"top_{n}gram_char_frac"] = _r4(top_chars / tok_chars)
        else:
            out[f"top_{n}gram_char_frac"] = 0.0
    for n in (5, 10):
        grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
        from collections import Counter

        cnt = Counter(grams)
        covered: set[int] = set()
        for i, g in enumerate(grams):
            if cnt[g] >= 2:
                covered.update(range(i, i + n))
        cov_chars = sum(len(toks[i]) for i in covered)
        out[f"dup_{n}gram_char_frac"] = (
            _r4(cov_chars / tok_chars) if tok_chars else 0.0
        )
    return out


@st.composite
def _doc(draw):
    # token soup with deliberate phrase repetition so duplicate n-grams
    # actually occur; join with spaces, newlines, and blank lines
    chunks = draw(
        st.lists(
            st.one_of(
                st.lists(st.sampled_from(WORDS), min_size=1, max_size=12).map(
                    " ".join
                ),
                st.just(""),  # blank line -> paragraph break material
            ),
            min_size=0,
            max_size=6,
        )
    )
    phrase = " ".join(draw(st.lists(st.sampled_from(WORDS), min_size=5, max_size=6)))
    if draw(st.booleans()):
        chunks = chunks + [phrase, phrase]
    return "\n".join(chunks)


@settings(max_examples=12, deadline=None)
@given(st.lists(_doc(), min_size=1, max_size=5))
def test_profile_matches_python_model(spark, docs):
    frame = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r.asDict() for r in repetition_profile(frame).collect()}
    assert set(got) == set(range(len(docs)))
    for i, text in enumerate(docs):
        want = _py_profile(text)
        have = {k: v for k, v in got[i].items() if k != "doc_id"}
        assert have == want, f"doc {i}: {text!r}\n{have}\nvs\n{want}"


def test_py_tokens_matches_spark_tokens_on_hostile_whitespace(spark):
    """py_tokens is the documented Python replay of tokens() — pin the
    equivalence on exactly the inputs where naive Python diverges:
    ASCII controls (\\x0b IS Java whitespace), NBSP and LINE SEPARATOR
    (Unicode whitespace to Python's str.split but NOT to the JVM's
    ASCII \\s — they must stay inside tokens on both sides here)."""
    from ds_caselaw_ingester_spark.operators.textstats import py_tokens, tokens
    from pyspark.sql import functions as F

    texts = [
        "",
        " ",
        "\n\t a \x0b b \f\r",
        "a b c",          # NBSP glues a and b into one token
        "x y z w",   # LINE/PARAGRAPH SEPARATOR likewise
        " ",              # a lone NBSP IS a (one-char) token
        "  left pad",
        "right pad  ",
        "multi   internal\t\tgaps",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, text string"
    )
    got = {
        r["i"]: r["toks"]
        for r in df.select("i", tokens(F.col("text")).alias("toks")).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == py_tokens(t), repr(t)


@settings(max_examples=8, deadline=None)
@given(st.lists(_doc(), min_size=1, max_size=4))
def test_mapside_profile_matches_python_model(spark, docs):
    """repetition_profile_mapside agrees with the SAME independent
    pure-Python model the relational test above pins — so mapside ==
    relational by transitivity, on arbitrary corpora (VERDICT r10 #1)."""
    from ds_caselaw_ingester_spark.operators.repetition import (
        repetition_profile_mapside,
    )

    frame = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    out = repetition_profile_mapside(frame)
    got = {r["doc_id"]: r.asDict() for r in out.collect()}
    assert set(got) == set(range(len(docs)))
    for i, text in enumerate(docs):
        want = _py_profile(text)
        have = {k: v for k, v in got[i].items() if k not in ("doc_id", "text")}
        assert have == want, f"doc {i}: {text!r}\n{have}\nvs\n{want}"


def test_mapside_profile_plan_is_exchange_free(spark):
    from ds_caselaw_ingester_spark.operators.repetition import (
        repetition_profile_mapside,
    )

    frame = spark.createDataFrame(
        [(1, "a bb a bb a bb\n\nx y z")], "doc_id long, text string"
    )
    out = repetition_profile_mapside(frame)
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "simple"
    )
    assert "Exchange" not in plan, plan


def test_registered_repetition_query_plan_shape(spark):
    """The registered repetition_profile row runs the mapside engine
    (round 11): its whole plan must be the read-spread Exchange plus ONE
    MapInPandas — any groupBy/window/join creeping back in would revive
    the relational form's id-keyed shuffles under the registry's name."""
    from ds_caselaw_ingester_spark.plans.queries_text import q_repetition_profile

    out = q_repetition_profile(spark, "/root/testdata/sf0.001")
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "simple"
    )
    assert plan.count("Exchange") == 1, plan  # the spread() read fan-out only
    assert plan.count("MapInPandas") == 1, plan
    for node in ("HashAggregate", "Window", "SortMergeJoin", "BroadcastHashJoin"):
        assert node not in plan, plan


# ------------------------------------------------------- batch engine parity

# tokens may carry control chars BELOW ' ' (0x01/0x02): these are the
# ONLY characters on which token-tuple order can disagree with
# joined-gram binary order, so the strategy plants them deliberately
_CTRL_WORDS = ["a", "bb", "ccc", "spam", "x", "a\x01", "b\x02b", "\x01"]


@st.composite
def _ctrl_doc(draw):
    toks = draw(st.lists(st.sampled_from(_CTRL_WORDS), max_size=40))
    if draw(st.booleans()) and toks:
        toks = toks * draw(st.integers(2, 3))  # force repetition
    sep = draw(st.sampled_from([" ", " ", "\n", "\n\n"]))
    tail = draw(st.sampled_from(["", "\nx\nx", "\n\n" + " ".join(toks[:3]), "  "]))
    return sep.join(toks) + tail


@given(st.lists(_ctrl_doc(), min_size=1, max_size=25))
@settings(max_examples=60, deadline=None)
def test_batch_profiler_equals_per_doc_replay(docs):
    """make_batch_profiler IS py_repetition_profile, amortized: every
    value identical on arbitrary docs — including control characters
    inside tokens, where the engine's tuple-order fast path must yield
    to the joined-string tie rule, and engine state must not leak
    across documents (one profiler instance scores the whole list)."""
    from ds_caselaw_ingester_spark.operators.repetition import (
        make_batch_profiler,
        py_repetition_profile,
    )
    from ds_caselaw_ingester_spark.operators.textstats import py_tokens

    prof = make_batch_profiler((2, 3, 4), (5, 10))
    for t in docs + [None, ""]:
        assert prof(t) == py_repetition_profile(t, (2, 3, 4), (5, 10)), repr(t)
        # pre-tokenized path (the fused gate scan's) agrees too
        toks = py_tokens(t if isinstance(t, str) else "")
        assert prof(t, toks) == py_repetition_profile(t, (2, 3, 4), (5, 10))


def test_batch_profiler_ctrl_char_tie_break_planted():
    """Planted regression for the tuple-vs-joined order divergence:
    among count-tied top grams ('a\\x01','b') and ('a','c'), tuple order
    picks ('a','c') but the documented joined-binary rule picks
    'a\\x01 b' (0x01 < ' ') — and their char lengths differ, so getting
    the tie-break wrong changes the VALUE, not just the witness."""
    from ds_caselaw_ingester_spark.operators.repetition import (
        make_batch_profiler,
        py_repetition_profile,
    )

    t = "a\x01 b a\x01 b a c a c"
    got = make_batch_profiler((2,), ())(t)
    want = py_repetition_profile(t, (2,), ())
    assert got == want
    # non-vacuity: the two candidate grams really are count-tied and
    # really differ in char length
    assert want["top_2gram_char_frac"] == got["top_2gram_char_frac"] != 0.0
