"""Gopher-style repetition signals (Rae et al. 2021, "Scaling Language
Models: ... Gopher", Table A1) — the repetition-removal half of the
quality pipeline that `text_profile`'s single dup_3gram_ratio only hints
at.

Per document:
- duplicate line / paragraph fraction: occurrences AFTER the first of an
  identical line (split on newline) or paragraph (split on blank line),
  over the total element count;
- duplicate line / paragraph CHARACTER fraction: same, weighted by the
  element's character length;
- top n-gram character fraction (n = 2, 3, 4 by default): characters
  covered by all occurrences of the single most frequent word n-gram,
  over the document's total token characters;
- duplicate n-gram character fraction (n = 5, 10 by default): characters
  of token positions covered by ANY word n-gram occurring at least
  twice, over total token characters.

Definition note (documented divergence): for duplicate n-grams, the
published filters (e.g. the DataTrove/NeMo re-implementations of Gopher)
scan the document left-to-right and skip n tokens after each duplicate
hit, so their covered-character count depends on scan order. We instead
use order-independent POSITIONAL COVERAGE — a token position is covered
iff it lies inside any duplicated n-gram occurrence — which is a
deterministic set property, replayable in ANSI SQL, and monotone in the
same repetition signal. Thresholds calibrated for the greedy variant
transfer approximately, not exactly.

Scale design: everything is keyed by (doc_id[, element]) — no global
shuffle, no driver state. The tagged-element explode multiplies the
corpus by ~(tokens + lines + paragraphs + one gram array per top-n), the
same token-explode scale class as the BM25 tokenizer scan; the groupBy
runs with map-side partial aggregation on (doc_id, kind, elem). The
duplicate-n-gram pass uses one window count per n partitioned by
(doc_id, gram) — skew-bounded by the repetition within a single
document. Reference parity: the reference ingester has no corpus-quality
stage at all (it ingests one tarball per Lambda invoke); these signals
are part of the training-data-pipeline surface SURVEY.md §2.9 adds.
"""

from __future__ import annotations

import re
from collections.abc import Sequence
from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ds_caselaw_ingester_spark.operators.textstats import tokens, word_ngrams

__all__ = [
    "repetition_profile",
    "repetition_profile_mapside",
    "py_repetition_profile",
    "make_batch_profiler",
]

_ELEM_STRUCT = "struct<kind:string,elem:string,clen:bigint>"


def _tagged(kind: str, arr: Column, clen_minus: int = 0) -> Column:
    """Array of (kind, elem, clen) structs; clen subtracts the joining
    spaces for word n-grams so character accounting never counts the
    separator we inserted ourselves."""
    return F.transform(
        arr,
        lambda x: F.struct(
            F.lit(kind).alias("kind"),
            x.alias("elem"),
            (F.length(x) - F.lit(clen_minus)).cast("bigint").alias("clen"),
        ),
    )


def _lines(text: Column) -> Column:
    return F.filter(F.split(text, "\n"), lambda x: x != "")


def _paras(text: Column) -> Column:
    return F.filter(
        F.transform(F.split(text, "\n{2,}"), lambda x: F.trim(x)),
        lambda x: x != "",
    )


def _frac(num: Column, den: Column, digits: int) -> Column:
    return F.when(den > 0, F.round(num.cast("double") / den, digits)).otherwise(
        F.lit(0.0)
    )


def repetition_profile(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_ns: Sequence[int] = (2, 3, 4),
    dup_ns: Sequence[int] = (5, 10),
    round_digits: int = 4,
) -> DataFrame:
    """Per-document Gopher repetition profile. Returns one row per input
    document (empty documents get all-zero signals):

    (id_col, n_lines, dup_line_frac, dup_line_char_frac,
     n_paras, dup_para_frac, dup_para_char_frac,
     top_{n}gram_char_frac ... for n in top_ns,
     dup_{n}gram_char_frac ... for n in dup_ns)
    """
    if any(n < 2 for n in (*top_ns, *dup_ns)):
        raise ValueError("repetition n-grams need n >= 2")
    if len(set(top_ns)) != len(top_ns) or len(set(dup_ns)) != len(dup_ns):
        raise ValueError("duplicate n in top_ns/dup_ns")

    d = docs.select(F.col(id_col), F.col(text_col).alias("_text"))
    tok = tokens(F.col("_text"))

    # --- pass A: one tagged explode covers tokens, lines, paragraphs and
    # every top-n gram size; (cnt - 1)-weighted sums give the duplicate
    # fractions, a struct-min gives the deterministic top gram (highest
    # count, then lexicographically smallest).
    parts = [
        _tagged("tok", tok),
        _tagged("line", _lines(F.col("_text"))),
        _tagged("para", _paras(F.col("_text"))),
    ]
    for n in top_ns:
        parts.append(_tagged(f"g{n}", word_ngrams(tok, n), clen_minus=n - 1))
    elems = d.select(
        id_col, F.explode(F.concat(*parts).cast(f"array<{_ELEM_STRUCT}>")).alias("e")
    ).select(id_col, "e.kind", "e.elem", "e.clen")

    grouped = elems.groupBy(id_col, "kind", "elem").agg(
        F.count("*").alias("cnt"), F.max("clen").alias("clen")
    )
    per_kind = grouped.groupBy(id_col, "kind").agg(
        F.sum("cnt").alias("n_elems"),
        F.count("*").alias("n_distinct"),
        F.sum(F.col("cnt") * F.col("clen")).alias("chars"),
        F.sum((F.col("cnt") - 1) * F.col("clen")).alias("dup_chars"),
        F.min(
            F.struct(
                (-F.col("cnt")).alias("neg_cnt"),
                F.col("elem").alias("elem"),
                F.col("clen").alias("clen"),
            )
        ).alias("top"),
    )

    def _kind(kind: str, col: str) -> Column:
        return F.max(F.when(F.col("kind") == kind, F.col(col)))

    aggs = [
        F.coalesce(_kind("tok", "chars"), F.lit(0)).alias("_tok_chars"),
        F.coalesce(_kind("line", "n_elems"), F.lit(0)).cast("int").alias("n_lines"),
        F.coalesce(_kind("line", "n_distinct"), F.lit(0)).alias("_line_dist"),
        F.coalesce(_kind("line", "chars"), F.lit(0)).alias("_line_chars"),
        F.coalesce(_kind("line", "dup_chars"), F.lit(0)).alias("_line_dup_chars"),
        F.coalesce(_kind("para", "n_elems"), F.lit(0)).cast("int").alias("n_paras"),
        F.coalesce(_kind("para", "n_distinct"), F.lit(0)).alias("_para_dist"),
        F.coalesce(_kind("para", "chars"), F.lit(0)).alias("_para_chars"),
        F.coalesce(_kind("para", "dup_chars"), F.lit(0)).alias("_para_dup_chars"),
    ]
    for n in top_ns:
        aggs.append(
            F.coalesce(
                (-_kind(f"g{n}", "top.neg_cnt")) * _kind(f"g{n}", "top.clen"),
                F.lit(0),
            ).alias(f"_top{n}_chars")
        )
    prof = per_kind.groupBy(id_col).agg(*aggs)

    out_cols = [
        F.col(id_col),
        F.col("n_lines"),
        _frac(F.col("n_lines") - F.col("_line_dist"), F.col("n_lines"), round_digits)
        .alias("dup_line_frac"),
        _frac(F.col("_line_dup_chars"), F.col("_line_chars"), round_digits)
        .alias("dup_line_char_frac"),
        F.col("n_paras"),
        _frac(F.col("n_paras") - F.col("_para_dist"), F.col("n_paras"), round_digits)
        .alias("dup_para_frac"),
        _frac(F.col("_para_dup_chars"), F.col("_para_chars"), round_digits)
        .alias("dup_para_char_frac"),
    ]
    for n in top_ns:
        out_cols.append(
            _frac(F.col(f"_top{n}_chars"), F.col("_tok_chars"), round_digits)
            .alias(f"top_{n}gram_char_frac")
        )

    # --- pass B: duplicate-n-gram positional coverage. One window count
    # per n over (doc, gram); covered token positions -> distinct ->
    # char-weighted by a join against the token-position frame.
    tokpos = d.select(
        id_col, F.posexplode(tok).alias("_pos", "_tok")
    ).select(id_col, "_pos", F.length("_tok").cast("bigint").alias("_tlen"))
    cov_frames = []
    for n in dup_ns:
        grampos = d.select(
            id_col, F.posexplode(word_ngrams(tok, n)).alias("_gpos", "_gram")
        )
        w = Window.partitionBy(id_col, "_gram")
        covered = (
            grampos.withColumn("_cnt", F.count("*").over(w))
            .filter(F.col("_cnt") >= 2)
            .select(
                id_col,
                F.explode(
                    F.sequence(F.col("_gpos"), F.col("_gpos") + F.lit(n - 1))
                ).alias("_pos"),
            )
            .distinct()
        )
        cov_frames.append(
            covered.join(tokpos, [id_col, "_pos"])
            .groupBy(id_col)
            .agg(F.sum("_tlen").alias(f"_cov{n}_chars"))
        )

    base = docs.select(F.col(id_col)).join(prof, id_col, "left")
    for n, cf in zip(dup_ns, cov_frames):
        base = base.join(cf, id_col, "left")
        out_cols.append(
            _frac(
                F.coalesce(F.col(f"_cov{n}_chars"), F.lit(0)),
                F.col("_tok_chars"),
                round_digits,
            ).alias(f"dup_{n}gram_char_frac")
        )
    # left-join keeps empty documents; their kind rows never existed, so
    # coalesce the counts (fracs already 0.0 through the zero denominators)
    base = base.na.fill({"n_lines": 0, "n_paras": 0, "_tok_chars": 0})
    return base.select(*out_cols)


def _round_half_up(x: float, n: int) -> float:
    """Spark's ROUND on doubles: HALF_UP over the shortest-repr decimal
    (Python's round() is HALF_EVEN — replays must use this)."""
    if x == 0.0:  # exact (sign preserved); skips the Decimal round-trip
        return x
    return float(
        Decimal(repr(x)).quantize(Decimal(1).scaleb(-n), rounding=ROUND_HALF_UP)
    )


def _py_dup_stats(elems: "list[str]", round_digits: int) -> "tuple[float, float]":
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
    if dups == 0:  # exact shortcut: both rounds would return 0.0
        return 0.0, 0.0
    chars = sum(len(e) for e in elems)
    return (
        _round_half_up(dups / n, round_digits),
        _round_half_up(dup_chars / chars, round_digits) if chars else 0.0,
    )


def py_repetition_profile(
    text: "str | None",
    top_ns: Sequence[int] = (2, 3, 4),
    dup_ns: Sequence[int] = (5, 10),
    round_digits: int = 4,
) -> dict:
    """Pure-Python replay of repetition_profile for ONE document — the
    row-local engine of repetition_profile_mapside and the fused
    curation gate scan. Semantics are the module docstring's definitions
    exactly as the relational path computes them: py_tokens (the JVM
    ASCII-\\s replay, NOT str.split), lines split on '\\n', paragraphs
    split on '\\n{2,}' then space-only-trimmed (Spark trim), top-gram
    ties break to the lexicographically smallest gram (UTF-8 byte order
    == code-point order, so Python str comparison agrees with Spark's
    binary ordering), positional n-gram coverage, and HALF_UP rounding
    on the shortest-repr decimal (Spark ROUND). A None/empty text
    yields the relational path's all-zero row. Equality with the
    relational path is pinned by tests/test_repetition_property.py."""
    from collections import Counter

    from ds_caselaw_ingester_spark.operators.textstats import py_tokens

    t = text if isinstance(text, str) else ""
    toks = py_tokens(t)
    tok_chars = sum(len(x) for x in toks)
    lines = [x for x in t.split("\n") if x != ""]
    paras = [p for p in (s.strip(" ") for s in re.split(r"\n{2,}", t)) if p != ""]

    out: dict = {"n_lines": len(lines)}
    out["dup_line_frac"], out["dup_line_char_frac"] = _py_dup_stats(
        lines, round_digits
    )
    out["n_paras"] = len(paras)
    out["dup_para_frac"], out["dup_para_char_frac"] = _py_dup_stats(
        paras, round_digits
    )
    for n in top_ns:
        grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
        if grams and tok_chars:
            cnt = Counter(grams)
            neg, best = min((-c, g) for g, c in cnt.items())
            top_chars = -neg * (len(best) - (n - 1))
            out[f"top_{n}gram_char_frac"] = _round_half_up(
                top_chars / tok_chars, round_digits
            )
        else:
            out[f"top_{n}gram_char_frac"] = 0.0
    for n in dup_ns:
        grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
        cnt = Counter(grams)
        covered: set[int] = set()
        for i, g in enumerate(grams):
            if cnt[g] >= 2:
                covered.update(range(i, i + n))
        cov_chars = sum(len(toks[i]) for i in covered)
        out[f"dup_{n}gram_char_frac"] = (
            _round_half_up(cov_chars / tok_chars, round_digits)
            if tok_chars
            else 0.0
        )
    return out


def make_batch_profiler(
    top_ns: Sequence[int] = (2, 3, 4),
    dup_ns: Sequence[int] = (5, 10),
    round_digits: int = 4,
):
    """Batch-scoped py_repetition_profile: returns
    `profile(text, toks=None) -> dict` with values IDENTICAL to
    py_repetition_profile (pinned by tests/test_repetition_property.py)
    but n-grams represented as TOKEN TUPLES instead of joined strings —
    py_repetition_profile spends most of its time in " ".join per gram
    position (O(tokens × n) string allocation per n); zip-built tuples
    count identically (tokens contain no whitespace, so gram-string
    equality == token-tuple equality) and the join is paid only for the
    handful of count-TIED candidates of the top-gram rule, where the
    documented tie-break compares JOINED-string binary order (tuple
    order can disagree when a token contains a control char < ' ' —
    planted regression in the property test). A shared gram list per n
    also serves both the top_ns and dup_ns passes when sizes overlap.
    `toks` MUST equal py_tokens(text) when provided (the fused gate
    scan tokenizes once and feeds every gate)."""
    from ds_caselaw_ingester_spark.operators.textstats import py_tokens

    tn, dn = tuple(top_ns), tuple(dup_ns)
    all_ns = sorted(set(tn) | set(dn))
    rd = round_digits
    # chars < ' ' that survive tokenization (whitespace-class chars are
    # split away): ONLY on these can token-tuple lexicographic order
    # disagree with joined-gram binary order (' ' == 0x20 compares
    # smaller than every other char a token can contain)
    ctrl_re = re.compile(r"[\x00-\x08\x0e-\x1f]")

    def profile(text, toks: "list[str] | None" = None) -> dict:
        from collections import Counter

        t = text if isinstance(text, str) else ""
        if toks is None:
            toks = py_tokens(t)
        tok_lens = [len(x) for x in toks]
        tok_chars = sum(tok_lens)
        lines = [x for x in t.split("\n") if x != ""]
        if "\n\n" in t:
            paras = [
                p
                for p in (s.strip(" ") for s in re.split(r"\n{2,}", t))
                if p != ""
            ]
        else:  # no blank line => the whole text is the only paragraph
            paras = [p] if (p := t.strip(" ")) != "" else []
        out: dict = {"n_lines": len(lines)}
        out["dup_line_frac"], out["dup_line_char_frac"] = _py_dup_stats(lines, rd)
        out["n_paras"] = len(paras)
        out["dup_para_frac"], out["dup_para_char_frac"] = _py_dup_stats(paras, rd)
        grams_by_n: "dict[int, list]" = {
            n: list(zip(*(toks[i:] for i in range(n)))) for n in all_ns
        }
        ctrl = ctrl_re.search(t) is not None
        for n in tn:
            grams = grams_by_n[n]
            if grams and tok_chars:
                cnt = Counter(grams)
                maxc = max(cnt.values())
                # tie rule is binary order of the JOINED gram, same
                # (count, string) key as py_repetition_profile's
                # min((-c, g)). Without control chars inside tokens,
                # tuple order IS joined order (see ctrl_re above), so
                # the common case never builds a joined string; the
                # control-char path joins only the tied candidates.
                if ctrl:
                    blen = len(
                        min(" ".join(g) for g, c in cnt.items() if c == maxc)
                    ) - (n - 1)
                elif maxc == 1:
                    # every gram tied: min over the keys directly
                    # (C-level tuple comparisons, no filter genexpr)
                    blen = sum(map(len, min(cnt)))
                else:
                    best = min(g for g, c in cnt.items() if c == maxc)
                    blen = sum(map(len, best))
                out[f"top_{n}gram_char_frac"] = _round_half_up(
                    maxc * blen / tok_chars, rd
                )
            else:
                out[f"top_{n}gram_char_frac"] = 0.0
        for n in dn:
            grams = grams_by_n[n]
            cnt = Counter(grams)
            # a document with NO repeated n-gram (the common clean-text
            # case) covers nothing — skip the per-position scan
            if cnt and max(cnt.values()) >= 2:
                covered: "set[int]" = set()
                for i, g in enumerate(grams):
                    if cnt[g] >= 2:
                        covered.update(range(i, i + n))
                cov_chars = sum(tok_lens[i] for i in covered)
                out[f"dup_{n}gram_char_frac"] = (
                    _round_half_up(cov_chars / tok_chars, rd)
                    if tok_chars
                    else 0.0
                )
            else:
                out[f"dup_{n}gram_char_frac"] = 0.0
        return out

    return profile


def repetition_profile_mapside(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_ns: Sequence[int] = (2, 3, 4),
    dup_ns: Sequence[int] = (5, 10),
    round_digits: int = 4,
) -> DataFrame:
    """Shuffle-FREE repetition profiling: the same output columns as
    repetition_profile, computed row-locally in one Arrow mapInPandas
    pass (py_repetition_profile per document) and APPENDED to the input
    frame — no tagged-element explode, no (doc, kind, elem) groupBys,
    no per-gram windows, no join-back.

    Why this exists alongside the relational form: the agg path's
    exchanges carry ~(tokens + lines + paragraphs + one gram array per
    n) rows per document — the dominant cost of the full curation
    composite at sf0.1 (docs/SCALE.md) — to compute a per-document
    value that in the gate role exists only to FILTER. The langid
    lesson applied: a per-document score used as a filter is a pure
    map. The relational form remains the DuckDB-oracle path (registered
    query repetition_profile) and the cross-engine definition record.

    Trade: per-document Python (Counter over grams) instead of codegen
    — linear in document length with small constants, no exchange at
    any corpus size. Values are pinned equal to the relational path by
    tests/test_repetition_property.py (same replay, same rounding)."""
    if any(n < 2 for n in (*top_ns, *dup_ns)):
        raise ValueError("repetition n-grams need n >= 2")
    if len(set(top_ns)) != len(top_ns) or len(set(dup_ns)) != len(dup_ns):
        raise ValueError("duplicate n in top_ns/dup_ns")
    for c in (id_col, text_col):
        # driver-side, not a KeyError inside an executor's Arrow batch
        if c not in docs.columns:
            raise ValueError(f"{c!r} is not a column of the input frame")
    from pyspark.sql import types as T

    prof_fields = [
        T.StructField("n_lines", T.IntegerType(), True),
        T.StructField("dup_line_frac", T.DoubleType(), True),
        T.StructField("dup_line_char_frac", T.DoubleType(), True),
        T.StructField("n_paras", T.IntegerType(), True),
        T.StructField("dup_para_frac", T.DoubleType(), True),
        T.StructField("dup_para_char_frac", T.DoubleType(), True),
    ]
    for n in top_ns:
        prof_fields.append(
            T.StructField(f"top_{n}gram_char_frac", T.DoubleType(), True)
        )
    for n in dup_ns:
        prof_fields.append(
            T.StructField(f"dup_{n}gram_char_frac", T.DoubleType(), True)
        )
    clash = {f.name for f in prof_fields} & set(docs.columns)
    if clash:
        raise ValueError(
            f"profile columns {sorted(clash)} already exist on the input "
            "frame (the mapside profiler appends, never replaces)"
        )
    schema = T.StructType(list(docs.schema.fields) + prof_fields)
    cols = [f.name for f in prof_fields]
    tn, dn, rd = tuple(top_ns), tuple(dup_ns), round_digits

    def _profile(batches):
        # batch engine, not py_repetition_profile per row: identical
        # values (make_batch_profiler's contract) with tuple-gram
        # counting in place of per-position string joins
        prof_fn = make_batch_profiler(tn, dn, rd)
        for pdf in batches:
            pdf = pdf.copy()
            profs = [prof_fn(t) for t in pdf[text_col]]
            for c in cols:
                pdf[c] = [p[c] for p in profs]
            yield pdf

    return docs.mapInPandas(_profile, schema)
