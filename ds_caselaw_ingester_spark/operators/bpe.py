"""BPE merge learning — byte-pair-encoding tokenizer training as an
iterative Spark job (Sennrich et al. 2016, "Neural Machine Translation
of Rare Words with Subword Units" — the published algorithm; no
implementation consulted).

The published algorithm: start from characters (plus an end-of-word
marker), repeatedly find the most frequent ADJACENT symbol pair across
the corpus and merge it into one symbol; the ordered merge list IS the
tokenizer.

Scale decomposition — the part worth getting right at 100 TB:
- The corpus-sized work happens ONCE: a single scan builds the
  (word, frequency) table. BPE statistics are identical on the word
  table and on the raw corpus (a pair inside "the" counts freq("the")
  times either way), and the word table is vocabulary-sized — millions
  of rows, not billions — so the merge loop never touches the corpus
  again. This is the same sample-vs-index asymmetry as the IVF/PQ
  quantizers.
- Each merge round on the word table is: one explode of adjacent pairs
  weighted by word frequency, one partially-aggregated groupBy, one
  TakeOrdered(1) — a single slim shuffle; then a map-side fold applies
  the winning merge. Lineage is truncated per round (localCheckpoint),
  the same discipline as the connected-components loop — without it
  round N replays rounds 1..N-1.
- Only the winning (pair, count) row crosses to the driver per round.

Determinism: ties on the max count break lexicographically on the pair,
so the learned merge list is reproducible across engines and runs —
pinned by a pure-Python replay in tests/test_bpe.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ds_caselaw_ingester_spark.operators.textstats import tokens

# Known sentinel caveat (shared with the published algorithm's own
# convention): merges can CONSTRUCT a symbol textually equal to the
# marker (e.g. '</w' + '>'), after which a rule meant for word ends can
# match mid-word. Corpora whose tokens contain literal '</w>' should
# pre-escape it; the operator itself stays total either way (see the
# try_element_at note in _apply_merge).
END_OF_WORD = "</w>"


def word_frequencies(docs: DataFrame, text_col: str) -> DataFrame:
    """(word, freq): the one corpus-sized scan. Map-side combine
    collapses repeats before the shuffle carries one row per distinct
    word per partition."""
    from ds_caselaw_ingester_spark.sources.catalog import spread_if_narrow

    # Production entry for an UNSEEN frame (feeds bpe_learn): the token
    # explode touches every byte — widen a 1-2-partition single-file
    # corpus, no-op otherwise. Keyless round-robin (there is no id
    # contract here); word counts are placement-invariant.
    docs = spread_if_narrow(docs)
    return (
        docs.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def _initial_symbols(word: Column) -> Column:
    """Character symbols + the end-of-word marker: 'low' ->
    [l, o, w, </w>]. The marker is what lets BPE distinguish suffixes
    from prefixes ('est</w>' vs 'est')."""
    chars = F.transform(
        F.sequence(F.lit(1), F.length(word)), lambda i: F.substring(word, i, 1)
    )
    return F.concat(chars, F.array(F.lit(END_OF_WORD)))


def _apply_merge(syms: Column, a: str, b: str) -> Column:
    """Greedy left-to-right merge of every adjacent (a, b) into a+b —
    the published replacement rule — as one sequential fold (map-side,
    no shuffle). The skip flag consumes the right half of a just-merged
    pair so overlapping occurrences ('aaa' with merge (a,a)) merge
    left-first, matching the reference algorithm."""
    merged = F.lit(a + b)
    init = F.struct(
        F.array().cast("array<string>").alias("out"), F.lit(False).alias("skip")
    )

    def step(acc: Column, i: Column) -> Column:
        cur = F.element_at(syms, i)
        # try_element_at, NOT element_at: at the last symbol i+1 is past
        # the array end, and when cur == a the conjunction below must
        # evaluate nxt — under Spark 4's default ANSI mode element_at
        # would throw (reproduced with a merge whose left symbol is the
        # end-of-word marker); try_element_at yields NULL and the
        # isNotNull guard declines the merge.
        nxt = F.try_element_at(syms, i + 1)
        take = (
            (~acc["skip"])
            & (cur == F.lit(a))
            & nxt.isNotNull()
            & (nxt == F.lit(b))
        )
        out = (
            F.when(acc["skip"], acc["out"])
            .when(take, F.concat(acc["out"], F.array(merged)))
            .otherwise(F.concat(acc["out"], F.array(cur)))
        )
        skip = F.when(acc["skip"], F.lit(False)).otherwise(take)
        return F.struct(out.alias("out"), skip.alias("skip"))

    return F.aggregate(
        F.sequence(F.lit(1), F.size(syms)), init, step, lambda acc: acc["out"]
    )


def bpe_learn(
    word_freqs: DataFrame,
    num_merges: int,
    checkpoint_every: int = 4,
) -> "list[tuple[str, str, int]]":
    """Learn `num_merges` merges from a (word, freq) table. Returns the
    ordered merge list [(left, right, pair_count), ...]; stops early
    when no adjacent pair remains.

    Tie-break: (count DESC, left ASC, right ASC) — deterministic and
    engine-portable."""
    words = word_freqs.select(
        "freq", _initial_symbols(F.col("word")).alias("syms")
    ).localCheckpoint(eager=True)
    merges: list[tuple[str, str, int]] = []
    for round_no in range(num_merges):
        # Words fully merged to ONE symbol have no adjacent pairs; for
        # them sequence(1, size-1) would be the DESCENDING [1, 0] and
        # element_at(syms, 0) throws under Spark 4 ANSI mode (reproduced:
        # corpus 'a a a a b' aborts on round 2 once (a,'</w>') merges).
        # The size>1 guard yields an empty pair array instead, which
        # explode drops — and makes the no-pairs-remain early stop below
        # actually reachable.
        pairs = (
            words.select(
                "freq",
                F.explode(
                    F.when(
                        F.size(F.col("syms")) > 1,
                        F.transform(
                            F.sequence(F.lit(1), F.size(F.col("syms")) - 1),
                            lambda i: F.struct(
                                F.element_at(F.col("syms"), i).alias("a"),
                                F.element_at(F.col("syms"), i + 1).alias("b"),
                            ),
                        ),
                    ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
                ).alias("p"),
            )
            .groupBy(F.col("p")["a"].alias("a"), F.col("p")["b"].alias("b"))
            .agg(F.sum("freq").alias("n"))
        )
        top = pairs.orderBy(F.desc("n"), F.asc("a"), F.asc("b")).limit(1).collect()
        if not top:
            break
        a, b, n = top[0]["a"], top[0]["b"], int(top[0]["n"])
        merges.append((a, b, n))
        words = words.select("freq", _apply_merge(F.col("syms"), a, b).alias("syms"))
        # truncate lineage so round N doesn't replay rounds 1..N-1;
        # amortized every few rounds — each checkpoint materializes the
        # word table, so per-round checkpointing doubles small-round
        # cost for no asymptotic gain
        if (round_no + 1) % checkpoint_every == 0:
            words = words.localCheckpoint(eager=True)
    return merges


def _segment_word(word: str, merges: "list[tuple[str, str]]") -> "list[str]":
    """Pure-Python replay of _apply_merge over the full merge list:
    greedy left-first replacement per merge, in merge order — the same
    semantics the expression fold implements and tests/test_bpe.py's
    reference pins."""
    syms: list[str] = list(word) + [END_OF_WORD]
    for a, b in merges:
        if len(syms) == 1:
            break
        out: list[str] = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def bpe_segment_arrow(
    docs: DataFrame, id_col: str, text_col: str, merges: "list[tuple[str, str, int]]"
) -> DataFrame:
    """The SCALE path for large merge lists: constant plan depth however
    many merges. Tokenization stays JVM-side (explode); the merge
    application runs as an Arrow-batched mapInPandas with a per-batch
    memo over distinct tokens (natural-language batches repeat words
    heavily, so each distinct word segments once per batch).

    bpe_segment's expression-fold variant builds one plan node per
    merge — ideal for small corpus-statistics runs (fully JVM-side,
    whole-stage codegen) but unplannable at real vocab sizes (a 32k-
    merge list would be a 32k-deep expression tree). This variant is
    what a 100 TB tokenization pass uses; semantics are identical
    (pinned equal on the test corpus, tests/test_bpe.py)."""
    from pyspark.sql import types as T

    tok = docs.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("token")
    )
    schema = T.StructType(
        [
            tok.schema[id_col],
            T.StructField("token", T.StringType()),
            T.StructField("pieces", T.ArrayType(T.StringType())),
        ]
    )
    ms = [(a, b) for a, b, *_ in merges]

    def _seg(batches):
        for pdf in batches:
            memo: dict = {}
            pdf = pdf.copy()

            def _memo_seg(w):
                # identity-safe memo: `get(w) or setdefault(...)` would
                # recompute on falsy cached values (e.g. an empty list)
                if w not in memo:
                    memo[w] = _segment_word(w, ms)
                return memo[w]

            pdf["pieces"] = [_memo_seg(w) for w in pdf["token"]]
            yield pdf

    return tok.mapInPandas(_seg, schema)


def bpe_segment(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    merges: "list[tuple[str, str, int]]",
    max_expr_merges: int = 64,
) -> DataFrame:
    """Apply a learned merge list to fresh text: (id, token, pieces
    array<string>).

    Engine choice: up to `max_expr_merges` merges, one expression-fold
    plan node per merge (JVM-side, codegen — right for the corpus-
    statistics use); beyond that, the plan tree would grow unplannably
    deep, so it routes to bpe_segment_arrow (constant-depth, Arrow-
    batched Python with per-batch token memoization — the path a real
    32k-merge vocab takes). Semantics are identical in both engines."""
    if len(merges) > max_expr_merges:
        return bpe_segment_arrow(docs, id_col, text_col, merges)
    out = docs.select(
        F.col(id_col),
        F.explode(tokens(F.col(text_col))).alias("token"),
    ).withColumn("pieces", _initial_symbols(F.col("token")))
    for a, b, _ in merges:
        out = out.withColumn("pieces", _apply_merge(F.col("pieces"), a, b))
    return out


def export_merges(merges: "list[tuple[str, str, int]]") -> str:
    """Serialize a learned merge list in the interchange form real
    tokenizer runtimes consume — one "left right" pair per line in
    merge order (the format Sennrich's subword-nmt writes and
    HuggingFace tokenizers' BPE reads as merges.txt; counts are
    training diagnostics and deliberately excluded). The per-request
    tokenization path belongs in a serving runtime; this engine's job
    is learning the merges at corpus scale and handing them off —
    applying them in-engine (bpe_segment) is for corpus statistics."""
    return "".join(f"{a} {b}\n" for a, b, _ in merges)


def import_merges(text: str) -> "list[tuple[str, str, int]]":
    """Inverse of export_merges (counts restored as 0 — they are not
    part of the interchange form). Blank lines and '#version'-style
    comment headers are skipped, matching what merges.txt consumers
    accept."""
    out: list[tuple[str, str, int]] = []
    for line in text.splitlines():
        line = line.rstrip("\n")
        if not line or line.startswith("#"):
            continue
        a, sep, b = line.partition(" ")
        if not sep:
            raise ValueError(f"malformed merge line: {line!r}")
        out.append((a, b, 0))
    return out
