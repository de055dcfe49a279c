"""Full-text keyword search: BM25-scored top-k retrieval over the
`documents` table — the lexical half of a retrieval stack (the ANN
operators in `similarity.py` are the dense half). A training-data
pipeline needs this both for corpus exploration ("show me documents
about X") and for retrieval-based decontamination beyond exact n-gram
overlap.

Spark-first shape (per stage, with the 100 TB rationale):

1. **Filter before you count.** The query's terms are a handful of
   literals, so the (doc, term) term-frequency table is built from a
   token explode filtered by `isin(terms)` *before* any aggregation —
   at 100 TB the explode's output is pruned to matching tokens inside
   the same whole-stage-codegen pass that produced them; nothing
   off-query ever shuffles.
2. **Document lengths are a separate cheap aggregate** over the same
   pruned (id, text) scan — `size(tokens)` is map-side; the per-doc
   row is one long.
3. **Corpus stats (N, total length) collapse to ONE row**; document
   frequencies per query term collapse to ≤|terms| rows. Both sides of
   the scoring join are broadcast — the per-doc score assembly is a
   broadcast-hash join with zero shuffle of the corpus-sized side.
4. **Top-k is orderBy().limit(k)** — Spark plans TakeOrderedAndProject
   (per-partition heap, single k-row merge), never a global sort.

Determinism (oracle hash-parity): BM25 is a sum of per-term doubles,
and float addition is order-sensitive, so each per-(doc, term) score is
rounded to micro-units and cast to BIGINT *before* the per-doc sum —
integer addition is associative, so the aggregate is bit-stable under
any shuffle order, in Spark and DuckDB alike. The ≤1e-6 per-term
quantization is documented API behavior, not an accident.

Reference parity note: the reference has no search surface (it is an
ingest Lambda); this extends SURVEY.md §2.9's pipeline operators the
same way the ANN/dedup family does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ds_caselaw_ingester_spark.operators.textstats import tokens

_MICRO = 1000000.0


def _bm25_corpus_frames(docs, id_col, text_col, term_prune):
    """(dl, stats, tf, df_t) — the query-independent corpus side shared
    by the single- and multi-query BM25 forms (ONE implementation: the
    determinism contract requires the two forms' expressions to stay
    token-for-token identical with the DuckDB oracles, so there is
    exactly one copy to keep in sync).

    NULL-text rows are excluded from the CORPUS, not just from
    matching: size(tokens(NULL)) is NULL, so without the filter
    count(*) would include such a doc in n_docs while sum(dl) skipped
    it — idf/avgdl must see one consistent corpus (the oracle excludes
    NULL text from both).

    dl is a materialized SLIM frame (two longs per doc): one tokenize
    pass serves both the corpus-stats row and the scoring join-back.
    This replaces the original design that rode `dl` through the
    explode's groupBy key — there, CollapseProject inlined
    size(tokens(text)) PAST the Generate and the regex tokenizer re-ran
    per TOKEN row: measured 32.3 s of a 33.8 s query at sf10 vs 7.9 s
    for this shape (BENCH_SF1.md r8). The checkpoint is 16 bytes/doc.

    term_prune: maps the exploded (doc_id, token) frame to its pruned
    form — isin(terms) for the single-query form, a broadcast join
    against the union of all queries' terms for the multi-query form.
    tf is localCheckpointed: it has two consumers (the df_t build and
    the scoring join) and is match-bounded."""
    base = docs.where(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("_text")
    )
    tok = tokens(F.col("_text"))
    # LAZY checkpoint (optimization round 14): dl is deterministic, so
    # unlike qterms (see bm25_topk_queries) nothing requires it pinned
    # BEFORE the scoring join observes it — the eager variant only
    # bought a dedicated scheduling round-trip per invocation. The
    # first consumer (the stats agg or the scoring join, whichever the
    # scheduler reaches first) materializes the slim (doc_id, dl) rows
    # and every other consumer reads the pinned copy, so the
    # one-tokenize-pass property that motivated the checkpoint
    # (BENCH_SF1.md r8: 32.3 s -> 7.9 s) is unchanged.
    dl = base.select("doc_id", F.size(tok).alias("dl")).localCheckpoint(
        eager=False
    )
    stats = dl.agg(F.count("*").alias("n_docs"), F.sum("dl").alias("total_dl"))
    tf = (
        term_prune(base.select("doc_id", F.explode(tok).alias("token")))
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint(eager=True)
    )
    df_t = tf.groupBy("token").agg(F.count("*").alias("df"))
    return dl, stats, tf, df_t


def _bm25_micro_score(k1: float, b: float):
    """The per-(doc, term) micro-rounded BIGINT score expression —
    expression order mirrors the DuckDB oracle token-for-token so the
    IEEE double sequence is identical on both sides; integer partials
    make the per-doc sum shuffle-order-stable."""
    avgdl = F.col("total_dl") / F.col("n_docs")
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    denom = F.col("tf") + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * (F.col("dl") / avgdl)
    )
    term_score = (idf * (F.col("tf") * F.lit(k1 + 1.0))) / denom
    return F.round(term_score * F.lit(_MICRO), 0).cast("long")


def bm25_topk(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    terms: list[str],
    k: int,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k documents for a bag-of-terms query under BM25
    (Robertson/Sparck-Jones idf: ln(1 + (N - df + 0.5)/(df + 0.5))).

    Returns (doc_id, score, rank) with rank 1..k ordered by
    (score DESC, doc_id ASC); only documents containing at least one
    query term are candidates. `score` is the micro-rounded per-term
    sum (see module docstring).
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    if not terms:
        raise ValueError("terms must be non-empty")
    if len(set(terms)) != len(terms):
        raise ValueError("terms must be distinct")

    dl, stats, tf, df_t = _bm25_corpus_frames(
        docs, id_col, text_col,
        lambda exploded: exploded.where(F.col("token").isin(terms)),
    )
    # dl ⋈ tf is deliberately hint-free: tf is match-bounded, so AQE
    # broadcasts it for any selective query and the corpus-sized dl
    # frame never shuffles; a pathological stop-word query degrades to
    # a shuffle join of two slim long columns, not an explode blowup.
    scored = (
        dl.join(tf, "doc_id")
        .join(F.broadcast(df_t), "token")
        .join(F.broadcast(stats))
    )
    micro = _bm25_micro_score(k1, b)
    per_doc = scored.groupBy("doc_id").agg(
        (F.sum(micro) / F.lit(_MICRO)).alias("score")
    )
    topk = per_doc.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    # Rank over the ≤k surviving rows only — the single-partition window
    # touches k rows, never the corpus.
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return topk.select(
        "doc_id", "score", F.row_number().over(w).alias("rank")
    )


def _bm25_base_ctes_sql(tf_pred: str) -> str:
    """The query-independent CTE block (tok/dl/alldl/stats/tf/dft)
    shared by both BM25 oracles — one copy, mirroring
    _bm25_corpus_frames expression-for-expression. tf_pred: the SQL
    predicate pruning tokens to query terms."""
    return f"""tok AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS token
  FROM documents
),
dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
alldl AS (SELECT doc_id, 0 AS dl FROM documents WHERE trim(text) = ''
          UNION ALL SELECT doc_id, dl FROM dl),
stats AS (SELECT count(*) AS n_docs, sum(dl) AS total_dl FROM alldl),
tf AS (
  SELECT doc_id, token, count(*) AS tf
  FROM tok WHERE {tf_pred}
  GROUP BY doc_id, token
),
dft AS (SELECT token, count(*) AS df FROM tf GROUP BY token)"""


def _bm25_micro_sql(k1: float, b: float) -> str:
    """The per-(doc, term) micro BIGINT expression both oracles sum —
    one copy, mirroring _bm25_micro_score token-for-token."""
    return (
        "CAST(round("
        "(ln(1.0 + (s.n_docs - dft.df + 0.5) / (dft.df + 0.5))"
        f" * (tf.tf * {k1 + 1.0!r}))"
        f" / (tf.tf + {k1!r} * ({1.0 - b!r} + {b!r}"
        " * (d.dl / (s.total_dl / s.n_docs))))"
        f" * {_MICRO!r}, 0) AS BIGINT)"
    )


def bm25_oracle_sql(
    terms: list[str], k: int, k1: float = 1.2, b: float = 0.75
) -> str:
    """DuckDB oracle mirroring `bm25_topk` expression-for-expression
    (micro-rounded per-term scores summed as BIGINT)."""
    quoted = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
    return f"""
WITH {_bm25_base_ctes_sql(f"token IN ({quoted})")},
per_term AS (
  SELECT tf.doc_id, {_bm25_micro_sql(k1, b)} AS micro
  FROM tf
  JOIN dft USING (token)
  JOIN alldl d USING (doc_id)
  CROSS JOIN stats s
)
SELECT doc_id, sum(micro) / {_MICRO!r} AS score,
       row_number() OVER (ORDER BY sum(micro) / {_MICRO!r} DESC, doc_id ASC) AS rank
FROM per_term
GROUP BY doc_id
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""


def rrf_fuse(
    ranked_lists: "list[DataFrame]",
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k: int = 10,
    rrf_k: int = 60,
    query_col: "str | None" = None,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009, SIGIR — the
    published formula: score(d) = sum over lists of 1/(rrf_k + rank_d))
    — the standard way to combine the lexical (bm25_topk) and dense
    (cosine/LSH/IVF/PQ top-k) halves of a retrieval stack without
    score calibration: ranks are comparable across scorers, raw scores
    are not.

    Each input frame needs (id_col, rank_col); with query_col=None the
    inputs MUST be single-query ranked lists (one global ranking each —
    bm25_topk's shape). Multi-query shortlists — the (q_id, doc_id,
    rank) frames the per-query ANN operators emit — MUST pass
    query_col: the fusion then partitions by query, returning the top-k
    PER QUERY. Passing a multi-query frame without query_col would sum
    reciprocal ranks across unrelated queries into one meaningless
    list (ADVICE r7), so the query_col=None path validates its inputs:
    a duplicated rank within one input raises. (The per-query path does
    not re-validate — its inputs are the repo's own per-query top-k
    frames, rank-unique by construction.)

    Documents absent from a list contribute nothing for it (the
    standard convention). Scale shape: the inputs are already
    top-k-sized (k rows per query per scorer), so the union + groupBy
    moves k x |queries| x |lists| rows — fusion cost is bounded by the
    SHORTLISTS, never the corpus; determinism comes from integer
    micro-rounding of the per-list reciprocal before the sum (the
    repo's order-stable float convention) and the id tie-break.

    Returns (id_col, rrf_score, rank) — plus query_col when given —
    with rank 1..k (per query)."""
    from pyspark.sql import Window

    if not ranked_lists:
        raise ValueError("ranked_lists must be non-empty")
    if rrf_k <= 0:
        raise ValueError(f"rrf_k must be positive, got {rrf_k}")
    group = [query_col, id_col] if query_col else [id_col]
    slim = []
    for i, df in enumerate(ranked_lists):
        s = df.select(
            *([F.col(query_col)] if query_col else []),
            F.col(id_col),
            F.col(rank_col).alias("_r"),
        )
        if query_col is None:
            # a rank appearing twice within one list is the
            # multi-query-frame-without-query_col misuse — fail loudly
            # instead of fusing garbage. Materialize the slim shortlist
            # first (it is ≤ k rows by contract) so the check and the
            # fusion share one upstream scan. A MISUSED corpus-sized
            # frame does get materialized before the error — bounded by
            # executor disk, not memory (localCheckpoint persists
            # MEMORY_AND_DISK) — the price of not double-running every
            # correct caller's scorer.
            s = s.localCheckpoint(eager=True)
            dup = (
                s.groupBy("_r").count().where(F.col("count") > 1).limit(1).collect()
            )
            if dup:
                raise ValueError(
                    f"rrf_fuse: input {i} has a duplicated rank "
                    f"({dup[0]['_r']}) — a multi-query shortlist must be "
                    "fused with query_col set"
                )
        slim.append(s)
    both = slim[0]
    for s in slim[1:]:
        both = both.unionByName(s)
    micro = F.round(
        (F.lit(1.0) / (F.lit(float(rrf_k)) + F.col("_r"))) * F.lit(_MICRO), 0
    ).cast("long")
    fused = both.groupBy(*group).agg(
        (F.sum(micro) / F.lit(_MICRO)).alias("rrf_score")
    )
    if query_col:
        # per-query top-k: rank within the query partition, then keep k.
        # The window moves |queries| x k x |lists| rows — shortlist-sized.
        w = Window.partitionBy(query_col).orderBy(
            F.desc("rrf_score"), F.asc(id_col)
        )
        return (
            fused.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select(query_col, id_col, "rrf_score", "rank")
        )
    topk = fused.orderBy(F.desc("rrf_score"), F.asc(id_col)).limit(k)
    w = Window.orderBy(F.desc("rrf_score"), F.asc(id_col))
    return topk.select(
        id_col, "rrf_score", F.row_number().over(w).alias("rank")
    )


def bm25_topk_queries(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    queries: DataFrame,
    q_id_col: str = "q_id",
    terms_col: str = "terms",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 top-k PER QUERY from a queries TABLE — the multi-query form
    of bm25_topk, emitting the (q_id, doc_id, rank) shape the per-query
    ANN operators emit and rrf_fuse(query_col=...) fuses.

    queries: (q_id_col, terms_col array<string>). Duplicate terms
    within a query are deduplicated (a repeated term must not
    double-count its score — same rule as bm25_topk's distinct-terms
    precondition, enforced here instead of raised).

    One corpus pass serves every query: the token explode is pruned by
    a broadcast join against the UNION of all queries' terms (the
    multi-query analog of the isin prune — nothing off-query shuffles),
    and tf / df / dl / the corpus-stats row are all query-independent,
    so adding queries adds only the final broadcast join of the tiny
    (q_id, token) frame and a per-query rank window over match-bounded
    rows. Scores are micro-rounded per (doc, term) and summed as
    integers (order-stable, engine-exact vs DuckDB).

    Returns (q_id, doc_id, score, rank), rank 1..k per query by
    (score DESC, doc_id ASC).
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    # qterms has two consumers (the prune and the scoring join), and they
    # MUST observe the same evaluation: a caller may pass a
    # nondeterministic queries frame (a sample(), a rand() filter), and
    # terms visible only to the scoring join would already be pruned out
    # of tf/df_t — scores silently wrong. A LAZY localCheckpoint pins one
    # evaluation without the eager variant's dedicated job (round-13: the
    # eager checkpoint's extra scheduling round-trip was a measurable
    # slice of hybrid_search_multi's warm-up tail, docs/SCALE.md): the
    # first action that computes it — the tf checkpoint's broadcast of
    # all_terms — persists the RDD, and the scoring join reads the pinned
    # rows.
    qterms = (
        queries.select(
            F.col(q_id_col).alias("q_id"),
            F.explode(F.col(terms_col)).alias("token"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    all_terms = qterms.select("token").distinct()

    dl, stats, tf, df_t = _bm25_corpus_frames(
        docs, id_col, text_col,
        lambda exploded: exploded.join(F.broadcast(all_terms), "token"),
    )
    scored = (
        dl.join(tf, "doc_id")
        .join(F.broadcast(df_t), "token")
        .join(F.broadcast(qterms), "token")
        .join(F.broadcast(stats))
    )
    micro = _bm25_micro_score(k1, b)
    per_doc = scored.groupBy("q_id", "doc_id").agg(
        (F.sum(micro) / F.lit(_MICRO)).alias("score")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("q_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        per_doc.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "doc_id", "score", "rank")
    )


def bm25_queries_oracle_sql(
    k: int, k1: float = 1.2, b: float = 0.75, queries_cte: str = "queries"
) -> str:
    """DuckDB oracle for bm25_topk_queries: expects a CTE/view named
    `queries_cte` with (q_id, token) rows (already exploded+distinct),
    sharing the single-query oracle's CTE block and micro expression."""
    base = _bm25_base_ctes_sql(
        f"token IN (SELECT token FROM {queries_cte})"
    )
    return f"""
WITH {base},
per_term AS (
  SELECT q.q_id, tf.doc_id, {_bm25_micro_sql(k1, b)} AS micro
  FROM tf
  JOIN dft USING (token)
  JOIN alldl d USING (doc_id)
  JOIN {queries_cte} q USING (token)
  CROSS JOIN stats s
)
SELECT q_id, doc_id, score, rank FROM (
  SELECT q_id, doc_id, sum(micro) / {_MICRO!r} AS score,
         row_number() OVER (PARTITION BY q_id
                            ORDER BY sum(micro) / {_MICRO!r} DESC, doc_id ASC) AS rank
  FROM per_term
  GROUP BY q_id, doc_id
) WHERE rank <= {k}
"""
