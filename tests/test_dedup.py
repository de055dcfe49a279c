

def test_lsh_collision_curve_and_band_planner():
    """The S-curve math the banding design rests on: monotone in s,
    steep near the implied threshold, and the planner recovers the
    engine's 16-hash default and prefers recall on ties."""
    from ds_caselaw_ingester_spark.operators.dedup import (
        lsh_collision_probability,
        plan_lsh_bands,
    )

    # monotone, with the boundary values exact
    probs = [lsh_collision_probability(s / 10, 4, 4) for s in range(11)]
    assert probs == sorted(probs)
    assert probs[0] == 0.0 and probs[-1] == 1.0
    # the implied threshold (1/4)^(1/4) ~ 0.707: well below it the pair
    # is nearly never a candidate, well above nearly always
    assert lsh_collision_probability(0.4, 4, 4) < 0.1
    assert lsh_collision_probability(0.9, 4, 4) > 0.95
    # the registered pipeline's configuration is what the planner picks
    assert plan_lsh_bands(16, 0.7) == (4, 4)
    # lower threshold -> more bands (recall); higher -> more rows
    b_lo, r_lo = plan_lsh_bands(16, 0.3)
    b_hi, r_hi = plan_lsh_bands(16, 0.95)
    assert b_lo > 4 and r_hi > 4
    import pytest

    with pytest.raises(ValueError):
        plan_lsh_bands(16, 1.5)
    with pytest.raises(ValueError):
        lsh_collision_probability(-0.1, 4, 4)


def test_incremental_lsh_matches_full_recompute(spark, sf_dir):
    """Splitting the corpus into base + increment and probing the band
    index must find EXACTLY the full-recompute pairs that touch an
    increment document — plus, chaining two increments reproduces the
    full pair set."""
    from ds_caselaw_ingester_spark.operators.dedup import (
        doc_shingles,
        incremental_lsh_pairs,
        lsh_bands,
        lsh_candidate_pairs,
        minhash_signatures,
    )
    from ds_caselaw_ingester_spark.sources.catalog import spread, table

    from pyspark.sql import functions as F

    corpus = spread(
        table(spark, sf_dir, "documents").select("doc_id", "text"), "doc_id"
    )

    def bands_of(df):
        return lsh_bands(minhash_signatures(doc_shingles(df, "doc_id", "text"), "doc_id"), "doc_id")

    full_pairs = {
        (r["doc_a"], r["doc_b"])
        for r in lsh_candidate_pairs(bands_of(corpus), "doc_id").collect()
    }
    base = corpus.where(F.col("doc_id") % 3 != 0)
    inc = corpus.where(F.col("doc_id") % 3 == 0)
    index = bands_of(base)
    pairs, updated = incremental_lsh_pairs(index, bands_of(inc), "doc_id")
    got = {(r["doc_a"], r["doc_b"]) for r in pairs.collect()}

    inc_ids = {r["doc_id"] for r in inc.select("doc_id").collect()}
    want = {p for p in full_pairs if p[0] in inc_ids or p[1] in inc_ids}
    assert got == want
    assert want, "increment must actually touch some pairs"
    # base-only pairs were NOT recomputed (cost tracks the increment)
    assert all(p[0] in inc_ids or p[1] in inc_ids for p in got)
    # the updated index is complete: probing an empty increment later
    # finds nothing, and its band set equals the full corpus's
    full_bands = bands_of(corpus)
    assert updated.count() == full_bands.count()


def test_incremental_lsh_reingest_replaces_stale_bands(spark, sf_dir):
    """Review finding pinned: re-ingesting an id with CHANGED text must
    supersede its old index rows — the updated index holds exactly one
    version per id, and the probe never pairs against a dead version's
    band keys."""
    from pyspark.sql import functions as F

    from ds_caselaw_ingester_spark.operators.dedup import (
        doc_shingles,
        incremental_lsh_pairs,
        lsh_bands,
        minhash_signatures,
    )
    from ds_caselaw_ingester_spark.sources.catalog import spread, table

    corpus = spread(
        table(spark, sf_dir, "documents").select("doc_id", "text").limit(60),
        "doc_id",
    )

    def bands_of(df):
        return lsh_bands(
            minhash_signatures(doc_shingles(df, "doc_id", "text"), "doc_id"),
            "doc_id",
        )

    index = bands_of(corpus)
    # re-ingest 10 docs with rewritten text
    changed = corpus.where(F.col("doc_id") % 6 == 0).select(
        "doc_id", F.concat(F.lit("totally rewritten body now "), F.col("text")).alias("text")
    )
    pairs, updated = incremental_lsh_pairs(index, bands_of(changed), "doc_id")
    changed_ids = {r["doc_id"] for r in changed.select("doc_id").collect()}
    # one version per id: the updated index equals a fresh index over
    # the replaced corpus
    replaced = corpus.where(F.col("doc_id") % 6 != 0).unionAll(changed)
    fresh = bands_of(replaced)
    got = {tuple(r) for r in updated.collect()}
    want = {tuple(r) for r in fresh.collect()}
    assert got == want
    # and the pairs equal a full recompute over the replaced corpus,
    # restricted to pairs touching a re-ingested doc
    from ds_caselaw_ingester_spark.operators.dedup import lsh_candidate_pairs

    full = {
        (r["doc_a"], r["doc_b"])
        for r in lsh_candidate_pairs(fresh, "doc_id").collect()
    }
    want_pairs = {p for p in full if p[0] in changed_ids or p[1] in changed_ids}
    assert {(r["doc_a"], r["doc_b"]) for r in pairs.collect()} == want_pairs


def test_duplicate_spans_exact_geometry(spark):
    """Hand-built corpus pins the span algebra: a block repeated across
    two documents yields one maximal merged span per side (windows
    overlapping OR exactly adjacent must fuse — the seam case), interior
    unique text splits spans, short docs vanish, and the per-doc
    coordinates are 1-based inclusive."""
    from ds_caselaw_ingester_spark.operators.dedup import duplicate_spans

    block = " ".join(f"b{i}" for i in range(8))  # exactly one 8-gram
    docs = spark.createDataFrame(
        [
            # doc 1: block at tokens 1-8 and again at 11-18 (gap u1 u2)
            (1, block + " u1 u2 " + block),
            # doc 2: the same block once, inside unique padding
            (2, "x1 x2 x3 " + block + " y1"),
            # doc 3: fully unique, no duplicated windows
            (3, " ".join(f"z{i}" for i in range(12))),
            # doc 4: shorter than n tokens -> no grams at all
            (4, "t1 t2 t3"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r["doc_id"], r["span_start"], r["span_end"], r["span_tokens"])
        for r in duplicate_spans(docs, "doc_id", "text", n=8).collect()
    }
    assert got == {
        (1, 1, 8, 8),   # first copy of the block
        (1, 11, 18, 8), # second copy: gap 11-1=10 > 8 keeps them apart
        (2, 4, 11, 8),  # block sits at tokens 4-11 of doc 2
    }

    # Seam case: duplicated windows at positions p and p+n are exactly
    # adjacent intervals and MUST merge into one contiguous span, while
    # p and p+n+1 must NOT. doc 1 = B1B2 back-to-back: its duplicated
    # positions are exactly {1, 9} (the straddling windows 2-8 contain
    # doc-1-only token sequences), distance n -> ONE span 1-16. doc 2 =
    # B1 sep B2: duplicated positions {1, 10}, distance n+1 -> TWO
    # spans, and the seam token `sep` survives between them.
    blk2 = " ".join(f"c{i}" for i in range(8))
    docs2 = spark.createDataFrame(
        [(1, block + " " + blk2), (2, block + " sep " + blk2)],
        "doc_id long, text string",
    )
    spans2 = duplicate_spans(docs2, "doc_id", "text", n=8).collect()
    assert {
        (r["doc_id"], r["span_start"], r["span_end"]) for r in spans2
    } == {
        (1, 1, 16),
        (2, 1, 8),
        (2, 10, 17),
    }

    # min_count raises the bar: a gram seen twice stops qualifying.
    assert (
        duplicate_spans(docs2, "doc_id", "text", n=8, min_count=3).count() == 0
    )

    import pytest

    with pytest.raises(ValueError):
        duplicate_spans(docs, "doc_id", "text", n=1)
    with pytest.raises(ValueError):
        duplicate_spans(docs, "doc_id", "text", n=8, min_count=1)


def test_strip_spans_cut_geometry(spark):
    """The cut applied to the hand-built geometry corpus: covered
    tokens vanish, survivors keep their order, a fully-covered document
    comes back as the empty string (row retained), and documents with
    no spans pass through VERBATIM — including whitespace the
    tokenizer would otherwise normalize."""
    from ds_caselaw_ingester_spark.operators.dedup import (
        duplicate_spans,
        strip_spans,
    )

    block = " ".join(f"b{i}" for i in range(8))
    docs = spark.createDataFrame(
        [
            (1, block + " u1 u2 " + block),
            (2, "x1 x2 x3 " + block + " y1"),
            (3, "z0 z1  z2\tz3"),  # unique -> verbatim, odd spacing kept
            (4, block),  # exactly the block: fully covered -> ""
        ],
        "doc_id long, text string",
    )
    spans = duplicate_spans(docs, "doc_id", "text", n=8)
    got = {r["doc_id"]: r["text"] for r in strip_spans(docs, "doc_id", "text", spans).collect()}
    assert got == {
        1: "u1 u2",
        2: "x1 x2 x3 y1",
        3: "z0 z1  z2\tz3",
        4: "",
    }
