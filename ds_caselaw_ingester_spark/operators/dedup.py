"""Near-duplicate detection operators: MinHash+LSH, SimHash, n-gram
Jaccard. Spark-first design notes:

- Shingling/minhashing is explode + groupBy-min over (doc, seed) — fully
  JVM-side; the only Python is plan construction.
- The LSH band join is an equi-join on (band, band_key): Catalyst hash-
  shuffles both sides on a 16-byte key, so candidate generation never
  compares documents pairwise — O(n) + join fan-out instead of O(n²).
- Portability: hashes are md5 hex strings and "min" is lexicographic
  string-min, which is a valid uniform permutation surrogate and is
  bit-identical in any engine (no xxhash/murmur dependency).

At 100 TB: shingle rows dominate (docs × grams × seeds). Keep seeds modest
(16 here), dedup grams before the seed cross-join, and let AQE coalesce
the groupBy-min output. Banding keys are tiny; the band join broadcast-s
nothing but shuffles only (doc_id, band, 32-char key) rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ds_caselaw_ingester_spark.operators.textstats import tokens, word_ngrams

HEX_HIGH = ("8", "9", "a", "b", "c", "d", "e", "f")


def doc_shingles(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per document: (id, gram)."""
    tok = tokens(F.col(text_col))
    return (
        df.select(F.col(id_col), F.explode(word_ngrams(tok, n)).alias("gram"))
        .distinct()
    )


def minhash_signatures(shingles: DataFrame, id_col: str, num_seeds: int = 16) -> DataFrame:
    """(id, seed, mh): per-seed minhash = lexicographic min of
    md5(seed || '|' || gram).

    Plan shape: ONE wide aggregation (num_seeds min() columns in a single
    groupBy pass, all hashes computed in the same projection) then an
    unpivot — instead of exploding shingles × seeds, which would shuffle
    num_seeds× the data. At 100 TB the explode version shuffles 16× the
    shingle set; this shuffles one row of 16 columns per document.
    """
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}|"), F.col("gram")))).alias(f"mh{i}")
        for i in range(num_seeds)
    ]
    wide = shingles.groupBy(id_col).agg(*aggs)
    stack_args = ", ".join(f"{i}, mh{i}" for i in range(num_seeds))
    return wide.selectExpr(
        id_col, f"stack({num_seeds}, {stack_args}) AS (seed, mh)"
    )


def lsh_bands(signatures: DataFrame, id_col: str, rows_per_band: int = 4) -> DataFrame:
    """(id, band, band_key): md5 over the band's seed-ordered minhashes."""
    banded = signatures.withColumn("band", F.expr(f"seed div {rows_per_band}"))
    ordered = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct("seed", "mh"))), lambda x: x["mh"]
        ),
        ",",
    )
    return banded.groupBy(id_col, "band").agg(F.md5(ordered).alias("band_key"))


def lsh_candidate_pairs(bands: DataFrame, id_col: str) -> DataFrame:
    """Distinct (doc_a, doc_b) sharing at least one LSH band."""
    a = bands.select(F.col(id_col).alias("doc_a"), "band", "band_key")
    b = bands.select(F.col(id_col).alias("doc_b"), "band", "band_key")
    return (
        a.join(b, ["band", "band_key"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def estimate_jaccard(
    pairs: DataFrame, signatures: DataFrame, id_col: str, num_seeds: int = 16
) -> DataFrame:
    """Signature-agreement estimate of Jaccard for each candidate pair."""
    x = signatures.select(F.col(id_col).alias("doc_a"), "seed", F.col("mh").alias("mh_a"))
    y = signatures.select(F.col(id_col).alias("doc_b"), "seed", F.col("mh").alias("mh_b"))
    return (
        pairs.join(x, "doc_a")
        .join(y, ["doc_b", "seed"])
        .groupBy("doc_a", "doc_b")
        .agg(
            F.round(
                F.sum(F.when(F.col("mh_a") == F.col("mh_b"), 1).otherwise(0))
                / F.lit(float(num_seeds)),
                4,
            ).alias("est_jaccard")
        )
    )


def exact_jaccard_pairs(
    shingles: DataFrame, id_col: str, threshold: float, max_doc_freq: int | None = None
) -> DataFrame:
    """Exact n-gram Jaccard via inverted-index self-join on the shingle.

    sizes: |A|, |B| from per-doc counts; common from the gram join;
    jaccard = common / (|A| + |B| - common) — integer inputs, one double
    division, engine-exact.

    max_doc_freq: drop shingles appearing in more than this many documents
    from the JOIN side only (sizes still count them). The prefix-filtering
    analog: a shingle shared by thousands of documents produces a
    quadratic pair fan-out while contributing no near-dup signal — at
    100 TB the hot-shingle join IS the bottleneck, and the cap turns the
    worst key from O(df²) pairs into nothing. Pairs whose overlap is
    exclusively ultra-common shingles fall below any useful threshold
    anyway; the reported jaccard for surviving pairs is a lower bound.
    """
    sizes = shingles.groupBy(id_col).agg(F.count("*").alias("n_grams"))
    joinable = shingles
    if max_doc_freq is not None:
        gram_df = shingles.groupBy("gram").agg(F.count("*").alias("gram_df"))
        joinable = (
            shingles.join(gram_df.where(F.col("gram_df") <= max_doc_freq), "gram")
            .select(id_col, "gram")
        )
    a = joinable.select(F.col(id_col).alias("doc_a"), "gram")
    b = joinable.select(F.col(id_col).alias("doc_b"), "gram")
    common = (
        a.join(b, "gram")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("n_grams").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n_grams").alias("n_b"))
    jac = (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                4,
            ),
        )
    )
    return jac.where(F.col("jaccard") >= threshold).select(
        "doc_a", "doc_b", "n_common", "jaccard"
    )


def simhash16(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """16-bit SimHash from the first 16 hex digits of md5(token), token
    multiplicity preserved: bit_p = 1 iff sum over tokens of ±1
    (hex digit p high/low) is positive."""
    tok = df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("token"))
    hashed = tok.select(F.col(id_col), F.md5("token").alias("th"))
    bit_aggs = [
        F.when(
            F.sum(
                F.when(F.substring("th", p + 1, 1).isin(*HEX_HIGH), 1).otherwise(-1)
            )
            > 0,
            F.lit("1"),
        )
        .otherwise(F.lit("0"))
        .alias(f"b{p}")
        for p in range(16)
    ]
    bits = hashed.groupBy(id_col).agg(*bit_aggs)
    return bits.select(
        F.col(id_col), F.concat(*[F.col(f"b{p}") for p in range(16)]).alias("simhash")
    )
