"""Similarity-search + multimodal queries (SURVEY.md §2.9) over the
`embeddings` and `documents` tables."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ds_caselaw_ingester_spark.operators.multimodal import extract_asset_metadata
from ds_caselaw_ingester_spark.operators.similarity import (
    ann_lsh_topk,
    cosine_topk,
    lsh_bucket,
)
from ds_caselaw_ingester_spark.plans.registry import register
from ds_caselaw_ingester_spark.session import ensure_oracle_safe
from ds_caselaw_ingester_spark.sources.catalog import table

# ---------------------------------------------------------------------------
# cosine_topk — brute-force exact ANN baseline
# ---------------------------------------------------------------------------

COSINE_TOPK_ORACLE = """
WITH q AS (
  SELECT vec_id AS q_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 8
),
c AS (
  SELECT vec_id AS c_id, embedding::DOUBLE[] AS cv FROM embeddings
),
scored AS (
  SELECT q_id, c_id,
         round(list_dot_product(qv, cv)
               / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))),
               4) AS cosine
  FROM c CROSS JOIN q
  WHERE q_id <> c_id
)
SELECT * FROM (
  SELECT q_id, c_id, cosine,
         row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id ASC) AS rank
  FROM scored
) WHERE rank <= 10
"""


@register(
    "cosine_topk",
    COSINE_TOPK_ORACLE,
    doc="Exact cosine top-10 for 8 query vectors: broadcast queries × "
    "streamed candidates, sequential-fold dot product, rank on rounded "
    "cosine with id tie-break.",
    survey_ops=("ext:ann-brute",),
)
def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_oracle_safe(spark)
    emb = table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qv")
    )
    candidates = emb.select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("cv"))
    return cosine_topk(queries, candidates, k=10, round_digits=4)


# ---------------------------------------------------------------------------
# ann_lsh_topk — LSH-bucketed approximate ANN (the scale path)
# ---------------------------------------------------------------------------

ANN_LSH_ORACLE = """
WITH base AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
),
planes AS (SELECT unnest(generate_series(0, 7)) AS p),
dims AS (SELECT unnest(generate_series(1, 64)) AS i),
proj AS (
  SELECT b.vec_id, pl.p,
         sum(list_extract(b.v, d.i)
             * (CASE WHEN substr(md5(CAST(pl.p AS VARCHAR) || '_' || CAST(d.i AS VARCHAR)), 1, 1)
                      IN ('8','9','a','b','c','d','e','f') THEN 1.0 ELSE -1.0 END)) AS s
  FROM base b CROSS JOIN planes pl CROSS JOIN dims d
  GROUP BY b.vec_id, pl.p
),
buckets AS (
  SELECT vec_id,
         string_agg(CASE WHEN s > 0 THEN '1' ELSE '0' END, '' ORDER BY p) AS bucket
  FROM proj GROUP BY vec_id
),
q AS (
  SELECT b.vec_id AS q_id, base.v AS qv, b.bucket
  FROM buckets b JOIN base USING (vec_id) WHERE vec_id < 8
),
c AS (
  SELECT b.vec_id AS c_id, base.v AS cv, b.bucket
  FROM buckets b JOIN base USING (vec_id)
),
scored AS (
  SELECT q.q_id, c.c_id,
         round(list_dot_product(q.qv, c.cv)
               / (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(c.cv, c.cv))),
               4) AS cosine
  FROM c JOIN q ON c.bucket = q.bucket
  WHERE q.q_id <> c.c_id
)
SELECT * FROM (
  SELECT q_id, c_id, cosine,
         row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id ASC) AS rank
  FROM scored
) WHERE rank <= 10
"""


@register(
    "ann_lsh_topk",
    ANN_LSH_ORACLE,
    doc="Approximate top-10: 8 md5-derived random hyperplanes -> sign-bit "
    "bucket -> equi-join inside buckets only (candidate set shrinks "
    "~2^8-fold at scale).",
    survey_ops=("ext:ann-lsh",),
)
def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_oracle_safe(spark)
    emb = table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qv")
    )
    candidates = emb.select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("cv"))
    return ann_lsh_topk(queries, candidates, k=10, num_planes=8, round_digits=4)


# ---------------------------------------------------------------------------
# embedding_buckets — LSH bucket assignment + occupancy (always non-empty)
# ---------------------------------------------------------------------------

EMB_BUCKETS_ORACLE = """
WITH base AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
),
planes AS (SELECT unnest(generate_series(0, 7)) AS p),
dims AS (SELECT unnest(generate_series(1, 64)) AS i),
proj AS (
  SELECT b.vec_id, pl.p,
         sum(list_extract(b.v, d.i)
             * (CASE WHEN substr(md5(CAST(pl.p AS VARCHAR) || '_' || CAST(d.i AS VARCHAR)), 1, 1)
                      IN ('8','9','a','b','c','d','e','f') THEN 1.0 ELSE -1.0 END)) AS s
  FROM base b CROSS JOIN planes pl CROSS JOIN dims d
  GROUP BY b.vec_id, pl.p
),
buckets AS (
  SELECT vec_id,
         string_agg(CASE WHEN s > 0 THEN '1' ELSE '0' END, '' ORDER BY p) AS bucket
  FROM proj GROUP BY vec_id
)
SELECT bucket, count(*) AS n_vectors, min(vec_id) AS min_vec_id
FROM buckets GROUP BY bucket
"""


@register(
    "embedding_buckets",
    EMB_BUCKETS_ORACLE,
    doc="LSH bucket occupancy: the partitioning histogram that sizes the "
    "ANN candidate sets (skew here = skewed ANN work).",
    survey_ops=("ext:ann-lsh",),
)
def q_embedding_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_oracle_safe(spark)
    emb = table(spark, sf_dir, "embeddings")
    b = emb.select(F.col("vec_id"), lsh_bucket(F.col("embedding"), 8).alias("bucket"))
    return b.groupBy("bucket").agg(
        F.count("*").alias("n_vectors"), F.min("vec_id").alias("min_vec_id")
    )


# ---------------------------------------------------------------------------
# multimodal_meta — binary column + mapInPandas decode-stub plumbing
# ---------------------------------------------------------------------------

MULTIMODAL_ORACLE = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
       CAST(ascii(substr(text, 1, 1)) AS INTEGER) AS first_byte,
       CAST(octet_length(encode(text)) % 997 AS INTEGER) AS fake_width,
       CAST((octet_length(encode(text)) * 31 + ascii(substr(text, 1, 1))) % 997 AS INTEGER) AS fake_height,
       CAST(ascii(substr(text, 1, 1)) % 4 + 1 AS INTEGER) AS fake_channels
FROM documents
"""


@register(
    "multimodal_meta",
    MULTIMODAL_ORACLE,
    doc="Opaque-binary multimodal path: text->bytes as the stand-in asset, "
    "metadata extracted via Arrow-batched mapInPandas (decode kernel "
    "stubbed; plumbing real — see operators/multimodal.py).",
    survey_ops=("ext:multimodal", "K6", "K9"),
)
def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_oracle_safe(spark)
    d = table(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("content")
    )
    return extract_asset_metadata(d, "doc_id", "content")


# ---------------------------------------------------------------------------
# ann_ivf_topk — IVF (inverted-file) ANN: centroid cells + nprobe search
# ---------------------------------------------------------------------------

ANN_IVF_ORACLE = """
WITH cent AS (
  SELECT vec_id AS centroid_id, embedding::DOUBLE[] AS cvec
  FROM embeddings WHERE vec_id >= 8 AND vec_id < 24
),
c AS (SELECT vec_id AS c_id, embedding::DOUBLE[] AS cv FROM embeddings),
q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 8),
cand_assign AS (
  SELECT c_id, cv, centroid_id FROM (
    SELECT c_id, cv, centroid_id,
           row_number() OVER (
             PARTITION BY c_id
             ORDER BY round(list_dot_product(cv, cvec)
                            / (sqrt(list_dot_product(cv, cv)) * sqrt(list_dot_product(cvec, cvec))), 4) DESC,
                      centroid_id ASC) AS crn
    FROM c CROSS JOIN cent
  ) WHERE crn <= 1
),
q_assign AS (
  SELECT q_id, qv, centroid_id FROM (
    SELECT q_id, qv, centroid_id,
           row_number() OVER (
             PARTITION BY q_id
             ORDER BY round(list_dot_product(qv, cvec)
                            / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cvec, cvec))), 4) DESC,
                      centroid_id ASC) AS crn
    FROM q CROSS JOIN cent
  ) WHERE crn <= 2
),
scored AS (
  SELECT q_id, c_id,
         round(list_dot_product(qv, cv)
               / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))), 4) AS cosine
  FROM cand_assign ca JOIN q_assign qa USING (centroid_id)
  WHERE q_id <> c_id
)
SELECT * FROM (
  SELECT q_id, c_id, cosine,
         row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id ASC) AS rank
  FROM scored
) WHERE rank <= 10
"""


@register(
    "ann_ivf_topk",
    ANN_IVF_ORACLE,
    doc="IVF ANN: 16 deterministic centroid cells, candidates assigned to "
    "their nearest cell (broadcast centroids, map-side), queries probe "
    "nprobe=2 cells via centroid_id equi-join; top-10 per query on rounded "
    "cosine. The stored-index scale path alongside LSH bucketing.",
    survey_ops=("ext:ann-ivf",),
)
def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ds_caselaw_ingester_spark.operators.similarity import ivf_topk

    ensure_oracle_safe(spark)
    emb = table(spark, sf_dir, "embeddings")
    centroids = emb.where((F.col("vec_id") >= 8) & (F.col("vec_id") < 24)).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("cvec")
    )
    queries = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qv")
    )
    candidates = emb.select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("cv"))
    return ivf_topk(queries, candidates, centroids, k=10, nprobe=2)
