"""ETL-shaped queries: the reference's operators (SURVEY.md §2) re-expressed
over the driver's relational test tables.

The reference works on messages/identifiers/documents; the driver's
deterministic tables are TPC-H-ish. Per FIXTURES.md §5, reference operators
are re-expressed over driver tables with deterministic surrogate columns:
`orders` stands in for the inbound message stream, `customer` for the
identifier index. The *logic* (join shapes, CASE ladders, cardinality
semantics) is exactly the reference's.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ds_caselaw_ingester_spark.operators.uri_cascade import (
    expected_namespace_col,
    resolve_uris,
)
from ds_caselaw_ingester_spark.plans.registry import register
from ds_caselaw_ingester_spark.session import ensure_oracle_safe
from ds_caselaw_ingester_spark.sources.catalog import table

# ---------------------------------------------------------------------------
# Flagship: URI-resolution cascade (J1-J3 + A1 + P15)
# ---------------------------------------------------------------------------

URI_CASCADE_ORACLE = """
WITH msgs AS (
  SELECT o_orderkey AS msg_id,
         CASE o_orderkey % 3 WHEN 0 THEN 'judgment'
                             WHEN 1 THEN 'pressSummary'
                             ELSE 'parserLog' END AS doc_kind,
         CASE WHEN o_orderkey % 5 = 0 THEN NULL
              ELSE 'cust-' || CAST(o_custkey AS VARCHAR) END AS slug_candidate,
         CASE WHEN o_orderkey % 7 = 0 THEN NULL
              ELSE '[NCN-' || CAST(o_custkey AS VARCHAR) || ']' END AS ncn_candidate
  FROM orders
),
msgs2 AS (
  SELECT m.*,
         CASE doc_kind WHEN 'judgment' THEN 'ukncn'
                       WHEN 'pressSummary' THEN 'pressSummaryNcn'
                       ELSE NULL END AS expected_ns
  FROM msgs m
),
ids_base AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 3 = 1 THEN NULL
              ELSE 'cust-' || CAST(c_custkey AS VARCHAR) END AS slug,
         CASE WHEN c_custkey % 2 = 0
              THEN '[NCN-' || CAST(c_custkey AS VARCHAR) || ']' ELSE NULL END AS value,
         CASE c_custkey % 3 WHEN 0 THEN 'ukncn'
                            WHEN 1 THEN 'pressSummaryNcn'
                            ELSE 'fclid' END AS namespace,
         'doc/' || CAST(c_custkey AS VARCHAR) AS uri
  FROM customer
),
ids AS (
  SELECT * FROM ids_base
  UNION ALL
  SELECT * FROM ids_base WHERE c_custkey % 50 IN (3, 4)
),
slug_idx AS (
  SELECT slug, count(*) AS n_slug, min(uri) AS uri_slug
  FROM ids WHERE slug IS NOT NULL GROUP BY slug
),
ncn_idx AS (
  SELECT value, namespace, count(*) AS n_ncn, min(uri) AS uri_ncn
  FROM ids WHERE value IS NOT NULL GROUP BY value, namespace
),
resolved AS (
  SELECT m.msg_id, m.doc_kind,
         CASE WHEN s.n_slug > 1 THEN 'error_multiple_slug'
              WHEN s.n_slug = 1 THEN 'resolved_slug'
              WHEN n.n_ncn > 1 THEN 'error_multiple_ncn'
              WHEN n.n_ncn = 1 THEN 'resolved_ncn'
              ELSE 'new' END AS status,
         CASE WHEN s.n_slug = 1 THEN s.uri_slug
              WHEN s.n_slug > 1 THEN NULL
              WHEN n.n_ncn = 1 THEN n.uri_ncn
              WHEN n.n_ncn > 1 THEN NULL
              ELSE 'd-' || substr(md5(CAST(m.msg_id AS VARCHAR)), 1, 12) END AS uri
  FROM msgs2 m
  LEFT JOIN slug_idx s ON m.slug_candidate = s.slug
  LEFT JOIN ncn_idx n
    ON m.ncn_candidate = n.value AND m.expected_ns = n.namespace
)
SELECT msg_id, doc_kind, status, uri,
       CASE WHEN status IN ('resolved_slug','resolved_ncn') THEN TRUE
            WHEN status = 'new' THEN FALSE
            ELSE NULL END AS exists_in_db,
       CASE WHEN status IN ('resolved_slug','resolved_ncn') THEN 'updated'
            WHEN status = 'new' THEN 'inserted'
            ELSE 'error' END AS upload_state
FROM resolved
"""


def _cascade_messages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders -> synthetic message stream exercising every cascade branch."""
    o = table(spark, sf_dir, "orders")
    ck = F.col("o_custkey").cast("string")
    doc_kind = (
        F.when(F.col("o_orderkey") % 3 == 0, F.lit("judgment"))
        .when(F.col("o_orderkey") % 3 == 1, F.lit("pressSummary"))
        .otherwise(F.lit("parserLog"))
    )
    return o.select(
        F.col("o_orderkey").alias("msg_id"),
        doc_kind.alias("doc_kind"),
        F.when(F.col("o_orderkey") % 5 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("cust-"), ck))
        .alias("slug_candidate"),
        F.when(F.col("o_orderkey") % 7 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("[NCN-"), ck, F.lit("]")))
        .alias("ncn_candidate"),
    ).withColumn("expected_ns", expected_namespace_col(F.col("doc_kind")))


def _cascade_identifiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer -> synthetic identifier index (slug + NCN namespaces),
    with deliberate duplicates for the cardinality-error branch."""
    c = table(spark, sf_dir, "customer")
    ck = F.col("c_custkey").cast("string")
    base = c.select(
        F.col("c_custkey"),
        F.when(F.col("c_custkey") % 3 == 1, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("cust-"), ck))
        .alias("slug"),
        F.when(F.col("c_custkey") % 2 == 0, F.concat(F.lit("[NCN-"), ck, F.lit("]")))
        .otherwise(F.lit(None).cast("string"))
        .alias("value"),
        F.when(F.col("c_custkey") % 3 == 0, F.lit("ukncn"))
        .when(F.col("c_custkey") % 3 == 1, F.lit("pressSummaryNcn"))
        .otherwise(F.lit("fclid"))
        .alias("namespace"),
        F.concat(F.lit("doc/"), ck).alias("uri"),
    )
    # %50==3 duplicates a slug (odd custkey -> slug-dup branch); %50==4
    # duplicates an even custkey whose slug is absent (4 % 3 == 1) -> the
    # NCN-duplicate branch is reachable after a slug miss.
    return base.unionAll(base.where((F.col("c_custkey") % 50).isin(3, 4)))


@register(
    "uri_cascade",
    URI_CASCADE_ORACLE,
    doc="J1 slug lookup -> J2 namespace-filtered NCN lookup -> J3 deterministic "
    "fallback id; cardinality errors as data (ingester.py:513-539).",
    survey_ops=("J1", "J2", "J3", "A1", "P15"),
)
def q_uri_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_oracle_safe(spark)
    msgs = _cascade_messages(spark, sf_dir)
    ids = _cascade_identifiers(spark, sf_dir)
    return resolve_uris(msgs, ids)
