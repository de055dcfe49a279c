"""Envelope / metadata / sink-naming queries (SURVEY.md §2.1 S1-S5,
§2.2 P2-P13, §2.5 C3-C4, §2.6 K1-K3, K6-K10, K13).

These register the message-parsing and metadata-projection operators
(sources/messages.py, functions/scalars.py, operators/upsert.py) as
oracle-checked queries. The inputs are REAL JSON strings synthesized
deterministically from the driver tables and parsed with the production
machinery (`F.from_json` with the pinned schemas) — the oracle rebuilds
the same strings and decodes them with DuckDB's JSON functions, so the
parse itself (double decode, classification, null-vs-missing probing)
is what's being checked, not just arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ds_caselaw_ingester_spark.functions.scalars import (
    is_tdr,
    option_with_default,
    trimmed_uri,
)
from ds_caselaw_ingester_spark.operators.upsert import merge_documents
from ds_caselaw_ingester_spark.plans.registry import register
from ds_caselaw_ingester_spark.schemas import METADATA_SCHEMA
from ds_caselaw_ingester_spark.session import ensure_oracle_safe
from ds_caselaw_ingester_spark.sources.catalog import table
from ds_caselaw_ingester_spark.sources.messages import parse_messages

# ---------------------------------------------------------------------------
# envelope_classify — S1/S2 double decode, S3 classification, S4/S5
# reference derivation, P10 TRE override
# ---------------------------------------------------------------------------

ENVELOPE_ORACLE = r"""
WITH src AS (SELECT o_orderkey AS k FROM orders),
built AS (
  SELECT k,
    CASE WHEN k % 4 = 2 THEN 'aws:sns' ELSE 'aws:sqs' END AS event_source,
    'mid-' || CAST(k AS VARCHAR) AS message_id_in,
    CASE
      WHEN k % 4 = 1 THEN
        '{"Records": [{"eventSource": "aws:s3", "s3": {"bucket": {"name": "bulk-bucket"}, "object": {"key": "drops/BULK-'
        || CAST(k AS VARCHAR) || '.tar.gz"}}}]}'
      WHEN k % 4 = 3 THEN NULL
      ELSE
        '{"parameters": {"reference": "'
        || CASE WHEN k % 20 = 0 THEN '' ELSE 'TDR-2024-' || CAST(k AS VARCHAR) END
        || '", "originator": "TDR", "s3Bucket": "ingest-bucket", "s3Key": "consignments/pkg-'
        || CAST(k AS VARCHAR) || '.tar.gz"}}'
    END AS inner_json
  FROM src
),
bodies AS (
  SELECT k, event_source, message_id_in,
    CASE WHEN k % 4 = 3 THEN 'not json ' || CAST(k AS VARCHAR)
         ELSE '{"Type": "Notification", "MessageId": "sns-' || CAST(k AS VARCHAR)
              || '", "Message": "' || replace(inner_json, '"', '\"') || '"}'
    END AS body
  FROM built
),
unwrapped AS (
  SELECT k,
    CASE WHEN event_source = 'aws:sqs' THEN message_id_in END AS message_id,
    CASE WHEN json_valid(body) THEN json_extract_string(body, '$.Message') END AS payload
  FROM bodies
),
classified AS (
  SELECT k, message_id, payload,
    CASE
      WHEN payload IS NULL THEN 'invalid'
      WHEN json_extract_string(payload, '$.Records[0].eventSource') = 'aws:s3' THEN 's3'
      WHEN json_extract(payload, '$.parameters') IS NOT NULL THEN 'v2'
      ELSE 'invalid'
    END AS kind0
  FROM unwrapped
),
refd AS (
  SELECT k, message_id, payload, kind0,
    CASE
      WHEN kind0 = 'v2' THEN nullif(trim(json_extract_string(payload, '$.parameters.reference')), '')
      WHEN kind0 = 's3' THEN split_part(
        list_extract(string_split(json_extract_string(payload, '$.Records[0].s3.object.key'), '/'), -1),
        '.', 1)
    END AS consignment_ref
  FROM classified
)
SELECT k AS msg_seq, message_id,
  CASE WHEN kind0 IN ('v2', 's3') AND consignment_ref IS NULL THEN 'invalid' ELSE kind0 END AS kind,
  consignment_ref,
  CASE WHEN kind0 = 's3' THEN 'TRE-' || consignment_ref ELSE consignment_ref END AS updated_ref,
  CASE WHEN kind0 = 's3' THEN 'FCL S3'
       ELSE json_extract_string(payload, '$.parameters.originator') END AS originator,
  CASE WHEN kind0 = 's3' THEN json_extract_string(payload, '$.Records[0].s3.bucket.name')
       ELSE json_extract_string(payload, '$.parameters.s3Bucket') END AS s3_bucket,
  CASE WHEN kind0 = 's3' THEN json_extract_string(payload, '$.Records[0].s3.object.key')
       ELSE json_extract_string(payload, '$.parameters.s3Key') END AS s3_key
FROM refd
"""


@register(
    "envelope_classify",
    ENVELOPE_ORACLE,
    doc="SQS/SNS envelope double-decode (messages.py:108-127), tagged-union "
    "classification (messages.py:17-24), V2/S3 consignment-reference "
    "derivation (messages.py:48-57, 83-93), TRE override (ingester.py:204-206) "
    "— run through the production from_json parse on synthesized real JSON.",
    survey_ops=("S1", "S2", "S3", "S4", "S5", "P10", "C6"),
)
def q_envelope_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ds_caselaw_ingester_spark.sources.catalog import spread

    ensure_oracle_safe(spark)
    # spread BEFORE the synth+double-from_json: a compact single-file
    # orders table arrives as 1-2 splits, capping the CPU-bound Jackson
    # parse at 2 cores (measured 13 s at sf1 while sf3 ran FASTER purely
    # because it had more splits). The shuffle moves only the 8-byte key;
    # the expensive JSON work then runs at full parallelism. On a real
    # cluster large inputs already arrive in thousands of splits — this
    # guards the small-file shape, same as the dedup corpus reader.
    o = spread(
        table(spark, sf_dir, "orders").select(F.col("o_orderkey").alias("k")), "k"
    )
    k = F.col("k")
    ks = k.cast("string")
    ref_val = F.when(k % 20 == 0, F.lit("")).otherwise(F.concat(F.lit("TDR-2024-"), ks))
    inner_v2 = F.concat(
        F.lit('{"parameters": {"reference": "'),
        ref_val,
        F.lit('", "originator": "TDR", "s3Bucket": "ingest-bucket", "s3Key": "consignments/pkg-'),
        ks,
        F.lit('.tar.gz"}}'),
    )
    inner_s3 = F.concat(
        F.lit('{"Records": [{"eventSource": "aws:s3", "s3": {"bucket": {"name": "bulk-bucket"}, "object": {"key": "drops/BULK-'),
        ks,
        F.lit('.tar.gz"}}}]}'),
    )
    inner = F.when(k % 4 == 1, inner_s3).when(k % 4 == 3, F.lit(None)).otherwise(inner_v2)
    body = F.when(k % 4 == 3, F.concat(F.lit("not json "), ks)).otherwise(
        F.concat(
            F.lit('{"Type": "Notification", "MessageId": "sns-'),
            ks,
            F.lit('", "Message": "'),
            F.replace(inner, F.lit('"'), F.lit('\\"')),
            F.lit('"}'),
        )
    )
    records = o.select(
        k.alias("msg_seq"),
        F.concat(F.lit("mid-"), ks).alias("message_id"),
        F.when(k % 4 == 2, F.lit("aws:sns")).otherwise(F.lit("aws:sqs")).alias("event_source"),
        body.alias("body"),
    )
    parsed = parse_messages(records)
    updated_ref = F.when(
        F.col("kind") == "s3", F.concat(F.lit("TRE-"), F.col("consignment_ref"))
    ).otherwise(F.col("consignment_ref"))
    return parsed.select(
        "msg_seq",
        "message_id",
        "kind",
        "consignment_ref",
        updated_ref.alias("updated_ref"),
        "originator",
        "s3_bucket",
        "s3_key",
    )


# ---------------------------------------------------------------------------
# metadata_probe — P3-P7, P9, P13, C4 over real parsed TRE metadata JSON
# ---------------------------------------------------------------------------

METADATA_ORACLE = r"""
WITH src AS (SELECT doc_id AS d FROM documents),
built AS (
  SELECT d,
    '{"parameters": {'
    || '"TRE": {"reference": "TRE-' || CAST(d AS VARCHAR) || '", "payload": {'
    || CASE d % 3 WHEN 0 THEN ''
                  WHEN 1 THEN '"filename": null, '
                  ELSE '"filename": "doc-' || CAST(d AS VARCHAR) || '.docx", ' END
    || '"xml": "doc.xml", "images": ["image1.png"]}}'
    || ', "PARSER": {"uri": "'
    || CASE d % 3 WHEN 0 THEN 'https://caselaw.nationalarchives.gov.uk/id/ewca/civ/2024/' || CAST(d AS VARCHAR)
                  WHEN 1 THEN ''
                  ELSE 'https://caselaw.nationalarchives.gov.uk/id/' END
    || '", "cite": ' || CASE WHEN d % 5 = 0 THEN 'null'
                             ELSE '"[2024] EWCA Civ ' || CAST(d AS VARCHAR) || '"' END
    || '}'
    || CASE WHEN d % 2 = 0 THEN
         ', "TDR": {"Source-Organization": "org-' || CAST(d % 7 AS VARCHAR)
         || '", "Contact-Name": "name-' || CAST(d AS VARCHAR)
         || '", "Contact-Email": "user' || CAST(d AS VARCHAR) || '@example.com"}'
       ELSE '' END
    || CASE WHEN d % 4 < 2 THEN
         ', "INGESTER_OPTIONS": {"auto_publish": ' || CASE WHEN d % 4 = 0 THEN 'true' ELSE 'false' END
         || CASE WHEN d % 8 < 4 THEN ', "error_on_existing_document": true' ELSE '' END
         || '}'
       ELSE '' END
    || '}}' AS raw
  FROM src
)
SELECT d AS doc_id,
  json_extract(raw, '$.parameters.TDR') IS NOT NULL AS is_tdr,
  nullif(trim(regexp_replace(json_extract_string(raw, '$.parameters.PARSER.uri'),
                             '^https://caselaw\.nationalarchives\.gov\.uk/id/', '')), '') AS trimmed_uri,
  coalesce(CAST(json_extract_string(raw, '$.parameters.INGESTER_OPTIONS.auto_publish') AS BOOLEAN), false) AS auto_publish,
  coalesce(CAST(json_extract_string(raw, '$.parameters.INGESTER_OPTIONS.error_on_existing_document') AS BOOLEAN), false) AS error_on_existing,
  json_extract_string(raw, '$.parameters.PARSER.cite') AS ncn,
  CASE WHEN raw NOT LIKE '%"filename"%' THEN 'error_docx_not_found'
       WHEN json_extract_string(raw, '$.parameters.TRE.payload.filename') IS NULL THEN 'reparse_no_source'
       ELSE json_extract_string(raw, '$.parameters.TRE.payload.filename') END AS filename_status,
  CASE WHEN json_extract(raw, '$.parameters.TDR') IS NOT NULL
       THEN json_extract_string(raw, '$.parameters.TDR."Contact-Name"') END AS submitter_name,
  CASE WHEN json_extract(raw, '$.parameters.TDR') IS NOT NULL
       THEN json_extract_string(raw, '$.parameters.TDR."Contact-Email"') END AS submitter_email,
  CASE WHEN json_extract(raw, '$.parameters.TDR') IS NOT NULL
       THEN 'Updated document submitted by TDR user'
       ELSE 'Updated document uploaded by Find Case Law' END AS annotation_msg
FROM built
"""


@register(
    "metadata_probe",
    METADATA_ORACLE,
    doc="TRE-metadata projections over real from_json parsing: is_tdr "
    "(ingester.py:133-136), trimmed_uri (138-145), INGESTER_OPTIONS "
    "defaults (147-162), NCN extraction (:203), null-vs-missing filename "
    "probe (file_helpers.py:118-124), conditional annotation payload "
    "(ingester.py:83-97) and TDR/FCL annotation wording (:225-238).",
    survey_ops=("S9", "P3", "P4", "P5", "P6", "P7", "P9", "P13", "C4"),
)
def q_metadata_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_oracle_safe(spark)
    docs = table(spark, sf_dir, "documents").select(F.col("doc_id").alias("d"))
    d = F.col("d")
    ds = d.cast("string")
    filename_part = (
        F.when(d % 3 == 0, F.lit(""))
        .when(d % 3 == 1, F.lit('"filename": null, '))
        .otherwise(F.concat(F.lit('"filename": "doc-'), ds, F.lit('.docx", ')))
    )
    uri_part = (
        F.when(d % 3 == 0, F.concat(F.lit("https://caselaw.nationalarchives.gov.uk/id/ewca/civ/2024/"), ds))
        .when(d % 3 == 1, F.lit(""))
        .otherwise(F.lit("https://caselaw.nationalarchives.gov.uk/id/"))
    )
    cite_part = F.when(d % 5 == 0, F.lit("null")).otherwise(
        F.concat(F.lit('"[2024] EWCA Civ '), ds, F.lit('"'))
    )
    tdr_part = F.when(
        d % 2 == 0,
        F.concat(
            F.lit(', "TDR": {"Source-Organization": "org-'),
            (d % 7).cast("string"),
            F.lit('", "Contact-Name": "name-'),
            ds,
            F.lit('", "Contact-Email": "user'),
            ds,
            F.lit('@example.com"}'),
        ),
    ).otherwise(F.lit(""))
    opts_part = F.when(
        d % 4 < 2,
        F.concat(
            F.lit(', "INGESTER_OPTIONS": {"auto_publish": '),
            F.when(d % 4 == 0, F.lit("true")).otherwise(F.lit("false")),
            F.when(d % 8 < 4, F.lit(', "error_on_existing_document": true')).otherwise(F.lit("")),
            F.lit("}"),
        ),
    ).otherwise(F.lit(""))
    raw = F.concat(
        F.lit('{"parameters": {"TRE": {"reference": "TRE-'),
        ds,
        F.lit('", "payload": {'),
        filename_part,
        F.lit('"xml": "doc.xml", "images": ["image1.png"]}}'),
        F.lit(', "PARSER": {"uri": "'),
        uri_part,
        F.lit('", "cite": '),
        cite_part,
        F.lit("}"),
        tdr_part,
        opts_part,
        F.lit("}}"),
    )
    m = F.from_json(raw, METADATA_SCHEMA)
    parms = m["parameters"]
    tdr = parms["TDR"]
    filename = parms["TRE"]["payload"]["filename"]
    return docs.select(
        d.alias("doc_id"),
        is_tdr(tdr).alias("is_tdr"),
        trimmed_uri(parms["PARSER"]["uri"]).alias("trimmed_uri"),
        option_with_default(parms["INGESTER_OPTIONS"]["auto_publish"], False).alias("auto_publish"),
        option_with_default(parms["INGESTER_OPTIONS"]["error_on_existing_document"], False).alias(
            "error_on_existing"
        ),
        parms["PARSER"]["cite"].alias("ncn"),
        # P13 null-vs-missing: schema-parse can't distinguish, so probe the
        # raw keys (SURVEY.md §7 hard part 2; file_helpers.py:118-124)
        F.when(~raw.contains('"filename"'), F.lit("error_docx_not_found"))
        .when(filename.isNull(), F.lit("reparse_no_source"))
        .otherwise(filename)
        .alias("filename_status"),
        F.when(is_tdr(tdr), tdr["Contact-Name"]).alias("submitter_name"),
        F.when(is_tdr(tdr), tdr["Contact-Email"]).alias("submitter_email"),
        F.when(is_tdr(tdr), F.lit("Updated document submitted by TDR user"))
        .otherwise(F.lit("Updated document uploaded by Find Case Law"))
        .alias("annotation_msg"),
    )


# ---------------------------------------------------------------------------
# lambda_versions — P2 map-entries flatten
# ---------------------------------------------------------------------------

LAMBDA_VERSIONS_ORACLE = """
WITH src AS (SELECT n_nationkey AS k, n_regionkey AS r FROM nation)
SELECT k AS nation_id, 'ingester' AS component, 'v' || CAST(k AS VARCHAR) AS version FROM src
UNION ALL
SELECT k, 'parser', 'p' || CAST(r AS VARCHAR) FROM src
"""


@register(
    "lambda_versions",
    LAMBDA_VERSIONS_ORACLE,
    doc="extract_lambda_versions (lambda_function.py:90-95): dict flattened "
    "to (key, value) rows via explode(map_entries(...)).",
    survey_ops=("P2",),
)
def q_lambda_versions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_oracle_safe(spark)
    n = table(spark, sf_dir, "nation")
    versions = F.create_map(
        F.lit("ingester"),
        F.concat(F.lit("v"), F.col("n_nationkey").cast("string")),
        F.lit("parser"),
        F.concat(F.lit("p"), F.col("n_regionkey").cast("string")),
    )
    entries = n.select(
        F.col("n_nationkey").alias("nation_id"),
        F.explode(F.map_entries(versions)).alias("entry"),
    )
    return entries.select(
        "nation_id",
        F.col("entry.key").alias("component"),
        F.col("entry.value").alias("version"),
    )


# ---------------------------------------------------------------------------
# asset_fanout — K6-K10 asset key derivation + K13 effect ordering as data
# ---------------------------------------------------------------------------

ASSET_FANOUT_ORACLE = """
WITH src AS (
  SELECT doc_id AS d,
         'doc/' || CAST(doc_id % 100 AS VARCHAR) || '/' || CAST(doc_id AS VARCHAR) AS uri,
         'TDR-2024-' || CAST(doc_id AS VARCHAR) AS ref,
         CASE WHEN doc_id % 3 = 0 THEN NULL
              WHEN doc_id % 2 = 0 THEN 'judgment-' || CAST(doc_id AS VARCHAR) || '.docx'
              ELSE 'judgment-' || CAST(doc_id AS VARCHAR) || '.pdf' END AS source_filename,
         CASE WHEN doc_id % 4 = 0 THEN ['image1.png', 'image2.jpg']
              WHEN doc_id % 4 = 1 THEN ['image1.png']
              ELSE [] END AS images
  FROM documents
),
tar_rows AS (
  SELECT d, 1 AS effect_seq, 'tar' AS asset_kind,
         uri || '/' || CASE WHEN source_filename IS NULL
                            THEN ref || '_nodocx.tar.gz'
                            ELSE ref || '.tar.gz' END AS s3_key
  FROM src
),
source_rows AS (
  SELECT d, 2, 'source_doc',
         uri || '/' || replace(uri, '/', '_') || '.'
             || lower(list_extract(string_split(source_filename, '.'), -1))
  FROM src WHERE source_filename IS NOT NULL
),
log_rows AS (
  SELECT d, 3, 'parser_log', uri || '/parser.log' FROM src
),
image_rows AS (
  SELECT d, 4, 'image', uri || '/' || unnest(images) FROM src
)
SELECT * FROM tar_rows
UNION ALL SELECT * FROM source_rows
UNION ALL SELECT * FROM log_rows
UNION ALL SELECT * FROM image_rows
"""


def _asset_src(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic (d, uri, ref, source_filename, images) frame the
    asset queries derive from `documents` — mod rules mirror the oracle
    CTE in ASSET_FANOUT_ORACLE."""
    docs = table(spark, sf_dir, "documents").select(F.col("doc_id").alias("d"))
    d = F.col("d")
    ds = d.cast("string")
    return docs.select(
        d,
        F.concat(F.lit("doc/"), (d % 100).cast("string"), F.lit("/"), ds).alias("uri"),
        F.concat(F.lit("TDR-2024-"), ds).alias("ref"),
        F.when(d % 3 == 0, F.lit(None).cast("string"))
        .when(d % 2 == 0, F.concat(F.lit("judgment-"), ds, F.lit(".docx")))
        .otherwise(F.concat(F.lit("judgment-"), ds, F.lit(".pdf")))
        .alias("source_filename"),
        F.when(d % 4 == 0, F.array(F.lit("image1.png"), F.lit("image2.jpg")))
        .when(d % 4 == 1, F.array(F.lit("image1.png")))
        .otherwise(F.array().cast("array<string>"))
        .alias("images"),
    )


@register(
    "asset_fanout",
    ASSET_FANOUT_ORACLE,
    doc="S3 asset fan-out key derivation: tar archive with _nodocx rename "
    "when no source (ingester.py:361-381), source-doc rename to "
    "uri-with-underscores + extension (:383-394), parser.log copy "
    "(:396-405), per-image explode (:407-418), store_file key layout "
    "(file_helpers.py:36-73); effect_seq pins the K13 order (:542-575).",
    survey_ops=("K6", "K7", "K8", "K9", "K10", "K13"),
)
def q_asset_fanout(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ds_caselaw_ingester_spark.operators.assets import asset_rows

    ensure_oracle_safe(spark)
    return asset_rows(_asset_src(spark, sf_dir), ["d"])


# ---------------------------------------------------------------------------
# publish_copy_fanout — K11 publish-time private->public asset copies
# ---------------------------------------------------------------------------

PUBLISH_COPY_ORACLE = """
WITH src AS (
  SELECT doc_id AS d,
         'doc/' || CAST(doc_id % 100 AS VARCHAR) || '/' || CAST(doc_id AS VARCHAR) AS uri,
         'TDR-2024-' || CAST(doc_id AS VARCHAR) AS ref,
         CASE WHEN doc_id % 3 = 0 THEN NULL
              WHEN doc_id % 2 = 0 THEN 'judgment-' || CAST(doc_id AS VARCHAR) || '.docx'
              ELSE 'judgment-' || CAST(doc_id AS VARCHAR) || '.pdf' END AS source_filename,
         CASE WHEN doc_id % 4 = 0 THEN ['image1.png', 'image2.jpg']
              WHEN doc_id % 4 = 1 THEN ['image1.png']
              ELSE [] END AS images
  FROM documents
),
assets AS (
  SELECT d, uri,
         uri || '/' || CASE WHEN source_filename IS NULL
                            THEN ref || '_nodocx.tar.gz'
                            ELSE ref || '.tar.gz' END AS s3_key
  FROM src
  UNION ALL
  SELECT d, uri,
         uri || '/' || replace(uri, '/', '_') || '.'
             || lower(list_extract(string_split(source_filename, '.'), -1))
  FROM src WHERE source_filename IS NOT NULL
  UNION ALL
  SELECT d, uri, uri || '/parser.log' FROM src
  UNION ALL
  SELECT d, uri, uri || '/' || unnest(images) FROM src
)
SELECT uri, s3_key,
       'unpublished' AS from_bucket, 'published' AS to_bucket
FROM assets WHERE d % 6 = 0
"""


@register(
    "publish_copy_fanout",
    PUBLISH_COPY_ORACLE,
    doc="K11 publish asset-copy: for the uris being published (d % 6 = 0 "
    "here; will_publish in the composite), every asset under the "
    "document's prefix gets one private->public copy row "
    "(docs/workflow.md:169-175 — publish lists the unpublished bucket by "
    "prefix and copies each object). Composition of the green "
    "asset_rows fan-out and a semi-join on the publish set.",
    survey_ops=("K11",),
)
def q_publish_copy_fanout(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ds_caselaw_ingester_spark.operators.assets import asset_rows, publish_copies

    ensure_oracle_safe(spark)
    src = _asset_src(spark, sf_dir)
    assets = asset_rows(src, ["d", "uri"])
    pub = src.where(F.col("d") % 6 == 0).select("uri")
    return publish_copies(assets, pub)


# ---------------------------------------------------------------------------
# upsert_merge — K1/K2/K3 MERGE semantics + C3 error branch as data
# ---------------------------------------------------------------------------

UPSERT_ORACLE = """
WITH ks AS (SELECT c_custkey AS k FROM customer),
target AS (
  SELECT 'doc/' || CAST(k AS VARCHAR) AS uri,
         'old-' || CAST(k AS VARCHAR) AS body,
         CAST((k % 3) + 1 AS INTEGER) AS version_n
  FROM ks WHERE k % 2 = 0
),
upd AS (
  SELECT 'doc/' || CAST(k AS VARCHAR) AS uri,
         'new-' || CAST(k AS VARCHAR) AS body,
         (k % 4 = 0) AS err_flag
  FROM ks WHERE k % 3 = 0
),
err AS (
  SELECT u.uri, u.body, CAST(NULL AS INTEGER) AS version_n, 'error_existing' AS op
  FROM upd u JOIN target t ON u.uri = t.uri
  WHERE u.err_flag
),
clean AS (
  SELECT uri, body FROM upd
  WHERE NOT (err_flag AND uri IN (SELECT uri FROM target))
),
merged AS (
  SELECT coalesce(u.uri, t.uri) AS uri,
         coalesce(u.body, t.body) AS body,
         CAST(CASE WHEN t.uri IS NOT NULL AND u.uri IS NOT NULL THEN t.version_n + 1
                   WHEN t.uri IS NULL THEN 1
                   ELSE t.version_n END AS INTEGER) AS version_n,
         CASE WHEN t.uri IS NOT NULL AND u.uri IS NOT NULL THEN 'updated'
              WHEN t.uri IS NULL THEN 'inserted'
              ELSE 'unchanged' END AS op
  FROM target t FULL OUTER JOIN clean u ON t.uri = u.uri
)
SELECT * FROM merged UNION ALL SELECT * FROM err
"""


@register(
    "upsert_merge",
    UPSERT_ORACLE,
    doc="Document upsert as MERGE (full-outer-join emulation, "
    "operators/upsert.py): insert/update/unchanged with version bump "
    "(ingester.py:225-261), error_on_existing_document split BEFORE the "
    "merge preserving per-record containment (insert_or_update_xml, "
    "ingester.py:459-483).",
    survey_ops=("K1", "K2", "K3", "C3"),
)
def q_upsert_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_oracle_safe(spark)
    ks = table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k"))
    k = F.col("k")
    ks_str = k.cast("string")
    target = ks.where(k % 2 == 0).select(
        F.concat(F.lit("doc/"), ks_str).alias("uri"),
        F.concat(F.lit("old-"), ks_str).alias("body"),
        ((k % 3) + 1).cast("int").alias("version_n"),
    )
    upd = ks.where(k % 3 == 0).select(
        F.concat(F.lit("doc/"), ks_str).alias("uri"),
        F.concat(F.lit("new-"), ks_str).alias("body"),
        (k % 4 == 0).alias("err_flag"),
    )
    # C3: exists & error_on_existing_document -> error row, not merged
    exists = upd.join(target.select("uri"), "uri", "left_semi")
    err = exists.where(F.col("err_flag")).select(
        "uri", "body", F.lit(None).cast("int").alias("version_n"), F.lit("error_existing").alias("op")
    )
    err_uris = exists.where(F.col("err_flag")).select("uri")
    clean = upd.join(err_uris, "uri", "left_anti").select("uri", "body")
    merged = merge_documents(target, clean, key="uri").select(
        "uri", "body", F.col("version_n").cast("int").alias("version_n"), "op"
    )
    return merged.unionAll(err)


# ---------------------------------------------------------------------------
# publish_flow — K11 publish/unpublish flag + private->public asset copy
# ---------------------------------------------------------------------------

PUBLISH_ORACLE = """
WITH src AS (
  SELECT 'doc/' || CAST(c_custkey AS VARCHAR) AS uri,
         CASE c_custkey % 3 WHEN 0 THEN 'TDR' WHEN 1 THEN 'FCL' ELSE 'FCL S3' END AS originator,
         c_custkey % 2 = 0 AS exists_in_db,
         c_custkey % 3 = 0 AS was_published,
         c_custkey % 5 = 0 AS auto_publish,
         c_custkey AS k
  FROM customer
),
decided AS (
  SELECT uri, originator, k,
         CASE WHEN originator = 'TDR' THEN false
              WHEN originator = 'FCL S3' THEN auto_publish
              ELSE exists_in_db AND was_published END AS will_publish
  FROM src
),
flags AS (
  SELECT uri, originator,
         CASE WHEN will_publish THEN 'publish' ELSE 'unpublish' END AS action,
         will_publish AS new_published,
         CAST(NULL AS VARCHAR) AS asset_key,
         CAST(NULL AS VARCHAR) AS dst_bucket
  FROM decided
),
copies AS (
  SELECT uri, originator, 'copy_asset' AS action, true AS new_published,
         uri || '/' || unnest(['judgment.tar.gz', 'parser.log']) AS asset_key,
         'public-assets' AS dst_bucket
  FROM decided WHERE will_publish
)
SELECT * FROM flags UNION ALL SELECT * FROM copies
"""


@register(
    "publish_flow",
    PUBLISH_ORACLE,
    doc="K11 (perform_ingest, ingester.py:565-573): will_publish ladder "
    "(C1, :424-440) -> publish sets the flag AND fans out private->public "
    "asset copies (docs/workflow.md:169-175); unpublish clears the flag. "
    "Effects modeled as data rows over the documents/assets tables.",
    survey_ops=("K11", "C1", "J5"),
)
def q_publish_flow(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_oracle_safe(spark)
    c = table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k"))
    k = F.col("k")
    src = c.select(
        F.concat(F.lit("doc/"), k.cast("string")).alias("uri"),
        F.when(k % 3 == 0, F.lit("TDR")).when(k % 3 == 1, F.lit("FCL")).otherwise(F.lit("FCL S3")).alias("originator"),
        (k % 2 == 0).alias("exists_in_db"),
        (k % 3 == 0).alias("was_published"),
        (k % 5 == 0).alias("auto_publish"),
    )
    # the SHARED C1 ladder (operators/routing.will_publish), not an
    # inline copy: the copy this replaced defaulted unknown originators
    # into the FCL branch while the shared helper returns NULL (the
    # reference raises) — invisible on this synth (only the three known
    # originators) but a silent two-place edit trap (review finding)
    from ds_caselaw_ingester_spark.operators.routing import will_publish

    decided = src.select(
        "uri",
        "originator",
        will_publish(
            F.col("originator"),
            F.col("auto_publish"),
            F.col("exists_in_db"),
            F.col("was_published"),
        ).alias("will_publish"),
    )
    flags = decided.select(
        "uri",
        "originator",
        F.when(F.col("will_publish"), F.lit("publish")).otherwise(F.lit("unpublish")).alias("action"),
        F.col("will_publish").alias("new_published"),
        F.lit(None).cast("string").alias("asset_key"),
        F.lit(None).cast("string").alias("dst_bucket"),
    )
    copies = (
        decided.where(F.col("will_publish"))
        .select(
            "uri",
            "originator",
            F.explode(F.array(F.lit("judgment.tar.gz"), F.lit("parser.log"))).alias("a"),
        )
        .select(
            "uri",
            "originator",
            F.lit("copy_asset").alias("action"),
            F.lit(True).alias("new_published"),
            F.concat(F.col("uri"), F.lit("/"), F.col("a")).alias("asset_key"),
            F.lit("public-assets").alias("dst_bucket"),
        )
    )
    return flags.unionAll(copies)
