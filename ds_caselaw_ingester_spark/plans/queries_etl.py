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
from ds_caselaw_ingester_spark.operators.routing import document_noun
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
              ELSE 'd-' || md5(CAST(m.msg_id AS VARCHAR)) END AS uri
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


# ---------------------------------------------------------------------------
# identifier_assignment — C5: typed identifier rows, filtered by doc type
# ---------------------------------------------------------------------------

IDENTIFIER_ASSIGN_ORACLE = """
WITH msgs AS (
  SELECT o_orderkey AS msg_id,
         CASE o_orderkey % 3 WHEN 0 THEN 'judgment'
                             WHEN 1 THEN 'pressSummary'
                             ELSE 'parserLog' END AS doc_kind,
         'doc/' || CAST(o_custkey AS VARCHAR) AS uri,
         CASE WHEN o_orderkey % 7 = 0 THEN NULL
              ELSE '[NCN-' || CAST(o_custkey AS VARCHAR) || ']' END AS extracted_ncn
  FROM orders
)
SELECT msg_id, uri,
       CASE doc_kind WHEN 'judgment' THEN 'ukncn' ELSE 'pressSummaryNcn' END AS namespace,
       extracted_ncn AS value
FROM msgs
WHERE doc_kind IN ('judgment', 'pressSummary')  -- parserLog has no identifier class
  AND extracted_ncn IS NOT NULL                 -- no NCN -> no-op
"""


@register(
    "identifier_assignment",
    IDENTIFIER_ASSIGN_ORACLE,
    doc="set_document_identifiers (ingester.py:263-284): skip types without "
    "an identifier class (ParserLog) and rows without an NCN; emit typed "
    "identifier rows (tests/test_identifier_assignment.py:15-105).",
    survey_ops=("C5",),
)
def q_identifier_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_oracle_safe(spark)
    # SAME synth as the cascade (shared helper, not a hand-copied
    # doc_kind/NCN mod ladder: the rules and their oracle CTEs must move
    # in lockstep — review finding). The uri ('doc/' || o_custkey) is
    # reconstructed from the kept rows' ncn_candidate, which always
    # embeds the custkey and is non-null for every row this query keeps.
    msgs = _cascade_messages(spark, sf_dir).select(
        "msg_id",
        "doc_kind",
        F.concat(
            F.lit("doc/"),
            F.regexp_extract(F.col("ncn_candidate"), r"NCN-(\d+)", 1),
        ).alias("uri"),
        F.col("ncn_candidate").alias("extracted_ncn"),
    )
    return (
        msgs.where(F.col("doc_kind").isin("judgment", "pressSummary"))
        .where(F.col("extracted_ncn").isNotNull())
        .select(
            "msg_id",
            "uri",
            F.when(F.col("doc_kind") == "judgment", F.lit("ukncn"))
            .otherwise(F.lit("pressSummaryNcn"))
            .alias("namespace"),
            F.col("extracted_ncn").alias("value"),
        )
    )


# ---------------------------------------------------------------------------
# existence_guard — J4 semi-join precheck + J5 published-flag lookup
# ---------------------------------------------------------------------------

EXISTENCE_GUARD_ORACLE = """
WITH docs AS (
  SELECT 'doc/' || CAST(c_custkey AS VARCHAR) AS uri,
         c_custkey % 3 = 0 AS is_published
  FROM customer WHERE c_custkey % 4 <> 1
),
candidates AS (
  SELECT o_orderkey AS msg_id, 'doc/' || CAST(o_custkey AS VARCHAR) AS uri
  FROM orders
)
SELECT c.msg_id, c.uri,
       EXISTS (SELECT 1 FROM docs d WHERE d.uri = c.uri) AS exists_in_db,
       COALESCE((SELECT d.is_published FROM docs d WHERE d.uri = c.uri), FALSE) AS was_published
FROM candidates c
"""


@register(
    "existence_guard",
    EXISTENCE_GUARD_ORACLE,
    doc="J4 pre-update existence check (get_judgment_xml guard, "
    "ingester.py:240) as a semi-join flag + J5 get_published lookup "
    "(ingester.py:438) with not-found -> false. The document-state side "
    "is corpus-sized, so the join carries no broadcast hint (same "
    "doctrine as the composite's J5, operators/ingest.py) — AQE "
    "broadcasts small state and shuffles on uri past that.",
    survey_ops=("J4", "J5"),
)
def q_existence_guard(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_oracle_safe(spark)
    c = table(spark, sf_dir, "customer")
    docs = c.where(F.col("c_custkey") % 4 != 1).select(
        F.concat(F.lit("doc/"), F.col("c_custkey").cast("string")).alias("uri"),
        (F.col("c_custkey") % 3 == 0).alias("is_published"),
    )
    candidates = table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("msg_id"),
        F.concat(F.lit("doc/"), F.col("o_custkey").cast("string")).alias("uri"),
    )
    joined = candidates.join(docs, "uri", "left")
    return joined.select(
        "msg_id",
        "uri",
        F.col("is_published").isNotNull().alias("exists_in_db"),
        F.coalesce(F.col("is_published"), F.lit(False)).alias("was_published"),
    )


# ---------------------------------------------------------------------------
# email_personalisation — P8: notification payload projection with defaults
# ---------------------------------------------------------------------------

EMAIL_PERSONALISATION_ORACLE = """
WITH tdr AS (
  SELECT o_orderkey AS msg_id,
         CASE WHEN o_orderkey % 6 = 0 THEN NULL ELSE 'Org ' || CAST(o_custkey AS VARCHAR) END AS source_organization,
         CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE 'Contact ' || CAST(o_custkey AS VARCHAR) END AS contact_name,
         CASE WHEN o_orderkey % 8 = 0 THEN NULL ELSE 'c' || CAST(o_custkey AS VARCHAR) || '@example.com' END AS contact_email,
         'TDR-2024-' || CAST(o_orderkey AS VARCHAR) AS consignment_ref,
         CASE WHEN o_orderkey % 9 = 0 THEN NULL ELSE '2024-01-15T10:30:00Z' END AS completed_at,
         'ewca/civ/2024/' || CAST(o_orderkey AS VARCHAR) AS uri
  FROM orders
)
SELECT msg_id,
       'https://editor.example/detail?judgment_uri=' || uri AS doc_url,
       COALESCE(source_organization, 'unknown') AS submitter_org,
       COALESCE(contact_name, 'unknown') || ' (' || COALESCE(contact_email, 'unknown') || ')' AS submitter,
       consignment_ref,
       COALESCE(completed_at, 'unknown') AS submitted_at,
       CASE WHEN msg_id % 2 = 0 THEN 'email_updated' ELSE 'email_new' END AS template,
       CASE WHEN msg_id % 2 = 1 THEN
         CASE msg_id % 3 WHEN 0 THEN 'judgment' WHEN 1 THEN 'press summary' ELSE 'document' END
       END AS doctype,
       to_json(struct_pack(
         source_organization := COALESCE(source_organization, 'unknown'),
         contact_name := COALESCE(contact_name, 'unknown'),
         contact_email := COALESCE(contact_email, 'unknown'),
         consignment_reference := consignment_ref,
         completed_at := COALESCE(completed_at, 'unknown')
       )) AS metadata_json
FROM tdr
"""


@register(
    "email_personalisation",
    EMAIL_PERSONALISATION_ORACLE,
    doc="personalise_email (ingester.py:100-125): 6-key projection with "
    "'unknown' defaults, URL/submitter string build, the JSON metadata "
    "blob (to_json over an all-non-null struct for engine parity), and "
    "the new-vs-updated template split with the doctype noun attached "
    "ONLY to new-judgment payloads (ingester.py:305-306).",
    survey_ops=("P8", "K12"),
)
def q_email_personalisation(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_oracle_safe(spark)
    o = table(spark, sf_dir, "orders")
    ok, ck = F.col("o_orderkey"), F.col("o_custkey").cast("string")
    tdr = o.select(
        ok.alias("msg_id"),
        F.when(ok % 6 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("Org "), ck))
        .alias("source_organization"),
        F.when(ok % 7 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("Contact "), ck))
        .alias("contact_name"),
        F.when(ok % 8 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("c"), ck, F.lit("@example.com")))
        .alias("contact_email"),
        F.concat(F.lit("TDR-2024-"), ok.cast("string")).alias("consignment_ref"),
        F.when(ok % 9 == 0, F.lit(None).cast("string"))
        .otherwise(F.lit("2024-01-15T10:30:00Z"))
        .alias("completed_at"),
        F.concat(F.lit("ewca/civ/2024/"), ok.cast("string")).alias("uri"),
    )
    unk = lambda c: F.coalesce(c, F.lit("unknown"))  # noqa: E731
    return tdr.select(
        "msg_id",
        F.concat(F.lit("https://editor.example/detail?judgment_uri="), F.col("uri")).alias(
            "doc_url"
        ),
        unk(F.col("source_organization")).alias("submitter_org"),
        F.concat(
            unk(F.col("contact_name")), F.lit(" ("), unk(F.col("contact_email")), F.lit(")")
        ).alias("submitter"),
        "consignment_ref",
        unk(F.col("completed_at")).alias("submitted_at"),
        F.when(F.col("msg_id") % 2 == 0, F.lit("email_updated"))
        .otherwise(F.lit("email_new"))
        .alias("template"),
        F.when(
            F.col("msg_id") % 2 == 1,
            document_noun(
                F.when(F.col("msg_id") % 3 == 0, F.lit("judgment"))
                .when(F.col("msg_id") % 3 == 1, F.lit("pressSummary"))
                .otherwise(F.lit("parserLog"))
            ),
        ).alias("doctype"),
        F.to_json(
            F.struct(
                unk(F.col("source_organization")).alias("source_organization"),
                unk(F.col("contact_name")).alias("contact_name"),
                unk(F.col("contact_email")).alias("contact_email"),
                F.col("consignment_ref").alias("consignment_reference"),
                unk(F.col("completed_at")).alias("completed_at"),
            )
        ).alias("metadata_json"),
    )


# ---------------------------------------------------------------------------
# tar_pipeline — S7-S12 binary path as a registered (rows-only) query
# ---------------------------------------------------------------------------


def _build_archives() -> list[tuple[str, bytes]]:
    """Deterministic consignment tar.gz fixtures, exercising every scan
    branch: valid XML, invalid XML (-> parser.log synth), missing
    parser.log (-> not-found default), metadata last-match-wins."""
    import io
    import tarfile

    out = []
    for i in range(30):
        ref = f"TDR-2030-{i:04d}"
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w:gz") as tf:

            def add(name: str, data: bytes) -> None:
                info = tarfile.TarInfo(name)
                info.size = len(data)
                info.mtime = 0
                tf.addfile(info, io.BytesIO(data))

            xml_name = f"{ref}.xml"
            meta = (
                '{"parameters": {"TRE": {"reference": "%s", "payload": '
                '{"xml": "%s", "filename": "doc.docx", "images": []}}}}' % (ref, xml_name)
            ).encode()
            # a decoy metadata first: the LAST -metadata.json must win (S9)
            add(f"{ref}/decoy-metadata.json", b'{"parameters": {}}')
            add(f"{ref}/TRE-{ref}-metadata.json", meta)
            if i % 3 == 0:
                add(f"{ref}/{xml_name}", b"<judgment><body>ok %d</body></judgment>" % i)
            elif i % 3 == 1:
                add(f"{ref}/{xml_name}", b"<judgment>unclosed & broken < tag")
            else:
                add(f"{ref}/{xml_name}", b'<doc name="pressSummary"><p>s</p></doc>')
            if i % 5 != 0:
                add(f"{ref}/parser.log", b"parse log line <%d>" % i)
            add(f"{ref}/junk.bin", b"\x00\x01")
        out.append((ref, buf.getvalue()))
    return out


# The fixtures are a pure function of i (mtime pinned to 0), so the
# pipeline's expected output has a closed form — the oracle re-derives
# it from generate_series instead of reading tars (which DuckDB can't).
# This is a REAL check of the scan semantics: if last-match-wins (S9)
# regressed to first-match, the decoy metadata would null out xml_name
# and flip has_metadata/best_xml; if the try-parse fallback (S12) or the
# escape in the parser-log synth (S11) regressed, best_xml strings
# diverge. Only the tarfile byte-plumbing itself is outside the oracle —
# that part is pinned by tests/test_tar_source.py fixtures.
TAR_PIPELINE_ORACLE = """
WITH idx AS (SELECT unnest(generate_series(0, 29)) AS i)
SELECT 'TDR-2030-' || lpad(CAST(i AS VARCHAR), 4, '0') AS consignment_ref,
       CAST(CASE WHEN i % 5 = 0 THEN 4 ELSE 5 END AS BIGINT) AS n_members,
       TRUE AS has_metadata,
       i % 3 <> 1 AS xml_was_valid,
       CASE
         WHEN i % 3 = 0 THEN '<judgment><body>ok ' || CAST(i AS VARCHAR) || '</body></judgment>'
         WHEN i % 3 = 2 THEN '<doc name="pressSummary"><p>s</p></doc>'
         WHEN i % 5 = 0 THEN '<error>parser.log not found</error>'
         ELSE '<error>parse log line &lt;' || CAST(i AS VARCHAR) || '&gt;</error>'
       END AS best_xml,
       CASE WHEN i % 3 = 0 THEN 'judgment'
            WHEN i % 3 = 2 THEN 'pressSummary'
            ELSE 'parserLog' END AS doc_kind
FROM idx
"""


@register(
    "tar_pipeline",
    TAR_PIPELINE_ORACLE,
    doc="Full consignment binary path on deterministic in-memory tar.gz "
    "fixtures: archive rows (S7), member explode via Arrow mapInPandas "
    "(S8), last-match metadata scan (S9), named-XML scan (S10), "
    "parser-log synth (S11), try-parse best-XML fallback (S12), document "
    "classification (P11). Covers file_helpers.py:24-115 semantics. The "
    "oracle is the closed-form expected output of the deterministic "
    "fixtures (see TAR_PIPELINE_ORACLE comment).",
    survey_ops=("S7", "S8", "S9", "S10", "S12", "P11"),
)
def q_tar_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ds_caselaw_ingester_spark.functions.scalars import classify_document_xml

    ensure_oracle_safe(spark)
    from ds_caselaw_ingester_spark.schemas import METADATA_SCHEMA
    from ds_caselaw_ingester_spark.sources.tar import (
        best_xml,
        explode_tar_members,
        scan_metadata,
        scan_named_xml,
        scan_parser_log,
    )

    # 30 fixture archives: createDataFrame spreads them over defaultParallelism
    # slices, giving 32 one-row tasks each paying Python-worker dispatch in
    # the mapInPandas explode. Coalesce (no shuffle) to a handful of tasks —
    # at real scale archive counts dwarf cores and this is a no-op.
    #
    # Arrow path on purpose (optimization round 14, guide §6): a
    # list-of-tuples createDataFrame plans as a PythonRDD — every
    # consumer's tasks round-trip a Python worker to unpickle the rows,
    # measured ~1.5 s per pass over this 45 KB frame (and the frame has
    # two consumers: the member explode and the consignment spine). A
    # pandas DataFrame converts driver-side via Arrow into a JVM
    # LocalTableScan — measured 0.2-0.3 s noop, byte-identical values.
    import pandas as pd

    _arch = _build_archives()
    archives = spark.createDataFrame(
        pd.DataFrame(
            {
                "consignment_ref": [r for r, _ in _arch],
                "content": [b for _, b in _arch],
            }
        ),
        "consignment_ref string, content binary",
    ).coalesce(4)
    # localCheckpoint, not persist: four consumers read members, but a
    # plain persist pins a new cached RDD per INVOCATION of this query
    # for the session's lifetime (driver sweep + bench loops call it
    # repeatedly); the checkpointed RDD is released by the
    # ContextCleaner when the returned frame goes out of scope
    members = explode_tar_members(archives).localCheckpoint(eager=True)
    meta = scan_metadata(members).withColumn(
        "meta", F.from_json(F.col("metadata_bytes").cast("string"), METADATA_SCHEMA)
    )
    # xml_names has TWO consumers (the named-XML scan and the final
    # has_metadata join). Left lazy, each consumer replays the metadata
    # scan — a full pass over the checkpointed members plus its
    # last-match window and a second SortMergeJoin (measured: the
    # before-plan carries the members scan + WindowGroupLimit tower
    # twice, plans/r14/tar_pipeline_before.txt). The checkpoint stores
    # one slim (ref, xml_name) row per archive — strictly smaller than
    # the members checkpoint the query already pays — and both
    # consumers read the pinned rows (optimization round 14, guide
    # §2.4: share one evaluation instead of re-deriving).
    xml_names = meta.select(
        "consignment_ref",
        F.col("meta")["parameters"]["TRE"]["payload"]["xml"].alias("xml_name"),
    ).localCheckpoint(eager=False)
    named = scan_named_xml(members, xml_names)
    logs = scan_parser_log(members)
    consignments = archives.select("consignment_ref")
    chosen = best_xml(consignments, named, logs)
    counts = members.groupBy("consignment_ref").agg(F.count("*").alias("n_members"))
    return (
        chosen.join(counts, "consignment_ref")
        .join(xml_names, "consignment_ref", "left")
        .select(
            "consignment_ref",
            "n_members",
            F.col("xml_name").isNotNull().alias("has_metadata"),
            "xml_was_valid",
            "best_xml",
            classify_document_xml(F.col("best_xml")).alias("doc_kind"),
        )
    )
