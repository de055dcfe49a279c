"""Oracle-checked decomposition of the tar-package path (SURVEY.md §2.1
S7-S12, P11).

`tar_pipeline` (queries_etl.py) exercises the binary path end-to-end but
is rows-only (a tar.gz is not SQL-expressible). These queries close the
oracle gap by splitting the path at its decision points:

- ``tar_member_listing`` — build REAL tar.gz archives from a
  deterministic rule, write them to local files, read them back through
  ``read_archives`` (S7: binaryFile + filename-stem ref) and explode via
  the genuine tarfile ``mapInPandas`` (S8). The DuckDB oracle predicts
  the exact member listing (names, tar ordinals, md5 of content) from
  the same construction rule — so the whole binary round-trip, including
  the skip-non-file semantics and ordinal numbering, is value-checked.

- ``tar_best_xml_select`` — the selection/fallback logic
  (file_helpers.py:76-115, ingester.py:215-223) over member rows
  synthesized from the ``documents`` table: named-XML scan with
  last-match-wins against a decoy member (S10), the genuine try-parse
  pandas UDF deciding valid vs fallback (S12), the 3-entity-escaped
  ``<error>`` parser-log synth (S11), and document classification of
  the chosen XML (P11). Validity is *constructed* (doc_id mod rules),
  so the oracle predicts what the real XML parser must decide.

At 100 TB: both plans are the production shapes — binaryFile streams
archive bytes executor-side (driver never touches content), the explode
is Arrow-batched, and the scans are windows/joins, not Python loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ds_caselaw_ingester_spark.plans.registry import register
from ds_caselaw_ingester_spark.sources.catalog import table

# ---------------------------------------------------------------------------
# tar_member_listing — S7 (fetch) + S8 (member explode), value-checked
# ---------------------------------------------------------------------------

TAR_MEMBER_LISTING_ORACLE = """
WITH r AS (SELECT i, printf('TDR-2031-%04d', i) AS ref FROM range(24) t(i))
SELECT ref AS consignment_ref,
       ref || '/TRE-' || ref || '-metadata.json' AS member_name,
       CAST(1 AS BIGINT) AS member_index,
       md5('{"i": ' || i || '}') AS content_md5,
       CAST(length('{"i": ' || i || '}') AS BIGINT) AS content_len
FROM r
UNION ALL
SELECT ref, ref || '/doc-' || i || '.xml', 2,
       md5('<judgment><p>' || i || '</p></judgment>'),
       length('<judgment><p>' || i || '</p></judgment>')
FROM r
UNION ALL
SELECT ref, ref || '/parser.log', 3, md5('line ' || i), length('line ' || i)
FROM r WHERE i % 4 <> 0
"""


# NOT @register-ed: S7/S8 coverage is a strict subset of tar_pipeline's
# (S7-S12 composite over the same Arrow tarfile scan), so this slot was
# freed for doc_chunks under the driver's 50-row cap. The round-trip
# stays oracle-checked in pytest
# (tests/test_oracle_parity.py::test_unregistered_tar_listing_matches_oracle).
#
# Genuine tar.gz round-trip: deterministic archives written to local
# files, fetched via binaryFile with filename-stem consignment refs
# (S7, messages.py:59-69,83-93), exploded member-by-member with tar
# ordinals via the Arrow mapInPandas tarfile scan (S8,
# file_helpers.py:24-29). A leading directory member pins the
# skip-non-file + ordinal-still-counts semantics. The oracle predicts
# every (name, ordinal, md5(content)) row from the construction rule.
_TAR_LISTING_FIXTURE_DIR: "str | None" = None


def q_tar_member_listing(spark: SparkSession, sf_dir: str) -> DataFrame:
    import io
    import os
    import tarfile
    import tempfile

    from ds_caselaw_ingester_spark.sources.tar import explode_tar_members, read_archives

    # ONE fixture dir per process, reused: mkdtemp per invocation leaked
    # a 24-file directory every pytest/bench run (the archives must
    # outlive the returned lazy frame, so a with-block can't own them)
    global _TAR_LISTING_FIXTURE_DIR
    try:
        tmp = _TAR_LISTING_FIXTURE_DIR
        if tmp is not None and os.path.isdir(tmp):
            archives = read_archives(spark, tmp).coalesce(2)
            members = explode_tar_members(archives)
            return _tar_listing_projection(members)
    except NameError:
        pass
    tmp = tempfile.mkdtemp(prefix="spark_tar_listing_")
    _TAR_LISTING_FIXTURE_DIR = tmp
    for i in range(24):
        ref = f"TDR-2031-{i:04d}"
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w:gz") as tf:
            # directory member at ordinal 0: skipped by the scan, but the
            # reference's enumerate still counts it (tar order preserved)
            d = tarfile.TarInfo(ref)
            d.type = tarfile.DIRTYPE
            d.mtime = 0
            tf.addfile(d)

            def add(name: str, data: bytes) -> None:
                info = tarfile.TarInfo(name)
                info.size = len(data)
                info.mtime = 0
                tf.addfile(info, io.BytesIO(data))

            add(f"{ref}/TRE-{ref}-metadata.json", b'{"i": %d}' % i)
            add(f"{ref}/doc-{i}.xml", b"<judgment><p>%d</p></judgment>" % i)
            if i % 4 != 0:
                add(f"{ref}/parser.log", b"line %d" % i)
        with open(os.path.join(tmp, f"{ref}.tar.gz"), "wb") as fh:
            fh.write(buf.getvalue())

    # 24 small fixtures -> a couple of explode tasks, not 32 one-row ones;
    # at real scale archive counts dwarf cores and the coalesce is a no-op.
    archives = read_archives(spark, tmp).coalesce(2)
    members = explode_tar_members(archives)
    return _tar_listing_projection(members)


def _tar_listing_projection(members: DataFrame) -> DataFrame:
    return members.select(
        "consignment_ref",
        "member_name",
        F.col("member_index").cast("long").alias("member_index"),
        F.md5(F.col("content")).alias("content_md5"),
        F.length(F.col("content")).cast("long").alias("content_len"),
    )


# ---------------------------------------------------------------------------
# tar_best_xml_select — S10 + S11 + S12 + P11, value-checked
# ---------------------------------------------------------------------------

TAR_BEST_XML_ORACLE = """
SELECT 'C' || CAST(doc_id AS VARCHAR) AS consignment_ref,
       (doc_id % 7 <> 0 AND doc_id % 3 <> 1) AS xml_was_valid,
       CASE
         WHEN doc_id % 7 <> 0 AND doc_id % 3 = 0
           THEN '<judgment><p>j' || doc_id || '</p></judgment>'
         WHEN doc_id % 7 <> 0 AND doc_id % 3 = 2
           THEN '<doc name="pressSummary"><p>s</p></doc>'
         WHEN doc_id % 5 <> 0
           THEN '<error>log &lt;' || doc_id || '&gt; &amp; done</error>'
         ELSE '<error>parser.log not found</error>'
       END AS best_xml,
       CASE
         WHEN doc_id % 7 <> 0 AND doc_id % 3 = 0 THEN 'judgment'
         WHEN doc_id % 7 <> 0 AND doc_id % 3 = 2 THEN 'pressSummary'
         ELSE 'parserLog'
       END AS doc_kind
FROM documents
"""


@register(
    "tar_best_xml_select",
    TAR_BEST_XML_ORACLE,
    doc="Best-XML selection and fallback over synthesized member rows: "
    "named-XML scan with NULL-name short-circuit and last-match-wins "
    "against an earlier decoy member (S10, file_helpers.py:76-82), "
    "genuine ElementTree try-parse deciding valid vs fallback (S12, "
    "file_helpers.py:98-115), 3-entity-escaped <error> synth of the "
    "parser.log with the not-found default (S11, file_helpers.py:85-95), "
    "and classification of the chosen XML (P11, ingester.py:215-223). "
    "Validity is constructed from doc_id mod rules, so the oracle "
    "predicts what the real parser must decide.",
    survey_ops=("S10", "S11", "S12", "P11"),
)
def q_tar_best_xml_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ds_caselaw_ingester_spark.functions.scalars import classify_document_xml
    from ds_caselaw_ingester_spark.session import ensure_oracle_safe

    ensure_oracle_safe(spark)
    from ds_caselaw_ingester_spark.sources.tar import (
        best_xml,
        scan_named_xml,
        scan_parser_log,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id")
    did = F.col("doc_id").cast("string")
    ref = F.concat(F.lit("C"), did)

    # TRE metadata's payload.xml name: absent (NULL) for doc_id % 7 == 0
    # -> the named scan must match nothing, even though a decoy member
    # whose NAME would match exists (file_helpers.py:76-82 empty-name
    # short-circuit).
    xml_name = F.when(F.col("doc_id") % 7 == 0, F.lit(None).cast("string")).otherwise(
        F.concat(F.lit("doc-"), did, F.lit(".xml"))
    )
    body = (
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.lit("<judgment><p>j"), did, F.lit("</p></judgment>")),
        )
        .when(F.col("doc_id") % 3 == 1, F.lit("<judgment><p>broken"))
        .otherwise(F.lit('<doc name="pressSummary"><p>s</p></doc>'))
    )
    log_content = F.concat(F.lit("log <"), did, F.lit("> & done"))
    members = (
        docs.select(
            ref.alias("consignment_ref"),
            F.explode(
                F.array(
                    # ordinal 0: decoy whose NAME contains the xml name but
                    # whose content is a well-formed wrong document — if the
                    # last-match window broke, this valid decoy would win
                    # and the value check would catch it
                    F.struct(
                        F.concat(F.lit("pre/doc-"), did, F.lit(".xml.bak")).alias(
                            "member_name"
                        ),
                        F.lit(0).alias("member_index"),
                        F.lit('<doc name="pressSummary"><p>decoy</p></doc>').alias(
                            "content"
                        ),
                    ),
                    # ordinal 1: parser.log, absent for doc_id % 5 == 0
                    F.struct(
                        F.when(F.col("doc_id") % 5 != 0, F.lit("parser.log")).alias(
                            "member_name"
                        ),
                        F.lit(1).alias("member_index"),
                        log_content.alias("content"),
                    ),
                    # ordinal 2: the named XML member (the one that must win)
                    F.struct(
                        F.concat(F.lit("body/doc-"), did, F.lit(".xml")).alias(
                            "member_name"
                        ),
                        F.lit(2).alias("member_index"),
                        body.alias("content"),
                    ),
                )
            ).alias("m"),
        )
        .select(
            "consignment_ref",
            F.col("m.member_name").alias("member_name"),
            F.col("m.member_index").alias("member_index"),
            F.col("m.content").cast("binary").alias("content"),
        )
        .where(F.col("member_name").isNotNull())
    )
    xml_names = docs.select(ref.alias("consignment_ref"), xml_name.alias("xml_name"))
    named = scan_named_xml(members, xml_names)
    logs = scan_parser_log(members)
    consignments = docs.select(ref.alias("consignment_ref"))
    chosen = best_xml(consignments, named, logs)
    return chosen.select(
        "consignment_ref",
        "xml_was_valid",
        "best_xml",
        classify_document_xml(F.col("best_xml")).alias("doc_kind"),
    )
