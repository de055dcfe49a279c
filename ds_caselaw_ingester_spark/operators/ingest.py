"""The end-to-end ingest plan: the reference's `Ingest` object (analyze
phase, ingester.py:178-210) and `perform_ingest` (execute phase,
ingester.py:542-575) as composable DataFrame stages.

Analyze (pure, one row per message — all lookups are joins):
    parse_messages (S1-S6)
      -> metadata join + projections (P3-P10, S9)
      -> document classification from best XML (P11, S12)
      -> URI cascade (J1-J3, A1)
      -> routing decisions (C1-C5, P15)

Execute (effects, fixed K13 order — driver-side sequencing because Spark
gives no cross-sink ordering guarantee, mirroring perform_ingest,
ingester.py:540-575):
    documents MERGE (K1/K2+K3) -> versions append -> identifiers append
    (C5) -> properties upsert (K4/K5) -> notifications (K12) -> asset
    fan-out (K6-K10, save_files_to_s3) -> publish asset-copies (K11).
External notifications (K12) are modeled as an appended `notifications`
effect-log table — observable, replayable, idempotent.

At 100 TB: analyze is shuffle-light — the only wide exchanges are the
identifier-index broadcasts (tiny) and the metadata join keyed on
consignment_ref; execute shuffles each sink once on `uri`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ds_caselaw_ingester_spark.functions.scalars import (
    classify_document_xml,
    trimmed_uri,
    upload_state,
)
from ds_caselaw_ingester_spark.operators.routing import (
    annotation_message,
    email_action,
    insert_or_update_route,
    will_publish,
)
from ds_caselaw_ingester_spark.operators.upsert import upsert_parquet_table_bucketed
from ds_caselaw_ingester_spark.operators.uri_cascade import (
    expected_namespace_col,
    resolve_uris,
)


def analyze(
    messages: DataFrame,
    metadata: DataFrame,
    best_xmls: DataFrame,
    identifiers: DataFrame,
    documents_state: DataFrame,
    environment: str = "prod",
) -> DataFrame:
    """Build the fully-resolved analysis record per message.

    messages:        parse_messages() output (message_id, kind,
                     consignment_ref, originator, ...)
    metadata:        (consignment_ref, metadata struct) — parsed TRE json
    best_xmls:       (consignment_ref, best_xml, xml_was_valid) — S12
    identifiers:     (slug, value, namespace, uri) index
    documents_state: (uri, is_published) current sink state (J5)
    environment:     deployment environment; outside 'prod' editorial
                     notifications are suppressed (ingester.py:288-290)
    """
    m = metadata.select(
        "consignment_ref",
        F.col("metadata.parameters.TRE.reference").alias("tre_reference"),
        F.col("metadata.parameters.TRE.payload.filename").alias("source_filename"),
        F.col("metadata.parameters.TRE.payload.images").alias("images"),
        F.col("metadata.parameters.PARSER.uri").alias("parser_uri"),
        F.col("metadata.parameters.PARSER.cite").alias("extracted_ncn"),  # P9
        F.col("metadata.parameters.PARSER.parser_run_id").alias("parser_run_id"),
        F.col("metadata.parameters.TDR").alias("tdr"),
        F.col("metadata.parameters.INGESTER_OPTIONS.auto_publish").alias("opt_auto_publish"),
        F.col("metadata.parameters.INGESTER_OPTIONS.error_on_existing_document").alias(
            "opt_error_on_existing"
        ),
    )
    enriched = (
        messages.where(F.col("kind") != "invalid")
        .join(m, "consignment_ref", "left")
        .join(best_xmls, "consignment_ref", "left")
        # The PRE-override reference survives as raw_consignment_ref:
        # the reference snapshots it at Ingest.__init__ (ingester.py:193)
        # BEFORE the TRE update (:206) and every FILE operation — tar
        # filename, copy_file member paths {ref}/parser.log,
        # {ref}/{source}, {ref}/{image} — reads the snapshot
        # (:364-413). Tar members are keyed by the archive filename
        # stem, so asset joins keyed on the post-override ref would
        # probe 'TRE-X/parser.log' against member 'X/parser.log' and
        # silently miss (review finding).
        .withColumn("raw_consignment_ref", F.col("consignment_ref"))
        # P10: S3-path consignment ref is overwritten by the TRE reference;
        # V2 path keeps the message reference (messages.py:33-34, 84-93)
        .withColumn(
            "consignment_ref",
            F.when(
                (F.col("kind") == "s3") & F.col("tre_reference").isNotNull(),
                F.col("tre_reference"),
            ).otherwise(F.col("consignment_ref")),
        )
        .withColumn("is_tdr", F.col("tdr").isNotNull())  # P3
        .withColumn("auto_publish", F.coalesce(F.col("opt_auto_publish"), F.lit(False)))  # P5
        .withColumn(
            "error_on_existing", F.coalesce(F.col("opt_error_on_existing"), F.lit(False))
        )  # P6
        .withColumn("doc_kind", classify_document_xml(F.col("best_xml")))  # P11
        .withColumn("slug_candidate", trimmed_uri(F.col("parser_uri")))  # P4
        .withColumn("ncn_candidate", F.col("extracted_ncn"))
        .withColumn("expected_ns", expected_namespace_col(F.col("doc_kind")))
        .withColumn("msg_id", F.coalesce(F.col("message_id"), F.col("consignment_ref")))
    )
    # msg_id is the join key back from resolution, so it must be UNIQUE
    # within the batch: an at-least-once source can deliver the same
    # message_id twice in one micro-batch (and direct-SNS rows fall back
    # to the shared consignment_ref), and duplicate keys would fan the
    # enriched<->resolved join out quadratically — every sink then gets
    # 2x rows. First-wins per msg_id mirrors the reference, where a
    # redelivery re-runs the SAME work idempotently rather than twice in
    # one invocation.
    w_dedup = Window.partitionBy("msg_id").orderBy(
        F.col("message_id").asc_nulls_last()
    )
    enriched = (
        enriched.withColumn("_rn", F.row_number().over(w_dedup))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    resolved = resolve_uris(
        enriched.select(
            "msg_id", "doc_kind", "slug_candidate", "ncn_candidate", "expected_ns"
        ),
        identifiers,
    )
    analysis = enriched.join(
        resolved.select("msg_id", "status", "uri", "exists_in_db"), "msg_id", "left"
    )
    # J5 — published-flag lookup. documents_state is the full corpus-sized
    # sink table, NOT a dimension: never broadcast-hint it (at 100 TB that
    # is an executor OOM). Leave the strategy to Catalyst/AQE — with the
    # 2-column projection AQE still broadcasts when the batch's state
    # slice is genuinely small, and falls back to a shuffled hash join
    # keyed on `uri` otherwise.
    pub_state = documents_state.select(
        F.col("uri"), F.col("is_published").alias("was_published")
    )
    analysis = analysis.join(pub_state, "uri", "left").withColumn(
        "was_published", F.coalesce(F.col("was_published"), F.lit(False))
    )
    return analysis.select(
        "msg_id",
        "message_id",
        "kind",
        "consignment_ref",
        "raw_consignment_ref",
        "originator",
        "doc_kind",
        "status",
        "uri",
        "exists_in_db",
        "is_tdr",
        "auto_publish",
        "error_on_existing",
        "source_filename",
        "images",
        "extracted_ncn",
        "parser_run_id",
        "best_xml",
        "tdr",
        will_publish(
            F.col("originator"),
            F.col("auto_publish"),
            F.col("exists_in_db"),
            F.col("was_published"),
        ).alias("will_publish"),
        email_action(
            F.col("originator"),
            F.col("auto_publish"),
            F.col("exists_in_db"),
            environment=F.lit(environment),
        ).alias("email_action"),
        insert_or_update_route(F.col("exists_in_db"), F.col("error_on_existing")).alias(
            "write_route"
        ),
        annotation_message(F.col("is_tdr"), F.col("exists_in_db")).alias("annotation"),
        upload_state(F.col("exists_in_db")).alias("upload_state"),
    )


def perform_ingest(
    analysis: DataFrame,
    sink_root: str,
    members: DataFrame | None = None,
    batch_id: int | None = None,
    archives: DataFrame | None = None,
) -> dict[str, int]:
    """Execute phase: apply effects in the reference's fixed order (K13).

    Rows routed to error states (cascade cardinality errors, C3
    error_existing) are quarantined, not written — per-record containment.
    Returns row counts per effect table for observability.

    Counts come from ``Observation`` metrics attached to each sink plan —
    the write action itself computes them, so no sink plan ever runs
    twice (a second action per sink is O(batch) wasted work at scale).

    members: optional tar member rows (consignment_ref, member_name) used
    to gate the parser.log asset on the member actually existing
    (reference suppress(FileNotFoundException), ingester.py:396-405).
    Without it every consignment is assumed to carry a parser.log. When
    the rows also carry a `content` column (explode_tar_members output),
    asset rows additionally get `content_md5` of the member bytes the
    reference would copy — see operators/assets.py.

    archives: optional raw (consignment_ref, content) archive frame; with
    it the tar asset row's content_md5 is the md5 of the whole tar.gz
    (the reference stores the original archive, ingester.py:373-380).

    batch_id: when set (the foreachBatch epoch), append sinks become
    dynamic partition OVERWRITES of the `batch_id=<n>` partition — an
    at-least-once redelivery of the same epoch replaces its own rows
    instead of appending duplicates, so every sink table converges on
    replay (the documents MERGE is already idempotent by key). This is
    the standard Spark epoch-keyed exactly-once-ish sink pattern.
    """
    from pyspark.sql import Observation

    analysis = analysis.persist()
    # A row errors out of the happy path when resolution errored, the
    # insert-vs-update gate refused, OR the routing ladder hit an
    # unknown originator (email_action == 'error'; the reference raises
    # RuntimeError there, failing the message into the DLQ —
    # ingester.py's originator dispatch). Review regression: the third
    # clause was missing, so unknown-originator rows sailed through
    # every sink while their 'error' action was silently dropped by the
    # notifications filter — no quarantine row, no operator signal.
    bad = (
        F.col("status").startswith("error")
        | (F.col("write_route") == "error_existing")
        | (F.col("email_action") == "error")
    )
    ok = analysis.where(~bad).persist()
    try:
        quarantine = analysis.where(bad)
        counts: dict[str, int] = {}

        def append_counted(df: DataFrame, name: str) -> None:
            obs = Observation(f"ingest_{name}")
            observed = df.observe(obs, F.count(F.lit(1)).alias("n"))
            if batch_id is None:
                observed.write.mode("append").parquet(f"{sink_root}/{name}")
            else:
                (
                    observed.withColumn("batch_id", F.lit(int(batch_id)))
                    .write.mode("overwrite")
                    .option("partitionOverwriteMode", "dynamic")
                    .partitionBy("batch_id")
                    .parquet(f"{sink_root}/{name}")
                )
            counts[name] = obs.get["n"]

        # K1/K2 — documents upsert: partition-pruned MERGE (only the
        # key-hash buckets this batch touches are read and rewritten —
        # O(touched buckets) per batch, not O(table))
        docs_obs = Observation("ingest_documents")
        docs = ok.select(
            "uri",
            F.col("best_xml").alias("xml"),
            F.col("doc_kind").alias("doc_type"),
            F.col("will_publish").alias("is_published"),
        ).observe(docs_obs, F.count(F.lit(1)).alias("n"))
        upsert_parquet_table_bucketed(docs, f"{sink_root}/documents", key="uri")
        counts["documents"] = docs_obs.get["n"]

        # versions append (annotation payload, P7/C4)
        versions = ok.select(
            "uri",
            F.col("annotation").alias("annotation_message"),
            F.col("auto_publish").alias("annotation_automated"),
            F.when(F.col("exists_in_db"), F.lit("update")).otherwise(F.lit("insert")).alias(
                "annotation_type"
            ),
        )
        append_counted(versions, "versions")

        # C5 — identifiers: only types with an identifier class AND an
        # NCN. Falsy filter, not just null (reference: `if ncn:` —
        # ingester.py:277): an empty-string cite must not write a bogus
        # ('', ukncn) identifier row into the index J2 later probes.
        idents = (
            ok.where(F.col("doc_kind").isin("judgment", "pressSummary"))
            .where(F.col("extracted_ncn").isNotNull() & (F.col("extracted_ncn") != ""))
            .select(
                "uri",
                expected_namespace_col(F.col("doc_kind")).alias("namespace"),
                F.col("extracted_ncn").alias("value"),
            )
        )
        append_counted(idents, "identifiers")

        # K4/K5 — properties (TDR rows only; parser-run-id iff present)
        tdr_props = ok.where(F.col("is_tdr")).selectExpr(
            "uri",
            """stack(5,
                'source-organisation', tdr['Source-Organization'],
                'source-name', tdr['Contact-Name'],
                'source-email', tdr['Contact-Email'],
                'transfer-consignment-reference', tdr['Internal-Sender-Identifier'],
                'transfer-received-at', tdr['Consignment-Completed-Datetime']
            ) AS (name, value)""",
        ).where(F.col("value").isNotNull())
        parser_props = ok.where(F.col("parser_run_id").isNotNull()).select(
            "uri", F.lit("parser-run-id").alias("name"), F.col("parser_run_id").alias("value")
        )
        props = tdr_props.unionByName(parser_props)
        append_counted(props, "properties")

        # K12 — notifications effect log, with the personalise_email
        # payload the reference sends per message (ingester.py:100-125).
        # New-judgment sends carry an extra trailing 'doctype' key
        # (ingester.py:305-306); update sends stay doctype-free.
        from ds_caselaw_ingester_spark.operators.routing import (
            document_noun,
            personalisation_json,
        )

        notifications = ok.where(F.col("email_action").startswith("email")).select(
            "msg_id",
            "uri",
            F.col("email_action").alias("template"),
            personalisation_json(
                F.col("uri"),
                F.col("tdr"),
                doctype=F.when(
                    F.col("email_action") == "email_new",
                    document_noun(F.col("doc_kind")),
                ),
            ).alias("personalisation_json"),
        )
        append_counted(notifications, "notifications")

        # K6-K10 — asset fan-out (reference save_files_to_s3, runs after
        # metadata writes and before publish, ingester.py:560-562)
        from ds_caselaw_ingester_spark.operators.assets import asset_rows, publish_copies

        asset_src = ok.select(
            "uri",
            # PRE-override ref: file operations use the Ingest.__init__
            # snapshot in the reference (see analyze), and tar members
            # are keyed by the archive filename stem — the post-P10 TRE
            # ref would miss every member join and misname the tar
            F.col("raw_consignment_ref").alias("ref"),
            "source_filename",
            "images",
        )
        has_log = None
        if members is not None:
            logs_present = (
                # containment, matching the reference scan (file_helpers
                # .py:88) and sources/tar.py scan_parser_log
                members.where(F.col("member_name").contains("parser.log"))
                .select(F.col("consignment_ref").alias("ref"))
                .distinct()
                .withColumn("_has_log", F.lit(True))
            )
            asset_src = asset_src.join(logs_present, "ref", "left")
            has_log = F.col("_has_log").isNotNull()
        # persist: TWO sinks consume the fan-out (assets, then the K11
        # asset_copies projection of it). Left lazy, the whole plan —
        # including md5 over every tar member's bytes and the
        # whole-archive digests — re-executes for the second write
        # (review regression vs this function's own "no sink plan runs
        # twice" contract).
        assets = asset_rows(
            asset_src,
            ["uri"],
            has_parser_log=has_log,
            members=members,
            archives=archives,
        ).persist()
        try:
            append_counted(assets, "assets")

            # K11 — publish: copy every asset under the published uri's
            # prefix private -> public (docs/workflow.md:169-175);
            # unpublish is the is_published=false flag already written
            # in the documents MERGE
            pub_uris = ok.where(F.col("will_publish") == F.lit(True)).select("uri")
            copies = publish_copies(assets, pub_uris)
            append_counted(copies, "asset_copies")
        finally:
            assets.unpersist()

        # C6 — quarantine/DLQ
        q = quarantine.select("msg_id", "message_id", "status", "write_route")
        append_counted(q, "quarantine")
        return counts
    finally:
        ok.unpersist()
        analysis.unpersist()
