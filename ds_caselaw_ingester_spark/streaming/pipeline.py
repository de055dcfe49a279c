"""Streaming ingest pipeline (SURVEY.md §2.7).

Reference delivery model: SNS -> SQS long-poll -> Lambda, at-least-once,
partial-batch failure reporting, DLQ after max receives
(terraform/main.tf:3-26; template.yml:62-69, 106-107). Spark-first
re-expression:

- source: ``readStream`` over a message directory (files = the queue);
  in production Kafka/Kinesis — same plan either way.
- the batch analyze plan (parse -> classify -> cascade -> route) runs
  unchanged inside ``foreachBatch`` — batch/streaming parity by
  construction.
- at-least-once + replay safety: checkpointing + idempotent upsert sinks
  (operators/upsert.py MERGE keyed on uri — redelivery is a no-op-or-
  update, exactly like the reference re-running an ingest).
- partial-batch failure: the quarantine split (C6) writes failed rows to
  a DLQ table instead of failing the trigger.
- no watermarks: the reference has no event-time logic (§2.7); windowed
  aggs are available via the normal API when extensions need them.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ds_caselaw_ingester_spark.schemas import SQS_RECORD_SCHEMA
from ds_caselaw_ingester_spark.sources.messages import parse_messages


def read_message_stream(spark: SparkSession, path: str, max_files: int = 1) -> DataFrame:
    """File-arrival stream of JSON SQS records. maxFilesPerTrigger is the
    analog of the SQS batch size (default 1, template.yml:62-65)."""
    raw = (
        spark.readStream.schema(SQS_RECORD_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .json(path)
    )
    return raw.select(
        F.col("messageId").alias("message_id"),
        F.col("eventSource").alias("event_source"),
        F.col("body"),
    )


def read_message_stream_rate(
    spark: SparkSession,
    rows_per_second: int = 10,
    rows_per_batch: int | None = None,
) -> DataFrame:
    """Queue-shaped (SQS/Kafka analog) UNBOUNDED message stream from the
    rate family of sources — completes the delivery-model picture next to
    the file-arrival source (read_message_stream): files model a drained
    queue directory; this models the live continuous feed where
    micro-batches are cut by time, not file boundaries. Swapping in a
    real Kafka source changes only this reader — every downstream plan
    (parse -> classify -> cascade -> route in foreachBatch) is identical,
    which is the point: source choice is a deployment detail, not a
    pipeline rewrite.

    Each rate row (timestamp, value) becomes a deterministic V2 SQS
    record derived from `value`: the body is the double-encoded SNS
    envelope the reference unwraps (messages.py:108-127), originators
    rotate TDR / FCL S3 / FCL, and every 7th message carries an empty
    consignment reference so the invalid -> quarantine branch stays
    exercised under continuous delivery.

    rows_per_batch: when set, uses the `rate-micro-batch` source
    (exactly that many rows per trigger, values dense from 0) —
    deterministic for tests; otherwise the wall-clock `rate` source at
    rows_per_second.
    """
    if rows_per_batch is not None:
        raw = (
            spark.readStream.format("rate-micro-batch")
            .option("rowsPerBatch", rows_per_batch)
            .load()
        )
    else:
        raw = (
            spark.readStream.format("rate")
            .option("rowsPerSecond", rows_per_second)
            .load()
        )
    v = F.col("value")
    ref = F.when(v % 7 == 0, F.lit("")).otherwise(
        F.concat(F.lit("TDR-R-"), v.cast("string"))
    )
    originator = (
        F.when(v % 3 == 0, F.lit("TDR"))
        .when(v % 3 == 1, F.lit("FCL S3"))
        .otherwise(F.lit("FCL"))
    )
    payload = F.to_json(
        F.struct(
            F.struct(
                ref.alias("reference"),
                originator.alias("originator"),
                F.lit("ingest-bucket").alias("s3Bucket"),
                F.concat(ref, F.lit(".tar.gz")).alias("s3Key"),
            ).alias("parameters")
        )
    )
    body = F.to_json(F.struct(payload.alias("Message")))
    return raw.select(
        F.concat(F.lit("rate-"), v.cast("string")).alias("message_id"),
        F.lit("aws:sqs").alias("event_source"),
        body.alias("body"),
    )


def run_ingest_stream(
    records: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    analyze: Callable[[DataFrame], DataFrame] | None = None,
):
    """Wire the analyze plan into foreachBatch with a quarantine split.

    Writes two parquet tables under out_dir: `processed/` (kind != invalid)
    and `quarantine/` (the DLQ — invalid rows with their message_id so a
    redrive can retry exactly these, per ReportBatchItemFailures).
    """
    analyze = analyze or parse_messages

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        analyzed = analyze(batch_df)
        analyzed.persist()
        try:
            ok = analyzed.where(F.col("kind") != "invalid").drop("payload")
            bad = analyzed.where(F.col("kind") == "invalid").drop("payload")
            # Fixed effect order (K13 analog): processed before quarantine.
            ok.write.mode("append").parquet(f"{out_dir}/processed")
            bad.write.mode("append").parquet(f"{out_dir}/quarantine")
        finally:
            analyzed.unpersist()

    return (
        records.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def run_full_ingest_stream(
    records: DataFrame,
    metadata: DataFrame,
    best_xmls: DataFrame,
    identifiers: DataFrame,
    sink_root: str,
    checkpoint_dir: str,
    members: DataFrame | None = None,
    environment: str = "prod",
    archives: DataFrame | None = None,
):
    """The COMPLETE reference pipeline under streaming delivery: each
    micro-batch runs analyze (parse -> classify -> cascade -> route) and
    perform_ingest (all K13 effect tables) — batch/streaming parity by
    construction, since both phases are the batch plans unchanged.

    Replay safety (at-least-once redelivery, the SQS model):
    - documents: MERGE keyed on uri — redelivery converges by key;
    - every append sink: epoch-keyed dynamic partition overwrite
      (perform_ingest batch_id) — a redelivered epoch replaces its own
      partition instead of appending duplicates.

    documents_state (J5 exists/published lookups) is re-read from the
    documents sink at each batch start — AFTER per-bucket crash
    recovery, since the bucketed MERGE can crash leaving a kb=N.old
    backup that partition discovery would read as a partition VALUE,
    doubling every uri in that bucket and fanning the analysis join out
    to contradictory is_published rows — so a batch sees every earlier
    batch's writes exactly once (the streaming analog of the reference
    checking MarkLogic per message).

    Invalid messages (unclassifiable / missing reference) are written
    to `quarantine/` partitioned by epoch BEFORE analysis — the C6 DLQ
    the simpler run_ingest_stream has; without it a parse-invalid
    message would vanish (analyze() filters kind='invalid'), with no
    message_id recorded for a ReportBatchItemFailures-style redrive.
    """
    from ds_caselaw_ingester_spark.operators.compaction import (
        read_parquet_or_none,
        recover_buckets,
    )
    from ds_caselaw_ingester_spark.operators.ingest import analyze, perform_ingest

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        docs_path = f"{sink_root}/documents"
        recover_buckets(docs_path[len("file:") :] if docs_path.startswith("file:") else docs_path)
        docs = read_parquet_or_none(spark, docs_path)
        # ONLY the first-batch case (no documents table yet) runs with
        # empty state; read_parquet_or_none propagates any other read
        # failure — silently treating a corrupt table as "first batch"
        # would flip exists_in_db/was_published for every message.
        state = (
            docs.select("uri", "is_published")
            if docs is not None
            else spark.createDataFrame([], "uri string, is_published boolean")
        )
        msgs = parse_messages(batch_df).persist()
        try:
            # DLQ first: analyze() drops kind='invalid', so quarantine is
            # the only record these messages existed. Epoch-keyed dynamic
            # overwrite — a redelivered epoch replaces its own partition.
            bad = msgs.where(F.col("kind") == "invalid").drop("payload")
            bad.withColumn("batch_id", F.lit(epoch_id)).write.mode(
                "overwrite"
            ).partitionBy("batch_id").option(
                "partitionOverwriteMode", "dynamic"
            ).parquet(f"{sink_root}/quarantine")
            a = analyze(
                msgs, metadata, best_xmls, identifiers, state, environment=environment
            )
            perform_ingest(
                a, sink_root, members=members, batch_id=epoch_id, archives=archives
            )
        finally:
            msgs.unpersist()

    return (
        records.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def windowed_ingest_counts(
    events: DataFrame,
    ts_col: str = "event_time",
    key_col: str = "originator",
    window: str = "1 hour",
    late: str = "2 hours",
):
    """Event-time windowed ingest-rate aggregation with a watermark.

    The reference has no event-time logic (SURVEY.md §2.7) — this is the
    monitoring extension a pipeline at scale needs: tumbling-window counts
    per originator, late rows beyond the watermark dropped so state is
    bounded. State size = |keys| × (late/window) windows per partition;
    the watermark is what makes this runnable forever on a real cluster
    (without it, window state grows without bound).
    """
    return (
        events.withWatermark(ts_col, late)
        .groupBy(F.window(F.col(ts_col), window).alias("win"), F.col(key_col))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            key_col,
            "n_events",
        )
    )


def run_windowed_counts_stream(events: DataFrame, out_dir: str, checkpoint_dir: str):
    """Materialize the windowed counts with append-mode semantics: a
    window's row is emitted exactly once, when the watermark passes its
    end — the idempotent-sink analog for time-series rollups."""
    agg = windowed_ingest_counts(events)
    return (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", f"{out_dir}/windowed_counts")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def sessionized_counts(
    events: DataFrame,
    ts_col: str = "event_time",
    key_col: str = "originator",
    gap: str = "15 minutes",
    late: str = "2 hours",
):
    """Event-time SESSION windows (gap-based, variable length) with a
    watermark — the streaming incrementalization of the batch
    sessionize query (plans/queries_relational.py user_sessions, which
    builds sessions with lag()+cumsum window functions).

    Spark-first: `F.session_window` keeps one open window per key in
    the state store, MERGES windows when a row bridges two (state-store
    native — no shuffle beyond the groupBy's), closes a session when
    `gap` passes without a row, and the watermark bounds state: a
    session older than (max event time - late) is finalized, emitted
    once (append mode), and evicted. State size = |active keys|, not
    |history| — the property that makes per-user sessionization over an
    unbounded event stream runnable forever.
    """
    return (
        events.withWatermark(ts_col, late)
        .groupBy(
            F.session_window(F.col(ts_col), gap).alias("win"), F.col(key_col)
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            key_col,
            "n_events",
        )
    )


def run_sessionized_stream(events: DataFrame, out_dir: str, checkpoint_dir: str):
    """Materialize finalized sessions append-only: each session row is
    emitted exactly once, when the watermark passes its end."""
    agg = sessionized_counts(events)
    return (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", f"{out_dir}/sessions")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
