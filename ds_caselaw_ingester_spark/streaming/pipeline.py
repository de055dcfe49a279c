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
