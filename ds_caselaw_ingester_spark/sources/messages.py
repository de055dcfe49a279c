"""Message-envelope source operators (SURVEY.md §2.1 S1-S6).

Reference flow (messages.py:108-127): an event carries Records[]; SQS
records hold a JSON body that is an SNS notification whose Message field
is the JSON payload (double decode); direct SNS records carry the payload
one level up. The payload is then classified (messages.py:17-24):
Records[0].eventSource == 'aws:s3' -> s3 message; has 'parameters' -> v2;
else invalid (quarantined, not raised, in this engine).

All parsing is F.from_json with pinned schemas — JVM-side Jackson, no
Python. Malformed JSON yields NULL structs which route to 'invalid'.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ds_caselaw_ingester_spark.schemas import (
    PAYLOAD_SCHEMA,
    SNS_BODY_SCHEMA,
)

KIND_V2 = "v2"
KIND_S3 = "s3"
KIND_INVALID = "invalid"


def unwrap_envelope(records: DataFrame) -> DataFrame:
    """S1/S2: records(message_id, event_source, body) -> + payload struct.

    Both delivery paths carry the payload inside an SNS notification's
    `Message` field — SQS wraps the notification in the queue record's
    body (messages.py:116-120: json.loads(body)["Message"]), direct SNS
    puts it in the record's Sns.Message (messages.py:122-125), which
    this input model normalizes into `body` upstream. So the decode is
    IDENTICAL for both sources; what differs is only message_id: NULL
    for direct SNS, so failures are not retryable (messages.py:108-113).
    """
    sns = F.from_json(F.col("body"), SNS_BODY_SCHEMA)
    payload = F.from_json(sns["Message"], PAYLOAD_SCHEMA)
    message_id = F.when(
        F.col("event_source") == "aws:sqs", F.col("message_id")
    ).otherwise(F.lit(None).cast("string"))
    extra = [c for c in records.columns if c not in ("message_id", "event_source", "body")]
    return records.select(
        message_id.alias("message_id"),
        F.col("event_source"),
        payload.alias("payload"),
        *extra,
    )


def classify_payload(payload: Column) -> Column:
    """S3 classification ladder (messages.py:17-24).

    try_element_at, NOT element_at: a body decoding to {"Records": []}
    is valid JSON, so from_json yields an EMPTY array (not NULL), and
    under Spark 4's default ANSI mode element_at(…, 1) would throw —
    failing the whole micro-batch and, with checkpointed offsets,
    replaying the same poison message forever. try_element_at yields
    NULL and the ladder routes the row to kind='invalid', which is the
    documented quarantine contract."""
    first_record_source = F.try_element_at(payload["Records"], F.lit(1))["eventSource"]
    return (
        F.when(first_record_source == "aws:s3", F.lit(KIND_S3))
        .when(payload["parameters"].isNotNull(), F.lit(KIND_V2))
        .otherwise(F.lit(KIND_INVALID))
    )


def consignment_reference(kind: Column, payload: Column) -> Column:
    """S4/S5: V2 -> parameters.reference (empty/missing -> NULL = invalid,
    messages.py:48-57); s3 -> filename stem of the object key
    (messages.py:83-93)."""
    v2_ref = F.nullif(F.trim(payload["parameters"]["reference"]), F.lit(""))
    # try_element_at: total on empty Records (see classify_payload)
    key = F.try_element_at(payload["Records"], F.lit(1))["s3"]["object"]["key"]
    s3_ref = F.split(F.element_at(F.split(key, "/"), -1), "\\.", 2).getItem(0)
    return F.when(kind == KIND_V2, v2_ref).when(kind == KIND_S3, s3_ref)


def parse_messages(records: DataFrame) -> DataFrame:
    """Full S1-S6 stage: envelope unwrap + classify + reference + routing
    fields. Invalid rows (unclassifiable or missing reference) stay in the
    frame with kind='invalid' for the quarantine branch."""
    unwrapped = unwrap_envelope(records)
    kind = classify_payload(F.col("payload"))
    out = unwrapped.withColumn("kind", kind)
    ref = consignment_reference(F.col("kind"), F.col("payload"))
    originator = F.when(
        F.col("kind") == KIND_S3, F.lit("FCL S3")  # hardcoded (messages.py:80-81)
    ).otherwise(F.col("payload")["parameters"]["originator"])
    bucket = F.when(
        F.col("kind") == KIND_S3,
        F.try_element_at(F.col("payload")["Records"], F.lit(1))["s3"]["bucket"]["name"],
    ).otherwise(F.col("payload")["parameters"]["s3Bucket"])
    key = F.when(
        F.col("kind") == KIND_S3,
        F.try_element_at(F.col("payload")["Records"], F.lit(1))["s3"]["object"]["key"],
    ).otherwise(F.col("payload")["parameters"]["s3Key"])
    return (
        out.withColumn("consignment_ref", ref)
        .withColumn("originator", originator)
        .withColumn("s3_bucket", bucket)
        .withColumn("s3_key", key)
        .withColumn(
            "kind",
            F.when(
                (F.col("kind") == KIND_V2) & F.col("consignment_ref").isNull(),
                F.lit(KIND_INVALID),
            )
            # an s3 record without an object key has no reference to
            # derive — the reference raises (KeyError -> batch item
            # failure); here the row is re-kinded invalid so it lands in
            # quarantine instead of inserting a junk NULL-xml document
            .when(
                (F.col("kind") == KIND_S3) & F.col("consignment_ref").isNull(),
                F.lit(KIND_INVALID),
            )
            .otherwise(F.col("kind")),
        )
    )
