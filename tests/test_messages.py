"""Envelope parsing + classification tests — mirrors the reference's
tests/test_all_messages.py and tests/test_main.py:18-50 (missing/empty
reference, malformed messages, message_id propagation)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from ds_caselaw_ingester_spark.schemas import SQS_RECORD_SCHEMA
from ds_caselaw_ingester_spark.sources.messages import parse_messages


def _sqs_record(message_id: str, payload: dict) -> dict:
    sns = {"Type": "Notification", "MessageId": "sns-1", "Message": json.dumps(payload)}
    return {"messageId": message_id, "eventSource": "aws:sqs", "body": json.dumps(sns)}


def _sns_record(payload: dict) -> dict:
    sns = {"Type": "Notification", "MessageId": "sns-2", "Message": json.dumps(payload)}
    return {"messageId": None, "eventSource": "aws:sns", "body": json.dumps(sns)}


V2_PAYLOAD = {
    "properties": {"messageType": "uk.gov.nationalarchives.tre.messages.CourtDocumentPackageAvailable"},
    "parameters": {
        "status": "COURT_DOCUMENT_PARSE_NO_ERRORS",
        "reference": "TDR-2022-DNWR",
        "originator": "TDR",
        "s3Bucket": "te-editorial-out-int",
        "s3Key": "TDR-2022-DNWR.tar.gz",
    },
}

S3_PAYLOAD = {
    "Records": [
        {
            "eventSource": "aws:s3",
            "eventName": "ObjectCreated:Put",
            "s3": {
                "bucket": {"name": "bulk-bucket"},
                "object": {"key": "bulk/2010+Reported/TDR-2025-XYZ.tar.gz"},
            },
        }
    ]
}


@pytest.fixture(scope="module")
def parsed(spark):
    records = [
        _sqs_record("m1", V2_PAYLOAD),
        _sns_record(V2_PAYLOAD),
        _sqs_record("m3", S3_PAYLOAD),
        _sqs_record("m4", {"parameters": {"reference": ""}}),  # empty ref -> invalid
        _sqs_record("m5", {"unrelated": True}),  # neither shape -> invalid
        {"messageId": "m6", "eventSource": "aws:sqs", "body": "NOT JSON {"},
    ]
    df = spark.createDataFrame(
        [(r["messageId"], r["eventSource"], r["body"]) for r in records],
        schema="message_id string, event_source string, body string",
    )
    rows = parse_messages(df).collect()
    return {(r.message_id, r.event_source): r for r in rows}


def test_v2_sqs_message(parsed):
    r = parsed[("m1", "aws:sqs")]
    assert r.kind == "v2"
    assert r.consignment_ref == "TDR-2022-DNWR"
    assert r.originator == "TDR"
    assert r.s3_bucket == "te-editorial-out-int"


def test_direct_sns_has_null_message_id(parsed):
    # messages.py:110-113 — SNS-path failures are not retryable
    r = parsed[(None, "aws:sns")]
    assert r.kind == "v2"
    assert r.message_id is None


def test_s3_message_ref_from_key_and_hardcoded_originator(parsed):
    r = parsed[("m3", "aws:sqs")]
    assert r.kind == "s3"
    assert r.consignment_ref == "TDR-2025-XYZ"  # stem of last key segment
    assert r.originator == "FCL S3"  # messages.py:80-81
    assert r.s3_bucket == "bulk-bucket"


def test_empty_reference_is_invalid(parsed):
    assert parsed[("m4", "aws:sqs")].kind == "invalid"


def test_unclassifiable_is_invalid(parsed):
    assert parsed[("m5", "aws:sqs")].kind == "invalid"


def test_malformed_json_is_invalid(parsed):
    assert parsed[("m6", "aws:sqs")].kind == "invalid"


def test_empty_records_array_is_invalid_not_crash(spark):
    """Review regression: a body decoding to {"Records": []} is valid
    JSON, so from_json yields an EMPTY array; under ANSI mode a plain
    element_at would throw and poison the whole micro-batch forever
    (checkpointed replay). try_element_at routes it to kind='invalid'
    — the quarantine contract."""
    import json

    from ds_caselaw_ingester_spark.sources.messages import parse_messages

    body = json.dumps({"Message": json.dumps({"Records": []})})
    records = spark.createDataFrame(
        [("m1", "aws:sqs", body)],
        "message_id string, event_source string, body string",
    )
    rows = parse_messages(records).collect()
    assert len(rows) == 1 and rows[0]["kind"] == "invalid"


def test_s3_record_without_object_key_is_invalid(spark):
    """Parity regression: an s3 record with no object key has no
    reference to derive — the reference raises (batch item failure).
    Previously the row kept kind='s3' with NULL ref and inserted a junk
    NULL-xml document; it must quarantine instead."""
    import json

    from ds_caselaw_ingester_spark.sources.messages import parse_messages

    payload = {
        "Records": [
            {"eventSource": "aws:s3", "s3": {"bucket": {"name": "b"}}}
        ]
    }
    body = json.dumps({"Message": json.dumps(payload)})
    records = spark.createDataFrame(
        [("m1", "aws:sqs", body)],
        "message_id string, event_source string, body string",
    )
    rows = parse_messages(records).collect()
    assert len(rows) == 1 and rows[0]["kind"] == "invalid"
