"""Fixed StructType schemas for the reference's data universe
(SURVEY.md §1; FIXTURES.md).

The reference consumes dynamic JSON with TypedDict annotations; here every
shape is a pinned StructType parsed with PERMISSIVE mode so malformed rows
quarantine instead of failing the batch (reference containment,
lambda_function.py:131-136).

Real TRE metadata keys use hyphens (`error-messages`, `Consignment-Type`);
parquet/Spark field names use underscores — the hyphen->underscore mapping
happens at parse time via these schemas' field names against
``F.from_json`` with explicit paths.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- Message envelopes (messages.py:108-127) -------------------------------

# SQS record: body is a JSON-encoded SNS notification whose Message field
# is the JSON-encoded payload (double decode, messages.py:116-120).
SQS_RECORD_SCHEMA = T.StructType(
    [
        T.StructField("messageId", T.StringType(), True),
        T.StructField("eventSource", T.StringType(), True),
        T.StructField("body", T.StringType(), True),
    ]
)

SNS_BODY_SCHEMA = T.StructType(
    [
        T.StructField("Type", T.StringType(), True),
        T.StructField("MessageId", T.StringType(), True),
        T.StructField("Message", T.StringType(), True),  # inner JSON payload
        T.StructField("Timestamp", T.StringType(), True),
    ]
)

# --- Inner payloads (messages.py:17-105) ------------------------------------

# V2 message (aws_examples/sns/parsed-judgment-v2.json)
V2_PROPERTIES_SCHEMA = T.StructType(
    [
        T.StructField("messageType", T.StringType(), True),
        T.StructField("timestamp", T.StringType(), True),
        T.StructField("function", T.StringType(), True),
        T.StructField("producer", T.StringType(), True),
        T.StructField("executionId", T.StringType(), True),
        T.StructField("parentExecutionId", T.StringType(), True),
    ]
)

V2_PARAMETERS_SCHEMA = T.StructType(
    [
        T.StructField("status", T.StringType(), True),
        T.StructField("reference", T.StringType(), True),
        T.StructField("originator", T.StringType(), True),
        T.StructField("s3Bucket", T.StringType(), True),
        T.StructField("s3Key", T.StringType(), True),
        T.StructField("bundleFileURI", T.StringType(), True),
        T.StructField("metadataFilePath", T.StringType(), True),
        T.StructField("metadataFileType", T.StringType(), True),
    ]
)

# S3 event record (inner message Records[0], messages.py:72-105)
S3_RECORD_SCHEMA = T.StructType(
    [
        T.StructField("eventSource", T.StringType(), True),
        T.StructField("eventName", T.StringType(), True),
        T.StructField(
            "s3",
            T.StructType(
                [
                    T.StructField(
                        "bucket",
                        T.StructType([T.StructField("name", T.StringType(), True)]),
                        True,
                    ),
                    T.StructField(
                        "object",
                        T.StructType([T.StructField("key", T.StringType(), True)]),
                        True,
                    ),
                ]
            ),
            True,
        ),
    ]
)

# Superset payload schema: both variants parse into this; the kind column
# discriminates (messages.py:17-24).
PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("properties", V2_PROPERTIES_SCHEMA, True),
        T.StructField("parameters", V2_PARAMETERS_SCHEMA, True),
        T.StructField("Records", T.ArrayType(S3_RECORD_SCHEMA), True),
    ]
)

# --- TRE metadata (FIXTURES.md §3; ingester.py:26-31) -----------------------
# Hyphenated JSON keys are preserved here verbatim (Spark StructField names
# may contain hyphens); accessors quote them with backticks.

TRE_PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("filename", T.StringType(), True),  # null = reparse; MISSING = error
        T.StructField("xml", T.StringType(), True),
        T.StructField("metadata", T.StringType(), True),
        T.StructField("images", T.ArrayType(T.StringType()), True),
        T.StructField("log", T.StringType(), True),
    ]
)

TRE_SCHEMA = T.StructType(
    [
        T.StructField("reference", T.StringType(), True),
        T.StructField("payload", TRE_PAYLOAD_SCHEMA, True),
    ]
)

PARSER_SCHEMA = T.StructType(
    [
        T.StructField("uri", T.StringType(), True),
        T.StructField("court", T.StringType(), True),
        T.StructField("cite", T.StringType(), True),
        T.StructField("date", T.StringType(), True),
        T.StructField("name", T.StringType(), True),
        T.StructField("documentType", T.StringType(), True),
        T.StructField("attachments", T.ArrayType(T.StringType()), True),
        T.StructField("error-messages", T.ArrayType(T.StringType()), True),
        T.StructField("parser_run_id", T.StringType(), True),
    ]
)

TDR_SCHEMA = T.StructType(
    [
        T.StructField("Consignment-Type", T.StringType(), True),
        T.StructField("Source-Organization", T.StringType(), True),
        T.StructField("Contact-Name", T.StringType(), True),
        T.StructField("Contact-Email", T.StringType(), True),
        T.StructField("Internal-Sender-Identifier", T.StringType(), True),
        T.StructField("Consignment-Completed-Datetime", T.StringType(), True),
        # update-notification keys (personalise_email, ingester.py:100-125;
        # booleans per the reference's metadata fixtures)
        T.StructField("Judgment-Update", T.BooleanType(), True),
        T.StructField("Judgment-Update-Type", T.StringType(), True),
        T.StructField("Judgment-Update-Details", T.StringType(), True),
        T.StructField("Judgment-Neutral-Citation", T.StringType(), True),
        T.StructField("Judgment-No-Neutral-Citation", T.BooleanType(), True),
        T.StructField("Judgment-Reference", T.StringType(), True),
    ]
)

INGESTER_OPTIONS_SCHEMA = T.StructType(
    [
        T.StructField("auto_publish", T.BooleanType(), True),
        T.StructField("error_on_existing_document", T.BooleanType(), True),
    ]
)

METADATA_SCHEMA = T.StructType(
    [
        T.StructField(
            "parameters",
            T.StructType(
                [
                    T.StructField("TRE", TRE_SCHEMA, True),
                    T.StructField("PARSER", PARSER_SCHEMA, True),
                    T.StructField("TDR", TDR_SCHEMA, True),
                    T.StructField("INGESTER_OPTIONS", INGESTER_OPTIONS_SCHEMA, True),
                ]
            ),
            True,
        )
    ]
)

# --- Sink tables (SURVEY.md §1.1 #5) ----------------------------------------

DOCUMENTS_SINK_SCHEMA = T.StructType(
    [
        T.StructField("uri", T.StringType(), False),
        T.StructField("xml", T.StringType(), True),
        T.StructField("doc_type", T.StringType(), True),
        T.StructField("is_published", T.BooleanType(), True),
    ]
)

VERSIONS_SINK_SCHEMA = T.StructType(
    [
        T.StructField("uri", T.StringType(), False),
        T.StructField("version_n", T.IntegerType(), False),
        T.StructField("annotation_type", T.StringType(), True),
        T.StructField("annotation_automated", T.BooleanType(), True),
        T.StructField("annotation_message", T.StringType(), True),
        T.StructField("annotation_payload", T.StringType(), True),  # JSON
    ]
)

IDENTIFIERS_SINK_SCHEMA = T.StructType(
    [
        T.StructField("uri", T.StringType(), False),
        T.StructField("namespace", T.StringType(), False),
        T.StructField("value", T.StringType(), True),
        T.StructField("slug", T.StringType(), True),
    ]
)

PROPERTIES_SINK_SCHEMA = T.StructType(
    [
        T.StructField("uri", T.StringType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("value", T.StringType(), True),
    ]
)
