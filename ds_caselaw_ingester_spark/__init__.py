"""PySpark-native analytics/ETL engine with the capabilities of
nationalarchives/ds-caselaw-ingester, re-expressed Spark-first.

The reference (read-only at /root/reference) is an event-driven
document-ETL Lambda: SNS/SQS message intake -> tar.gz unpack -> Akoma
Ntoso XML classification -> identifier-lookup URI cascade -> MarkLogic
upsert + S3 asset fan-out + conditional publish/notify.

This package re-expresses every operator in that pipeline (SURVEY.md §2)
as idiomatic PySpark DataFrame / Structured Streaming code over
relational tables, and extends it with large-scale LLM-data-pipeline
operators (dedup, similarity search, text analysis, multimodal columns).

Layout:
    session     SparkSession builder tuned for local[N] and cluster use
    sources/    message-envelope parsing, tar-member explode, catalog
    functions/  scalar column functions (P1-P15 of SURVEY.md §2.2)
    operators/  cascade / routing / upsert / dedup / similarity / text
    plans/      the driver-facing query registry + oracle SQL
    streaming/  Structured Streaming wrapper (foreachBatch + quarantine)
"""

__version__ = "0.1.0"
