"""Aggregator: importing this module registers every query family."""

from ds_caselaw_ingester_spark.plans import (  # noqa: F401
    queries_dedup,
    queries_envelope,
    queries_etl,
    queries_relational,
    queries_routing,
    queries_similarity,
    queries_tar,
    queries_text,
)
