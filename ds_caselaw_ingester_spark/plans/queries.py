"""Aggregator: importing this module registers every query family."""

from ds_caselaw_ingester_spark.plans import (  # noqa: F401
    queries_etl,
)
