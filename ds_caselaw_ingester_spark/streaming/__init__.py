"""Structured Streaming wrapper: incrementalized ingest with quarantine."""
