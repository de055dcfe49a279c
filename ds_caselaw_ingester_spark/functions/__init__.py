"""Scalar column functions (SURVEY.md §2.2 P1-P15) and text/hash helpers."""
