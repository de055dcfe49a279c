"""Relational operators: URI cascade, routing matrices, upsert, dedup,
similarity search, text analysis."""
