"""Driver-facing query registry (queries + DuckDB oracle SQL)."""
