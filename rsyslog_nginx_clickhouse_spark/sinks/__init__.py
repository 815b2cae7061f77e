"""Sinks: typed-table targets beyond the built-in parquet path."""
