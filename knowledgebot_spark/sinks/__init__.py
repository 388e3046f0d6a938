"""Sinks: keyed idempotent parquet upsert (K2), chunk-file writer (K1),
checkpoint state (S8/K5), processed markers (K6)."""
