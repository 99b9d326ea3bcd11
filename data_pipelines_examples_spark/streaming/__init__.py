"""Structured Streaming pipelines (file-source ETL, windowed analytics)."""
