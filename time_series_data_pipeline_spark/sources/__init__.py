"""Batch sources/sinks: wide gas-sensor CSV ingestion and the
long-format partitioned-Parquet "bucket" storage contract."""
