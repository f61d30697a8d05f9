"""Structured Streaming surface: continuous file-arrival ingestion and
watermarked event-time aggregation."""
