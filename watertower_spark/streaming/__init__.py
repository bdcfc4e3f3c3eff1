"""Structured Streaming ingestion for the index (beyond-reference capability)."""
