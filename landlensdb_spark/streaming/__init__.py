"""Structured Streaming adapters (incremental ingest of the pages/events feed)."""
