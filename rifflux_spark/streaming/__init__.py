"""Streaming-flavored freshness surface (batch-equivalent incremental)."""
