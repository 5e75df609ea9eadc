"""Structured Streaming layer: the reference's continuous ingest loop."""
