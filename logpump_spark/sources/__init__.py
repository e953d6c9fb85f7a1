"""Batch and streaming source/sink connectors."""
