"""Composed dataflow operators (dedup, similarity search, pipelines)."""
