"""Structured Streaming equivalents of the reference's queue/worker
semantics (SURVEY.md §2.9 T1-T8)."""
