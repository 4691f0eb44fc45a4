"""Structured Streaming / incremental processing (SURVEY.md §2.10)."""
