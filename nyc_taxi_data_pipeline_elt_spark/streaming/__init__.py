"""Structured Streaming surface (SURVEY.md §2.9 — absent in the reference,
built here as the incremental-processing path its orchestration simulates)."""
