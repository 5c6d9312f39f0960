"""Structured Streaming variant of the extraction pipeline (SURVEY.md §2.10)."""
