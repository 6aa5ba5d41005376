"""Structured Streaming surface (SURVEY.md §2.2 I)."""
