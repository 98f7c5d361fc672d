"""Structured Streaming surface (SURVEY.md §2.9 T1-T5)."""
