"""Structured Streaming surface (SURVEY.md §2 S1–S6)."""
