"""Multimodal column support (SURVEY.md §2 C5)."""
