"""Structured Streaming facade (SURVEY.md §2.9/§7.4)."""
