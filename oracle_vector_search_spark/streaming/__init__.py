"""Structured Streaming operators (SURVEY.md §2.8, §7 M7)."""
