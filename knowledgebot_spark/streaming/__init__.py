"""Structured Streaming surface (SURVEY.md §7 M5)."""
