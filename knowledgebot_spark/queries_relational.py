"""Relational-surface query catalog (SURVEY.md §2.3). Populated below."""
