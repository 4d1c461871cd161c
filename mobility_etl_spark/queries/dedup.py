"""Deduplication operators (SURVEY.md §2.C N1–N2): placeholder, filled next."""
