"""Similarity search (SURVEY.md §2.C N3/N6): placeholder, filled next."""
