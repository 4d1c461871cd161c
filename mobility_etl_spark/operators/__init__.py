"""Composite operators Spark lacks as single primitives (SURVEY.md §2)."""
