"""Structured Streaming surface (SURVEY.md §2.B E30–E37)."""
