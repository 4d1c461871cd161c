"""Multimodal binary columns (SURVEY.md §2.C N4): placeholder, filled next."""
