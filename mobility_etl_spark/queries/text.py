"""Text analysis (SURVEY.md §2.C N5): placeholder, filled next."""
