"""Scalar function families (SURVEY.md §2.B E23–E29): placeholder, filled next."""
