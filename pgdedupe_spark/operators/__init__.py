"""Operator layer — one module per operator family from SURVEY.md §2."""
