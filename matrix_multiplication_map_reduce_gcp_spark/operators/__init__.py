"""Relational + matrix operator surface (SURVEY.md §2.3 categories)."""
