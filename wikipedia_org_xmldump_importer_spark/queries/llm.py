"""Placeholder — filled in a later milestone (SURVEY.md §7)."""
