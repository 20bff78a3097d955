"""Column-level helper functions (SURVEY.md §2.7, §2.8)."""
