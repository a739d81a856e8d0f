"""Physical-plan inspection (SURVEY.md §4)."""
