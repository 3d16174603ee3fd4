"""Composable DataFrame -> DataFrame operators (SURVEY.md §2.3-2.9 + extensions)."""
