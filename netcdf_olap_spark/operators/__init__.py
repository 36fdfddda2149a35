"""Operator library: each module re-expresses one family from
SURVEY.md §2 as composable DataFrame transformations."""
