"""Relational breadth queries (SURVEY.md §2 status=A rows): filters, scalar
expressions, grouped aggregation, joins, sorts, set ops, ranking windows.
Populated in M2."""
