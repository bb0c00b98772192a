"""Operator library — each module implements one operator family Spark-first.

Modules cite the reference (``/root/reference/src/main.cc``) semantics they
reproduce or generalize; see SURVEY.md §2 for the inventory mapping.
"""
