"""Reusable relational/dataflow operators (SURVEY.md §2 + LLM-pipeline set)."""
