"""Structured Streaming surface (north-star; the reference is pure
batch — SURVEY.md §2.10)."""
