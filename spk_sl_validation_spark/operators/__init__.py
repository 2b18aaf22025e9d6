"""Operator layer: relational ops, rule cascades, dedup, similarity."""
