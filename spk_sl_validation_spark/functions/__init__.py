"""Column-expression function surface (scalar / text / vector)."""
