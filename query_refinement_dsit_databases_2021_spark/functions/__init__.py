"""Reusable column-function helpers (scalar functions, SURVEY §2.8)."""
