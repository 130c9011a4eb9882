"""Logical query representation: parser -> QuerySpec -> planner/executor."""
