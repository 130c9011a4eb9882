"""Structured Streaming extensions (the reference is batch-only,
SURVEY §2.10; these are the Spark-native stream analogues)."""
