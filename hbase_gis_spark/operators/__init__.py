"""Spark DataFrame operators: spatial queries, grouped top-k, dedup,
similarity search, and text analysis."""
