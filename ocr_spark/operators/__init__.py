"""Spark operators: extraction pipeline, span algebra, dedup, similarity,
text analysis."""
