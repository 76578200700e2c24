"""Spark operator stages: vectorized extraction + skew handling."""
