"""Scalar/vectorized function library (numpy-inside-Arrow-batch helpers)."""
