"""Scalar/vectorized function library (tokenize, chunk, embed, analyze)."""
