"""Distributed operators: posting build, BM25 top-k, kNN, fusion, dedup."""
