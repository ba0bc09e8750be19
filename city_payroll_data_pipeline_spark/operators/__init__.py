"""Relational operators: report layer, dedup, similarity, windows."""
