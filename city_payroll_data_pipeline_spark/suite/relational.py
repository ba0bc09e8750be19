"""Placeholder — filled in subsequent milestones."""

QUERIES = {}
