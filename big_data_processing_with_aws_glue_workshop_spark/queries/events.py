"""Placeholder — filled in later this round."""

QUERIES = {}
ORACLES = {}
