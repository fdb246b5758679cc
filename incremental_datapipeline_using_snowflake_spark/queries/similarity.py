"""Similarity-search query inventory (filled in the similarity milestone)."""

QUERIES: dict = {}
