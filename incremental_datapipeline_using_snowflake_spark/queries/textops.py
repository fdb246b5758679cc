"""Text-analysis and dedup query inventory (filled in the textops milestone)."""

QUERIES: dict = {}
