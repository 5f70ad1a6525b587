"""Reusable relational operator patterns (window dedup, joins, dedup, similarity)."""
