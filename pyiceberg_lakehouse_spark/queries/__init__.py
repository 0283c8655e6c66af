"""Relational query surface (scans, filters, aggs, joins, windows, set ops)."""
