"""Operators: extraction, linking, canonicalization, dedup, graph, vector, text."""
