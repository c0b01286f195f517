"""Structured Streaming wrappers: incremental (availableNow) extraction."""
