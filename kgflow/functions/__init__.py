"""Column-function library: text stats, hygiene, portable hashing."""
