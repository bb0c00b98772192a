"""Column-level function libraries."""
