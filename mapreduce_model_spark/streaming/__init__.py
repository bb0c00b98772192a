"""Structured Streaming operators (north-star: streams are first-class)."""
