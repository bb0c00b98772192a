"""Input connectors."""
