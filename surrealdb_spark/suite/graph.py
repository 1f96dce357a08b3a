"""Suite module: graph (filled in incrementally)."""
