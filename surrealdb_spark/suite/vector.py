"""Suite module: vector (filled in incrementally)."""
