"""Suite module: text (filled in incrementally)."""
