"""Suite module: surql (filled in incrementally)."""
