"""Suite module: dedup (filled in incrementally)."""
