"""Streaming runtime: changefeeds, SHOW CHANGES, LIVE SELECT analogues on
Structured Streaming (SURVEY.md §2.12)."""
