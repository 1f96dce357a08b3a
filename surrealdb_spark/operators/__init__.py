"""Query operators re-expressed as DataFrame plan builders.

Each module maps one reference operator family (SURVEY.md §2) onto
declarative PySpark; Catalyst picks the physical strategy.
"""
