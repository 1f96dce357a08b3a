"""LLM-training-data pipeline operators (the 100 TB superset):
deduplication, similarity search, text analysis, multimodal plumbing.

These go beyond the reference's own surface (SURVEY.md §2 north-star) but
reuse its machinery: record ids, vector functions, tokenizers.
"""
