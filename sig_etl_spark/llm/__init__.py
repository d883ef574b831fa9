"""LLM training-data pipeline operators (BASELINE north-star extensions).

Text analysis, deduplication, similarity search, multimodal plumbing —
designed around shuffle-friendly keys so they hold at 100 TB.
"""
