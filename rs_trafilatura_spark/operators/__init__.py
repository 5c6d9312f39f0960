"""Corpus-level operators: dedup, similarity search, text stats, multimodal."""
