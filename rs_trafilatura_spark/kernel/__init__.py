"""Per-document extraction kernel (reference parity; SURVEY.md §2-§3)."""

from .extract import extract, extract_bytes

__all__ = ["extract", "extract_bytes"]
