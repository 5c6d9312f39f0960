"""LRU segment deduplication (reference lru.rs, html_processing.rs:694-715):
a text segment longer than 100 chars that has already been seen more than
2 times is dropped (the 4th occurrence fails, test html_processing.rs:1540-1552).

Scope is per-document by default (deterministic, required for byte-identical
output); an optional shared cache handles near-duplicate boilerplate across
pages of one host within a partition (SURVEY.md §2.12).
"""

from __future__ import annotations

from collections import OrderedDict

MIN_DUPLICATE_CHECK_SIZE = 100
MAX_DUPLICATE_COUNT = 2


class LruCache:
    """Counting LRU with bounded size (reference lru.rs via html-cleaning)."""

    __slots__ = ("maxsize", "_data")

    def __init__(self, maxsize: int = 1000):
        self.maxsize = maxsize
        self._data: OrderedDict[str, int] = OrderedDict()

    def put_and_count(self, key: str) -> int:
        count = self._data.pop(key, 0) + 1
        self._data[key] = count
        if len(self._data) > self.maxsize:
            self._data.popitem(last=False)
        return count

    def clear(self) -> None:
        self._data.clear()


def duplicate_test(segment: str, cache: LruCache) -> bool:
    """True if this segment should be dropped as a duplicate."""
    s = segment.strip()
    if len(s) <= MIN_DUPLICATE_CHECK_SIZE:
        return False
    return cache.put_and_count(s) > MAX_DUPLICATE_COUNT + 1


def dedup_blocks(text: str, cache: LruCache) -> str:
    """Apply segment dedup over blank-line-separated blocks of the final
    text (the engine's block-level equivalent of the reference's
    per-element check)."""
    blocks = text.split("\n\n")
    kept = [b for b in blocks if not duplicate_test(b, cache)]
    return "\n\n".join(kept)
