"""Extraction options — immutable per job, shipped as a Spark broadcast
(never a column).  Field-for-field mirror of the reference's 28-field
``Options`` struct (options.rs:28-233, defaults options.rs:236-269)."""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import Optional


@dataclass(frozen=True)
class Options:
    include_comments: bool = False
    include_tables: bool = True
    include_images: bool = False
    include_links: bool = False
    favor_precision: bool = False
    favor_recall: bool = False
    target_language: Optional[str] = None
    url: Optional[str] = None
    author_blacklist: tuple[str, ...] = ()
    deduplicate: bool = False
    min_extracted_size: int = 200
    min_extracted_len: int = 200
    max_extracted_len: int = 1_000_000
    min_output_size: int = 50
    min_output_comm_size: int = 10
    min_score: int = 1000
    max_duplicate_ratio: float = 0.5
    max_link_density: float = 0.8
    min_paragraph_cluster: int = 3
    include_formatting: bool = False
    only_with_metadata: bool = False
    max_tree_depth: int = 100
    min_word_length: int = 2
    use_fallback_extraction: bool = True
    dedup_cache_size: int = 1000
    include_title_in_content: bool = False
    output_markdown: bool = False
    page_type: Optional[str] = None
    # engine-side additions (not in the reference Options):
    # emit content_html alongside text
    include_content_html: bool = True
    # emit span offsets into the decoded source html (north rule)
    emit_spans: bool = True

    def with_url(self, url: Optional[str]) -> "Options":
        return replace(self, url=url)


DEFAULT_OPTIONS = Options()
