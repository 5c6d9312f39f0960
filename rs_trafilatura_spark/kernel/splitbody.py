"""Split-article-body merge (reference extract.rs:1512-1727): CMS layouts
that split one article into multiple sibling chunks (article__body,
body__container, entry-content, storybodycompanioncolumn) merged back
together when the single-chunk extraction under-delivers (< 5000 chars) and
the merge is 1.2x-4x bigger, capped at 20k."""

from __future__ import annotations

from typing import Optional

from ..dom import Element, select
from ..options import Options

_SIGNATURES = (
    "article__body",
    "body__container",
    "entry-content",
    "storybodycompanioncolumn",
)


def _signature_for_node(node: Element) -> Optional[str]:
    cls = node.get("class").lower()
    id_ = node.get("id").lower()
    for token in _SIGNATURES:
        if token in cls or token in id_:
            return token
    return None


def _nearest_article_ancestor(node: Element) -> Optional[Element]:
    cur: Optional[Element] = node
    while cur is not None:
        if cur.tag == "article":
            return cur
        cur = cur.parent
    return None


def _find_candidates(article: Element, token: str) -> list[Element]:
    out: list[Element] = []
    kept: set[int] = set()
    for el in article.iterdesc():
        cls = el.get("class")
        # the ancestor walk only matters for elements that WOULD be kept
        # (non-matching elements were only ever skipped, never added), and
        # an empty kept-set can never match — both guards keep the output
        # identical while skipping the per-element ancestor scan that
        # profiled at ~5% of the whole cascade
        if not (cls and token in cls.lower()):
            continue
        if kept and any(id(a) in kept for a in el.ancestors()):
            continue
        out.append(el)
        kept.add(id(el))
    return out


def _infer_signature(article: Element) -> Optional[tuple[str, list[Element]]]:
    """First signature token with >= 2 non-nested candidates, plus those
    candidates — ONE tree walk for all four tokens (was one walk per
    token) with the same per-token nesting suppression and the same
    priority order."""
    outs: dict[str, list[Element]] = {t: [] for t in _SIGNATURES}
    kepts: dict[str, set[int]] = {t: set() for t in _SIGNATURES}
    for el in article.iterdesc():
        cls = el.get("class")
        if not cls:
            continue
        low = cls.lower()
        for token in _SIGNATURES:
            if token in low:
                kept = kepts[token]
                if kept and any(id(a) in kept for a in el.ancestors()):
                    continue
                outs[token].append(el)
                kept.add(id(el))
    for token in _SIGNATURES:
        if len(outs[token]) >= 2:
            return token, outs[token]
    return None


def _viable_chunk(chunk: Element) -> bool:
    cls = chunk.get("class").lower()
    if "truncation" in cls or "truncate" in cls:
        return False
    if select(chunk, "p"):
        return True
    return len(chunk.text_content().strip()) >= 200


def maybe_merge_split_bodies(
    content_node: Element,
    opts: Options,
    baseline_text: str,
    page_title: Optional[str] = None,
    comments_are_content: bool = False,
    relaxed: bool = False,
) -> Optional[str]:
    from .traversal import extract_filtered_text

    baseline_len = len(baseline_text.strip())
    if baseline_len >= 5000:
        return None
    article = _nearest_article_ancestor(content_node)
    if article is None:
        return None
    token = _signature_for_node(content_node)
    candidates: Optional[list[Element]] = None
    if token is None:
        inferred = _infer_signature(article)
        if inferred is None:
            return None
        token, candidates = inferred
    # entry-content wrappers nest everywhere: only merge under relaxed mode
    if token == "entry-content" and not relaxed:
        return None
    if candidates is None:
        candidates = _find_candidates(article, token)
    if len(candidates) < 2:
        return None

    parts: list[str] = []
    for chunk in candidates:
        if not _viable_chunk(chunk):
            continue
        text, _ = extract_filtered_text(
            chunk, opts,
            filter_named_boilerplate=not relaxed,
            page_title=page_title,
            comments_are_content=comments_are_content,
        )
        if text.strip():
            parts.append(text)
    if len(parts) < 2:
        return None

    merged = "\n\n".join(parts)
    merged_len = len(merged.strip())
    if merged_len <= baseline_len + baseline_len // 5:
        return None
    if merged_len > baseline_len * 4 or merged_len > 20_000:
        return None
    if len(merged) > opts.max_extracted_len:
        return None
    return merged
