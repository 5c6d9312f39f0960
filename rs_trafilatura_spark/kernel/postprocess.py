"""Per-type post passes (reference extract.rs:231-372):

- multi-candidate merge for service/forum pages (extract.rs:644-768)
- repeated-item collection for listing/category pages (extract.rs:524-636)
- collection-description prepend for category pages (extract.rs:472-514)
"""

from __future__ import annotations

from typing import Optional

from ..dom import Document, Element, select
from ..functions.textnorm import clean_text
from ..options import Options
from .boilerplate import is_boilerplate
from .content_select import score_content_node

_CONTAINER_SELECTORS = (
    "main", "[role='main']", "#content", ".content",
    "section", ".feed", ".stream", ".listing", ".items",
)


def _node_span(el: Element) -> list[tuple[int, int, str]]:
    if el._srcpos is None:
        return []
    start, end = el._srcpos
    return [(start, max(end, start), el.tag)]


def _collect_sibling_group(container: Element, child_tag: str,
                           min_count: int, min_words: int
                           ) -> Optional[list[tuple[str, Element]]]:
    children = select(container, child_tag)
    if len(children) < min_count:
        return None
    texts = []
    for el in children:
        cls = el.get("class")
        if cls and is_boilerplate(cls):
            continue
        text = el.text_content().strip()
        if len(text.split()) >= min_words:
            texts.append((text, el))
    return texts if len(texts) >= min_count else None


def try_collect_repeated_items(
    doc: Document, min_words: int = 15
) -> Optional[tuple[str, list[tuple[int, int, str]]]]:
    """Find containers with 3+ same-tag children carrying real text
    (news card grids, product lists); biggest group by total length wins.
    Returns (text, source spans — one per collected item node)."""
    best: Optional[list[tuple[str, Element]]] = None
    best_total = 0

    for sel_str in _CONTAINER_SELECTORS:
        for container in select(doc.root, sel_str):
            group = _collect_sibling_group(container, "article", 3, min_words)
            if group:
                total = sum(len(t) for t, _ in group)
                if total > best_total:
                    best_total, best = total, group
            for lst in select(container, "ul, ol"):
                group = _collect_sibling_group(lst, "li", 3, min_words)
                if group:
                    total = sum(len(t) for t, _ in group)
                    if total > best_total:
                        best_total, best = total, group

    articles = select(doc.root, "article")
    if len(articles) >= 3:
        texts = []
        for el in articles:
            cls = el.get("class")
            if cls and is_boilerplate(cls):
                continue
            text = el.text_content().strip()
            if len(text.split()) >= min_words:
                texts.append((text, el))
        if len(texts) >= 3:
            total = sum(len(t) for t, _ in texts)
            if total > best_total:
                best_total, best = total, texts

    if not best:
        return None
    spans: list[tuple[int, int, str]] = []
    for _, el in best:
        spans.extend(_node_span(el))
    return "\n\n".join(t for t, _ in best), spans


def try_multi_candidate_merge(
    doc: Document, opts: Options
) -> Optional[tuple[str, list[tuple[int, int, str]]]]:
    """Merge top-scoring non-overlapping candidates for service/marketing
    pages: sorted by score desc, keep top + others scoring >= top/5 whose
    text isn't already contained, cap 15k chars (extract.rs:644-768)."""
    body = doc.body
    body_len = max(len(clean_text(body.text_content())), 1)

    candidates: list[tuple[int, str, Element]] = []
    for el in body.iterdesc():
        if el.tag not in ("div", "section", "article", "main"):
            continue
        if is_boilerplate(el.get("class")) or is_boilerplate(el.get("id")):
            continue
        cleaned = clean_text(el.text_content())
        text_len = len(cleaned)
        if text_len < 50:
            continue
        if text_len / body_len > 0.85:
            continue
        depth = 0
        cur = el.parent
        while cur is not None and cur.tag != "body":
            depth += 1
            cur = cur.parent
        score = score_content_node(el, cleaned, text_len, depth)
        candidates.append((score, cleaned, el))

    if not candidates:
        return None
    candidates.sort(key=lambda c: -c[0])
    top_score = candidates[0][0]
    if top_score <= 0:
        return None

    merged: list[str] = []
    spans: list[tuple[int, int, str]] = []
    total = 0
    for score, text, el in candidates:
        if merged and score < top_score / 5:
            break
        if any(text in m or m in text for m in merged):
            continue
        if total + len(text) > 15_000:
            break
        merged.append(text)
        spans.extend(_node_span(el))
        total += len(text)
    if not merged:
        return None
    return "\n\n".join(merged), spans


_COLLECTION_DESC_SELECTOR = (
    "[class*='category-description'], [class*='collection-description'], "
    "[class*='category-intro'], [class*='collection-intro'], "
    "[class*='taxonomy-description'], [class*='archive-description']"
)


def extract_collection_description(doc: Document) -> Optional[str]:
    """Longest collection/category description wins (extract.rs:472-514)."""
    best = ""
    for el in select(doc.root, _COLLECTION_DESC_SELECTOR):
        text = clean_text(el.text_content())
        if len(text) > len(best):
            best = text
    return best if len(best) >= 50 else None
