"""Heuristic extraction-quality score (reference extract.rs:880-985) —
the score the live path uses (extract.rs:401-406).
"""

from __future__ import annotations

import re
from typing import Optional

_EXPECTED_RANGE = {
    "article": (1500, 5000),
    "forum": (1000, 4000),
    "product": (300, 1500),
    "category": (500, 3000),
    "listing": (1000, 5000),
    "documentation": (2000, 8000),
    "service": (1500, 5000),
}

_BOILERPLATE_KEYWORDS = (
    "cookie", "consent", "subscribe", "newsletter", "sign up",
    "skip to content", "skip to main", "©", "copyright",
    "privacy policy", "terms of", "accept all",
)

_A_RE = re.compile(r"<a [^>]*>(.*?)</a>", re.S)


def compute_extraction_quality(
    content_text: str,
    content_html: Optional[str],
    html_len: int,
    page_type: str = "article",
) -> float:
    score = 1.0
    content_len = len(content_text)

    # 1. extraction-to-html ratio
    if html_len > 0:
        ratio = content_len / html_len
        if ratio < 0.005:
            score -= 0.30
        elif ratio < 0.01:
            score -= 0.20
        elif ratio < 0.02:
            score -= 0.10
        if ratio > 0.30:
            score -= 0.10

    # 2. length vs expected per page type
    expected_low, expected_mid = _EXPECTED_RANGE.get(page_type, (1500, 5000))
    if content_len < 100:
        score -= 0.30
    elif content_len < expected_low // 2:
        score -= 0.20
    elif content_len < expected_low:
        score -= 0.10
    if expected_low <= content_len <= expected_mid * 3:
        score += 0.05

    # 3. paragraph structure
    if content_html is not None:
        p_count = content_html.count("<p>") + content_html.count("<p ")
        if p_count == 0 and content_len > 200:
            score -= 0.20
    elif content_len > 200:
        score -= 0.05

    # 4. link density within the kept html
    if content_html is not None and content_len > 0:
        a_text_len = sum(len(m.group(1)) for m in _A_RE.finditer(content_html))
        link_density = a_text_len / content_len
        if link_density > 0.5:
            score -= 0.25
        elif link_density > 0.3:
            score -= 0.10

    # 5. boilerplate keywords in the first 200 chars
    first_lower = content_text[:200].lower()
    bp_count = sum(1 for kw in _BOILERPLATE_KEYWORDS if kw in first_lower)
    if bp_count >= 2:
        score -= 0.25
    elif bp_count == 1:
        score -= 0.10

    return max(0.0, min(1.0, score))
