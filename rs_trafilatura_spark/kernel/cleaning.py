"""Document cleaning (reference html_processing.rs:120-346).

Order matters and changes output bytes:
1. profile boilerplate selector removal
2. figure->div rename when wrapping tables/blockquotes
3. noscript salvage (>500 chars, non-consent) — unwrap instead of remove
4. contextual footer removal (keep footers inside article/main)
5. bulk removal (TAGS_TO_CLEAN) / unwrap (TAGS_TO_STRIP) / modal+GDPR selectors
6. tail-aware empty-element pruning under a 1 MB guard
"""

from __future__ import annotations

from ..dom import Element, select
from ..options import Options
from .tags import (
    EMPTY_TAGS_TO_REMOVE,
    TABLE_TAGS_TO_STRIP,
    TAGS_TO_CLEAN,
    TAGS_TO_STRIP,
)

MAX_PRUNE_DOCUMENT_SIZE = 1_000_000
_NOSCRIPT_CONTENT_THRESHOLD = 500

_CONSENT_MARKERS = (
    "cookie", "consent", "gdpr", "privacy", "third party partners",
    "personalize content", "enable javascript",
)

_MODAL_CLASSES = frozenset(
    {"modal-dialog", "modal-content", "modal-backdrop", "modal-overlay", "modal"}
)


def _is_modal_consent(el: Element) -> bool:
    """Modal/GDPR/consent predicate — same semantics as the reference's
    selector list (html_processing.rs:237-252), checked attribute-side in
    the single cleaning pass instead of 14 separate tree scans."""
    cls = el.get("class")
    id_ = el.get("id")
    if cls:
        if any(c in _MODAL_CLASSES for c in cls.split()):
            return True
        if ("gdpr" in cls or "consent" in cls or "cookie-banner" in cls
                or "cookiebanner" in cls):
            return True
    if id_ and ("gdpr" in id_ or "consent" in id_ or "cookie-banner" in id_
                or "cookiebanner" in id_):
        return True
    return el.get("role") == "dialog"


_AD_CORE_TOKENS = frozenset(
    {"ad", "ads", "advert", "adverts", "advertisement", "advertisements",
     "sponsored"}
)
# Generic marketing words: real ads usually pair them with a core ad token
# ("banner-ad") or put them on ids; a class like "hero-banner" routinely
# wraps a legitimate article lede, so a bare class match would over-prune.
_AD_GENERIC_TOKENS = frozenset({"banner", "banners", "sponsor", "promo"})
_AD_TAGS = frozenset(
    {"div", "dd", "dt", "li", "ul", "ol", "dl", "p", "section", "span"}
)
_AD_SPLIT = __import__("re").compile(r"[^0-9A-Za-z]+")


def _is_ad_element(el: Element) -> bool:
    """Ad/banner containers by class/id token (the reference gets this from
    its bulk-cleaning preset, html_processing.rs:200-236 — e.g. its own
    tests expect id="google_ads" and id="banner-ad" removed,
    boilerplate_test.rs:412-501).  Token match, not substring, so
    "address"/"downloads" never false-positive (boilerplate_test.rs:504).
    Generic tokens (banner/promo/sponsor) fire alone only on the id
    attribute (the reference fixtures' shape); on class they need a core
    ad co-token so content wrappers like class="hero-banner" survive."""
    if el.tag not in _AD_TAGS:
        return False
    for attr in ("class", "id"):
        v = el.get(attr)
        if not v:
            continue
        tokens = frozenset(t for t in _AD_SPLIT.split(v.lower()) if t)
        if tokens & _AD_CORE_TOKENS:
            return True
        if attr == "id" and tokens & _AD_GENERIC_TOKENS:
            return True
    return False


def _inside_article_or_main(el: Element) -> bool:
    for anc in el.ancestors():
        if anc.tag in ("article", "main"):
            return True
        if anc.tag in ("body", "html"):
            break
    return False


def doc_cleaning(body: Element, opts: Options,
                 preserve_tags: frozenset = frozenset(),
                 boilerplate_selectors: tuple[str, ...] = ()) -> None:
    """Mutates the tree under ``body``."""
    # 1. page-type boilerplate selectors
    if boilerplate_selectors:
        for el in select(body, ", ".join(boilerplate_selectors)):
            if el.parent is not None:
                el.drop_tree()

    # 2-4 share one collection walk (figure rename, noscript salvage,
    # contextual footer removal); processing stays in the original pass
    # order, and none of the passes can detach another pass's nodes
    # beyond what the original per-pass selects saw (rename keeps the
    # node, unwrap keeps children attached).
    figures: list[Element] = []
    noscripts: list[Element] = []
    footers: list[Element] = []
    for el in body.iterdesc():
        t = el.tag
        if t == "figure":
            figures.append(el)
        elif t == "noscript":
            noscripts.append(el)
        elif t == "footer":
            footers.append(el)

    # 2. figure wrapping table/blockquote -> div (content container)
    for figure in figures:
        has_table = has_bq = False
        for d in figure.iterdesc():
            if d.tag == "table":
                has_table = True
            elif d.tag == "blockquote":
                has_bq = True
        if (opts.include_tables and has_table) or has_bq:
            figure.rename("div")

    # 3. noscript salvage
    for noscript in noscripts:
        text = noscript.text_content()
        low = text.lower()
        if len(text.strip()) > _NOSCRIPT_CONTENT_THRESHOLD and not any(
            m in low for m in _CONSENT_MARKERS
        ):
            noscript.unwrap()

    # 4. contextual footer removal
    for footer in footers:
        if footer.parent is not None and not _inside_article_or_main(footer):
            footer.drop_tree()

    # 5. bulk clean
    to_clean = set(TAGS_TO_CLEAN) - {"footer"} - set(preserve_tags)
    to_strip = set(TAGS_TO_STRIP) | set(TABLE_TAGS_TO_STRIP)
    if opts.include_images:
        to_clean -= {"figure", "picture", "source"}
        to_strip -= {"img"}
    if not opts.include_tables:
        to_clean |= {"table", "td", "th", "tr"}

    # single pass: collect victims first (mutating while iterating is unsafe);
    # modal/GDPR/consent removal rides the same pass
    clean_victims: list[Element] = []
    strip_victims: list[Element] = []
    for el in body.iterdesc():
        # both predicates are False for attribute-less elements (the
        # majority), so skip the calls outright for those
        if el.tag in to_clean or (el.attrib and (_is_modal_consent(el)
                                                 or _is_ad_element(el))):
            clean_victims.append(el)
        elif el.tag in to_strip:
            strip_victims.append(el)
    for el in clean_victims:
        if el.parent is not None:
            el.drop_tree()
    for el in strip_victims:
        if el.parent is not None:
            el.unwrap()

    # 6. tail-aware empty-element pruning with size guard
    if len(body.text_content()) < MAX_PRUNE_DOCUMENT_SIZE:
        prune_empty_elements(body)


def prune_empty_elements(root: Element) -> None:
    """Remove EMPTY_TAGS_TO_REMOVE elements with no children and no text;
    drop_tree keeps tails (reference html_processing.rs:323-346,
    extractor/pruning.rs:76-116)."""
    # iterate until fixpoint (removing a leaf can empty its parent)
    changed = True
    while changed:
        changed = False
        victims = [
            el
            for el in root.iterdesc()
            if el.tag in EMPTY_TAGS_TO_REMOVE
            and not el.children
            and not el.text.strip()
        ]
        for el in victims:
            if el.parent is not None:
                el.drop_tree()
                changed = True
