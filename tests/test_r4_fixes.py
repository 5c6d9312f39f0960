"""Round-4 regression tests for the advisor findings: PDF octal escapes,
generic ad tokens, multiprobe mask reuse, markdown per-node context, and
the curation cache ownership contract."""

import pytest

from rs_trafilatura_spark.functions.pdf import _unescape, extract_pdf_text
from rs_trafilatura_spark.functions.markdown import html_string_to_markdown


def test_pdf_unescape_octal_only_octal_digits():
    # \101 is octal 'A'; \8 and \9 are NOT octal — per the PDF spec the
    # backslash is dropped and the digit passes through (was: ValueError)
    assert _unescape(rb"\101") == b"A"
    assert _unescape(rb"\8") == b"8"
    assert _unescape(rb"\89") == b"89"
    assert _unescape(rb"a\9b") == b"a9b"
    # octal stops at 3 digits and at the first non-octal digit
    assert _unescape(rb"\1018") == b"A8"
    assert _unescape(rb"\12 ") == b"\n "


def test_pdf_extract_never_raises_on_bad_octal():
    # a malformed literal string with \89 inside a content stream must not
    # kill the task ("never raises on garbage" contract)
    body = b"BT (bad \\89 escape) Tj ET"
    pdf = (b"%PDF-1.4\n1 0 obj\n<< /Length " + str(len(body)).encode()
           + b" >>\nstream\n" + body + b"\nendstream\nendobj\n%%EOF")
    assert extract_pdf_text(pdf) == "bad 89 escape"


def test_ad_element_generic_tokens_need_id_or_core():
    from rs_trafilatura_spark.dom import Document
    from rs_trafilatura_spark.kernel.cleaning import _is_ad_element

    def el(html):
        return next(Document(
            f"<html><body>{html}</body></html>").root.iter("div"))

    # core ad tokens fire on class or id
    assert _is_ad_element(el('<div class="google_ads">x</div>'))
    assert _is_ad_element(el('<div id="banner-ad">x</div>'))
    assert _is_ad_element(el('<div class="sponsored">x</div>'))
    # generic marketing words alone on class do NOT prune (hero-banner
    # wraps a legitimate lede); on id they keep firing (fixture shape)
    assert not _is_ad_element(el('<div class="hero-banner">x</div>'))
    assert not _is_ad_element(el('<div class="promo">x</div>'))
    assert _is_ad_element(el('<div id="promo">x</div>'))
    assert _is_ad_element(el('<div id="site-banner">x</div>'))
    # token match, never substring
    assert not _is_ad_element(el('<div class="address downloads">x</div>'))


def test_ann_topk_probe_masks_generic():
    from rs_trafilatura_spark.operators.similarity import _probe_masks

    # popcount-bounded mask family for any probe_bits, and the ValueError
    # contract now applies to ann_topk too (it reuses _probe_masks)
    masks = _probe_masks(6, 3)
    assert len(masks) == 1 + 6 + 15 + 20
    assert all(bin(m).count("1") <= 3 for m in masks)
    with pytest.raises(ValueError):
        _probe_masks(4, 5)


def test_markdown_tail_not_line_start():
    # the tail after inline content continues the line: "* " there is NOT
    # a list marker and must be escaped; after <br> it IS at line start
    md = html_string_to_markdown("<p><b>a</b> * not a list</p>")
    assert "**a** \\* not a list" in md
    md2 = html_string_to_markdown("<p>x<br/>- item-ish</p>")
    # "-" is not a markdown special char; it survives either way
    assert "- item-ish" in md2


def test_markdown_literal_backtick_does_not_eat_escaping():
    # a lone backtick in prose must not open "inline code" and suppress
    # escaping of the rest of the text node
    md = html_string_to_markdown("<p>a ` tick then *literal*</p>")
    assert "\\*literal\\*" in md or "*literal*" in md
    # the concrete regression: specials AFTER the backtick still escape
    md2 = html_string_to_markdown("<p>` [x]</p>")
    assert "\\[x\\]" in md2


def test_mark_near_duplicates_cache_ownership(spark):
    from pyspark import StorageLevel
    from rs_trafilatura_spark.plans import curate

    df = spark.createDataFrame(
        [("u1", "same text here " * 30, None, "fp1", "article", 0.9, "en"),
         ("u2", "same text here " * 30, None, "fp2", "article", 0.9, "en")],
        "url string, content_text string, drop_reason string, "
        "fingerprint string, stage string, extraction_quality double, "
        "language string",
    )
    from rs_trafilatura_spark.operators import dedup as dedup_mod

    curate.mark_near_duplicates(df).count()
    # r7 contract: one call owns exactly the wide curated frame (the old
    # narrow (doc_id, text) cache is gone — the LSH tier reads text ONCE
    # and keeps its own feature cache in operators/dedup); that feature
    # cache holds at most one generation
    assert len(curate._OWNED_CACHE) == 1
    assert len(dedup_mod._LSH_FEATURE_CACHE) == 1
    first = list(curate._OWNED_CACHE)
    # next call releases the previous owned frames — nothing accumulates
    curate.mark_near_duplicates(df.limit(1)).count()
    assert len(curate._OWNED_CACHE) == 1
    assert len(dedup_mod._LSH_FEATURE_CACHE) == 1
    assert all(f.storageLevel == StorageLevel.NONE for f in first)
    curate.release_cache()
    assert not curate._OWNED_CACHE
    assert not dedup_mod._LSH_FEATURE_CACHE
    # caller-persisted input stays caller-owned — nothing is owned here
    # (the LSH feature cache is the dedup module's, not curate's)
    cached = df.persist(StorageLevel.MEMORY_AND_DISK)
    curate.mark_near_duplicates(cached).count()
    assert not curate._OWNED_CACHE
    assert cached.storageLevel != StorageLevel.NONE
    curate.release_cache()
    assert cached.storageLevel != StorageLevel.NONE
    cached.unpersist()
