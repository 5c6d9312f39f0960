"""Parity widening (7): recall/precision mode behavior
(tests/recall_test.rs, tests/precision_test.rs).  Cited per test."""

from rs_trafilatura_spark.kernel import extract
from rs_trafilatura_spark.options import Options


def test_recall_mode_accepts_sparse_content():
    """recall_test.rs (recall_mode_accepts_sparse_content): recall never
    extracts less than default."""
    html = ('<html><body><div id="content">'
            "<p>Brief article with minimal text.</p></div></body></html>")
    default = extract(html)
    recall = extract(html, Options(favor_recall=True))
    assert len(recall["content_text"]) >= len(default["content_text"])
    if recall["content_text"]:
        assert "Brief article" in recall["content_text"]


def test_recall_mode_includes_borderline_content():
    """recall_test.rs (recall_mode_includes_borderline_content)."""
    html = ("<html><body><article><h2>Quick Update</h2>"
            "<p>Short paragraph one.</p><p>Short paragraph two.</p>"
            "</article></body></html>")
    r = extract(html, Options(favor_recall=True))
    assert "Short paragraph one" in r["content_text"]
    assert "Short paragraph two" in r["content_text"]


def test_recall_mode_extracts_more_or_equal():
    """recall_test.rs (recall_mode_extracts_more_or_equal_content)."""
    html = ('<html><body><div id="main">'
            "<p>Main content paragraph with reasonable length and "
            "substance.</p>"
            "<p>Another paragraph of the main region with more words in "
            "it.</p></div>"
            '<aside class="related">Related reading teaser text.</aside>'
            "</body></html>")
    default = extract(html)
    recall = extract(html, Options(favor_recall=True))
    assert len(recall["content_text"]) >= len(default["content_text"])
    assert "Main content paragraph" in recall["content_text"]


def test_precision_mode_extracts_less_or_equal():
    """precision_test.rs family invariant (mirrors the recall invariant in
    the opposite direction: precision never extracts more than default on
    boilerplate-adjacent pages)."""
    html = ('<html><body><article>'
            "<p>Core article paragraph with plenty of meaningful words to "
            "extract for every mode today.</p>"
            "<p>Second core paragraph with additional substance and "
            "sentences for scoring purposes.</p>"
            '<div class="related-teaser">You may also like this other '
            "story teaser text block.</div></article></body></html>")
    default = extract(html)
    precision = extract(html, Options(favor_precision=True))
    assert len(precision["content_text"]) <= len(default["content_text"])
    assert "Core article paragraph" in precision["content_text"]
