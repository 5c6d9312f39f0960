"""Parity widening (9): robustness family (tests/robustness_test.rs) —
malformed inputs must never raise; degenerate inputs return an empty
result with warnings.  Cited per test.  (The 10 MB stress case lives in
test_kernel.py::test_huge_page_completes.)"""

import pytest

from rs_trafilatura_spark.kernel import extract


@pytest.mark.parametrize("html", [
    "<p>text<div>more",                 # unclosed tags
    "<p><div></p></div>",               # invalid nesting
    '<div class="test id=broken>',      # broken attributes
])
def test_malformed_html_never_raises(html):
    """robustness_test.rs (extract_does_not_panic_on_malformed_html_*)."""
    r = extract(html)  # must not raise
    assert isinstance(r["content_text"], str)


def test_missing_closing_tags_still_extracts():
    """robustness_test.rs (…_missing_closing_tags)."""
    r = extract("<html><body><article>content")
    assert "content" in r["content_text"] or r["warnings"]


def test_incomplete_entities_keep_text():
    """robustness_test.rs (…_incomplete_entities)."""
    r = extract("&amp text &lt;")
    assert "text" in r["content_text"] or r["warnings"]


@pytest.mark.parametrize("html", ["", "   \n\t  ", "<html></html>",
                                  "<body></body>"])
def test_degenerate_inputs_return_partial_result_with_warnings(html):
    """robustness_test.rs (extract_returns_partial_result_for_*)."""
    r = extract(html)
    assert r["content_text"] == ""
    assert r["warnings"]
