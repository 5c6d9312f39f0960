"""Parity widening (5): comments detection family (tests/comments_test.rs).
Each test cites its Rust source."""

import pytest

from rs_trafilatura_spark.kernel import extract
from rs_trafilatura_spark.options import Options

COMMENTS = ("<p>First comment with sufficient words to pass the minimum "
            "threshold requirement for comment extraction.</p>"
            "<p>Second comment adding more content to ensure the word count "
            "is adequate for comment detection.</p>")
ARTICLE = ("<p>Main article content here with sufficient text to pass "
           "extraction threshold.</p>"
           "<p>Second article paragraph adds more substance for proper "
           "content scoring and extraction.</p>")


def test_comments_excluded_by_default():
    """comments_test.rs (extract_excludes_comments_by_default)."""
    html = ('<html><body><article><p>ARTICLE_MARKER</p></article>'
            '<div id="comments"><p>COMMENT_MARKER</p></div></body></html>')
    r = extract(html)
    assert "ARTICLE_MARKER" in r["content_text"]
    assert r["comments_text"] is None
    assert r["comments_html"] is None


@pytest.mark.parametrize("container", [
    '<section class="comments">{c}</section>',     # comments class
    '<div id="disqus_thread">{c}</div>',           # disqus
    '<div class="fb-comments">{c}</div>',          # facebook comments
    '<div id="respond">{c}</div>',                 # wordpress respond
    '<div class="post-comment-list">{c}</div>',    # regex class fallback
])
def test_comment_containers_detected(container):
    """comments_test.rs (extract_includes_comments_when_option_enabled /
    _detects_disqus_container / _detects_fb_comments_container /
    _detects_respond_id / _detects_comment_list_class_via_regex_fallback)."""
    html = (f"<html><body><article>{ARTICLE}</article>"
            f"{container.format(c=COMMENTS)}</body></html>")
    r = extract(html, Options(include_comments=True))
    assert "Main article content" in r["content_text"]
    assert r["comments_text"] is not None, container
    assert "First comment" in r["comments_text"]
