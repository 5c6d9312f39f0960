"""Parity widening (8): image/link toggle family
(tests/image_link_toggle_test.rs).  Cited per test."""

from rs_trafilatura_spark.kernel import extract
from rs_trafilatura_spark.options import Options

PAD = ("<p>Padding paragraph so the article clears every extraction "
       "threshold with room to spare for all modes.</p>" * 3)


def test_image_toggle_doesnt_affect_text_content():
    """image_link_toggle_test.rs (image_toggle_doesnt_affect_text_content)."""
    html = ("<html><body><article><h1>Title</h1><p>Paragraph text.</p>"
            '<img src="https://example.com/image.jpg">'
            f"<p>More text.</p>{PAD}</article></body></html>")
    with_img = extract(html, Options(include_images=True))
    without_img = extract(html, Options(include_images=False))
    assert with_img["content_text"] == without_img["content_text"]
    assert with_img["images"] and not without_img["images"]


def test_link_toggle_doesnt_affect_text_content():
    """image_link_toggle_test.rs (link_toggle_doesnt_affect_text_content)."""
    html = ('<html><body><article><p>Text with '
            f'<a href="https://example.com">a link</a> here.</p>{PAD}'
            "</article></body></html>")
    with_links = extract(html, Options(include_links=True))
    without = extract(html, Options(include_links=False))
    assert with_links["content_text"] == without["content_text"]
    assert "a link" in with_links["content_text"]


def test_image_filename_extracted():
    """image_link_toggle_test.rs (image_filename_extracted_correctly):
    query string stripped."""
    html = ("<html><body><article>"
            '<img src="https://example.com/path/to/my-photo.jpg?v=123">'
            f"{PAD}</article></body></html>")
    r = extract(html, Options(include_images=True))
    assert len(r["images"]) == 1
    assert r["images"][0]["filename"] == "my-photo.jpg"


def test_figcaption_extracted_from_figure():
    """image_link_toggle_test.rs (figcaption_extracted_from_figure)."""
    html = ("<html><body><article><p>Article content.</p><figure>"
            '<img src="https://example.com/photo.jpg" alt="A photo">'
            "<figcaption>This is the caption for the photo.</figcaption>"
            f"</figure>{PAD}</article></body></html>")
    r = extract(html, Options(include_images=True))
    assert len(r["images"]) == 1
    assert r["images"][0]["caption"] == "This is the caption for the photo."
    assert r["images"][0]["alt"] == "A photo"


def test_figcaption_whitespace_normalized():
    """image_link_toggle_test.rs (figcaption_whitespace_normalized)."""
    html = ("<html><body><article><figure>"
            '<img src="https://example.com/image.jpg">'
            "<figcaption>\n  Caption with\n  multiple   spaces   and\n"
            f"  newlines.\n</figcaption></figure>{PAD}</article></body></html>")
    r = extract(html, Options(include_images=True))
    assert len(r["images"]) == 1
    assert r["images"][0]["caption"] == "Caption with multiple spaces and newlines."


# --- tests/options_test.rs --------------------------------------------------------


def test_options_default_values():
    """options_test.rs (options_default_values_are_sensible)."""
    o = Options()
    assert not o.include_comments
    assert o.include_tables
    assert not o.include_images
    assert not o.include_links
    assert not o.favor_precision
    assert not o.favor_recall
    assert o.target_language is None
    assert o.url is None


def test_options_url_used_for_hostname():
    """options_test.rs (extract_with_options_can_use_options_url_for_hostname_extraction)."""
    r = extract("<html><body><article><p>ARTICLE_MARKER</p></article></body></html>",
                Options(url="https://example.com/some/path"))
    assert r["hostname"] == "example.com"


def test_default_options_equal_plain_extract():
    """options_test.rs (extract_and_extract_with_default_options_match)."""
    html = "<html><body><article><p>ARTICLE_MARKER</p></article></body></html>"
    a = extract(html)
    b = extract(html, Options())
    for k in ("content_text", "content_html", "comments_text",
              "comments_html", "title", "stage"):
        assert a[k] == b[k], k
