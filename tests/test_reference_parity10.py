"""Parity widening (10): the last three unmirrored reference families —
tests/extraction_test.rs (content-rule selection + boilerplate exclusion),
tests/boilerplate_test.rs (semantic/class/id discard tables incl. its
PADDING-constant style), tests/spike_markdown_validation.rs (markdown
pipeline + escape/post-process/table functions).  Cited per test."""

import pytest

from rs_trafilatura_spark.functions.markdown import (
    escape_markdown,
    html_string_to_markdown,
    html_table_to_markdown,
    post_process_markdown,
)
from rs_trafilatura_spark.kernel import extract
from rs_trafilatura_spark.options import Options


# ---- extraction_test.rs ---------------------------------------------------------


def test_extract_prefers_article_over_main():
    """extraction_test.rs:4-29."""
    html = """
        <html><body>
            <main><p>MAIN_ONLY_TEXT</p></main>
            <nav>NAV_TEXT</nav>
            <article><p>ARTICLE_ONLY_TEXT</p></article>
            <footer>FOOTER_TEXT</footer>
        </body></html>
    """
    r = extract(html)
    assert "ARTICLE_ONLY_TEXT" in r["content_text"]
    assert "NAV_TEXT" not in r["content_text"]
    assert "FOOTER_TEXT" not in r["content_text"]


def test_extract_uses_main_when_no_article_present():
    """extraction_test.rs:32-52."""
    html = """
        <html><body>
            <nav>NAV_TEXT</nav>
            <main><p>MAIN_FALLBACK_TEXT</p></main>
            <footer>FOOTER_TEXT</footer>
        </body></html>
    """
    r = extract(html)
    assert "MAIN_FALLBACK_TEXT" in r["content_text"]
    assert "NAV_TEXT" not in r["content_text"]
    assert "FOOTER_TEXT" not in r["content_text"]


def test_extract_supports_role_article():
    """extraction_test.rs:55-69."""
    r = extract("<html><body><div role='article'><p>ROLE_ARTICLE_TEXT</p>"
                "</div></body></html>")
    assert "ROLE_ARTICLE_TEXT" in r["content_text"]


def test_extract_supports_role_main():
    """extraction_test.rs:72-86."""
    r = extract("<html><body><div role='main'><p>ROLE_MAIN_TEXT</p>"
                "</div></body></html>")
    assert "ROLE_MAIN_TEXT" in r["content_text"]


def test_extract_applies_content_heuristics_and_excludes_boilerplate():
    """extraction_test.rs:89-104."""
    long_text = "LONG_TEXT " * 200
    html = (f"<html><body><nav>NAV_TEXT</nav><div id='story'>SHORT</div>"
            f"<div id='maintext'><p>{long_text}</p></div>"
            f"<footer>FOOTER_TEXT</footer></body></html>")
    r = extract(html)
    assert "LONG_TEXT" in r["content_text"]
    assert "NAV_TEXT" not in r["content_text"]
    assert "FOOTER_TEXT" not in r["content_text"]


def test_extract_returns_partial_result_when_only_boilerplate_present():
    """extraction_test.rs:107-113 (warning string from extract.rs:162)."""
    r = extract("<html><body><nav>NAV_TEXT</nav>"
                "<footer>FOOTER_TEXT</footer></body></html>")
    assert r["content_text"] == ""
    assert r["warnings"]
    assert any("Content extraction failed" in w for w in r["warnings"])


def test_partial_result_has_meaningful_warning():
    """extraction_test.rs:116-125."""
    r = extract("<html><body><nav>NAV_TEXT</nav></body></html>")
    assert r["content_text"] == ""
    assert r["warnings"] and r["warnings"][0]
    assert any("Content extraction failed" in w for w in r["warnings"])


def test_extract_handles_section_with_content_class():
    """extraction_test.rs:128-147."""
    html = """
        <html><body>
            <nav>NAV_TEXT</nav>
            <section class="content"><p>SECTION_CONTENT_TEXT</p></section>
            <footer>FOOTER_TEXT</footer>
        </body></html>
    """
    r = extract(html)
    assert "SECTION_CONTENT_TEXT" in r["content_text"]
    assert "NAV_TEXT" not in r["content_text"]
    assert "FOOTER_TEXT" not in r["content_text"]


def test_extract_excludes_boilerplate_inside_article():
    """extraction_test.rs:150-169."""
    html = """
        <html><body><article>
            <p>ARTICLE_CONTENT</p>
            <nav>INTERNAL_NAV</nav>
            <aside>INTERNAL_ASIDE</aside>
        </article></body></html>
    """
    r = extract(html)
    assert "ARTICLE_CONTENT" in r["content_text"]
    assert "INTERNAL_NAV" not in r["content_text"]
    assert "INTERNAL_ASIDE" not in r["content_text"]


def test_extract_article_nested_in_nav_uses_fallback():
    """extraction_test.rs:172-192 (Ok-with-REAL_CONTENT or no-content are
    both acceptable per the reference's own match arms)."""
    html = """
        <html><body>
            <nav><article><p>NESTED_ARTICLE</p></article></nav>
            <div class="content"><p>REAL_CONTENT</p></div>
        </body></html>
    """
    r = extract(html)
    assert "REAL_CONTENT" in r["content_text"] or r["content_text"] == ""


# ---- boilerplate_test.rs --------------------------------------------------------

# boilerplate_test.rs:4 — its PADDING constant, verbatim
PADDING = ("<p>Additional paragraph with enough content to ensure the "
           "extraction algorithm finds sufficient text density to extract "
           "this article content properly.</p><p>Second padding paragraph "
           "adding more sentences to satisfy the minimum scoring threshold "
           "required for content extraction to succeed.</p>")


def _in_out(html, present, absent):
    r = extract(html)
    for s in present:
        assert s in r["content_text"], (s, r["content_text"])
    for s in absent:
        assert s not in r["content_text"], (s, r["content_text"])


def test_nav_is_excluded_even_inside_article():
    """boilerplate_test.rs:7-27."""
    _in_out("<html><body><article><nav>MENU_TEXT</nav>"
            "<p>BODY_TEXT</p></article></body></html>",
            ["BODY_TEXT"], ["MENU_TEXT"])


def test_site_footer_excluded_article_footer_preserved():
    """boilerplate_test.rs:30-55."""
    _in_out(f"<html><body><footer>SITE_FOOTER_TEXT</footer><article>"
            f"<p>ARTICLE_BODY</p>{PADDING}"
            f"<footer>ARTICLE_FOOTER_TEXT</footer></article></body></html>",
            ["ARTICLE_BODY", "ARTICLE_FOOTER_TEXT"], ["SITE_FOOTER_TEXT"])


def test_aside_is_excluded_even_inside_article():
    """boilerplate_test.rs:58-78."""
    _in_out("<html><body><article><aside>RELATED_SIDEBAR_TEXT</aside>"
            "<p>ARTICLE_BODY</p></article></body></html>",
            ["ARTICLE_BODY"], ["RELATED_SIDEBAR_TEXT"])


def test_related_and_recommended_sections_excluded_by_class():
    """boilerplate_test.rs:81-109."""
    _in_out(f"<html><body><article><p>ARTICLE_BODY</p>{PADDING}"
            '<div class="recommended">RECOMMENDED_TEXT</div>'
            '<div class="more-from">MORE_FROM_TEXT</div>'
            '<div class="you-may-like">YOU_MAY_LIKE_TEXT</div>'
            "</article></body></html>",
            ["ARTICLE_BODY"],
            ["RECOMMENDED_TEXT", "MORE_FROM_TEXT", "YOU_MAY_LIKE_TEXT"])


def test_footer_related_legal_classes_excluded_by_class():
    """boilerplate_test.rs:112-138."""
    _in_out("<html><body><article><p>ARTICLE_BODY</p>"
            '<div class="copyright">COPYRIGHT_TEXT</div>'
            '<div class="legal">LEGAL_TEXT</div>'
            '<div class="disclaimer">DISCLAIMER_TEXT</div>'
            '<div class="site-footer">SITE_FOOTER_TEXT</div>'
            "</article></body></html>",
            ["ARTICLE_BODY"],
            ["COPYRIGHT_TEXT", "LEGAL_TEXT", "DISCLAIMER_TEXT",
             "SITE_FOOTER_TEXT"])


def test_schema_breadcrumb_list_inside_article_excluded():
    """boilerplate_test.rs:141-165."""
    _in_out("<html><body><article>"
            '<ol itemscope itemtype="https://schema.org/BreadcrumbList">'
            "<li>Home</li><li>Section</li></ol>"
            "<p>BODY_TEXT</p></article></body></html>",
            ["BODY_TEXT"], ["Home", "Section"])


def test_site_header_excluded_article_header_preserved():
    """boilerplate_test.rs:168-202."""
    _in_out(f"<html><head><title>My Site</title></head><body>"
            f"<header><nav>SITE_NAV_TEXT</nav></header><article><header>"
            f"<h2>ARTICLE_SECTION_HEADING</h2></header>"
            f"<p>ARTICLE_BODY</p>{PADDING}</article></body></html>",
            ["ARTICLE_SECTION_HEADING", "ARTICLE_BODY"], ["SITE_NAV_TEXT"])


@pytest.mark.parametrize("cls,marker", [
    ("navbar", "NAVBAR_TEXT"),          # boilerplate_test.rs:205-223
    ("top-nav", "TOP_NAV_TEXT"),        # :272-290
    ("main-menu", "MAIN_MENU_TEXT"),    # :293-311
    ("site_nav", "SITE_NAV_TEXT"),      # :314-332
])
def test_nav_classes_are_excluded(cls, marker):
    tag = "ul" if cls == "main-menu" else "div"
    _in_out(f"<html><body><{tag} class=\"{cls}\">{marker}</{tag}>"
            "<article><p>BODY_TEXT</p></article></body></html>",
            ["BODY_TEXT"], [marker])


def test_breadcrumb_class_is_excluded():
    """boilerplate_test.rs:226-244."""
    _in_out('<html><body><nav class="breadcrumb">Home / Section</nav>'
            "<article><p>BODY_TEXT</p></article></body></html>",
            ["BODY_TEXT"], ["Home"])


def test_schema_breadcrumb_list_is_excluded():
    """boilerplate_test.rs:247-269."""
    _in_out("<html><body>"
            '<ol itemscope itemtype="https://schema.org/BreadcrumbList">'
            "<li>Home</li><li>Section</li></ol>"
            "<article><p>BODY_TEXT</p></article></body></html>",
            ["BODY_TEXT"], ["Home", "Section"])


def test_header_inside_main_is_preserved():
    """boilerplate_test.rs:335-363."""
    _in_out(f"<html><head><title>My Site</title></head><body>"
            f"<header>SITE_HEADER_TEXT</header><main><header>"
            f"<h2>MAIN_SECTION_HEADING</h2></header>"
            f"<p>MAIN_BODY</p>{PADDING}</main></body></html>",
            ["MAIN_SECTION_HEADING", "MAIN_BODY"], ["SITE_HEADER_TEXT"])


@pytest.mark.parametrize("attr,marker", [
    ('class="ad"', "AD_TEXT"),                    # boilerplate_test.rs:366-386
    ('class="sponsored"', "SPONSORED_TEXT"),      # :389-409
    ('id="google_ads"', "GOOGLE_ADS_TEXT"),       # :412-432
    ('class="advertisement"', "ADVERTISEMENT_TEXT"),  # :458-478
    ('id="banner-ad"', "BANNER_AD_TEXT"),         # :481-501
])
def test_ad_markers_are_excluded(attr, marker):
    _in_out(f"<html><body><article><p>BODY_TEXT</p>"
            f"<div {attr}>{marker}</div></article></body></html>",
            ["BODY_TEXT"], [marker])


def test_ins_tag_is_excluded():
    """boilerplate_test.rs:435-455."""
    _in_out("<html><body><article><p>BODY_TEXT</p>"
            "<ins>INS_AD_TEXT</ins></article></body></html>",
            ["BODY_TEXT"], ["INS_AD_TEXT"])


def test_address_class_is_not_treated_as_ad():
    """boilerplate_test.rs:504-529 ('ad' must not match inside 'address')."""
    _in_out(f"<html><body><article>"
            f'<div class="address">ADDRESS_TEXT</div>'
            f"<p>BODY_TEXT</p>{PADDING}</article></body></html>",
            ["BODY_TEXT", "ADDRESS_TEXT"], [])


def test_share_buttons_are_excluded():
    """boilerplate_test.rs:532-552."""
    _in_out("<html><body><article><p>BODY_TEXT</p>"
            '<div class="share-buttons">SHARE_TEXT</div>'
            "</article></body></html>",
            ["BODY_TEXT"], ["SHARE_TEXT"])


def test_social_widget_is_excluded():
    """boilerplate_test.rs:555-575."""
    _in_out("<html><body><article><p>BODY_TEXT</p>"
            '<div class="social">SOCIAL_TEXT</div>'
            "</article></body></html>",
            ["BODY_TEXT"], ["SOCIAL_TEXT"])


def test_footer_inside_main_is_preserved():
    """boilerplate_test.rs:578-603."""
    _in_out(f"<html><body><footer>SITE_FOOTER_TEXT</footer><main>"
            f"<p>MAIN_BODY</p>{PADDING}"
            f"<footer>MAIN_FOOTER_TEXT</footer></main></body></html>",
            ["MAIN_BODY", "MAIN_FOOTER_TEXT"], ["SITE_FOOTER_TEXT"])


def test_aside_inside_main_is_excluded():
    """boilerplate_test.rs:606-626."""
    _in_out("<html><body><main><aside>SIDEBAR_TEXT</aside>"
            "<p>MAIN_BODY</p></main></body></html>",
            ["MAIN_BODY"], ["SIDEBAR_TEXT"])


def test_nested_aside_is_excluded():
    """boilerplate_test.rs:629-653."""
    _in_out("<html><body><article><p>BODY_TEXT</p><aside>"
            '<div class="widget"><aside>NESTED_ASIDE_TEXT</aside></div>'
            "</aside></article></body></html>",
            ["BODY_TEXT"], ["NESTED_ASIDE_TEXT"])


# ---- spike_markdown_validation.rs -----------------------------------------------


def _to_md(html: str) -> str:
    """spike_markdown_validation.rs:11-14 (html_to_markdown +
    post_process_markdown; our converter applies the position-aware pass
    itself)."""
    return html_string_to_markdown(html)


def test_md_headings():
    """spike_markdown_validation.rs:18-24."""
    md = _to_md("<h1>H1</h1><h2>H2</h2><h3>H3</h3>")
    assert "# H1" in md and "## H2" in md and "### H3" in md


def test_md_paragraphs():
    """spike_markdown_validation.rs:27-32."""
    md = _to_md("<p>Para 1</p><p>Para 2</p>")
    assert "Para 1" in md and "Para 2" in md


def test_md_bold_italic():
    """spike_markdown_validation.rs:35-40."""
    md = _to_md("<p><strong>bold</strong> and <em>italic</em></p>")
    assert "**bold**" in md and "*italic*" in md


def test_md_literal_asterisks_preserved():
    """spike_markdown_validation.rs:44-50 (matched pairs survive the
    position-aware escaping)."""
    md = _to_md("<p>text with *asterisks*</p>")
    assert "*asterisks*" in md, md


def test_md_literal_underscores_preserved():
    """spike_markdown_validation.rs:53-59."""
    md = _to_md("<p>text with _underscores_</p>")
    assert "_underscores_" in md, md


def test_md_unordered_list():
    """spike_markdown_validation.rs:63-68."""
    md = _to_md("<ul><li>item 1</li><li>item 2</li></ul>")
    assert "- item 1" in md and "- item 2" in md


def test_md_ordered_list():
    """spike_markdown_validation.rs:71-76."""
    md = _to_md("<ol><li>first</li><li>second</li></ol>")
    assert "1." in md and "2." in md


def test_md_nested_list():
    """spike_markdown_validation.rs:79-83."""
    md = _to_md("<ul><li>outer<ul><li>inner</li></ul></li></ul>")
    assert "- outer" in md


def test_md_table_conversion():
    """spike_markdown_validation.rs:88-100."""
    md = html_table_to_markdown(
        "<table><tr><th>A</th><th>B</th></tr>"
        "<tr><td>1</td><td>2</td></tr></table>"
    )
    assert "| A" in md and "| B" in md and "---" in md


def test_md_table_alignment():
    """spike_markdown_validation.rs:103-113."""
    md = html_table_to_markdown(
        '<table><tr><th align="left">Left</th></tr>'
        "<tr><td>Data</td></tr></table>"
    )
    assert ":--" in md or "---" in md, md


def test_md_code_block():
    """spike_markdown_validation.rs:117-121."""
    md = _to_md("<pre><code>let x = 1;</code></pre>")
    assert "let x = 1;" in md


def test_md_inline_code():
    """spike_markdown_validation.rs:124-128."""
    md = _to_md("<p>Use <code>foo()</code> function</p>")
    assert "`foo()`" in md


def test_md_preserves_bold_formatting():
    """spike_markdown_validation.rs:132-137."""
    md = _to_md("<p>This is **bold** text</p>")
    assert "**bold**" in md, md


def test_md_preserves_italic_formatting():
    """spike_markdown_validation.rs:140-145."""
    md = _to_md("<p>This is *italic* text</p>")
    assert "*italic*" in md, md


def test_md_preserves_code_blocks():
    """spike_markdown_validation.rs:148-153 (code blocks never escape)."""
    md = _to_md("<pre><code>*not escaped*</code></pre>")
    assert "*not escaped*" in md, md


def test_md_empty_elements():
    """spike_markdown_validation.rs:157-161."""
    _to_md("<p></p><strong></strong><em></em>")  # must not raise


def test_md_malformed_html():
    """spike_markdown_validation.rs:164-168."""
    _to_md("<p>unclosed paragraph")  # must not raise


def test_escape_markdown_function():
    """spike_markdown_validation.rs:172-178 + markdown.rs doc examples."""
    assert escape_markdown("*text*", False) == r"\*text\*"
    assert escape_markdown("_var_", False) == r"\_var\_"
    assert escape_markdown("*text*", True) == "*text*"
    assert escape_markdown("my_variable_name", False) == r"my\_variable\_name"
    assert escape_markdown(r"path\to\file", False) == r"path\\to\\file"
    assert escape_markdown("<html>", False) == r"\<html\>"
    assert escape_markdown("", False) == ""
    assert escape_markdown("plain text", False) == "plain text"


def test_md_disabled_by_default():
    """spike_markdown_validation.rs:186-201."""
    r = extract("<html><body><article><p>Content</p></article></body></html>")
    assert r["content_markdown"] is None


def test_md_full_pipeline_document_structure():
    """spike_markdown_validation.rs:208-242."""
    html = """
        <html><body><article>
            <h1>Article Title</h1>
            <p>This is a statement with emphasis.</p>
            <ul><li>First item</li><li>Second item</li></ul>
            <p>Conclusion paragraph.</p>
        </article></body></html>
    """
    r = extract(html, Options(output_markdown=True))
    md = r["content_markdown"]
    assert md is not None
    assert "# Article Title" in md, md
    assert "First item" in md and "Second item" in md
    assert "Conclusion" in md


def test_md_full_pipeline_code_blocks():
    """spike_markdown_validation.rs:246-270."""
    html = """
        <html><body><article>
            <p>Here is some code:</p>
            <pre><code>fn main() {
    println!("Hello");
}</code></pre>
        </article></body></html>
    """
    r = extract(html, Options(output_markdown=True))
    assert "Hello" in r["content_markdown"]


def test_md_options_configured():
    """spike_markdown_validation.rs:301-326."""
    html = ('<html><body><article><p>Visit '
            '<a href="https://example.com">Example</a> for more.</p>'
            "</article></body></html>")
    r = extract(html, Options(output_markdown=True))
    assert r["content_markdown"]


def test_md_options_populated_and_none_when_disabled():
    """spike_markdown_validation.rs:359-401."""
    html = ("<html><body><article><p>Some content here.</p></article>"
            "</body></html>")
    on = extract(html, Options(output_markdown=True))
    assert on["content_markdown"]
    off = extract(html)
    assert off["content_markdown"] is None


# ---- url_utils.rs public API parity ----------------------------------------------


def test_url_utils_api_parity():
    """url_utils.rs:16-210 — the remaining public helpers."""
    from rs_trafilatura_spark.functions.urlutils import (
        get_base_url,
        get_domain_url,
        is_absolute_url,
        normalize_url,
        urls_match,
    )

    assert is_absolute_url("https://example.com/a")
    assert not is_absolute_url("ftp://example.com")
    assert not is_absolute_url("/relative/path")
    assert not is_absolute_url("")
    assert get_domain_url("https://sub.example.com/p?q=1") == "sub.example.com"
    assert get_domain_url("/rel") == ""
    assert get_base_url("https://example.com/deep/path") == "https://example.com"
    assert get_base_url("nope") == ""
    assert normalize_url("https://e.com/a/#frag") == "https://e.com/a"
    assert normalize_url("https://e.com/") == "https://e.com/"
    assert urls_match("https://e.com/a#x", "https://e.com/a/")
    assert not urls_match("https://e.com/a", "https://e.com/b")


# ---- extract.rs inline tests: warning formats + BEM boilerplate ------------------


def test_warning_generation_insufficient_content():
    """extract.rs:4111-4135 — warning carries counts and thresholds."""
    r = extract(
        "<html><body><article><p>Too short</p></article></body></html>",
        Options(min_output_size=100, min_extracted_len=500),
    )
    w = next(w for w in r["warnings"] if "Insufficient content" in w)
    assert "words" in w and "chars" in w and "min:" in w


def test_warning_generation_truncated_content():
    """extract.rs:4137-4160 — truncation warning carries the max length."""
    long_text = "word " * 300
    r = extract(
        f"<html><body><article><p>{long_text}</p></article></body></html>",
        Options(max_extracted_len=800, min_output_size=5),
    )
    assert len(r["content_text"]) <= 800
    w = next(w for w in r["warnings"] if "truncated" in w)
    assert "800" in w


def test_comments_validation_min_output_comm_size():
    """extract.rs:4081-4109 — short comments removed with a warning."""
    html = ("<html><body><article><p>Main content with enough words to pass "
            "validation checks here.</p></article>"
            '<div class="comments"><p>Short comment</p></div></body></html>')
    r = extract(html, Options(include_comments=True, min_output_comm_size=50,
                              min_output_size=5, min_extracted_len=10))
    assert r["comments_text"] is None
    assert r["comments_html"] is None
    w = next(w for w in r["warnings"] if "Comments section removed" in w)
    assert "words" in w and "min:" in w


def test_bem_boilerplate_classification():
    """extract.rs:3946-3991 — BEM layout/component prefixes are exempted
    unless another boilerplate pattern still matches."""
    from rs_trafilatura_spark.kernel.boilerplate import is_boilerplate

    assert not is_boilerplate("l-sidebar-fixed")
    assert not is_boilerplate("l-sidebar l-segment")
    assert not is_boilerplate("l-sidebar-fixed l-article-body-segment")
    assert not is_boilerplate("c-social-buttons")
    assert is_boilerplate("c-social-share")
    assert is_boilerplate("l-sidebar footer")
    assert is_boilerplate("c-widget sidebar")
    assert is_boilerplate("sidebar")
    assert is_boilerplate("sidebar-widget")
    assert is_boilerplate("social-share")
    assert is_boilerplate("footer-links")
    assert is_boilerplate("c-newsletter")
    assert is_boilerplate("c-related-articles")
    assert is_boilerplate("l-footer")
    assert is_boilerplate("c-comment-section")
    assert not is_boilerplate("address")
