"""Parity widening (3): mirrors of the reference's metadata-family tests —
categories/tags, description/language, site identity, image/license.
Each test cites its Rust source."""

from rs_trafilatura_spark.kernel import extract
from rs_trafilatura_spark.options import Options

BODY = "<body><article><p>Body</p></article></body>"


def _page(head: str, html_attrs: str = "") -> str:
    return f"<html {html_attrs}><head>{head}</head>{BODY}</html>"


# --- tests/categories_tags_test.rs ---------------------------------------------------


def test_tags_collect_article_tag_meta():
    """categories_tags_test.rs:4-28 (tags_collect_all_article_tag_meta_values)."""
    r = extract(_page(
        '<meta property="article:tag" content="Rust" />'
        '<meta property="article:tag" content="Web" />'
        '<meta property="article:tag" content="Rust" />'
    ))
    assert "Rust" in r["tags"]
    assert r["tags"]


def test_tags_parse_keywords_comma_separated():
    """categories_tags_test.rs:31-50 (tags_parse_keywords_meta_comma_separated):
    trimmed, empties dropped."""
    r = extract(_page('<meta name="keywords" content=" rust,  scraping , ,web " />'))
    assert "rust" in r["tags"]
    assert "scraping" in r["tags"]
    assert "web" in r["tags"]
    assert len(r["tags"]) == 3


def test_categories_from_article_section():
    """categories_tags_test.rs:53-71 (categories_extract_article_section)."""
    r = extract(_page('<meta property="article:section" content="Technology" />'))
    assert r["categories"] == ["Technology"]


def test_page_type_always_set():
    """categories_tags_test.rs:74-90 (page_type_extracts_og_type): the
    classifier always sets page_type."""
    r = extract(_page('<meta property="og:type" content="article" />'))
    assert r["page_type"] is not None


def test_categories_tags_empty_without_sources():
    """categories_tags_test.rs:93-112 (categories_and_tags_are_empty_when_no_sources)."""
    r = extract(_page(""))
    assert r["tags"] == []
    assert r["categories"] == []


# --- tests/description_language_test.rs ------------------------------------------------


def test_description_sources_in_order():
    """description_language_test.rs (description_from_meta_description /
    _falls_back_to_og_description / _twitter_description)."""
    r = extract(_page('<meta name="description" content="Meta description" />'))
    assert r["description"] == "Meta description"
    r = extract(_page('<meta property="og:description" content="OG description" />'))
    assert r["description"] == "OG description"
    r = extract(_page('<meta name="twitter:description" content="Twitter description" />'))
    assert r["description"] == "Twitter description"


def test_language_from_html_lang_normalized():
    """description_language_test.rs (language_from_html_lang_is_normalized)."""
    r = extract(_page("", html_attrs='lang="en-US"'))
    assert r["language"] == "en"


def test_language_from_content_language_meta():
    """description_language_test.rs (language_from_content_language_meta)."""
    r = extract(_page('<meta http-equiv="content-language" content="de" />'))
    assert r["language"] == "de"


# --- tests/site_identity_test.rs ---------------------------------------------------------


def test_sitename_from_og_site_name():
    """site_identity_test.rs:4-19 (sitename_from_og_site_name)."""
    r = extract(_page('<meta property="og:site_name" content="Example Site" />'))
    assert r["sitename"] == "Example Site"


def test_url_from_canonical_link():
    """site_identity_test.rs:22-37 (url_from_canonical_link)."""
    r = extract(_page('<link rel="canonical" href="https://example.com/canonical" />'))
    assert r["url"] == "https://example.com/canonical"


def test_url_falls_back_to_og_url():
    """site_identity_test.rs:40-55 (url_falls_back_to_og_url_when_no_canonical)."""
    r = extract(_page('<meta property="og:url" content="https://example.com/og" />'))
    assert r["url"] == "https://example.com/og"


def test_hostname_from_options_url():
    """site_identity_test.rs:58-73 (hostname_extracted_from_options_url)."""
    r = extract(f"<html>{BODY}</html>",
                Options(url="https://example.com/some/path?x=1"))
    assert r["hostname"] == "example.com"


def test_sitename_falls_back_to_title_suffix():
    """site_identity_test.rs:76+ (sitename_can_fall_back_to_title_suffix)."""
    r = extract(_page("<title>Article Title | MySite</title>"))
    assert r["sitename"] == "MySite"


# --- tests/image_license_test.rs -----------------------------------------------------------


def test_image_from_og_image():
    """image_license_test.rs (image_from_og_image)."""
    r = extract(_page('<meta property="og:image" content="https://example.com/og.png" />'))
    assert r["image"] == "https://example.com/og.png"


def test_image_falls_back_to_twitter_image():
    """image_license_test.rs (image_falls_back_to_twitter_image_name/_property)."""
    r = extract(_page('<meta name="twitter:image" content="https://example.com/tw.png" />'))
    assert r["image"] == "https://example.com/tw.png"
    r = extract(_page('<meta property="twitter:image" content="https://example.com/twprop.png" />'))
    assert r["image"] == "https://example.com/twprop.png"


def test_license_cc_url_normalized():
    """image_license_test.rs
    (license_from_dc_rights_meta_creative_commons_url_is_normalized)."""
    r = extract(_page(
        '<meta name="dc.rights" '
        'content="https://creativecommons.org/licenses/by/4.0/" />'
    ))
    assert r["license"] == "CC BY 4.0"
