"""Containment tests mirroring reference test families
(tests/toggle_test.rs, options_test.rs, text_output_test.rs,
title_extraction_test.rs, author_date_extraction_test.rs style)."""

from datetime import datetime

from rs_trafilatura_spark.functions.dates import parse_date
from rs_trafilatura_spark.functions.textnorm import titles_match
from rs_trafilatura_spark.kernel import extract
from rs_trafilatura_spark.kernel.metadata import (
    normalize_license,
    strip_site_suffix,
    validate_metadata_name,
)
from rs_trafilatura_spark.options import Options

PADDING = " ".join(
    f"Filler sentence number {i} supplies the extractor with prose." for i in range(12)
)


def wrap(body: str, head: str = "") -> str:
    return f"<!doctype html><html lang='en'><head><title>T</title>{head}</head><body>{body}</body></html>"


# --- text output format (tests/text_output_test.rs) ---------------------------


def test_br_and_li_newlines():
    html = wrap(
        f"<article><p>LINE_ONE<br>LINE_TWO {PADDING}</p>"
        "<ul><li>ITEM_A</li><li>ITEM_B</li></ul></article>"
    )
    r = extract(html)
    assert "LINE_ONE\nLINE_TWO" in r["content_text"]
    assert "ITEM_A\nITEM_B" in r["content_text"]


def test_punctuation_attaches_left():
    html = wrap(f"<article><p>Word <b>,</b> next . End {PADDING}</p></article>")
    r = extract(html)
    assert "Word, next. End" in r["content_text"]


def test_blockquote_and_pre_kept():
    html = wrap(
        f"<article><p>INTRO {PADDING}</p>"
        "<blockquote>QUOTED_WISDOM here</blockquote>"
        "<pre>preformatted_block</pre></article>"
    )
    r = extract(html)
    assert "QUOTED_WISDOM" in r["content_text"]
    assert "preformatted_block" in r["content_text"]


# --- option toggles (tests/toggle_test.rs, options_test.rs) ---------------------


def test_max_extracted_len_truncates():
    html = wrap(f"<article><p>{'x' * 500} {PADDING}</p></article>")
    r = extract(html, Options(max_extracted_len=100))
    assert len(r["content_text"]) == 100
    assert any("truncated" in w.lower() for w in r["warnings"])


def test_min_output_size_warning():
    # min_output_size is a word count (extract.rs:1095-1099): "Tiny." is one
    # qualifying word, far below 50 -> insufficient-content warning
    html = wrap("<article><p>Tiny.</p></article>")
    r = extract(html, Options(min_output_size=50, use_fallback_extraction=False))
    assert any("Insufficient content" in w for w in r["warnings"])


def test_min_output_size_counts_words_not_chars():
    # 12 words of >=2 chars but >200 chars: words >= min_output_size=10
    # and chars >= min_extracted_len -> no insufficient-content warning
    words = " ".join(f"word{i:02d}xxxxxxxxxxxxxx" for i in range(12))
    html = wrap(f"<article><p>{words}</p></article>")
    r = extract(html, Options(min_output_size=10, min_extracted_len=100,
                              use_fallback_extraction=False))
    assert not any("Insufficient content" in w for w in r["warnings"])


def test_include_links_toggle_in_html():
    html = wrap(
        f"<article><p>See <a href='https://x.example/ref'>THE_LINK</a> {PADDING}</p></article>"
    )
    r = extract(html, Options(include_links=True))
    assert '<a href="https://x.example/ref">' in r["content_html"]
    r2 = extract(html, Options(include_links=False))
    assert "<a " not in r2["content_html"]
    assert "THE_LINK" in r2["content_text"]  # text keeps link text either way


def test_itemprop_headline_dropped():
    html = wrap(
        f"<article><h2 itemprop='headline'>DUP_HEADLINE</h2><p>BODY {PADDING}</p></article>"
    )
    r = extract(html)
    assert "DUP_HEADLINE" not in r["content_text"]


def test_entry_title_class_dropped():
    html = wrap(
        f"<article><h2 class='entry-title'>CLASS_TITLE</h2><p>BODY {PADDING}</p></article>"
    )
    r = extract(html)
    assert "CLASS_TITLE" not in r["content_text"]


# --- metadata helpers (tests/title_extraction_test.rs etc.) ----------------------


def test_strip_site_suffix_rules():
    assert strip_site_suffix("Article Title - My Site") == "Article Title"
    assert strip_site_suffix("Article Title | Some Very Long Site Name That Keeps Going On") \
        == "Article Title | Some Very Long Site Name That Keeps Going On"
    assert strip_site_suffix(
        "Article Title | Some Very Long Site Name That Keeps Going On",
        sitename="Some Very Long Site Name That Keeps Going On",
    ) == "Article Title"


def test_titles_match_variants():
    assert titles_match("My Story", "My Story - Site")
    assert titles_match("My Story", "my story | site")
    assert not titles_match("Other", "My Story - Site")
    assert titles_match("My Story", "My Story")


def test_validate_metadata_name():
    assert validate_metadata_name("Jane Doe")
    assert not validate_metadata_name("x")
    assert not validate_metadata_name("https://example.com/author")
    assert not validate_metadata_name("12345")
    assert not validate_metadata_name("{json: true}")


def test_normalize_license():
    assert normalize_license(
        "https://creativecommons.org/licenses/by/4.0/"
    ) == "CC BY 4.0"
    assert normalize_license("All rights reserved") == "All rights reserved"


def test_date_parsing_chain():
    assert parse_date("2024-03-05T10:00:00Z") == datetime(2024, 3, 5, 10, 0)
    assert parse_date("2024-03-05T10:00:00+02:00") == datetime(2024, 3, 5, 8, 0)
    assert parse_date("2024-03-05") == datetime(2024, 3, 5)
    assert parse_date("March 5, 2024") == datetime(2024, 3, 5)
    assert parse_date("5 March 2024") == datetime(2024, 3, 5)
    assert parse_date("2024/03/05") == datetime(2024, 3, 5)
    assert parse_date("not a date") is None


def test_author_blacklist():
    html = wrap(
        f"<article><p>B {PADDING}</p></article>",
        head="<meta name='author' content='Spam Bot'>",
    )
    r = extract(html, Options(author_blacklist=("spam bot",)))
    assert r["author"] is None
    r2 = extract(html)
    assert r2["author"] == "Spam Bot"


def test_tags_from_keywords():
    html = wrap(
        f"<article><p>B {PADDING}</p></article>",
        head="<meta name='keywords' content='alpha, beta; gamma'>",
    )
    r = extract(html)
    assert r["tags"] == ["alpha", "beta", "gamma"]


def test_dedup_option_thresholds():
    # block <= 100 chars is never deduped
    short = "Short repeated block under limit."
    html = wrap("<article>" + f"<p>{short}</p>" * 5 + f"<p>{PADDING}</p></article>")
    r = extract(html, Options(deduplicate=True))
    assert r["content_text"].count(short) == 5


def test_trailing_heading_removed_in_precision():
    html = wrap(
        f"<article><p>CONTENT {PADDING}</p><h2>TRAILING_HEAD</h2></article>"
    )
    r = extract(html, Options(favor_precision=True))
    assert "TRAILING_HEAD" not in r["content_text"]
    # non-trailing heading (followed by content) is preserved
    html2 = wrap(
        f"<article><h2>MID_HEAD</h2><p>CONTENT {PADDING}</p></article>"
    )
    r2 = extract(html2, Options(favor_precision=True))
    assert "MID_HEAD" in r2["content_text"]
    # default mode keeps trailing headings
    r3 = extract(html)
    assert "TRAILING_HEAD" in r3["content_text"]
