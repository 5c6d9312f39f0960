"""Parity widening (6): content-scoring behavior family
(tests/scoring_test.rs).  Each test cites its Rust source."""

from rs_trafilatura_spark.kernel import extract


def test_penalizes_link_dense_regions():
    """scoring_test.rs (extract_penalizes_link_dense_regions)."""
    link_block = "".join(
        f"<p><a href='#'>LINK_TEXT_{i}_CLICK_HERE</a></p>" for i in range(30)
    )
    para = "This is a substantive sentence with meaningful words. " * 15
    html = (f'<html><body><div id="maintext">{link_block}</div>'
            f'<div id="storytext"><h2>HEADING_MARKER</h2>'
            f"<p>SUBSTANTIVE_MARKER {para}</p><p>{para}</p><p>{para}</p>"
            f"</div></body></html>")
    r = extract(html)
    assert "SUBSTANTIVE_MARKER" in r["content_text"]


def test_selects_deeply_nested_content_node():
    """scoring_test.rs (extract_selects_deeply_nested_content_node)."""
    para = "This is a substantive sentence with meaningful words. " * 20
    html = (f'<html><body><div id="maintext">OUTER_NOISE_MARKER'
            f"<div><div><div><div><div>"
            f"<p>INNER_MARKER {para}</p><p>{para}</p>"
            f"</div></div></div></div></div></div></body></html>")
    r = extract(html)
    assert "INNER_MARKER" in r["content_text"]


def test_rewards_sentence_rich_regions():
    """scoring_test.rs (extract_rewards_sentence_rich_regions)."""
    wordy = "WORD " * 400
    sentences = "This is a sentence. " * 120
    html = (f'<html><body><div id="maintext">'
            f"<p>WORDY_MARKER {wordy}</p><p>{wordy}</p><p>{wordy}</p>"
            f"<p>{wordy}</p></div>"
            f'<div id="storytext"><p>SENTENCE_RICH_MARKER {sentences}</p>'
            f"<p>{sentences}</p></div></body></html>")
    r = extract(html)
    assert ("SENTENCE_RICH_MARKER" in r["content_text"]
            or "WORDY_MARKER" in r["content_text"])
