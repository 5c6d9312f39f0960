"""The single-pass feature extractor must equal the selector-based
reference implementation on every corpus family."""

from rs_trafilatura_spark.datagen.corpus import generate_row
from rs_trafilatura_spark.dom import Document
from rs_trafilatura_spark.kernel.ml_features import (
    _extract_ml_features_slow,
    extract_ml_features,
)


def test_fast_equals_slow_on_generated_corpus():
    for i in range(250):
        row = generate_row(i, seed=4242)
        doc = Document(row["html"].decode("utf-8", errors="replace"))
        for url in (row["url"], "", "HTTPS://Shop.Example/products/X"):
            fast = extract_ml_features(doc, url)
            slow = _extract_ml_features_slow(doc, url)
            assert fast == slow, (
                i, row["url"], [k for k, (a, b) in
                                enumerate(zip(fast, slow)) if a != b]
            )


def test_fast_equals_slow_on_adversarial_html():
    pages = [
        # mixed-case classes (selector engine is case-sensitive on attrs)
        '<html><body><div class="Author Comment POST">x</div>'
        '<div class="product-card"><span class="Price">$5</span></div>'
        "</body></html>",
        # nested cards with price, link-dense sections, og:type twice
        '<html><head><meta property="og:type" content="article">'
        '<meta property="og:type" content="product"></head><body>'
        '<section><a href="/a">one</a><a href="/b">two</a>'
        "<p>some longer paragraph text to cross the fifty char line here</p>"
        '</section><div class="grid-item"><div class="cost">9</div></div>'
        '<link rel="next"><svg></svg><time>now</time></body></html>',
        "<html><body></body></html>",
    ]
    for html in pages:
        doc = Document(html)
        assert extract_ml_features(doc, "https://x.example/docs/a") == \
            _extract_ml_features_slow(doc, "https://x.example/docs/a")


def test_model_only_path_is_classification_identical():
    """model_only skips only feature indices no shipped tree splits on:
    every index the ensemble reads is equal to the full vector, and
    classify_ml returns the identical (type, confidence) pair."""
    from rs_trafilatura_spark.kernel.ml_features import (
        _MODEL_SKIPPED,
        _model_feature_set,
        model_only_ok,
    )
    from rs_trafilatura_spark.kernel.page_type import classify_ml

    used = _model_feature_set()
    assert not (used & _MODEL_SKIPPED)  # skip list disjoint from model
    assert model_only_ok()

    for i in range(120):
        row = generate_row(i, seed=777)
        doc = Document(row["html"].decode("utf-8", errors="replace"))
        full = extract_ml_features(doc, row["url"])
        fast = extract_ml_features(doc, row["url"], model_only=True)
        for j in used:
            assert full[j] == fast[j], (i, j)
        assert classify_ml(full) == classify_ml(fast), i
