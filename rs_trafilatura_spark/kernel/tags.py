"""Tag sets used by document cleaning (reference extractor/tags.rs:91-126)."""

from __future__ import annotations

# Remove with children (extractor/tags.rs:91-101)
TAGS_TO_CLEAN = frozenset(
    {
        "aside", "embed", "footer", "form", "head", "iframe", "menu", "object",
        "script",
        "applet", "audio", "canvas", "figure", "map", "picture", "svg", "video",
        "area", "blink", "button", "datalist", "dialog", "frame", "frameset",
        "fieldset", "link", "input", "ins", "label", "legend", "marquee",
        "math", "menuitem", "nav", "noscript", "optgroup", "option", "output",
        "param", "progress", "rp", "rt", "rtc", "select", "source", "style",
        "track", "textarea", "time", "use",
    }
)

# Strip tag, keep children (extractor/tags.rs:110-113)
TAGS_TO_STRIP = frozenset(
    {
        "abbr", "acronym", "address", "bdi", "bdo", "big", "cite", "data",
        "dfn", "font", "hgroup", "img", "ins", "mark", "meta", "ruby",
        "small", "template",
    }
)

# Remove if no children/text/tail (extractor/tags.rs:122-126)
EMPTY_TAGS_TO_REMOVE = frozenset(
    {
        "article", "b", "blockquote", "dd", "div", "dt", "em",
        "h1", "h2", "h3", "h4", "h5", "h6", "i", "li", "main",
        "p", "pre", "q", "section", "span", "strong",
    }
)

# Table structure tags stripped during cleaning (html_processing.rs)
TABLE_TAGS_TO_STRIP = frozenset({"tbody", "tfoot", "thead"})

# Traversal hard-exclusion tags (extract.rs:2326-2328)
EXCLUDED_TRAVERSAL_TAGS = frozenset(
    {"script", "style", "noscript", "nav", "aside", "iframe", "svg", "ins"}
)

BLOCK_SEPARATOR_TAGS = frozenset({"p", "div", "section", "article"})
HEADING_TAGS = frozenset({"h1", "h2", "h3", "h4", "h5", "h6"})
