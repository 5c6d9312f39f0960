"""HTML -> Element tree parser built on stdlib ``html.parser``.

The reference uses an html5ever tree (dom_query); we don't need full HTML5
tree-building — we need a robust, fast-enough pure-Python parse with the
common implicit-close rules (unclosed <p>, <li>, table cells) so that both
well-formed fixture HTML and mildly malformed real pages produce a sensible
tree (reference robustness tests: extract.rs:3807-3847).
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import Optional

from .element import Element, VOID_TAGS

# Block-level tags whose start implicitly closes an open <p> (HTML5 spec set)
_P_CLOSERS = frozenset(
    {
        "address", "article", "aside", "blockquote", "details", "div", "dl",
        "fieldset", "figcaption", "figure", "footer", "form", "h1", "h2",
        "h3", "h4", "h5", "h6", "header", "hr", "main", "menu", "nav", "ol",
        "p", "pre", "section", "table", "ul",
    }
)

# Tags allowed inside <head>; anything else implicitly closes head
_HEAD_TAGS = frozenset(
    {"title", "meta", "link", "base", "style", "script", "noscript", "template"}
)


class _TreeBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = Element("#root")
        self.stack: list[Element] = [self.root]
        self._line_starts: Optional[list[int]] = None

    # -- source offset helpers ------------------------------------------------
    def feed_with_offsets(self, data: str) -> None:
        # C-speed newline scan (str.find), not a per-character Python loop
        starts = [0]
        idx = data.find("\n")
        while idx != -1:
            starts.append(idx + 1)
            idx = data.find("\n", idx + 1)
        self._line_starts = starts
        self.feed(data)
        self.close()

    def _srcoffset(self) -> int:
        if self._line_starts is None:
            return -1
        line, col = self.getpos()
        if line - 1 < len(self._line_starts):
            return self._line_starts[line - 1] + col
        return -1

    # -- implicit close rules ---------------------------------------------------
    def _implicit_close(self, tag: str) -> None:
        while len(self.stack) > 1:
            top = self.stack[-1].tag
            if top == "p" and tag in _P_CLOSERS:
                self.stack.pop()
            elif top == "li" and tag == "li":
                self.stack.pop()
            elif top in ("dd", "dt") and tag in ("dd", "dt"):
                self.stack.pop()
            elif top in ("td", "th") and tag in ("td", "th", "tr"):
                self.stack.pop()
            elif top == "tr" and tag in ("tr", "tbody", "tfoot", "thead"):
                self.stack.pop()
            elif top in ("thead", "tbody", "tfoot") and tag in ("thead", "tbody", "tfoot"):
                self.stack.pop()
            elif top == "option" and tag in ("option", "optgroup"):
                self.stack.pop()
            elif top == "head" and tag not in _HEAD_TAGS:
                self.stack.pop()
            else:
                break

    # -- HTMLParser callbacks ------------------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:
        tag = tag.lower()
        self._implicit_close(tag)
        attrib: dict = {}
        for k, v in attrs:
            if k not in attrib:  # first occurrence wins
                attrib[k] = v if v is not None else ""
        el = Element(tag, attrib)
        off = self._srcoffset()
        if off >= 0:
            el._srcpos = (off, off)
        self.stack[-1].append(el)
        if tag not in VOID_TAGS:
            self.stack.append(el)

    def handle_startendtag(self, tag: str, attrs) -> None:
        tag = tag.lower()
        self._implicit_close(tag)
        attrib: dict = {}
        for k, v in attrs:
            if k not in attrib:
                attrib[k] = v if v is not None else ""
        el = Element(tag, attrib)
        off = self._srcoffset()
        if off >= 0:
            el._srcpos = (off, off)
        self.stack[-1].append(el)

    def handle_endtag(self, tag: str) -> None:
        tag = tag.lower()
        if tag in VOID_TAGS:
            return
        # find the matching open element; ignore stray end tags
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                end = self._srcoffset()
                if end >= 0 and self.stack[i]._srcpos is not None:
                    self.stack[i]._srcpos = (self.stack[i]._srcpos[0], end)
                del self.stack[i:]
                return

    def handle_data(self, data: str) -> None:
        if not data:
            return
        cur = self.stack[-1]
        if cur.children:
            cur.children[-1].tail += data
        else:
            cur.text += data

    # comments / declarations / PIs are dropped; surrounding text naturally
    # merges via text/tail.


def parse_html(html: str) -> Element:
    """Parse an HTML string into an Element tree rooted at ``#root``."""
    builder = _TreeBuilder()
    try:
        builder.feed_with_offsets(html)
    except Exception:
        # html.parser is forgiving, but guard anyway: return whatever tree
        # was built so far (reference degrades errors to warnings,
        # extract.rs:161-169)
        pass
    return builder.root
