"""HTML -> GitHub-flavored-Markdown walker (reference markdown.rs + the
quick_html2md delegation at extract.rs:425-442).  Operates on the
already-filtered content subtree, so no boilerplate logic here."""

from __future__ import annotations

from ..dom import Element

_HEADING = {"h1": "#", "h2": "##", "h3": "###", "h4": "####",
            "h5": "#####", "h6": "######"}
_MD_ESCAPES = "\\`*_{}[]"


def escape_md(s: str) -> str:
    for ch in _MD_ESCAPES:
        s = s.replace(ch, "\\" + ch)
    return s


def _inline(el: Element, include_links: bool) -> str:
    parts: list[str] = []
    if el.text:
        parts.append(escape_md(el.text))
    for child in el.children:
        t = child.tag
        inner = _inline(child, include_links)
        if t in ("strong", "b"):
            parts.append(f"**{inner}**")
        elif t in ("em", "i"):
            parts.append(f"*{inner}*")
        elif t == "code":
            parts.append(f"`{child.text_content()}`")
        elif t == "a" and include_links and child.get("href"):
            parts.append(f"[{inner}]({child.get('href')})")
        elif t == "br":
            parts.append("  \n")
        else:
            parts.append(inner)
        if child.tail:
            parts.append(escape_md(child.tail))
    return "".join(parts)


def _table_md(table: Element) -> str:
    from ..functions.textnorm import clean_text
    from ..dom import select

    rows = []
    for tr in select(table, "tr"):
        cells = [clean_text(td.text_content()).replace("|", "\\|")
                 for td in select(tr, "td, th")]
        if any(cells):
            rows.append("| " + " | ".join(cells) + " |")
    if not rows:
        return ""
    n_cols = rows[0].count("|") - 1
    sep = "|" + " --- |" * n_cols
    return "\n".join([rows[0], sep] + rows[1:])


def html_tree_to_markdown(root: Element, include_links: bool = True) -> str:
    blocks: list[str] = []

    def visit(el: Element, list_depth: int = 0) -> None:
        t = el.tag
        if t in _HEADING:
            blocks.append(f"{_HEADING[t]} {_inline(el, include_links).strip()}")
        elif t == "p":
            text = _inline(el, include_links).strip()
            if text:
                blocks.append(text)
        elif t == "pre":
            code = el.text_content().rstrip()
            blocks.append(f"```\n{code}\n```")
        elif t == "blockquote":
            inner = _inline(el, include_links).strip()
            if inner:
                blocks.append("\n".join(f"> {ln}" for ln in inner.splitlines()))
            for child in el.children:
                if child.tag in ("p", "ul", "ol", "blockquote"):
                    visit(child, list_depth)
        elif t in ("ul", "ol"):
            items = []
            idx = 1
            for li in el.children:
                if li.tag != "li":
                    continue
                marker = "-" if t == "ul" else f"{idx}."
                items.append(
                    "  " * list_depth + f"{marker} {_inline(li, include_links).strip()}"
                )
                idx += 1
                for sub in li.children:
                    if sub.tag in ("ul", "ol"):
                        visit(sub, list_depth + 1)
            if items:
                blocks.append("\n".join(items))
        elif t == "table":
            md = _table_md(el)
            if md:
                blocks.append(md)
        else:
            for child in el.children:
                visit(child, list_depth)

    visit(root)
    return "\n\n".join(b for b in blocks if b).strip()


def html_string_to_markdown(html: str, include_links: bool = True) -> str:
    from ..dom import Document

    return html_tree_to_markdown(Document(html).root, include_links)
