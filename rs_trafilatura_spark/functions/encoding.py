"""Charset sniffing + transcoding of raw page bytes to str.

Mirrors the reference behavior (encoding.rs:34-105): sniff the first 1024
bytes for ``<meta charset>`` / http-equiv Content-Type, default UTF-8, decode
lossily (replacement char), and map ISO-8859-1 -> windows-1252 per the WHATWG
encoding standard (encoding_rs does this label aliasing internally).

These run as pandas column ops inside the kernel batch — genuinely
vectorizable (SURVEY.md §2.11).
"""

from __future__ import annotations

import codecs
import re

CHARSET_META_RE = re.compile(rb"""(?i)<meta[^>]+charset\s*=\s*["']?([^"'\s>]+)""")
CONTENT_TYPE_CHARSET_RE = re.compile(
    rb"""(?i)<meta[^>]+http-equiv\s*=\s*["']?content-type["']?[^>]+content\s*=\s*["']?[^"'>]*;\s*charset\s*=\s*([^"'\s>]+)"""
)

# WHATWG label aliasing (the subset that matters for web text):
_WHATWG_ALIASES = {
    "iso-8859-1": "windows-1252",
    "latin1": "windows-1252",
    "latin-1": "windows-1252",
    "us-ascii": "windows-1252",
    "ascii": "windows-1252",
    "iso8859-1": "windows-1252",
    "l1": "windows-1252",
}


def detect_encoding(html: bytes) -> str:
    """Return a Python codec name for the page bytes (default utf-8)."""
    head = html[:1024]
    for pattern in (CHARSET_META_RE, CONTENT_TYPE_CHARSET_RE):
        m = pattern.search(head)
        if m:
            label = m.group(1).decode("ascii", "replace").strip().lower()
            label = _WHATWG_ALIASES.get(label, label)
            try:
                codecs.lookup(label)
                return label
            except LookupError:
                continue
    return "utf-8"


def transcode_to_utf8(html: bytes) -> str:
    """Decode page bytes to str with replacement on errors
    (reference lib.rs:179 -> encoding.rs:90-105)."""
    enc = detect_encoding(html)
    return html.decode(enc, errors="replace")
