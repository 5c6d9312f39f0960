"""Foreign-framed WARC fixture writer.

``sources/warc.py``'s own sink emits the Common Crawl layout: one gzip
member per record, bare headers, mtime=0.  A CDX/random-access reader
that only ever sees its own writer's output can hide writer-coupled
assumptions, so this module writes archives the way a DIFFERENT tool
might (all framings below are legal per RFC 1952 + ISO 28500):

- MULTI-RECORD members: two records concatenated inside one gzip member.
  The CDX then points several records at the SAME (offset, length) —
  random access must locate the right record WITHIN the member (by
  WARC-Target-URI), not assume member == record.
- PADDING members: empty gzip members between record members (legal,
  decompress to b"").  Offsets in the CDX must be honored exactly as
  written; a reader that re-derives offsets by walking members breaks.
- Non-canonical gzip headers: FNAME field, non-zero mtime, different
  compresslevel — header length varies per member, so any fixed-header
  offset arithmetic breaks.

This is a deliberately driver-side, single-file fixture generator (test
corpora are small); the distributed sink remains sources/warc.write_warc.
"""

from __future__ import annotations

import gzip
import io
import os
from typing import Iterable, Optional

from ..sources.warc import _WARC_DATE, build_warc_record


def _gzip_member(payload: bytes, *, mtime: int, fname: Optional[str],
                 level: int) -> bytes:
    buf = io.BytesIO()
    with gzip.GzipFile(filename=fname or "", mode="wb", fileobj=buf,
                       compresslevel=level, mtime=mtime) as gz:
        gz.write(payload)
    return buf.getvalue()


def write_foreign_warc(rows: Iterable[dict], path: str,
                       records_per_member: int = 2) -> tuple[str, str]:
    """Write ``rows`` (dicts with url / warc_ts / html / lang, e.g.
    ``df.toLocalIterator()`` rows) as ONE foreign-framed ``.warc.gz`` +
    ``.cdx`` pair under ``path``; returns (warc_path, cdx_path).

    Every ``records_per_member`` consecutive records share one gzip
    member; each member alternates FNAME/mtime/compresslevel; an empty
    padding member follows every record member.  The CDX lines use the
    same tab layout as sources/warc.write_warc, with each record's
    (offset, length) addressing its CONTAINING member."""
    os.makedirs(path, exist_ok=True)
    dest = os.path.join(path, "foreign-00000.warc.gz")
    cdx_dest = dest[: -len(".warc.gz")] + ".cdx"

    group: list[dict] = []
    groups: list[list[dict]] = []
    for row in rows:
        group.append(dict(row) if not isinstance(row, dict) else row)
        if len(group) == records_per_member:
            groups.append(group)
            group = []
    if group:
        groups.append(group)

    index: list[str] = []
    offset = 0
    with open(dest, "wb") as sink:
        for gi, grp in enumerate(groups):
            payload = b"".join(
                build_warc_record(
                    r["url"], r.get("warc_ts"),
                    bytes(r.get("html") or b""), r.get("lang"),
                )
                for r in grp
            )
            member = _gzip_member(
                payload,
                mtime=1700000000 + gi,                # non-zero, varying
                fname=f"seg-{gi}.warc" if gi % 2 else None,
                level=1 + (gi % 9),
            )
            sink.write(member)
            for r in grp:
                ts = r.get("warc_ts")
                index.append("\t".join((
                    r["url"],
                    ts.strftime(_WARC_DATE) if ts else "-",
                    os.path.basename(dest),
                    str(offset), str(len(member)),
                )))
            offset += len(member)
            # legal empty padding member between record members
            pad = _gzip_member(b"", mtime=0, fname=None, level=9)
            sink.write(pad)
            offset += len(pad)
    with open(cdx_dest, "w") as cdx:
        cdx.write("\n".join(index) + ("\n" if index else ""))
    return dest, cdx_dest
