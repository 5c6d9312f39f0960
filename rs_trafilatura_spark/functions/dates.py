"""Date parsing chain (reference metadata/meta_tags.rs:338-373 and
metadata/json_ld.rs:362-378): RFC3339 first, then a fixed fallback ladder.
Returns timezone-naive UTC datetimes (Spark TimestampType, session TZ=UTC).
"""

from __future__ import annotations

import re
from datetime import datetime, timezone
from typing import Optional

_RFC3339_RE = re.compile(
    r"^(\d{4})-(\d{2})-(\d{2})[Tt ](\d{2}):(\d{2}):(\d{2})(?:\.(\d+))?"
    r"(Z|z|[+-]\d{2}:?\d{2})?$"
)

_FALLBACK_FORMATS = (
    "%Y-%m-%dT%H:%M:%S",
    "%Y-%m-%d",
    "%Y/%m/%d",
    "%d-%m-%Y",
    "%d/%m/%Y",
    "%B %d, %Y",
    "%b %d, %Y",
    "%d %B %Y",
    "%d %b %Y",
)


def _to_naive_utc(dt: datetime) -> datetime:
    if dt.tzinfo is not None:
        dt = dt.astimezone(timezone.utc).replace(tzinfo=None)
    return dt


def parse_date(value: str) -> Optional[datetime]:
    value = value.strip()
    if not value:
        return None
    m = _RFC3339_RE.match(value)
    if m:
        try:
            iso = value.replace("Z", "+00:00").replace("z", "+00:00")
            return _to_naive_utc(datetime.fromisoformat(iso))
        except ValueError:
            pass
    # trim a trailing timezone/suffix for the simple formats
    head = value.split("+")[0].strip()
    for fmt in _FALLBACK_FORMATS:
        try:
            return datetime.strptime(head, fmt)
        except ValueError:
            continue
    # date embedded at the start, e.g. "2024-01-02 some text"
    m2 = re.match(r"^(\d{4}-\d{2}-\d{2})", value)
    if m2:
        try:
            return datetime.strptime(m2.group(1), "%Y-%m-%d")
        except ValueError:
            return None
    return None
