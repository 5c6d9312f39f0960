"""Table linearization with colspan/rowspan expansion
(reference extract.rs:2896-3063): rows joined with newlines, cells with
`` | ``, layout tables (role=presentation or <=1 row / <=1 cell) skipped,
size caps at 20k cells / 200k chars.
"""

from __future__ import annotations

from ..dom import Element, select
from ..functions.textnorm import clean_text

MAX_TABLE_CELLS = 20_000
MAX_TABLE_TEXT_LEN = 200_000


def is_layout_table(table: Element) -> bool:
    if table.get("role").lower() == "presentation":
        return True
    rows = 0
    for _ in _iter_rows(table):
        rows += 1
        if rows > 1:
            break
    if rows <= 1:
        return True
    cells = 0
    for _ in select(table, "td, th"):
        cells += 1
        if cells > 1:
            break
    return cells <= 1


def _iter_rows(table: Element):
    return select(table, "tr")


def _parse_span(value: str, default: int = 1) -> int:
    try:
        v = int(value.strip())
        return v if v > 0 else default
    except (ValueError, AttributeError):
        return default


def extract_table_text(table: Element) -> str:
    out: list[str] = []
    out_len = 0
    rowspan: list = []  # per-column: None or (remaining, value)
    total_cells = 0

    for tr in _iter_rows(table):
        if total_cells >= MAX_TABLE_CELLS or out_len >= MAX_TABLE_TEXT_LEN:
            break
        row_cells: list[str] = []
        col = 0

        def flush_rowspans():
            nonlocal col
            while col < len(rowspan) and rowspan[col] is not None:
                remaining, val = rowspan[col]
                row_cells.append(val)
                remaining -= 1
                rowspan[col] = (remaining, val) if remaining > 0 else None
                col += 1

        for cell in select(tr, "td, th"):
            flush_rowspans()
            text = clean_text(cell.text_content())
            colspan = _parse_span(cell.get("colspan"), 1)
            rowspan_n = _parse_span(cell.get("rowspan"), 1)
            need = col + colspan
            while len(rowspan) < need:
                rowspan.append(None)
            for i in range(colspan):
                total_cells += 1
                if total_cells >= MAX_TABLE_CELLS:
                    break
                row_cells.append(text)
                if rowspan_n > 1:
                    rowspan[col + i] = (rowspan_n - 1, text)
            col += colspan
            if total_cells >= MAX_TABLE_CELLS:
                break

        flush_rowspans()

        if all(not c.strip() for c in row_cells):
            continue
        line = " | ".join(row_cells)
        if out:
            out_len += 1  # newline
        out.append(line)
        out_len += len(line)
        if out_len >= MAX_TABLE_TEXT_LEN:
            break

    return "\n".join(out)
