"""Two-sheet xlsx result sink, stdlib-only (SURVEY.md §2.1 S8).

The reference's final sink writes a two-sheet Excel workbook —
"Summary" + "Detailed Scores" — through pandas.ExcelWriter with an
atomic tmp-file + os.replace commit (/root/reference/keywords4cv.py:
3243-3277).  openpyxl does not ship in this container, but an .xlsx
file is just a zip of ECMA-376 OOXML parts, so this module writes one
with nothing beyond ``zipfile`` + hand-built SpreadsheetML:

- ``write_xlsx(path, sheets)``  — minimal valid workbook: content
  types, package rels, workbook + workbook rels, a tiny styles part,
  one worksheet per sheet with inline strings (no sharedStrings
  indirection).  Committed atomically via tmp file + ``os.replace``,
  matching the reference's crash-safety contract.
- ``read_xlsx(path)``           — the inverse (zipfile + ElementTree),
  used by the round-trip tests; resolves sheet name → rId → part the
  same way a real consumer does rather than assuming part names.
- ``save_results_xlsx(...)``    — the reference-shaped entry point:
  two Spark DataFrames in, "Summary" / "Detailed Scores" out.

Scale note: an .xlsx sheet is capped at 1,048,576 rows by the format
itself — this sink is for the final human-facing report (the
reference's use), never for data-scale output; those go through the
parquet/JSONL sinks in ``sources/io.py``.  The collect here is
explicitly bounded by ``max_rows`` for that reason.
"""

from __future__ import annotations

import math
import os
import tempfile
import zipfile
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape, quoteattr

import pandas as pd

from pyspark.sql import DataFrame

_NS_MAIN = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
_NS_REL = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
_NS_PKG_REL = "http://schemas.openxmlformats.org/package/2006/relationships"

_XLSX_MAX_ROWS = 1_048_576


def _col_letter(idx: int) -> str:
    """0-based column index → A1-style letters (0→A, 25→Z, 26→AA)."""
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def _cell_xml(ref: str, value) -> str:
    """One <c> element; inline strings keep the part self-contained."""
    if value is None or (isinstance(value, float) and math.isnan(value)):
        return ""
    if isinstance(value, bool):
        return f'<c r="{ref}" t="b"><v>{int(value)}</v></c>'
    if isinstance(value, (int, float)):
        return f'<c r="{ref}"><v>{value!r}</v></c>'
    return f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">{escape(str(value))}</t></is></c>'


def _sheet_xml(df: pd.DataFrame) -> bytes:
    rows = []
    header = "".join(
        _cell_xml(f"{_col_letter(j)}1", str(c)) for j, c in enumerate(df.columns)
    )
    rows.append(f'<row r="1">{header}</row>')
    for i, rec in enumerate(df.itertuples(index=False), start=2):
        cells = "".join(
            _cell_xml(f"{_col_letter(j)}{i}", v) for j, v in enumerate(rec)
        )
        rows.append(f'<row r="{i}">{cells}</row>')
    body = "".join(rows)
    return (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<worksheet xmlns="{_NS_MAIN}"><sheetData>{body}</sheetData></worksheet>'
    ).encode()


def write_xlsx(path: str, sheets: dict[str, pd.DataFrame]) -> None:
    """Write ``sheets`` (name → frame, insertion-ordered) as an .xlsx.

    Atomic: the zip is assembled in a tmp file in the target directory
    and moved into place with ``os.replace`` — readers never observe a
    torn workbook (reference keywords4cv.py:3249-3260 parity).
    """
    if not sheets:
        raise ValueError("xlsx workbook needs at least one sheet")
    for name, df in sheets.items():
        if len(df) + 1 > _XLSX_MAX_ROWS:
            raise ValueError(
                f"sheet {name!r} has {len(df)} rows; .xlsx caps at "
                f"{_XLSX_MAX_ROWS - 1} data rows — use the parquet/JSONL sinks"
            )

    overrides = "".join(
        f'<Override PartName="/xl/worksheets/sheet{i}.xml" '
        'ContentType="application/vnd.openxmlformats-officedocument.'
        'spreadsheetml.worksheet+xml"/>'
        for i in range(1, len(sheets) + 1)
    )
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        '<Override PartName="/xl/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>'
        f"{overrides}</Types>"
    )
    pkg_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<Relationships xmlns="{_NS_PKG_REL}">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
        "</Relationships>"
    )
    sheet_entries = "".join(
        f"<sheet name={quoteattr(name)} sheetId=\"{i}\" r:id=\"rId{i}\"/>"
        for i, name in enumerate(sheets, start=1)
    )
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<workbook xmlns="{_NS_MAIN}" xmlns:r="{_NS_REL}">'
        f"<sheets>{sheet_entries}</sheets></workbook>"
    )
    n = len(sheets)
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<Relationships xmlns="{_NS_PKG_REL}">'
        + "".join(
            f'<Relationship Id="rId{i}" Type="http://schemas.openxmlformats.org/'
            'officeDocument/2006/relationships/worksheet" '
            f'Target="worksheets/sheet{i}.xml"/>'
            for i in range(1, n + 1)
        )
        + f'<Relationship Id="rId{n + 1}" Type="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships/styles" Target="styles.xml"/>'
        "</Relationships>"
    )
    styles = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<styleSheet xmlns="{_NS_MAIN}">'
        '<fonts count="1"><font><sz val="11"/><name val="Calibri"/></font></fonts>'
        '<fills count="1"><fill><patternFill patternType="none"/></fill></fills>'
        '<borders count="1"><border/></borders>'
        '<cellStyleXfs count="1"><xf/></cellStyleXfs>'
        '<cellXfs count="1"><xf xfId="0"/></cellXfs>'
        "</styleSheet>"
    )

    out_dir = os.path.dirname(os.path.abspath(path)) or "."
    fd, tmp = tempfile.mkstemp(suffix=".xlsx.tmp", dir=out_dir)
    try:
        with os.fdopen(fd, "wb") as f, zipfile.ZipFile(
            f, "w", zipfile.ZIP_DEFLATED
        ) as z:
            z.writestr("[Content_Types].xml", content_types)
            z.writestr("_rels/.rels", pkg_rels)
            z.writestr("xl/workbook.xml", workbook)
            z.writestr("xl/_rels/workbook.xml.rels", wb_rels)
            z.writestr("xl/styles.xml", styles)
            for i, df in enumerate(sheets.values(), start=1):
                z.writestr(f"xl/worksheets/sheet{i}.xml", _sheet_xml(df))
        os.replace(tmp, path)
    except BaseException:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise


def _cell_value(c: ET.Element):
    t = c.get("t")
    if t == "inlineStr":
        parts = c.findall(f".//{{{_NS_MAIN}}}t")
        return "".join(p.text or "" for p in parts)
    v = c.find(f"{{{_NS_MAIN}}}v")
    if v is None or v.text is None:
        return None
    if t == "b":
        return bool(int(v.text))
    try:
        return int(v.text)
    except ValueError:
        return float(v.text)


def _col_index(ref: str) -> int:
    """A1-style ref → 0-based column index ("C7" → 2)."""
    idx = 0
    for ch in ref:
        if not ch.isalpha():
            break
        idx = idx * 26 + (ord(ch.upper()) - ord("A") + 1)
    return idx - 1


def read_xlsx(path: str) -> dict[str, pd.DataFrame]:
    """Parse an .xlsx back to {sheet name: frame} (tests + spot reads)."""
    with zipfile.ZipFile(path) as z:
        wb = ET.fromstring(z.read("xl/workbook.xml"))
        rels = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
        rid_to_target = {
            r.get("Id"): r.get("Target")
            for r in rels.findall(f"{{{_NS_PKG_REL}}}Relationship")
        }
        out: dict[str, pd.DataFrame] = {}
        for sheet in wb.findall(f".//{{{_NS_MAIN}}}sheet"):
            rid = sheet.get(f"{{{_NS_REL}}}id")
            part = "xl/" + rid_to_target[rid].lstrip("/")
            ws = ET.fromstring(z.read(part))
            rows: dict[int, dict[int, object]] = {}
            for row in ws.findall(f".//{{{_NS_MAIN}}}row"):
                r = int(row.get("r"))
                for c in row.findall(f"{{{_NS_MAIN}}}c"):
                    rows.setdefault(r, {})[_col_index(c.get("r"))] = _cell_value(c)
            if not rows:
                out[sheet.get("name")] = pd.DataFrame()
                continue
            header = rows.pop(1, {})
            cols = [header[j] for j in sorted(header)]
            data = [
                [rows[r].get(j) for j in sorted(header)] for r in sorted(rows)
            ]
            out[sheet.get("name")] = pd.DataFrame(data, columns=cols)
        return out


def save_results_xlsx(
    summary: DataFrame,
    details: DataFrame,
    output_file: str,
    max_rows: int = 100_000,
) -> None:
    """Reference S8: Summary + Detailed Scores workbook, atomic write.

    The collect is bounded (a report sink, not a data sink); anything
    beyond ``max_rows`` per sheet is an error by design — route bulk
    output through ``save_results_parquet`` / ``save_results_jsonl``.
    """
    frames = {}
    for name, df in (("Summary", summary), ("Detailed Scores", details)):
        pdf = df.limit(max_rows + 1).toPandas()
        if len(pdf) > max_rows:
            raise ValueError(
                f"{name} exceeds max_rows={max_rows}; use the parquet/JSONL sinks"
            )
        frames[name] = pdf
    write_xlsx(output_file, frames)
