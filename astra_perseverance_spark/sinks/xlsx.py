"""Minimal dependency-free .xlsx writer (stdlib zipfile + XML).

XlsxWriter/openpyxl are not available in this environment, and an
.xlsx file is just a zip of OOXML parts (ECMA-376: [Content_Types],
workbook.xml, worksheets/sheetN.xml, styles.xml), so the sink writes
those parts directly.  Scope is exactly what the report needs:

- multiple named sheets, header row in bold, frozen panes;
- inline strings (no sharedStrings table — simpler, and fine at
  report grain), numbers as native numeric cells;
- column widths.

This is a driver-side presentation layer over *collected* results —
every tab is per-table / per-node grain, bounded by schema size, never
by input size (SURVEY.md §4.2.4).
"""

from __future__ import annotations

import zipfile
from xml.sax.saxutils import escape


class Formula:
    """A live formula cell: ``expr`` (without the leading ``=``) plus a
    cached result value so non-recalculating readers still see data.

    Mirrors the reference's ``write_formula`` cells (explore.py:1554,
    1724, 1758-1760, 1811-1826): totals recompute when a user edits the
    sheet, instead of being frozen Spark-side literals."""

    def __init__(self, expr: str, value: object = None):
        self.expr = expr
        self.value = value


def _col_letter(idx: int) -> str:
    """0-based column index → A1-style letters."""
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


class Sheet:
    def __init__(self, name: str, freeze_rows: int = 1,
                 col_widths: list[int] | None = None):
        self.name = name
        self.freeze_rows = freeze_rows
        self.col_widths = col_widths or []
        self.rows: list[list[tuple[object, int]]] = []
        self.merges: list[str] = []

    def add_row(self, values: list[object], style: int = 0) -> None:
        self.rows.append([(v, style) for v in values])

    def add_row_styled(self, cells: list[tuple[object, int]]) -> None:
        """Row with per-cell styles — for layouts where one spreadsheet
        row mixes data and total cells (side-by-side blocks of
        different lengths)."""
        self.rows.append(list(cells))

    def add_merge(self, ref: str) -> None:
        """Merge an A1-style range (content goes in the top-left cell)."""
        self.merges.append(ref)

    def _cell_xml(self, r: int, c: int, value: object, style: int) -> str:
        ref = f"{_col_letter(c)}{r + 1}"
        s = f' s="{style}"' if style else ""
        if value is None:
            return ""
        if isinstance(value, Formula):
            f = f"<f>{escape(value.expr)}</f>"
            v = value.value
            if v is None:
                return f'<c r="{ref}"{s}>{f}</c>'
            if isinstance(v, (int, float)) and not isinstance(v, bool):
                if isinstance(v, float) and v != v:  # NaN cache: omit
                    return f'<c r="{ref}"{s}>{f}</c>'
                return f'<c r="{ref}"{s}>{f}<v>{v!r}</v></c>'
            return (f'<c r="{ref}"{s} t="str">{f}'
                    f"<v>{escape(str(v))}</v></c>")
        if isinstance(value, bool):
            return f'<c r="{ref}"{s} t="b"><v>{int(value)}</v></c>'
        if isinstance(value, (int, float)):
            if isinstance(value, float) and value != value:  # NaN
                return ""
            return f'<c r="{ref}"{s}><v>{value!r}</v></c>'
        txt = escape(str(value))
        return (f'<c r="{ref}"{s} t="inlineStr"><is>'
                f'<t xml:space="preserve">{txt}</t></is></c>')

    def to_xml(self) -> str:
        parts = ['<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                 '<worksheet xmlns="http://schemas.openxmlformats.org/'
                 'spreadsheetml/2006/main">']
        if self.freeze_rows:
            parts.append(
                '<sheetViews><sheetView workbookViewId="0">'
                f'<pane ySplit="{self.freeze_rows}" '
                f'topLeftCell="A{self.freeze_rows + 1}" state="frozen"/>'
                "</sheetView></sheetViews>"
            )
        if self.col_widths:
            cols = "".join(
                f'<col min="{i + 1}" max="{i + 1}" width="{w}" customWidth="1"/>'
                for i, w in enumerate(self.col_widths)
            )
            parts.append(f"<cols>{cols}</cols>")
        parts.append("<sheetData>")
        for r, row in enumerate(self.rows):
            cells = "".join(self._cell_xml(r, c, v, st)
                            for c, (v, st) in enumerate(row))
            parts.append(f'<row r="{r + 1}">{cells}</row>')
        parts.append("</sheetData>")
        if self.merges:
            cells = "".join(f'<mergeCell ref="{m}"/>' for m in self.merges)
            parts.append(
                f'<mergeCells count="{len(self.merges)}">{cells}</mergeCells>')
        parts.append("</worksheet>")
        return "".join(parts)


_STYLES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
<fonts count="2"><font><sz val="11"/><name val="Calibri"/></font>
<font><b/><sz val="11"/><name val="Calibri"/></font></fonts>
<fills count="2"><fill><patternFill patternType="none"/></fill>
<fill><patternFill patternType="gray125"/></fill></fills>
<borders count="1"><border/></borders>
<cellStyleXfs count="1"><xf/></cellStyleXfs>
<cellXfs count="2"><xf xfId="0"/><xf fontId="1" xfId="0" applyFont="1"/></cellXfs>
</styleSheet>"""

HEADER_STYLE = 1


class Workbook:
    """Assembles sheets into a valid .xlsx zip."""

    def __init__(self) -> None:
        self.sheets: list[Sheet] = []

    def add_sheet(self, name: str, freeze_rows: int = 1,
                  col_widths: list[int] | None = None) -> Sheet:
        # Excel sheet-name limit is 31 chars, no []:*?/\ characters.
        clean = "".join(ch for ch in name if ch not in "[]:*?/\\")[:31]
        sh = Sheet(clean, freeze_rows, col_widths)
        self.sheets.append(sh)
        return sh

    def save(self, path: str) -> None:
        n = len(self.sheets)
        overrides = "".join(
            f'<Override PartName="/xl/worksheets/sheet{i + 1}.xml" '
            'ContentType="application/vnd.openxmlformats-officedocument.'
            'spreadsheetml.worksheet+xml"/>'
            for i in range(n)
        )
        content_types = (
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
            '<Default Extension="rels" ContentType="application/vnd.openxmlformats-'
            'package.relationships+xml"/>'
            '<Default Extension="xml" ContentType="application/xml"/>'
            '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.'
            'openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
            '<Override PartName="/xl/styles.xml" ContentType="application/vnd.'
            'openxmlformats-officedocument.spreadsheetml.styles+xml"/>'
            f"{overrides}</Types>"
        )
        root_rels = (
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/'
            'relationships"><Relationship Id="rId1" Type="http://schemas.'
            'openxmlformats.org/officeDocument/2006/relationships/officeDocument" '
            'Target="xl/workbook.xml"/></Relationships>'
        )
        sheets_xml = "".join(
            f'<sheet name="{escape(sh.name)}" sheetId="{i + 1}" r:id="rId{i + 1}"/>'
            for i, sh in enumerate(self.sheets)
        )
        workbook_xml = (
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/'
            'main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/'
            f'relationships"><sheets>{sheets_xml}</sheets></workbook>'
        )
        wb_rels = "".join(
            f'<Relationship Id="rId{i + 1}" Type="http://schemas.openxmlformats.org/'
            'officeDocument/2006/relationships/worksheet" '
            f'Target="worksheets/sheet{i + 1}.xml"/>'
            for i in range(n)
        ) + (
            f'<Relationship Id="rId{n + 1}" Type="http://schemas.openxmlformats.org/'
            'officeDocument/2006/relationships/styles" Target="styles.xml"/>'
        )
        wb_rels_xml = (
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/'
            f'relationships">{wb_rels}</Relationships>'
        )
        with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
            zf.writestr("[Content_Types].xml", content_types)
            zf.writestr("_rels/.rels", root_rels)
            zf.writestr("xl/workbook.xml", workbook_xml)
            zf.writestr("xl/_rels/workbook.xml.rels", wb_rels_xml)
            zf.writestr("xl/styles.xml", _STYLES)
            for i, sh in enumerate(self.sheets):
                zf.writestr(f"xl/worksheets/sheet{i + 1}.xml", sh.to_xml())
