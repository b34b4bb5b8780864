"""HTML/Excel source parsers: stdlib-based, fixture-driven."""

from __future__ import annotations

import io
import zipfile

from linkmerce_spark.sources.excel import excel_to_df, excel_to_rows
from linkmerce_spark.sources.htmlsource import (
    html_select_text,
    html_tables,
    parse_html_column,
)

_HTML = """
<html><body>
  <div class="title">Ad Report</div>
  <table>
    <tr><th>keyword</th><th>clicks</th><th>cost</th></tr>
    <tr><td>shoes</td><td>10</td><td>1,500</td></tr>
    <tr><td>hats</td><td>3</td><td>420</td></tr>
  </table>
  <div class="note">generated &amp; cached</div>
</body></html>
"""


def _xlsx_bytes() -> bytes:
    """Build a minimal real .xlsx with stdlib zipfile (shared+inline)."""
    shared = (
        '<?xml version="1.0"?><sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="2" uniqueCount="2">'
        "<si><t>sku</t></si><si><t>qty</t></si></sst>"
    )
    sheet = (
        '<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>'
        '<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c></row>'
        '<row r="2"><c r="A2" t="inlineStr"><is><t>SKU-1</t></is></c><c r="B2"><v>5</v></c></row>'
        '<row r="3"><c r="A3" t="inlineStr"><is><t>SKU-2</t></is></c><c r="B3"><v>2.5</v></c></row>'
        "</sheetData></worksheet>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("xl/sharedStrings.xml", shared)
        z.writestr("xl/worksheets/sheet1.xml", sheet)
    return buf.getvalue()


def test_html_tables_to_dicts():
    tables = html_tables(_HTML)
    assert len(tables) == 1
    assert tables[0] == [
        {"keyword": "shoes", "clicks": "10", "cost": "1,500"},
        {"keyword": "hats", "clicks": "3", "cost": "420"},
    ]


def test_html_class_selector():
    assert html_select_text(_HTML, cls="title") == ["Ad Report"]
    assert html_select_text(_HTML, cls="note") == ["generated & cached"]
    assert len(html_select_text(_HTML, tag="td")) == 6


def test_parse_html_column_distributed(spark):
    df = spark.createDataFrame([(1, _HTML), (2, "<p>no tables</p>")], "doc_id long, html string")
    out = parse_html_column(df).collect()
    assert len(out) == 3  # header + 2 body rows, doc 2 contributes none
    by_row = {(r["doc_id"], r["row_idx"]): r["cells"] for r in out}
    assert by_row[(1, 1)] == ["shoes", "10", "1,500"]


def test_excel_rows_and_df(spark):
    rows = excel_to_rows(_xlsx_bytes())
    assert rows == [["sku", "qty"], ["SKU-1", 5], ["SKU-2", 2.5]]
    df = excel_to_df(spark, _xlsx_bytes())
    got = {r["sku"]: r["qty"] for r in df.collect()}
    assert got == {"SKU-1": 5.0, "SKU-2": 2.5}
