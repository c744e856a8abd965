"""S2 Excel boundary: the hermetic stdlib XLSX codec.

No xlsx engine (openpyxl/xlsxwriter) exists in the runtime, so the S2
source falls back to the stdlib zip+XML parser; these tests pin the
writer↔reader round trip on adversarial content and the reader's
compatibility with the SHARED-STRINGS layout pandas/openpyxl write
(our writer uses inline strings; real-world files mostly don't)."""

from __future__ import annotations

import zipfile

from leader_graph_spark.sources.files import (
    _read_xlsx_stdlib,
    read_excel,
    write_xlsx,
)


def test_xlsx_roundtrip_adversarial_strings(spark, tmp_path):
    path = str(tmp_path / "adv.xlsx")
    rows = [
        (1, "a & b < c > d", "plain"),
        (2, "line1\nline2", "  leading and trailing  "),
        (3, None, ""),
        (4, "unicode: 中文 émoji ✓", "x"),
    ]
    write_xlsx(rows, ["id", "text", "extra"], path)
    df = read_excel(spark, path)
    got = {tuple(r) for r in df.collect()}
    # stdlib fallback returns strings (untyped, like CSV)
    assert ("1", "a & b < c > d", "plain") in got
    assert ("2", "line1\nline2", "  leading and trailing  ") in got
    assert ("4", "unicode: 中文 émoji ✓", "x") in got
    # None survives as null, empty string as empty string
    row3 = next(t for t in got if t[0] == "3")
    assert row3[1] is None and row3[2] == ""


def test_xlsx_reader_handles_shared_strings(spark, tmp_path):
    """Real-world xlsx (pandas/openpyxl) interns strings in
    xl/sharedStrings.xml with t="s" cells; the reader must resolve
    them even though our writer never emits that layout."""
    path = str(tmp_path / "shared.xlsx")
    write_xlsx([(1, "x")], ["k", "v"], path)  # scaffold valid parts
    shared = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="3" uniqueCount="3">'
        '<si><t>k</t></si><si><t>v</t></si>'
        "<si><r><t>rich </t></r><r><t>text</t></r></si></sst>"
    )
    sheet = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>'
        '<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c></row>'
        '<row r="2"><c r="A2"><v>7</v></c><c r="B2" t="s"><v>2</v></c></row>'
        "</sheetData></worksheet>"
    )
    src = zipfile.ZipFile(path)
    names = {n: src.read(n) for n in src.namelist()}
    src.close()
    names["xl/sharedStrings.xml"] = shared.encode()
    names["xl/worksheets/sheet1.xml"] = sheet.encode()
    with zipfile.ZipFile(path, "w") as z:
        for n, data in names.items():
            z.writestr(n, data)
    pdf = _read_xlsx_stdlib(path)
    assert list(pdf.columns) == ["k", "v"]
    # rich-text runs concatenate; numbers come back as strings
    assert pdf.iloc[0].tolist() == ["7", "rich text"]


def test_xlsx_reader_sparse_cells(spark, tmp_path):
    """Omitted cells (our writer skips None) must land in the right
    column via the r= reference, not collapse leftward."""
    path = str(tmp_path / "sparse.xlsx")
    write_xlsx([(None, "b", None), ("a", None, "c")], ["c1", "c2", "c3"], path)
    pdf = _read_xlsx_stdlib(path)
    assert pdf.iloc[0].tolist() == [None, "b", None]
    assert pdf.iloc[1].tolist() == ["a", None, "c"]


def test_xlsx_reader_rejects_non_zip(tmp_path):
    import pytest as _pytest

    bad = tmp_path / "not_a_workbook.xlsx"
    bad.write_bytes(b"this is not a zip archive")
    with _pytest.raises(Exception):
        _read_xlsx_stdlib(str(bad))


def test_read_excel_rejects_binary_xls_with_typed_error(spark, tmp_path):
    """A legacy OLE2 .xls reaching the no-engine runtime must raise the
    typed, actionable error — not a BadZipFile traceback. Reachable in
    production because read_tabular_dir globs *.xls."""
    import pytest as _pytest

    from leader_graph_spark.sources.files import (
        UnsupportedExcelFormatError,
        read_excel,
        read_tabular_dir,
    )

    legacy = tmp_path / "org_chart.xls"
    legacy.write_bytes(
        b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1" + b"\x00" * 512
    )
    with _pytest.raises(UnsupportedExcelFormatError, match=r"pre-2007 \.xls"):
        read_excel(spark, str(legacy))
    with _pytest.raises(UnsupportedExcelFormatError):
        read_tabular_dir(spark, str(tmp_path))


def test_excel_roundtrip_query_guards_oversized_collect(spark, monkeypatch):
    """The driver-side collect in excel_roundtrip_documents is bounded:
    above the cap it raises the typed misuse error BEFORE collecting."""
    import pytest as _pytest

    from leader_graph_spark.plans import REGISTRY, boundary_queries

    monkeypatch.setattr(boundary_queries, "_EXCEL_COLLECT_MAX_ROWS", 10)
    with _pytest.raises(ValueError, match="distributed sink"):
        REGISTRY["excel_roundtrip_documents"].spark(spark, "/root/testdata/sf0.001")
