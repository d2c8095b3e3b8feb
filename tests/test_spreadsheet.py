"""Stdlib XLSX/ODS parser unit tests (no Ray needed)."""

import io
import zipfile

from morph_kgc_ray.sources.spreadsheet import (
    _num_to_str,
    read_ods_rows,
    read_xlsx_rows,
    rows_to_table,
)

EXCEL_TC = '/root/reference/test/rml-core/tabular/RMLTC0002a_EXCEL/student.xlsx'
ODS_TC = '/root/reference/test/rml-core/tabular/RMLTC0002a_ODS/student.ods'


def test_num_to_str_matches_pandas_dtype_str():
    assert _num_to_str('30') == '30'
    assert _num_to_str('30.0') == '30'
    assert _num_to_str('3.5') == '3.5'
    assert _num_to_str('abc') == 'abc'


def test_xlsx_reference_tc():
    rows = read_xlsx_rows(open(EXCEL_TC, 'rb').read())
    assert rows == [['ID', 'Name'], ['10', 'Venus']]
    t = rows_to_table(rows)
    assert t.column_names == ['ID', 'Name']
    assert t['ID'].to_pylist() == ['10']


def test_ods_reference_tc():
    rows = read_ods_rows(open(ODS_TC, 'rb').read())
    assert rows == [['ID', 'Name'], ['10', 'Venus']]


def _mini_xlsx(shared_strings: bool) -> bytes:
    """A minimal handcrafted XLSX: header + 2 data rows, mixed cell types."""
    ss = ('<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
          '<si><t>col_a</t></si><si><r><t>he</t></r><r><t>llo</t></r></si></sst>')
    sheet = ('<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
             '<sheetData>'
             '<row r="1"><c r="A1" t="s"><v>0</v></c>'
             '<c r="B1" t="inlineStr"><is><t>col_b</t></is></c></row>'
             '<row r="2"><c r="A2" t="s"><v>1</v></c><c r="B2"><v>42</v></c></row>'
             '<row r="3"><c r="A3" t="b"><v>1</v></c><c r="B3"><v>2.5</v></c></row>'
             '</sheetData></worksheet>')
    wb = ('<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
          'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
          '<sheets><sheet name="S1" sheetId="1" r:id="rId1"/></sheets></workbook>')
    rels = ('<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
            '<Relationship Id="rId1" Target="worksheets/sheet1.xml" '
            'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet"/>'
            '</Relationships>')
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, 'w') as zf:
        zf.writestr('xl/workbook.xml', wb)
        zf.writestr('xl/_rels/workbook.xml.rels', rels)
        zf.writestr('xl/worksheets/sheet1.xml', sheet)
        if shared_strings:
            zf.writestr('xl/sharedStrings.xml', ss)
    return buf.getvalue()


def test_xlsx_cell_types_and_rich_text():
    rows = read_xlsx_rows(_mini_xlsx(shared_strings=True))
    assert rows == [['col_a', 'col_b'], ['hello', '42'], ['True', '2.5']]
