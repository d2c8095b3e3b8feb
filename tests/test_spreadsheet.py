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


def _mini_ods(body_rows: str) -> bytes:
    content = (
        '<office:document-content '
        'xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0" '
        'xmlns:table="urn:oasis:names:tc:opendocument:xmlns:table:1.0" '
        'xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0">'
        '<office:body><office:spreadsheet><table:table table:name="S1">'
        f'{body_rows}'
        '</table:table></office:spreadsheet></office:body>'
        '</office:document-content>')
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, 'w') as zf:
        zf.writestr('content.xml', content)
    return buf.getvalue()


def _tc(text=None, repeated=None):
    rep = f' table:number-columns-repeated="{repeated}"' if repeated else ''
    if text is None:
        return f'<table:table-cell{rep}/>'
    return (f'<table:table-cell office:value-type="string"{rep}>'
            f'<text:p>{text}</text:p></table:table-cell>')


def test_ods_mid_row_empty_repeats_keep_columns():
    # header of 4 cols; data row [A, <2 repeated empties>, B]: B must land
    # in column 4 (index 3), not get shifted left (silent misalignment bug)
    body = ('<table:table-row>' + _tc('h1') + _tc('h2') + _tc('h3') + _tc('h4')
            + '</table:table-row>'
            '<table:table-row>' + _tc('A') + _tc(repeated=2) + _tc('B')
            + '</table:table-row>')
    rows = read_ods_rows(_mini_ods(body))
    assert rows == [['h1', 'h2', 'h3', 'h4'], ['A', '', '', 'B']]
    t = rows_to_table(rows)
    assert t['h4'].to_pylist() == ['B']
    assert t['h2'].to_pylist() == ['']


def test_ods_leading_empty_and_trailing_padding():
    # leading empty keeps its column; huge trailing repeat run (LibreOffice
    # 16k-column padding) never materializes
    body = ('<table:table-row>' + _tc('h1') + _tc('h2') + _tc('h3')
            + '</table:table-row>'
            '<table:table-row>' + _tc(repeated=1) + _tc('X')
            + _tc(repeated=16382) + '</table:table-row>')
    rows = read_ods_rows(_mini_ods(body))
    assert rows == [['h1', 'h2', 'h3'], ['', 'X']]


def test_rows_to_table_duplicate_headers_mangled_pandas_style():
    t = rows_to_table([['Name', 'Name', 'Name.1'], ['a', 'b', 'c']])
    assert t.column_names == ['Name', 'Name.1', 'Name.1.1']
    assert t['Name'].to_pylist() == ['a']
    assert t['Name.1'].to_pylist() == ['b']
    assert t['Name.1.1'].to_pylist() == ['c']
