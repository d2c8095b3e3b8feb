"""Stdlib XLSX / ODS readers (zipfile + ElementTree — no openpyxl/odfpy).

Mirrors the reference's spreadsheet semantics (data_file.py:121-137:
``pd.read_excel(sheet_name=0, dtype=str, keep_default_na=False,
na_filter=False)``): FIRST sheet only, first row is the header, every value
returned as a string with no NA interpretation.  Numeric cells format the
way pandas' ``dtype=str`` does (integral floats print without the trailing
``.0``).

Both formats are zip archives of XML, so the stdlib covers the whole
tabular subset the RML test corpus (and typical mapping sources) uses:
shared/inline strings, numeric/boolean cells, skipped empty cells,
column-repeat runs (ODS).  Formulas yield their CACHED value (the stored
<v>/office:value), like a read-only consumer should.
"""

from __future__ import annotations

import re
import zipfile
import xml.etree.ElementTree as ET

_SSML = '{http://schemas.openxmlformats.org/spreadsheetml/2006/main}'
_REL = '{http://schemas.openxmlformats.org/officeDocument/2006/relationships}'
_PKGREL = '{http://schemas.openxmlformats.org/package/2006/relationships}'
_TABLE = '{urn:oasis:names:tc:opendocument:xmlns:table:1.0}'
_OFFICE = '{urn:oasis:names:tc:opendocument:xmlns:office:1.0}'
_TEXT = '{urn:oasis:names:tc:opendocument:xmlns:text:1.0}'

_CELL_REF_RX = re.compile(r'([A-Z]+)([0-9]+)')


def _num_to_str(raw: str) -> str:
    """Format a stored numeric the way pandas dtype=str renders it:
    integral values lose the decimal point (float('30.0') -> '30')."""
    try:
        f = float(raw)
    except ValueError:
        return raw
    if f == int(f) and abs(f) < 1e16:
        return str(int(f))
    return repr(f)


def _col_index(ref: str) -> 'int | None':
    """'C7' -> 2 (0-based column)."""
    m = _CELL_REF_RX.match(ref or '')
    if not m:
        return None
    idx = 0
    for ch in m.group(1):
        idx = idx * 26 + (ord(ch) - 64)
    return idx - 1


def read_xlsx_rows(data: bytes) -> list[list[str]]:
    """Rows (lists of cell strings) of the FIRST sheet of an XLSX blob."""
    with zipfile.ZipFile(_as_file(data)) as zf:
        names = set(zf.namelist())
        shared: list[str] = []
        if 'xl/sharedStrings.xml' in names:
            root = ET.fromstring(zf.read('xl/sharedStrings.xml'))
            for si in root.findall(f'{_SSML}si'):
                # plain or rich text: concatenate every <t> descendant
                shared.append(''.join(t.text or '' for t in si.iter(f'{_SSML}t')))
        sheet_path = _first_sheet_path(zf, names)
        root = ET.fromstring(zf.read(sheet_path))
        rows: list[list[str]] = []
        for row in root.iter(f'{_SSML}row'):
            cells: dict[int, str] = {}
            auto_col = 0
            for c in row.findall(f'{_SSML}c'):
                col = _col_index(c.get('r', ''))
                if col is None:
                    col = auto_col
                auto_col = col + 1
                ctype = c.get('t', 'n')
                if ctype == 'inlineStr':
                    is_el = c.find(f'{_SSML}is')
                    val = ''.join(t.text or '' for t in is_el.iter(f'{_SSML}t')) \
                        if is_el is not None else ''
                else:
                    v = c.find(f'{_SSML}v')
                    raw = v.text if (v is not None and v.text is not None) else None
                    if raw is None:
                        continue
                    if ctype == 's':
                        val = shared[int(raw)]
                    elif ctype == 'b':
                        val = 'True' if raw.strip() == '1' else 'False'
                    elif ctype in ('str', 'e'):
                        val = raw
                    else:  # 'n'
                        val = _num_to_str(raw)
                cells[col] = val
            width = max(cells) + 1 if cells else 0
            rows.append([cells.get(i, '') for i in range(width)])
        return rows


def _first_sheet_path(zf: zipfile.ZipFile, names: set) -> str:
    """Resolve the workbook's first sheet to its part path via the rels."""
    try:
        wb = ET.fromstring(zf.read('xl/workbook.xml'))
        sheets = wb.find(f'{_SSML}sheets')
        first = sheets.find(f'{_SSML}sheet')
        rid = first.get(f'{_REL}id')
        rels = ET.fromstring(zf.read('xl/_rels/workbook.xml.rels'))
        for rel in rels.findall(f'{_PKGREL}Relationship'):
            if rel.get('Id') == rid:
                target = rel.get('Target').lstrip('/')
                return target if target.startswith('xl/') else f'xl/{target}'
    except (KeyError, AttributeError, ET.ParseError):
        pass
    for cand in sorted(n for n in zf.namelist() if n.startswith('xl/worksheets/')):
        return cand
    raise ValueError('XLSX: no worksheet part found')


def read_ods_rows(data: bytes) -> list[list[str]]:
    """Rows of the FIRST table of an ODS blob (content.xml)."""
    with zipfile.ZipFile(_as_file(data)) as zf:
        root = ET.fromstring(zf.read('content.xml'))
        table = root.find(f'.//{_TABLE}table')
        if table is None:
            return []
        rows: list[list[str]] = []
        for row in table.findall(f'{_TABLE}table-row'):
            cells: list[str] = []
            # Empty repeat runs (number-columns-repeated) are buffered and
            # only materialized when a later non-empty cell needs them in
            # place — leading/mid-row blanks keep their columns, while the
            # 16k-column trailing padding runs never materialize at all.
            pending_empty = 0
            for cell in row:
                if cell.tag not in (f'{_TABLE}table-cell', f'{_TABLE}covered-table-cell'):
                    continue
                repeat = int(cell.get(f'{_TABLE}number-columns-repeated', '1'))
                vtype = cell.get(f'{_OFFICE}value-type')
                if vtype in ('float', 'percentage', 'currency'):
                    val = _num_to_str(cell.get(f'{_OFFICE}value', ''))
                elif vtype == 'boolean':
                    val = 'True' if cell.get(f'{_OFFICE}boolean-value') == 'true' else 'False'
                elif vtype == 'date':
                    val = cell.get(f'{_OFFICE}date-value', '')
                elif vtype == 'time':
                    val = cell.get(f'{_OFFICE}time-value', '')
                else:
                    val = '\n'.join((p.text or '') + ''.join(s.tail or '' for s in p)
                                    for p in cell.findall(f'{_TEXT}p')) \
                        if vtype is not None or len(cell) else ''
                if val == '':
                    pending_empty += repeat
                else:
                    if pending_empty:
                        cells.extend([''] * pending_empty)
                        pending_empty = 0
                    cells.extend([val] * repeat)
            rows.append(cells)
        # trim trailing all-empty rows (ODS repeats the last empty row)
        while rows and all(v == '' for v in rows[-1]):
            rows.pop()
        return rows


def _as_file(data: bytes):
    import io
    return io.BytesIO(data)


def rows_to_table(rows: list[list[str]]):
    """Header row + data rows -> pyarrow string table (pandas-read_excel
    shape: first row is the header)."""
    import pyarrow as pa
    if not rows:
        return pa.table({})
    # pandas read_excel mangles duplicate headers to 'Name.1', 'Name.2', ...
    header: list[str] = []
    seen: set = set()
    for h in rows[0]:
        h = str(h)
        if h in seen:
            n = 1
            while f'{h}.{n}' in seen:
                n += 1
            h = f'{h}.{n}'
        seen.add(h)
        header.append(h)
    cols = {h: [r[i] if i < len(r) else '' for r in rows[1:]]
            for i, h in enumerate(header)}
    return pa.table({h: pa.array(v, pa.string()) for h, v in cols.items()})
