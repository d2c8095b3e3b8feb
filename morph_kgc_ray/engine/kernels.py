"""Vectorized term-materialization kernels (Arrow batches, zero-copy hot path).

Re-expresses the reference's per-rule pandas string pipeline
(/root/reference/src/morph_kgc/materializer.py:106-230 ``_materialize_template``
and friends) as pyarrow.compute / numpy kernels that run inside
``Dataset.map_batches(batch_format='pyarrow')``:

- template expansion  -> one ``pc.binary_join_element_wise`` over alternating
  constant segments and processed reference columns;
- IRI percent-encoding (falcon ``encode_value`` ≡ ``urllib.quote(s, safe='')``)
  -> byte-level numpy lookup-table encoder (no per-row Python);
- N-Triples literal escaping -> chained ``pc.replace_substring`` with the
  reference's exact escape order (backslash first; also escapes ``'``);
- R2RML natural mapping (boolean lowercase, dateTime ' '->'T', integer
  float-truncate) -> Arrow cast kernels.

All functions are pure and stateless: safe for stateless map_batches tasks.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..constants import (
    AUXILIAR_UNIQUE_REPLACING_STRING,
    RML_BLANK_NODE,
    RML_CONSTANT,
    RML_IRI,
    RML_LITERAL,
    RML_REFERENCE,
    RML_TEMPLATE,
    XSD_BOOLEAN,
    XSD_DATETIME,
    XSD_DOUBLE,
    XSD_INTEGER,
)

# --------------------------------------------------------------------------
# template parsing
# --------------------------------------------------------------------------

_REFERENCE_RX = re.compile(r'\{([^}]+)\}')


def get_references_in_template(template: str) -> list[str]:
    """References in order of appearance; escaped braces are not delimiters
    (utils.py:98-112 semantics)."""
    aux = template.replace('\\{', AUXILIAR_UNIQUE_REPLACING_STRING).replace('\\}', AUXILIAR_UNIQUE_REPLACING_STRING)
    return _REFERENCE_RX.findall(aux)


def parse_template_segments(template: str) -> list[tuple[str, str]]:
    """Split a template into alternating ('const', text) / ('ref', name)
    segments.  Escaped braces (``\\{`` ``\\}``) become literal braces, inside
    and outside references.  A direct scanner — sentinel-substitution tricks
    corrupt templates that happen to contain the sentinel characters."""
    segments: list[tuple[str, str]] = []
    buf: list[str] = []
    i, n = 0, len(template)
    while i < n:
        c = template[i]
        if c == '\\' and i + 1 < n and template[i + 1] in '{}':
            buf.append(template[i + 1])
            i += 2
            continue
        if c == '{':
            j = i + 1
            ref: list[str] = []
            closed = False
            while j < n:
                if template[j] == '\\' and j + 1 < n and template[j + 1] in '{}':
                    ref.append(template[j + 1])
                    j += 2
                    continue
                if template[j] == '}':
                    closed = True
                    break
                ref.append(template[j])
                j += 1
            if closed and ref:  # '{}' is not a reference (regex was [^}]+)
                if buf:
                    segments.append(('const', ''.join(buf)))
                    buf = []
                segments.append(('ref', ''.join(ref)))
                i = j + 1
                continue
            if closed:  # empty '{}' stays literal
                buf.append('{}')
                i = j + 1
                continue
        buf.append(c)
        i += 1
    if buf:
        segments.append(('const', ''.join(buf)))
    return segments


# --------------------------------------------------------------------------
# IRI percent-encoding (byte-level, vectorized)
# --------------------------------------------------------------------------

_UNRESERVED = (b'ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~')
_ALLOWED_MASK = np.zeros(256, dtype=bool)
for _b in _UNRESERVED:
    _ALLOWED_MASK[_b] = True
# byte -> 3 output bytes '%XX' for disallowed bytes, identity (padded) otherwise
_ENC_TABLE = np.zeros((256, 3), dtype=np.uint8)
for _b in range(256):
    if _ALLOWED_MASK[_b]:
        _ENC_TABLE[_b, 0] = _b
    else:
        h = f'%{_b:02X}'.encode('ascii')
        _ENC_TABLE[_b] = list(h)
_OUT_LEN = np.where(_ALLOWED_MASK, 1, 3).astype(np.int64)


def percent_encode_array(arr: pa.Array) -> pa.Array:
    """Percent-encode every element (RFC 3986, safe='' — falcon encode_value
    semantics, materializer.py:127-132).  Operates on the raw UTF-8 buffer
    with numpy lookup tables; no per-row Python."""
    if len(arr) == 0:
        return arr
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    arr = arr.cast(pa.large_string())
    if arr.offset != 0:
        arr = pc.take(arr, np.arange(len(arr), dtype=np.int64))
    offsets = np.frombuffer(arr.buffers()[1], dtype=np.int64, count=len(arr) + 1 + arr.offset)[arr.offset:]
    databuf = arr.buffers()[2]
    data = np.frombuffer(databuf, dtype=np.uint8, count=len(databuf)) if databuf is not None else np.empty(0, np.uint8)
    start, end = offsets[0], offsets[-1]
    data = data[start:end]
    offsets = offsets - start

    if len(data) == 0:
        return arr
    needs = ~_ALLOWED_MASK[data]
    if not needs.any():
        return arr

    out_lens = _OUT_LEN[data]
    out_pos = np.zeros(len(data) + 1, dtype=np.int64)
    np.cumsum(out_lens, out=out_pos[1:])
    out = np.empty(out_pos[-1], dtype=np.uint8)
    # place all bytes via the 3-wide table; allowed bytes write 1 byte
    enc = _ENC_TABLE[data]  # (n, 3)
    pos = out_pos[:-1]
    out[pos] = enc[:, 0]
    tri = np.nonzero(needs)[0]
    out[out_pos[tri] + 1] = enc[tri, 1]
    out[out_pos[tri] + 2] = enc[tri, 2]

    new_offsets = out_pos[offsets]
    null_buf = arr.buffers()[0]
    return pa.Array.from_buffers(
        pa.large_string(), len(arr),
        [null_buf, pa.py_buffer(new_offsets.tobytes()), pa.py_buffer(out.tobytes())],
        null_count=arr.null_count)


def percent_encode_safe(arr: pa.Array, safe: str) -> pa.Array:
    """`safe_percent_encoding` configured: urllib.parse.quote with extra safe
    chars — cold path, per-unique-value Python."""
    from urllib.parse import quote
    uniq: dict[str, str] = {}
    vals = arr.to_pylist()
    return pa.array([None if v is None else uniq.setdefault(v, quote(v, safe=safe)) for v in vals],
                    type=pa.large_string())


# --------------------------------------------------------------------------
# literal processing
# --------------------------------------------------------------------------

# exact order of materializer.py:144 — backslash first, and ' is escaped too
_ESCAPE_CHAIN = (('\\', '\\\\'), ('\n', '\\n'), ('\t', '\\t'), ('\b', '\\b'),
                 ('\f', '\\f'), ('\r', '\\r'), ('"', '\\"'), ("'", "\\'"))


def escape_literal_array(arr: pa.Array) -> pa.Array:
    for old, new in _ESCAPE_CHAIN:
        arr = pc.replace_substring(arr, old, new)
    return arr


def xsd_canonical_double(value: str) -> str:
    """XSD 1.1 canonical lexical form of xsd:double ("80.25" -> "8.025E1",
    "30" -> "3.0E1") — mantissa in [1,10) with no trailing zeros (but at
    least one fraction digit), exponent with no sign/leading zeros."""
    from decimal import Decimal, InvalidOperation
    try:
        f = float(value)
    except (TypeError, ValueError):
        return value
    if f != f:
        return 'NaN'
    if f in (float('inf'), float('-inf')):
        return 'INF' if f > 0 else '-INF'
    if f == 0:
        return '-0.0E0' if str(f)[0] == '-' else '0.0E0'
    try:
        d = Decimal(repr(f))
    except InvalidOperation:  # pragma: no cover
        return value
    sign, digits, exp = d.as_tuple()
    digs = ''.join(map(str, digits)).rstrip('0') or '0'
    e = len(digits) - 1 + exp
    mant = digs[0] + '.' + (digs[1:] or '0')
    return ('-' if sign else '') + mant + 'E' + str(e)


def natural_mapping_array(arr: pa.Array, datatype: str, inferred: bool = False) -> pa.Array:
    """R2RML natural mapping of SQL values (materializer.py:134-141).

    ``inferred`` marks datatypes that came from SQL-type inference
    (infer_sql_datatypes): those additionally canonicalize 0/1 booleans and
    doubles (W3C natural-mapping lexical forms); explicitly declared
    datatypes keep the reference's narrower conversions."""
    if datatype == XSD_BOOLEAN:
        low = pc.utf8_lower(arr)
        if inferred:
            # sqlite stores booleans as 0/1 integers
            low = pc.replace_substring_regex(low, r'^1(\.0)?$', 'true')
            low = pc.replace_substring_regex(low, r'^0(\.0)?$', 'false')
        return low
    if datatype == XSD_DATETIME:
        return pc.replace_substring(arr, ' ', 'T')
    if datatype == XSD_INTEGER:
        floats = pc.cast(arr, pa.float64())
        ints = pc.cast(floats, pa.int64(), safe=False)  # truncates toward zero like astype(int)
        return pc.cast(ints, pa.large_string())
    if datatype == XSD_DOUBLE and inferred:
        vals = arr.to_pylist()  # cold path: only RDB natural-mapped doubles
        return pa.array([None if v is None else xsd_canonical_double(v) for v in vals],
                        pa.large_string())
    return arr


def remove_non_printable(arr: pa.Array) -> pa.Array:
    """only_printable_chars option — per-value Python (cold path)."""
    vals = arr.to_pylist()
    return pa.array([None if v is None else ''.join(c for c in v if c.isprintable()) for v in vals],
                    type=pa.large_string())


# --------------------------------------------------------------------------
# term plan + execution
# --------------------------------------------------------------------------

_SCHEME_RX = '^[A-Za-z][A-Za-z0-9+.\\-]*:'
_SCHEME_PY_RX = re.compile(_SCHEME_RX)
_INVALID_IRI_RX = '[\\x00-\\x20<>"{}|^`\\\\]'


@dataclass(frozen=True)
class TermPlan:
    """Compiled plan-time description of one term position of one rule."""
    position: str                       # output column name
    segments: tuple = ()                # (('const', s) | ('ref', name), ...)
    termtype: str = ''                  # RML_IRI / RML_LITERAL / RML_BLANK_NODE / '' (lang/datatype raw)
    map_type: str = ''                  # original map type (template/constant/reference)
    datatype: str = ''                  # effective datatype for natural mapping
    inferred_datatype: bool = False     # datatype came from SQL-type inference
    columns_alias: str = ''             # 'parent_' when materializing from a join
    only_printable: bool = False
    safe_encoding: str = ''             # non-empty -> urllib quote with this safe set
    base_iri: str = ''                  # IRI termtype: resolve relative results against this

    @property
    def references(self) -> list[str]:
        return [s[1] for s in self.segments if s[0] == 'ref']


def compile_term_plan(map_type: str, map_value: str, position: str, termtype: str = '',
                      datatype: str = '', columns_alias: str = '', only_printable: bool = False,
                      safe_encoding: str = '', base_iri: str = '',
                      inferred_datatype: bool = False) -> TermPlan:
    """Compile (map_type, map_value, termtype) into a TermPlan.

    Constants behave as zero-reference templates and references as
    single-reference templates (materializer.py:106-109).  Relative IRI
    results are resolved against the mapping's base IRI per R2RML
    (https://www.w3.org/TR/r2rml/#from-template) — the W3C conformance
    goldens require this."""
    if map_type == RML_REFERENCE:
        segments = [('ref', map_value)]
    elif map_type == RML_CONSTANT:
        segments = [('const', map_value)]
    else:  # template
        segments = parse_template_segments(map_value)

    tt = (termtype or '').strip()

    # merge adjacent const segments
    merged: list[tuple[str, str]] = []
    for kind, val in segments:
        if kind == 'const' and merged and merged[-1][0] == 'const':
            merged[-1] = ('const', merged[-1][1] + val)
        else:
            merged.append((kind, val))

    # plan-time base resolution decision: when the term starts with a constant
    # that is already absolute (or the base is unset), no per-row check needed
    if tt == RML_IRI and base_iri:
        if merged and merged[0][0] == 'const' and _SCHEME_PY_RX.match(merged[0][1]):
            base_iri = ''

    return TermPlan(position=position, segments=tuple(merged), termtype=tt, map_type=map_type,
                    datatype=datatype or '', columns_alias=columns_alias,
                    only_printable=only_printable, safe_encoding=safe_encoding, base_iri=base_iri,
                    inferred_datatype=inferred_datatype)


def _process_reference(col: pa.Array, plan: TermPlan) -> pa.Array:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = col.cast(pa.large_string())
    if plan.only_printable:
        col = remove_non_printable(col)
    if plan.termtype == RML_IRI and plan.map_type == RML_TEMPLATE:
        if plan.safe_encoding:
            col = percent_encode_safe(col, plan.safe_encoding)
        else:
            col = percent_encode_array(col)
    elif plan.termtype == RML_LITERAL:
        col = natural_mapping_array(col, plan.datatype, inferred=plan.inferred_datatype)
        col = escape_literal_array(col)
    return col


def ljoin(*parts, sep: str = ''):
    """binary_join_element_wise with large_string-typed scalars (Arrow needs
    uniform string width across inputs)."""
    conv = [pa.scalar(p, pa.large_string()) if isinstance(p, str) else p for p in parts]
    return pc.binary_join_element_wise(*conv, pa.scalar(sep, pa.large_string()))


def _wrap_term(raw, plan: TermPlan, n: int):
    """Apply termtype serialization (and base-IRI resolution) to raw values."""
    if isinstance(raw, str):  # constant-only term: compute once
        if plan.termtype == RML_IRI:
            if plan.base_iri and not _SCHEME_PY_RX.match(raw):
                raw = plan.base_iri + raw
            return pa.array([f'<{raw}>'] * n, pa.large_string())
        if plan.termtype == RML_BLANK_NODE:
            return pa.array([f'_:{raw}'] * n, pa.large_string())
        if plan.termtype == RML_LITERAL:
            return pa.array([f'"{raw}"'] * n, pa.large_string())
        return pa.array([raw] * n, pa.large_string())

    if plan.termtype == RML_IRI:
        if plan.base_iri:
            is_absolute = pc.match_substring_regex(raw, _SCHEME_RX)
            raw = pc.if_else(is_absolute, raw, ljoin(plan.base_iri, raw))
        # R2RML data errors: a term that is not a valid IRI generates no
        # triple (null here; rows dropped at triple serialization).  Only
        # unencoded value paths can produce these (encoded templates cannot).
        invalid = pc.match_substring_regex(raw, _INVALID_IRI_RX)
        raw = pc.if_else(invalid, pa.scalar(None, pa.large_string()), raw)
        return ljoin('<', raw, '>')
    if plan.termtype == RML_BLANK_NODE:
        return ljoin('_:', raw)
    if plan.termtype == RML_LITERAL:
        return ljoin('"', raw, '"')
    return raw


def materialize_term(table: pa.Table, plan: TermPlan) -> pa.Array:
    """Produce the serialized term column for ``plan`` over an Arrow batch."""
    n = table.num_rows
    parts = []
    has_ref = False
    for kind, val in plan.segments:
        if kind == 'const':
            parts.append(val)
        else:
            has_ref = True
            colname = plan.columns_alias + val
            parts.append(_process_reference(table[colname], plan))
    if not has_ref:
        return _wrap_term(''.join(parts), plan, n)
    raw = parts[0] if len(parts) == 1 else ljoin(*parts)
    return _wrap_term(raw, plan, n)


# --------------------------------------------------------------------------
# source prologue: stringify + null-drop + local distinct
# --------------------------------------------------------------------------

def stringify_column(col: 'pa.ChunkedArray | pa.Array') -> pa.Array:
    """Convert a column to large_string with Python-str-compatible formatting
    (mirrors the reference's ``data.map(str)`` + ``astype(str)`` chain,
    materializer.py:37-55) while keeping nulls null."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    t = col.type
    if pa.types.is_large_string(t):
        return col
    if pa.types.is_string(t):
        return col.cast(pa.large_string())
    if pa.types.is_floating(t):
        # python str(3.0) == '3.0'; Arrow would give '3' — go through numpy repr
        np_vals = col.to_numpy(zero_copy_only=False)
        out = np_vals.astype('U32')  # numpy unicode cast == python str() for float64
        res = pa.array(out).cast(pa.large_string())
        if col.null_count:
            res = pc.if_else(pc.is_null(col), pa.scalar(None, pa.large_string()), res)
        return res
    if pa.types.is_boolean(t):
        return pc.if_else(col, pa.scalar('True', pa.large_string()), pa.scalar('False', pa.large_string()))
    if pa.types.is_timestamp(t):
        # Arrow strftime %S includes fractional seconds for sub-second units;
        # trim trailing fractional zeros (SQL text form, also what DuckDB
        # prints) so oracle comparisons are byte-stable
        full = pc.strftime(col, format='%Y-%m-%d %H:%M:%S')
        trimmed = pc.replace_substring_regex(full, r'(\.\d*?)0+$', r'\1')
        trimmed = pc.replace_substring_regex(trimmed, r'\.$', '')
        return trimmed.cast(pa.large_string())
    if pa.types.is_date(t):
        return pc.strftime(col.cast(pa.timestamp('us')), format='%Y-%m-%d').cast(pa.large_string())
    if pa.types.is_integer(t) or pa.types.is_decimal(t):
        return pc.cast(col, pa.large_string())
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        # R2RML natural mapping of binary: uppercase hex (W3C R2RMLTC0016e)
        return pa.array([None if v is None else v.hex().upper() for v in col.to_pylist()],
                        type=pa.large_string())
    # fallback: per-value python str
    return pa.array([None if v is None else str(v) for v in col.to_pylist()], type=pa.large_string())


def source_prologue(table: pa.Table, references: list[str], na_values: list[str],
                    local_distinct: bool = True, keep_order: bool = False,
                    null_ok_refs: 'list[str] | None' = None) -> pa.Table:
    """Project to referenced columns, stringify, apply na_values filtering,
    drop rows with nulls in any reference, and locally dedup the block.
    (The reference's _preprocess_data contract, materializer.py:37-55.)

    ``keep_order=True`` preserves (or creates) ``__order``/``__record``
    columns carrying source row/record order — RML-CC collection construction
    is order-sensitive; dedup keeps the first occurrence per record.
    ``null_ok_refs`` lists references whose nulls do NOT drop the row
    (empty-collection support for rml:allowEmptyListAndContainer)."""
    if not references:
        return table
    cols = []
    na_set = [v for v in na_values if v is not None]
    null_ok = set(null_ok_refs or ())
    for ref in references:
        col = stringify_column(table[ref])
        if na_set:
            col = pc.if_else(pc.is_in(col, value_set=pa.array(na_set, pa.large_string())),
                             pa.scalar(None, pa.large_string()), col)
        cols.append(col)
    data = {r: c for r, c in zip(references, cols)}
    passthrough = []
    if keep_order:
        for aux in ('__order', '__record'):
            if aux in table.column_names:
                a = table[aux]
                if isinstance(a, pa.ChunkedArray):
                    a = a.combine_chunks()
                data[aux] = a.cast(pa.int64())
                passthrough.append(aux)
        if '__order' not in data:
            data['__order'] = pa.array(np.arange(table.num_rows, dtype=np.int64))
            passthrough.insert(0, '__order')
    out = pa.table(data)
    # null filter (rows with nulls only in null_ok refs survive)
    strict = [r for r in references if r not in null_ok]
    if strict:
        mask = None
        for r in strict:
            valid = pc.is_valid(out[r])
            mask = valid if mask is None else pc.and_(mask, valid)
        out = out.filter(mask)
    if local_distinct and out.num_rows:
        if keep_order:
            keys = list(references) + (['__record'] if '__record' in passthrough else [])
            safe = [f'c{i}' for i in range(len(keys))]
            t = out.select(keys + ['__order']).rename_columns(safe + ['__order'])
            t = t.group_by(safe, use_threads=False).aggregate([('__order', 'min')])
            out = t.rename_columns(keys + ['__order'])
        else:
            out = table_distinct(out)
    return out


def table_distinct(table: pa.Table) -> pa.Table:
    """Block-local distinct rows.  Columns are temporarily renamed because
    Arrow group_by parses '.' in names as nested field references."""
    names = table.column_names
    safe = [f'c{i}' for i in range(len(names))]
    t = table.rename_columns(safe)
    t = t.group_by(safe, use_threads=False).aggregate([])
    return t.select(safe).rename_columns(names)
