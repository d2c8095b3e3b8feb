"""Native SPSS ``.sav`` / ``.zsav`` reader — pure stdlib + numpy, no
pyreadstat.

Mirrors the reference's SPSS semantics (data_file.py:117-118:
``pd.read_spss(path, usecols=references, convert_categoricals=False)``):
numeric columns come back float64 with system-missing as NaN, string
columns as right-trimmed ``str``, long variable names applied, ``usecols``
projecting the dictionary BEFORE data decode.

Everything here is parsed from the public PSPP "System File Format"
documentation (the de-facto spec for ``.sav``):

* 176-byte file header — magic ``$FL2`` (plain / bytecode) or ``$FL3``
  (zlib, ``.zsav``); ``layout_code`` detects endianness; ``bias`` feeds the
  bytecode decoder.
* type-2 variable records — width 0 numeric, 1..255 string, -1 string
  continuation (one per extra 8-byte data element), optional label +
  missing-value blocks.
* type-3/4 value-label records, type-6 documents — skipped (the reference
  reads with ``convert_categoricals=False``).
* type-7 extension records — subtype 13 (long variable names), subtype 14
  (very long strings: >255-byte values split into 255-wide segments whose
  non-final segments carry 252 data bytes), subtype 20 (character
  encoding); all other subtypes skipped by size.
* type-999 dictionary terminator, then case data: every case is
  ``nominal_case_size`` 8-byte elements — raw, bytecode-compressed
  (command bytes 0 pad / 1-251 value+bias / 252 EOF / 253 literal follows
  / 254 eight spaces / 255 sysmiss), or zlib block-compressed bytecode
  (``$FL3``: 24-byte zheader, concatenated zlib streams, ztrailer).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pandas as pd

_SYSMIS = float.fromhex('-0x1.fffffffffffffp+1023')  # lowest finite double


class _SavDict:
    """Parsed dictionary: per-variable (name, width, first element index)."""

    def __init__(self):
        self.endian = '<'
        self.compression = 0
        self.bias = 100.0
        self.ncases = -1
        self.case_size = 0
        self.encoding = 'latin-1'
        self.variables: list[tuple[str, int, int]] = []  # (short_name, width, elem_idx)
        self.long_names: dict[str, str] = {}
        self.very_long: dict[str, int] = {}  # short_name -> true byte width


def _parse_header(buf: bytes, d: _SavDict) -> None:
    magic = buf[:4]
    if magic not in (b'$FL2', b'$FL3'):
        raise ValueError('not an SPSS system file (missing $FL2/$FL3 magic)')
    layout = struct.unpack_from('<i', buf, 64)[0]
    d.endian = '<' if layout in (2, 3) else '>'
    e = d.endian
    d.case_size = struct.unpack_from(e + 'i', buf, 68)[0]
    d.compression = struct.unpack_from(e + 'i', buf, 72)[0]
    d.ncases = struct.unpack_from(e + 'i', buf, 80)[0]
    d.bias = struct.unpack_from(e + 'd', buf, 84)[0]


def _parse_dictionary(buf: bytes) -> tuple[_SavDict, int]:
    """Walk the record stream up to the type-999 terminator; returns the
    dictionary and the offset where case data begins."""
    d = _SavDict()
    _parse_header(buf, d)
    e = d.endian
    pos = 176
    elem_idx = 0
    while pos < len(buf):
        rtype = struct.unpack_from(e + 'i', buf, pos)[0]
        pos += 4
        if rtype == 999:  # dictionary terminator (+ int32 filler)
            pos += 4
            break
        if rtype == 2:  # variable record
            width, has_label, n_missing = struct.unpack_from(e + 'iii', buf, pos)
            name = buf[pos + 20:pos + 28].decode('latin-1').rstrip()
            pos += 28
            if has_label:
                lab_len = struct.unpack_from(e + 'i', buf, pos)[0]
                pos += 4 + (lab_len + 3) // 4 * 4
            if n_missing:
                pos += 8 * abs(n_missing)
            if width >= 0:  # -1 records are string continuations (no element)
                d.variables.append((name, width, elem_idx))
                elem_idx += max(1, (width + 7) // 8)
        elif rtype == 3:  # value labels: count x (8-byte value + padded label)
            n = struct.unpack_from(e + 'i', buf, pos)[0]
            pos += 4
            for _ in range(n):
                lab_len = buf[pos + 8]
                pos += 8 + (1 + lab_len + 7) // 8 * 8
        elif rtype == 4:  # value-label variable indexes
            n = struct.unpack_from(e + 'i', buf, pos)[0]
            pos += 4 + 4 * n
        elif rtype == 6:  # documents: n_lines x 80 chars
            n = struct.unpack_from(e + 'i', buf, pos)[0]
            pos += 4 + 80 * n
        elif rtype == 7:  # extension record
            subtype, size, count = struct.unpack_from(e + 'iii', buf, pos)
            pos += 12
            payload = buf[pos:pos + size * count]
            pos += size * count
            if subtype == 13:  # long variable names: SHORT=Long\tSHORT=Long...
                for pair in payload.decode('latin-1', errors='replace').split('\t'):
                    if '=' in pair:
                        short, long_ = pair.split('=', 1)
                        d.long_names[short.rstrip()] = long_
            elif subtype == 14:  # very long strings: SHORT=LENGTH\0\t pairs
                for pair in payload.decode('latin-1', errors='replace') \
                                   .replace('\x00', '').split('\t'):
                    if '=' in pair:
                        short, ln = pair.split('=', 1)
                        try:
                            d.very_long[short.rstrip()] = int(ln)
                        except ValueError:
                            pass
            elif subtype == 20:  # character encoding
                try:
                    enc = payload.decode('ascii').strip()
                    'x'.encode(enc)  # validate
                    d.encoding = enc
                except (LookupError, UnicodeDecodeError):
                    pass
        else:
            raise ValueError(f'SAV: unknown record type {rtype} at offset {pos - 4}')
    return d, pos


def _decode_bytecode(buf: bytes, endian: str, bias: float,
                     max_elems: int | None = None) -> bytes:
    """Expand the bytecode stream into raw 8-byte elements (PSPP 'simple
    compression'): 8 command bytes, then that block's 253-literals, repeat."""
    sysmis = struct.pack(endian + 'd', _SYSMIS)
    spaces = b' ' * 8
    out: list[bytes] = []
    i, n = 0, len(buf)
    done = False
    while i + 8 <= n and not done:
        cmds = buf[i:i + 8]
        i += 8
        for c in cmds:
            if c == 0:  # padding
                continue
            if c == 252:  # end of data
                done = True
                break
            if c == 253:  # literal element follows the command block
                out.append(buf[i:i + 8])
                i += 8
            elif c == 254:  # 8 spaces (string element)
                out.append(spaces)
            elif c == 255:  # system-missing
                out.append(sysmis)
            else:  # 1..251: numeric (code - bias)
                out.append(struct.pack(endian + 'd', c - bias))
        if max_elems is not None and len(out) >= max_elems:
            break
    return b''.join(out)


def _inflate_zsav(buf: bytes, pos: int) -> bytes:
    """$FL3 data: 24-byte zheader (zheader_ofs, ztrailer_ofs, ztrailer_len),
    then concatenated zlib streams up to ztrailer_ofs."""
    zheader_ofs, ztrailer_ofs, _ztrailer_len = struct.unpack_from('<qqq', buf, pos)
    if zheader_ofs != pos:
        # big-endian file: the three int64s are byte-swapped
        zheader_ofs, ztrailer_ofs, _ztrailer_len = struct.unpack_from('>qqq', buf, pos)
    comp = buf[pos + 24:ztrailer_ofs]
    out = bytearray()
    at = 0
    while at < len(comp):
        dec = zlib.decompressobj()
        out += dec.decompress(comp[at:])
        consumed = len(comp) - at - len(dec.unused_data)
        if consumed <= 0:
            break
        at += consumed
    return bytes(out)


def read_sav(path_or_bytes, usecols: 'list[str] | None' = None) -> pd.DataFrame:
    """DataFrame with the reference's ``pd.read_spss(...,
    convert_categoricals=False)`` shape: float64 numerics (sysmiss -> NaN),
    rstripped strings, long names, ``usecols`` projection."""
    if isinstance(path_or_bytes, (bytes, bytearray)):
        buf = bytes(path_or_bytes)
    else:
        with open(path_or_bytes, 'rb') as f:
            buf = f.read()
    d, data_at = _parse_dictionary(buf)
    e = d.endian

    # --- raw 8-byte elements for every case ---
    if buf[:4] == b'$FL3' or d.compression == 2:
        raw = _decode_bytecode(_inflate_zsav(buf, data_at), e, d.bias)
    elif d.compression == 1:
        raw = _decode_bytecode(buf[data_at:], e, d.bias)
    else:
        raw = buf[data_at:]
    ncases = len(raw) // (8 * d.case_size) if d.case_size else 0
    raw = raw[:ncases * 8 * d.case_size]
    grid = np.frombuffer(raw, dtype=np.uint8).reshape(ncases, d.case_size, 8)

    # --- stitch very-long-string segments (>255 bytes split into 255-wide
    # segments; non-final segments carry 252 data bytes) ---
    # each output var: (short_name, width, [(elem_idx, stored_width, data_cap)...])
    out_vars: list[tuple[str, int, list[tuple[int, int, int]]]] = []
    i = 0
    while i < len(d.variables):
        name, width, elem = d.variables[i]
        true_len = d.very_long.get(name)
        if true_len and true_len > 255 and width == 255:
            nseg = (true_len + 251) // 252
            segs = []
            for s in range(nseg):
                _sn, sw, se = d.variables[i + s]
                cap = 252 if s < nseg - 1 else true_len - 252 * (nseg - 1)
                segs.append((se, sw, cap))
            out_vars.append((name, true_len, segs))
            i += nseg
        else:
            out_vars.append((name, width, [(elem, width, width)]))
            i += 1

    cols: dict[str, object] = {}
    for name, width, segs in out_vars:
        long = d.long_names.get(name, name)
        if width == 0:  # numeric
            vals = grid[:, segs[0][0], :].tobytes()
            arr = np.frombuffer(vals, dtype=(e + 'f8')).astype(np.float64, copy=True)
            arr[arr == _SYSMIS] = np.nan
            cols[long] = arr
        else:  # string: concatenate this variable's segment bytes, trim, decode
            parts = []
            for seidx, sw, cap in segs:
                nel = (sw + 7) // 8
                seg = grid[:, seidx:seidx + nel, :].reshape(ncases, nel * 8)
                parts.append(seg[:, :cap])
            chars = np.concatenate(parts, axis=1) if parts else np.empty((ncases, 0), np.uint8)
            blob = chars.tobytes()
            w = chars.shape[1]
            cols[long] = [blob[k * w:(k + 1) * w].decode(d.encoding, errors='replace').rstrip()
                          for k in range(ncases)]
    df = pd.DataFrame(cols)
    if usecols is not None:
        missing = [c for c in usecols if c not in df.columns]
        if missing:
            raise ValueError(f'SAV: columns not in file: {missing} '
                             f'(file has {list(df.columns)})')
        df = df[list(usecols)]
    return df
