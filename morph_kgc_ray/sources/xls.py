"""Native legacy ``.xls`` (BIFF8) reader — pure stdlib, no xlrd.

Mirrors the reference's Excel semantics (data_file.py:121-137:
``pd.read_excel(sheet_name=0, dtype=str, keep_default_na=False)`` — which
needs xlrd for .xls): FIRST sheet only, first row is the header, every value
a string with pandas ``dtype=str`` number formatting.

Two layers, both from the public specs:

1. **CFB container** ([MS-CFB]): 512-byte header, FAT built from the DIFAT
   (header's 109 entries + chained DIFAT sectors), directory stream walk,
   stream reads through the FAT chain — or through the miniFAT inside the
   root's mini stream for streams under the 4096-byte cutoff.
2. **BIFF8 records** ([MS-XLS]): BOUNDSHEET locates the first sheet
   substream; SST (with CONTINUE splits that re-emit the compression flag
   byte mid-string) feeds LABELSST; NUMBER / RK / MULRK / LABEL / BOOLERR /
   FORMULA(+STRING cached results) populate cells.

Formulas yield their CACHED value, like a read-only consumer should.
"""

from __future__ import annotations

import struct

from .spreadsheet import _num_to_str

_CFB_MAGIC = b'\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1'
_FREESECT = 0xFFFFFFFF
_ENDOFCHAIN = 0xFFFFFFFE


class _Cfb:
    """Minimal read-only Compound File Binary parser."""

    def __init__(self, data: bytes):
        if data[:8] != _CFB_MAGIC:
            raise ValueError('not a CFB (OLE2) file — is this really .xls?')
        self.data = data
        (self.sector_shift, self.mini_shift) = struct.unpack_from('<HH', data, 30)
        self.sec_size = 1 << self.sector_shift
        self.mini_size = 1 << self.mini_shift
        self.num_fat = struct.unpack_from('<I', data, 44)[0]
        self.dir_start = struct.unpack_from('<I', data, 48)[0]
        self.mini_cutoff = struct.unpack_from('<I', data, 56)[0]
        self.minifat_start = struct.unpack_from('<I', data, 60)[0]
        self.num_minifat = struct.unpack_from('<I', data, 64)[0]
        self.difat_start = struct.unpack_from('<I', data, 68)[0]
        self.num_difat = struct.unpack_from('<I', data, 72)[0]
        self.fat = self._load_fat()
        self.dir_entries = self._load_dir()
        root = self.dir_entries[0]
        self.mini_stream = self._read_chain(root['start'], root['size'])
        self.minifat = self._load_minifat()

    def _sector(self, sid: int) -> bytes:
        off = 512 + sid * self.sec_size
        return self.data[off:off + self.sec_size]

    def _load_fat(self) -> list:
        fat_sids = list(struct.unpack_from('<109I', self.data, 76))
        sid = self.difat_start
        for _ in range(self.num_difat):
            if sid in (_FREESECT, _ENDOFCHAIN):
                break
            sec = self._sector(sid)
            ids = struct.unpack(f'<{self.sec_size // 4}I', sec)
            fat_sids.extend(ids[:-1])
            sid = ids[-1]
        fat: list = []
        per = self.sec_size // 4
        for fsid in fat_sids:
            if fsid in (_FREESECT, _ENDOFCHAIN):
                continue
            fat.extend(struct.unpack(f'<{per}I', self._sector(fsid)))
        return fat

    def _read_chain(self, start: int, size: int) -> bytes:
        out = bytearray()
        sid = start
        guard = 0
        while sid not in (_ENDOFCHAIN, _FREESECT) and len(out) < size + self.sec_size:
            out += self._sector(sid)
            sid = self.fat[sid] if sid < len(self.fat) else _ENDOFCHAIN
            guard += 1
            if guard > len(self.data) // 64 + 16:
                raise ValueError('CFB: cyclic FAT chain')
        return bytes(out[:size])

    def _load_minifat(self) -> list:
        if self.minifat_start in (_ENDOFCHAIN, _FREESECT) or not self.num_minifat:
            return []
        raw = self._read_chain(self.minifat_start, self.num_minifat * self.sec_size)
        return list(struct.unpack(f'<{len(raw) // 4}I', raw))

    def _load_dir(self) -> list:
        # directory stream size is not stored; read the full chain
        raw = bytearray()
        sid = self.dir_start
        guard = 0
        while sid not in (_ENDOFCHAIN, _FREESECT):
            raw += self._sector(sid)
            sid = self.fat[sid] if sid < len(self.fat) else _ENDOFCHAIN
            guard += 1
            if guard > len(self.data) // 64 + 16:
                raise ValueError('CFB: cyclic directory chain')
        entries = []
        for off in range(0, len(raw) - 127, 128):
            name_len = struct.unpack_from('<H', raw, off + 64)[0]
            name = raw[off:off + max(0, name_len - 2)].decode('utf-16-le', errors='replace')
            etype = raw[off + 66]
            start, size = struct.unpack_from('<II', raw, off + 116)
            entries.append({'name': name, 'type': etype, 'start': start, 'size': size})
        return entries

    def _read_mini_chain(self, start: int, size: int) -> bytes:
        out = bytearray()
        sid = start
        guard = 0
        while sid not in (_ENDOFCHAIN, _FREESECT) and len(out) < size + self.mini_size:
            off = sid * self.mini_size
            out += self.mini_stream[off:off + self.mini_size]
            sid = self.minifat[sid] if sid < len(self.minifat) else _ENDOFCHAIN
            guard += 1
            if guard > len(self.data) // 16 + 16:
                raise ValueError('CFB: cyclic miniFAT chain')
        return bytes(out[:size])

    def stream(self, *names: str) -> bytes:
        for e in self.dir_entries:
            if e['type'] == 2 and e['name'] in names:
                if e['size'] < self.mini_cutoff:
                    return self._read_mini_chain(e['start'], e['size'])
                return self._read_chain(e['start'], e['size'])
        raise ValueError(f'CFB: no stream named {names!r}')


def _rk_value(rk: int) -> float:
    """Decode an RK-encoded number: bit0 = div-100, bit1 = int-vs-float."""
    div100 = rk & 1
    if rk & 2:
        v = float(struct.unpack('<i', struct.pack('<I', rk & 0xFFFFFFFC))[0] >> 2)
    else:
        v = struct.unpack('<d', struct.pack('<Q', (rk & 0xFFFFFFFC) << 32))[0]
    return v / 100.0 if div100 else v


class _RecordStream:
    """Iterate BIFF records; exposes a byte reader that transparently
    crosses CONTINUE (0x003C) record boundaries — needed by the SST, whose
    strings split across records and RE-EMIT the flags byte at each split."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos

    def __iter__(self):
        while self.pos + 4 <= len(self.data):
            rid, ln = struct.unpack_from('<HH', self.data, self.pos)
            payload_at = self.pos + 4
            self.pos = payload_at + ln
            yield rid, self.data[payload_at:payload_at + ln], payload_at


class _SstReader:
    """Byte cursor over the SST payload + its CONTINUE payloads."""

    def __init__(self, parts: list):
        self.parts = parts
        self.ip = 0  # part index
        self.off = 0

    def _remaining(self) -> int:
        return len(self.parts[self.ip]) - self.off

    def _advance_part(self):
        self.ip += 1
        self.off = 0

    def read(self, n: int) -> bytes:
        out = bytearray()
        while n > 0:
            if self._remaining() == 0:
                self._advance_part()
                continue
            take = min(n, self._remaining())
            p = self.parts[self.ip]
            out += p[self.off:self.off + take]
            self.off += take
            n -= take
        return bytes(out)

    def read_string(self) -> str:
        cch = struct.unpack('<H', self.read(2))[0]
        flags = self.read(1)[0]
        c_run = struct.unpack('<H', self.read(2))[0] if flags & 0x08 else 0
        cb_ext = struct.unpack('<i', self.read(4))[0] if flags & 0x04 else 0
        chars: list = []
        wide = bool(flags & 0x01)
        remaining = cch
        while remaining:
            if self._remaining() == 0:
                # a string split re-emits ONE flags byte with the (possibly
                # different) compression bit for the continued characters
                self._advance_part()
                wide = bool(self.read(1)[0] & 0x01)
            avail = self._remaining() // (2 if wide else 1)
            take = min(remaining, avail)
            raw = self.read(take * (2 if wide else 1))
            chars.append(raw.decode('utf-16-le' if wide else 'latin-1'))
            remaining -= take
        if c_run:
            self.read(4 * c_run)
        if cb_ext:
            self.read(cb_ext)
        return ''.join(chars)


def _short_string(data: bytes, off: int) -> str:
    """XLUnicodeString (16-bit length) at off — used by LABEL/STRING.

    Honors the optional-field flags like _SstReader.read_string: rich-text
    (0x08) prepends a 2-byte run count and ExtRst (0x04) a 4-byte extension
    length BEFORE the character data; skipping them keeps a formatted LABEL
    from consuming its run count as characters."""
    cch, flags = struct.unpack_from('<HB', data, off)
    pos = off + 3
    if flags & 0x08:  # cRun (rich-text formatting runs follow the chars)
        pos += 2
    if flags & 0x04:  # cbExtRst (phonetic extension follows the chars)
        pos += 4
    if flags & 0x01:
        return data[pos:pos + 2 * cch].decode('utf-16-le')
    return data[pos:pos + cch].decode('latin-1')


def read_xls_rows(data: bytes) -> list[list[str]]:
    """Rows (lists of cell strings) of the FIRST sheet of a .xls blob."""
    cfb = _Cfb(data)
    wb = cfb.stream('Workbook', 'Book')

    # --- globals substream: SST + first BOUNDSHEET ---
    sst: list[str] = []
    first_sheet_off: 'int | None' = None
    sst_parts: list = []
    in_sst = False
    for rid, payload, _ in _RecordStream(wb):
        if rid == 0x0085 and first_sheet_off is None:  # BOUNDSHEET
            first_sheet_off = struct.unpack_from('<I', payload, 0)[0]
        elif rid == 0x00FC:  # SST
            sst_parts = [payload[8:]]
            in_sst = True
            n_unique = struct.unpack_from('<i', payload, 4)[0]
        elif rid == 0x003C and in_sst:  # CONTINUE
            sst_parts.append(payload)
        elif in_sst and rid not in (0x00FC, 0x003C):
            in_sst = False
        if rid == 0x000A:  # EOF of globals
            break
    if sst_parts:
        rdr = _SstReader(sst_parts)
        for _ in range(max(0, n_unique)):
            sst.append(rdr.read_string())

    if first_sheet_off is None:
        return []

    # --- first worksheet substream ---
    cells: dict = {}

    def put(row: int, col: int, val: str):
        cells[(row, col)] = val

    pending_string_cell: 'tuple[int, int] | None' = None
    for rid, payload, _ in _RecordStream(wb, pos=first_sheet_off):
        if rid == 0x000A:  # EOF of this sheet
            break
        if rid == 0x00FD:  # LABELSST
            r, c, _x, isst = struct.unpack_from('<HHHI', payload, 0)
            put(r, c, sst[isst] if isst < len(sst) else '')
        elif rid == 0x0203:  # NUMBER
            r, c, _x = struct.unpack_from('<HHH', payload, 0)
            put(r, c, _num_to_str(repr(struct.unpack_from('<d', payload, 6)[0])))
        elif rid == 0x027E:  # RK
            r, c, _x, rk = struct.unpack_from('<HHHI', payload, 0)
            put(r, c, _num_to_str(repr(_rk_value(rk))))
        elif rid == 0x00BD:  # MULRK
            r, c0 = struct.unpack_from('<HH', payload, 0)
            n = (len(payload) - 6) // 6
            for i in range(n):
                _x, rk = struct.unpack_from('<HI', payload, 4 + 6 * i)
                put(r, c0 + i, _num_to_str(repr(_rk_value(rk))))
        elif rid == 0x0204:  # LABEL (inline string)
            r, c, _x = struct.unpack_from('<HHH', payload, 0)
            put(r, c, _short_string(payload, 6))
        elif rid == 0x0205:  # BOOLERR
            r, c, _x, v, is_err = struct.unpack_from('<HHHBB', payload, 0)
            if not is_err:
                put(r, c, 'True' if v else 'False')
        elif rid == 0x0006:  # FORMULA (cached result)
            r, c, _x = struct.unpack_from('<HHH', payload, 0)
            hi = struct.unpack_from('<H', payload, 12)[0]
            if hi == 0xFFFF:
                kind = payload[6]
                if kind == 0:  # string result follows in a STRING record
                    pending_string_cell = (r, c)
                elif kind == 1:  # boolean
                    put(r, c, 'True' if payload[8] else 'False')
                # kind 2 (error) / 3 (blank): emit nothing
            else:
                put(r, c, _num_to_str(repr(struct.unpack_from('<d', payload, 6)[0])))
        elif rid == 0x0207 and pending_string_cell is not None:  # STRING
            r, c = pending_string_cell
            put(r, c, _short_string(payload, 0))
            pending_string_cell = None

    if not cells:
        return []
    # bucket cells by row in ONE pass (a per-row rescan of the whole cells
    # dict is O(rows x total_cells) — minutes on a full 65536-row sheet)
    rows_map: dict[int, dict[int, str]] = {}
    for (r, c), v in cells.items():
        rows_map.setdefault(r, {})[c] = v
    max_row = max(rows_map)
    rows: list[list[str]] = []
    for r in range(max_row + 1):
        row_cells = rows_map.get(r, {})
        width = max(row_cells) + 1 if row_cells else 0
        rows.append([row_cells.get(i, '') for i in range(width)])
    while rows and not rows[0]:
        rows.pop(0)  # leading all-empty rows (header starts at first content)
    return rows
