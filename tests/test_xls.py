"""Native BIFF8 .xls reader tests against a hand-built CFB+BIFF8 fixture
(independent re-implementation of the writer side from the public MS-CFB /
MS-XLS specs — exercises the miniFAT stream path, SST CONTINUE splits, and
every cell record kind the reader supports)."""

import struct

import pytest

from morph_kgc_ray.sources.xls import read_xls_rows

ENDOFCHAIN = 0xFFFFFFFE
FREESECT = 0xFFFFFFFF
FATSECT = 0xFFFFFFFD


def _dir_entry(name: str, etype: int, start: int, size: int, child: int = -1) -> bytes:
    raw = name.encode('utf-16-le')
    e = bytearray(128)
    e[0:len(raw)] = raw
    struct.pack_into('<H', e, 64, len(raw) + 2)
    e[66] = etype
    e[67] = 1  # black
    struct.pack_into('<iii', e, 68, -1, -1, child)
    struct.pack_into('<I', e, 116, start)
    struct.pack_into('<I', e, 120, size)
    return bytes(e)


def build_cfb(stream_name: str, stream: bytes) -> bytes:
    """Minimal v3 CFB holding ONE stream, forced through the miniFAT
    (stream must be < 4096 bytes)."""
    assert len(stream) < 4096
    sec = 512
    mini = (stream + b'\0' * 63)[:len(stream) + (-len(stream)) % 64]
    n_mini_secs = len(mini) // 64
    n_data_secs = (len(mini) + sec - 1) // sec
    # sectors: 0=FAT, 1=directory, 2=miniFAT, 3..=ministream data
    fat = [FATSECT, ENDOFCHAIN, ENDOFCHAIN]
    for i in range(n_data_secs):
        fat.append(3 + i + 1 if i + 1 < n_data_secs else ENDOFCHAIN)
    fat += [FREESECT] * (sec // 4 - len(fat))
    minifat = [i + 1 if i + 1 < n_mini_secs else ENDOFCHAIN for i in range(n_mini_secs)]
    minifat += [FREESECT] * (sec // 4 - len(minifat))

    header = bytearray(512)
    header[0:8] = b'\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1'
    struct.pack_into('<H', header, 24, 0x3E)   # minor
    struct.pack_into('<H', header, 26, 3)      # major (v3)
    struct.pack_into('<H', header, 28, 0xFFFE)  # little-endian
    struct.pack_into('<H', header, 30, 9)      # 512-byte sectors
    struct.pack_into('<H', header, 32, 6)      # 64-byte minisectors
    struct.pack_into('<I', header, 44, 1)      # one FAT sector
    struct.pack_into('<I', header, 48, 1)      # directory at sector 1
    struct.pack_into('<I', header, 56, 4096)   # mini cutoff
    struct.pack_into('<I', header, 60, 2)      # miniFAT at sector 2
    struct.pack_into('<I', header, 64, 1)      # one miniFAT sector
    struct.pack_into('<I', header, 68, ENDOFCHAIN)  # no DIFAT chain
    struct.pack_into('<I', header, 72, 0)
    struct.pack_into('<I', header, 76, 0)      # DIFAT[0] -> FAT sector 0
    for i in range(1, 109):
        struct.pack_into('<I', header, 76 + 4 * i, FREESECT)

    directory = (_dir_entry('Root Entry', 5, 3, len(mini), child=1)
                 + _dir_entry(stream_name, 2, 0, len(stream))
                 + bytes(128) + bytes(128))
    body = (bytes(header)
            + b''.join(struct.pack('<I', x) for x in fat)
            + directory
            + b''.join(struct.pack('<I', x) for x in minifat)
            + mini + b'\0' * ((-len(mini)) % sec))
    return body


def _rec(rid: int, payload: bytes) -> bytes:
    return struct.pack('<HH', rid, len(payload)) + payload


def _compressed(s: str) -> bytes:
    return struct.pack('<HB', len(s), 0) + s.encode('latin-1')


def build_workbook(split_sst: bool = False) -> bytes:
    """BIFF8 Workbook stream: globals (BOF, BOUNDSHEET, SST, EOF) + one
    sheet covering every supported cell record."""
    long2 = 'Second_' + 'y' * 40
    if split_sst:
        # split long2's characters across SST -> CONTINUE (flags byte re-emitted)
        head = struct.pack('<ii', 3, 3) + _compressed('Name') + _compressed('Alpha')
        head += struct.pack('<HB', len(long2), 0) + long2[:10].encode('latin-1')
        sst = _rec(0x00FC, head) + _rec(0x003C, b'\x00' + long2[10:].encode('latin-1'))
    else:
        payload = struct.pack('<ii', 3, 3) + _compressed('Name') \
            + _compressed('Alpha') + _compressed(long2)
        sst = _rec(0x00FC, payload)

    bof_g = _rec(0x0809, struct.pack('<HHHHII', 0x0600, 0x0005, 0x0DBB, 0x07CC, 1, 0x0600))
    bof_s = _rec(0x0809, struct.pack('<HHHHII', 0x0600, 0x0010, 0x0DBB, 0x07CC, 1, 0x0600))
    eof = _rec(0x000A, b'')

    def cell_hdr(r, c):
        return struct.pack('<HHH', r, c, 0)

    rk_int = (7 << 2) | 2                     # RK int 7
    rk_cents = ((12345 << 2) | 2) | 1         # RK int 12345 / 100 = 123.45
    rk_float = struct.unpack('<I', struct.pack('<d', 2.5)[4:])[0] & 0xFFFFFFFC
    sheet = b''.join([
        bof_s,
        # header row: A1 = SST[0] 'Name', B1 inline LABEL 'Num'
        _rec(0x00FD, cell_hdr(0, 0) + struct.pack('<I', 0)),
        _rec(0x0204, cell_hdr(0, 1) + _compressed('Num')),
        _rec(0x0204, cell_hdr(0, 2) + _compressed('Flag')),
        # row 2: SST string, NUMBER 30.0 (-> '30'), BOOLERR TRUE
        _rec(0x00FD, cell_hdr(1, 0) + struct.pack('<I', 1)),
        _rec(0x0203, cell_hdr(1, 1) + struct.pack('<d', 30.0)),
        _rec(0x0205, cell_hdr(1, 2) + bytes([1, 0])),
        # row 3: long SST string, RK int, FORMULA cached number 6.5
        _rec(0x00FD, cell_hdr(2, 0) + struct.pack('<I', 2)),
        _rec(0x027E, cell_hdr(2, 1) + struct.pack('<I', rk_int)),
        _rec(0x0006, cell_hdr(2, 2) + struct.pack('<d', 6.5) + b'\0\0\0\0\0\0\0\0'),
        # row 4: MULRK over B..C (123.45, 2.5), then FORMULA string result
        _rec(0x00BD, struct.pack('<HH', 3, 1)
             + struct.pack('<HI', 0, rk_cents) + struct.pack('<HI', 0, rk_float)
             + struct.pack('<H', 2)),
        _rec(0x0006, cell_hdr(3, 0)
             + bytes([0, 0, 0, 0, 0, 0]) + struct.pack('<H', 0xFFFF) + b'\0' * 8),
        _rec(0x0207, _compressed('cached!')),
        eof,
    ])

    bs_placeholder = _rec(0x0085, struct.pack('<IBB', 0, 0, 0) + _compressed('S1')[2:] )
    globals_part = bof_g + bs_placeholder + sst + eof
    # patch the BOUNDSHEET stream offset now that the globals length is known
    bs = _rec(0x0085, struct.pack('<IBB', len(globals_part), 0, 0) + _compressed('S1')[2:])
    globals_part = bof_g + bs + sst + eof
    return globals_part + sheet


EXPECTED = [
    ['Name', 'Num', 'Flag'],
    ['Alpha', '30', 'True'],
    ['Second_' + 'y' * 40, '7', '6.5'],
    ['cached!', '123.45', '2.5'],
]


@pytest.mark.parametrize('split_sst', [False, True])
def test_xls_roundtrip_all_record_kinds(split_sst):
    blob = build_cfb('Workbook', build_workbook(split_sst=split_sst))
    assert read_xls_rows(blob) == EXPECTED


def test_xls_rejects_non_cfb():
    with pytest.raises(ValueError, match='CFB'):
        read_xls_rows(b'PK\x03\x04 this is a zip, not an xls')


def test_xls_through_read_source(ray_session, tmp_path):
    import pandas as pd
    from morph_kgc_ray.config import Config
    from morph_kgc_ray.sources.readers import read_source
    p = tmp_path / 'book.xls'
    p.write_bytes(build_cfb('Workbook', build_workbook(split_sst=True)))
    rule = {'source_type': 'XLS', 'logical_source_value': str(p),
            'logical_source_type': None}
    cfg = Config({'DS': {'mappings': '/dev/null'}})
    df = read_source(rule, ['Name', 'Num'], cfg).to_pandas()
    df = df.sort_values('Num').reset_index(drop=True)
    assert sorted(df['Num']) == ['123.45', '30', '7']
    assert set(df['Name']) == {'Alpha', 'Second_' + 'y' * 40, 'cached!'}


def test_xls_property_random_grids():
    """Round-trip random grids through the spec-built writer: string cells
    via SST, numeric via NUMBER records, across several shapes and SST
    sizes (forcing multi-minisector streams)."""
    import random
    random.seed(42)
    from morph_kgc_ray.sources.spreadsheet import _num_to_str

    for trial in range(12):
        n_rows = random.randint(1, 12)
        n_cols = random.randint(1, 6)
        grid = []
        for r in range(n_rows):
            row = []
            for c in range(n_cols):
                if random.random() < 0.5:
                    row.append('s%d_%d_%s' % (r, c, 'x' * random.randint(0, 30)))
                else:
                    row.append(random.choice([0.5, 30.0, -17.25, 1e6, 3.25]))
            grid.append(row)

        # writer: every string through SST/LABELSST, every number via NUMBER
        strings = sorted({v for row in grid for v in row if isinstance(v, str)})
        sidx = {s: i for i, s in enumerate(strings)}
        sst_payload = struct.pack('<ii', len(strings), len(strings)) \
            + b''.join(_compressed(s) for s in strings)
        bof_g = _rec(0x0809, struct.pack('<HHHHII', 0x0600, 0x0005, 0, 0, 1, 0x0600))
        bof_s = _rec(0x0809, struct.pack('<HHHHII', 0x0600, 0x0010, 0, 0, 1, 0x0600))
        eof = _rec(0x000A, b'')
        cells = b''
        for r, row in enumerate(grid):
            for c, v in enumerate(row):
                hdr = struct.pack('<HHH', r, c, 0)
                if isinstance(v, str):
                    cells += _rec(0x00FD, hdr + struct.pack('<I', sidx[v]))
                else:
                    cells += _rec(0x0203, hdr + struct.pack('<d', v))
        sheet = bof_s + cells + eof
        glb = bof_g + _rec(0x0085, struct.pack('<IBB', 0, 0, 0)) \
            + _rec(0x00FC, sst_payload) + eof
        glb = bof_g + _rec(0x0085, struct.pack('<IBB', len(glb), 0, 0)) \
            + _rec(0x00FC, sst_payload) + eof
        blob = build_cfb('Workbook', glb + sheet)

        got = read_xls_rows(blob)
        want = [[v if isinstance(v, str) else _num_to_str(repr(v)) for v in row]
                for row in grid]
        assert got == want, f'trial {trial}'
