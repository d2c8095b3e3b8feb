"""SAS source tests: the reference reads SAS with plain ``pd.read_sas``
(data_file.py:113-114) — no pyreadstat — so the engine's SAS7BDAT/XPT path
executes in this container.  The fixture is a V5 SAS transport (XPT) file
hand-built from the public TS-140 spec (80-byte records, big-endian NAMESTR
entries, IBM base-16 doubles)."""

import struct

import pytest


def _ibm_double(v: float) -> bytes:
    if v == 0:
        return b'\x00' * 8
    sign = 0x80 if v < 0 else 0
    v = abs(v)
    e = 0
    while v >= 1:
        v /= 16.0
        e += 1
    while v < 1 / 16:
        v *= 16.0
        e -= 1
    mant = int(v * (1 << 56))
    return bytes([sign | (64 + e)]) + mant.to_bytes(7, 'big')


def _rec(s: bytes) -> bytes:
    return s + b' ' * (80 - len(s))


def _namestr(ntype: int, length: int, num: int, name: str, pos: int) -> bytes:
    return struct.pack('>hhhh8s40s8shhh2s8shhl52x',
                       ntype, 0, length, num, name.ljust(8).encode(),
                       b' ' * 40, b' ' * 8, 0, 0, 0, b'  ', b' ' * 8, 0, 0, pos)


def build_xpt(rows) -> bytes:
    out = b''
    out += _rec(b'HEADER RECORD*******LIBRARY HEADER RECORD!!!!!!!'
                b'000000000000000000000000000000')
    out += _rec(b'SAS     SAS     SASLIB  9.4     bsd4.2'
                + b' ' * 26 + b'01JAN26:00:00:00')
    out += _rec(b'01JAN26:00:00:00')
    out += _rec(b'HEADER RECORD*******MEMBER  HEADER RECORD!!!!!!!'
                b'000000000000000001600000000140')
    out += _rec(b'HEADER RECORD*******DSCRPTR HEADER RECORD!!!!!!!'
                b'000000000000000000000000000000')
    out += _rec(b'SAS     TEST    SASDATA 9.4     bsd4.2'
                + b' ' * 26 + b'01JAN26:00:00:00')
    out += _rec(b'01JAN26:00:00:00' + b' ' * 16 + b'label'.ljust(40) + b'DATA    ')
    out += _rec(b'HEADER RECORD*******NAMESTR HEADER RECORD!!!!!!!'
                b'000000000200000000000000000000')
    block = _namestr(1, 8, 1, 'ID', 0) + _namestr(2, 8, 2, 'Name', 8)
    block += b' ' * ((-len(block)) % 80)
    out += block
    out += _rec(b'HEADER RECORD*******OBS     HEADER RECORD!!!!!!!'
                b'000000000000000000000000000000')
    data = b''
    for i, name in rows:
        data += _ibm_double(float(i)) + name.ljust(8).encode()
    data += b' ' * ((-len(data)) % 80)
    out += data
    return out


def test_pandas_reads_the_fixture():
    import io
    import pandas as pd
    df = pd.read_sas(io.BytesIO(build_xpt([(10, 'Venus'), (20, 'Demi')])),
                     format='xport', encoding='utf-8')
    assert list(df['ID']) == [10.0, 20.0]
    assert list(df['Name']) == ['Venus', 'Demi']


def test_xpt_through_read_source(ray_session, tmp_path):
    from morph_kgc_ray.config import Config
    from morph_kgc_ray.sources.readers import read_source
    p = tmp_path / 'students.xpt'
    p.write_bytes(build_xpt([(10, 'Venus'), (20, 'Demi')]))
    rule = {'source_type': 'XPT', 'logical_source_value': str(p),
            'logical_source_type': None}
    cfg = Config({'DS': {'mappings': '/dev/null'}})
    df = read_source(rule, ['ID', 'Name'], cfg).to_pandas() \
        .sort_values('ID').reset_index(drop=True)
    # prologue stringifies with pandas float rendering (10.0 -> '10.0',
    # exactly what the reference's astype(str) on read_sas output yields)
    assert list(df['ID']) == ['10.0', '20.0']
    assert list(df['Name']) == ['Venus', 'Demi']


# SPSS is no longer gated: sources/sav.py parses the .sav/.zsav system-file
# format natively (spec-built fixtures + dispatch test in tests/test_sav.py).
