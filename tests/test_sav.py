"""SPSS .sav/.zsav source tests.  The reference reads SPSS with
``pd.read_spss(usecols=references, convert_categoricals=False)``
(data_file.py:117-118, pyreadstat backend); this container has no
pyreadstat, so sources/sav.py parses the system-file format natively.
Fixtures are hand-built from the public PSPP system-file spec: 176-byte
header, type-2 variable records (+continuations), type-7 subtype-13 long
names / subtype-14 very long strings, type-999 terminator, and all three
data encodings (raw, bytecode, zlib)."""

import struct
import zlib

import numpy as np
import pytest

SYSMIS = float.fromhex('-0x1.fffffffffffffp+1023')


def _header(case_size: int, ncases: int, compression: int, magic: bytes = b'$FL2') -> bytes:
    out = magic
    out += b'@(#) PSPP-spec test writer'.ljust(60)
    out += struct.pack('<iiiii', 2, case_size, compression, 0, ncases)
    out += struct.pack('<d', 100.0)
    out += b'01 Jan 26' + b'00:00:00' + b' ' * 64 + b'\x00\x00\x00'
    assert len(out) == 176
    return out


def _var(width: int, name: str = '', label: str | None = None) -> bytes:
    out = struct.pack('<iiiiii8s', 2, width, 1 if label else 0, 0, 0, 0,
                      name.ljust(8).encode())
    if label:
        lab = label.encode()
        out += struct.pack('<i', len(lab)) + lab.ljust((len(lab) + 3) // 4 * 4, b' ')
    return out


def _ext(subtype: int, payload: bytes) -> bytes:
    return struct.pack('<iiii', 7, subtype, 1, len(payload)) + payload


_END = struct.pack('<ii', 999, 0)


def build_plain_sav() -> bytes:
    """Two vars — numeric SCORE, 11-char string CITY — three cases, raw data."""
    out = _header(case_size=3, ncases=3, compression=0)
    out += _var(0, 'SCORE')
    out += _var(11, 'CITY')
    out += _var(-1)  # string continuation element
    out += _ext(20, b'UTF-8')
    out += _END
    for score, city in [(1.5, 'Lisbon'), (SYSMIS, 'Porto'), (42.0, 'Vila Real')]:
        out += struct.pack('<d', score) + city.ljust(16).encode()
    return out


def test_plain_sav_numeric_string_sysmiss():
    from morph_kgc_ray.sources.sav import read_sav
    df = read_sav(build_plain_sav())
    assert list(df.columns) == ['SCORE', 'CITY']
    assert df['SCORE'][0] == 1.5 and df['SCORE'][2] == 42.0
    assert np.isnan(df['SCORE'][1])
    assert list(df['CITY']) == ['Lisbon', 'Porto', 'Vila Real']


def test_usecols_projects_and_errors():
    from morph_kgc_ray.sources.sav import read_sav
    df = read_sav(build_plain_sav(), usecols=['CITY'])
    assert list(df.columns) == ['CITY']
    with pytest.raises(ValueError, match='not in file'):
        read_sav(build_plain_sav(), usecols=['NOPE'])


def build_bytecode_sav() -> bytes:
    """compression=1: codes 1-251 = value+bias, 253 literal, 254 spaces,
    255 sysmiss, 0 pad, 252 EOF.  Long names via subtype 13."""
    out = _header(case_size=2, ncases=3, compression=1)
    out += _var(0, 'N1', label='a numeric')
    out += _var(8, 'S1')
    out += _ext(13, b'N1=score\tS1=tag')
    out += _END
    # case 1: N1=5 (code 105), S1='hi' (literal); case 2: N1 sysmiss (255),
    # S1 all spaces (254); case 3: N1=1234.5 literal (253), S1='world..' lit
    cmds = bytes([105, 253, 255, 254, 253, 253, 0, 0])
    lits = b'hi      ' + struct.pack('<d', 1234.5) + b'world.. '
    out += cmds + lits + bytes([252, 0, 0, 0, 0, 0, 0, 0])
    return out


def test_bytecode_compression_and_long_names():
    from morph_kgc_ray.sources.sav import read_sav
    df = read_sav(build_bytecode_sav())
    assert list(df.columns) == ['score', 'tag']
    assert df['score'][0] == 5.0 and np.isnan(df['score'][1]) and df['score'][2] == 1234.5
    assert list(df['tag']) == ['hi', '', 'world..']


def build_zsav() -> bytes:
    """$FL3: 24-byte zheader + one zlib stream of bytecode data + ztrailer."""
    out = _header(case_size=1, ncases=2, compression=2, magic=b'$FL3')
    out += _var(0, 'X')
    out += _END
    data_at = len(out)
    payload = bytes([110, 120, 252, 0, 0, 0, 0, 0])  # X=10, X=20, EOF
    comp = zlib.compress(payload)
    ztrailer_ofs = data_at + 24 + len(comp)
    out += struct.pack('<qqq', data_at, ztrailer_ofs, 48)
    out += comp
    # minimal ztrailer: int64 bias, int64 zero, int32 block size, int32 count
    # + one block descriptor
    out += struct.pack('<qqii', -100, 0, 0x3FF000, 1)
    out += struct.pack('<qqii', 0, data_at + 24, len(payload), len(comp))
    return out


def test_zsav_zlib_blocks():
    from morph_kgc_ray.sources.sav import read_sav
    df = read_sav(build_zsav())
    assert list(df['X']) == [10.0, 20.0]


def build_vlong_sav(s: str) -> bytes:
    """One very long string (width 300): stored as a 255-wide segment (32
    elements, 252 data bytes) + a 48-wide segment (6 elements)."""
    assert len(s) == 300
    out = _header(case_size=38, ncases=1, compression=0)
    out += _var(255, 'LONGSTR') + _var(-1) * 31
    out += _var(48, 'LONGST0') + _var(-1) * 5
    out += _ext(14, b'LONGSTR=00300\x00\t')
    out += _END
    out += s[:252].encode().ljust(256) + s[252:].encode().ljust(48)
    return out


def test_very_long_string_segments():
    from morph_kgc_ray.sources.sav import read_sav
    s = 'A' * 260 + 'B' * 40
    df = read_sav(build_vlong_sav(s))
    assert list(df.columns) == ['LONGSTR']
    assert df['LONGSTR'][0] == s


def test_sav_property_random_grids():
    """Round-trip random variable grids through the spec-built writer:
    mixed numeric/string columns, random widths (incl. multi-element
    strings), sysmiss holes, raw AND bytecode-compressed data, across
    several shapes."""
    import random

    from morph_kgc_ray.sources.sav import read_sav
    random.seed(7)
    for trial in range(10):
        n_rows = random.randint(1, 9)
        specs = []  # (name, width) ; width 0 = numeric
        for c in range(random.randint(1, 5)):
            if random.random() < 0.5:
                specs.append((f'NUM{c}', 0))
            else:
                specs.append((f'STR{c}', random.randint(1, 20)))
        data = []
        for _ in range(n_rows):
            row = []
            for name, width in specs:
                if width == 0:
                    row.append(SYSMIS if random.random() < 0.15
                               else round(random.uniform(-1e6, 1e6), 3))
                else:
                    n = random.randint(0, width)
                    row.append(''.join(random.choice('abcXYZ 09_') for _ in range(n)).rstrip())
            data.append(row)
        compression = random.choice((0, 1))

        case_size = sum(1 if w == 0 else (w + 7) // 8 for _, w in specs)
        out = _header(case_size, n_rows, compression)
        for name, width in specs:
            out += _var(width, name)
            out += _var(-1) * (0 if width == 0 else (width + 7) // 8 - 1)
        out += _END
        raw = b''
        for row in data:
            for (name, width), v in zip(specs, row):
                if width == 0:
                    raw += struct.pack('<d', v)
                else:
                    raw += v.encode().ljust((width + 7) // 8 * 8)
        if compression == 0:
            out += raw
        else:
            # bytecode: every element as a 253-literal (always valid)
            n_el = len(raw) // 8
            body = b''
            i = 0
            while i < n_el:
                chunk = min(8, n_el - i)
                body += bytes([253] * chunk + [0] * (8 - chunk))
                body += raw[i * 8:(i + chunk) * 8]
                i += chunk
            out += body + bytes([252] + [0] * 7)

        df = read_sav(out)
        assert list(df.columns) == [name for name, _ in specs], trial
        for r in range(n_rows):
            for (name, width), v in zip(specs, data[r]):
                got = df[name][r]
                if width == 0:
                    if v == SYSMIS:
                        assert np.isnan(got), (trial, r, name)
                    else:
                        assert got == v, (trial, r, name)
                else:
                    assert got == v, (trial, r, name, got)


def test_sav_through_read_source(ray_session, tmp_path):
    from morph_kgc_ray.config import Config
    from morph_kgc_ray.sources.readers import read_source
    p = tmp_path / 'cities.sav'
    p.write_bytes(build_plain_sav())
    rule = {'source_type': 'SAV', 'logical_source_value': str(p),
            'logical_source_type': None}
    cfg = Config({'DS': {'mappings': '/dev/null'}})
    df = read_source(rule, ['SCORE', 'CITY'], cfg).to_pandas() \
        .sort_values('CITY').reset_index(drop=True)
    # the prologue stringifies (pandas float rendering) and drops the
    # sysmiss/NaN row — same as the reference's astype(str) + dropna contract
    assert list(df['CITY']) == ['Lisbon', 'Vila Real']
    assert list(df['SCORE']) == ['1.5', '42.0']


def test_not_a_sav_rejected():
    from morph_kgc_ray.sources.sav import read_sav
    with pytest.raises(ValueError, match=r'\$FL2'):
        read_sav(b'PK\x03\x04 definitely a zip' + b'\x00' * 200)
