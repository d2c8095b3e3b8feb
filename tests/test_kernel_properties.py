"""Property-based tests (hypothesis) for the pure term-materialization
kernels: the vectorized implementations must agree with their obvious
Python-reference counterparts on arbitrary inputs."""

import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

texts = st.lists(st.text(max_size=60), min_size=0, max_size=25)


@settings(max_examples=200, deadline=None)
@given(texts)
def test_percent_encode_matches_urllib_quote(values):
    from urllib.parse import quote

    from morph_kgc_ray.engine.kernels import percent_encode_array
    arr = pa.array(values, pa.large_string())
    out = percent_encode_array(arr).to_pylist()
    assert out == [quote(v, safe='') for v in values]


@settings(max_examples=200, deadline=None)
@given(texts)
def test_escape_chain_matches_sequential_python_replace(values):
    from morph_kgc_ray.engine.kernels import _ESCAPE_CHAIN, escape_literal_array
    arr = pa.array(values, pa.large_string())
    out = escape_literal_array(arr).to_pylist()
    expected = []
    for v in values:
        for old, new in _ESCAPE_CHAIN:
            v = v.replace(old, new)
        expected.append(v)
    assert out == expected


@settings(max_examples=200, deadline=None)
@given(st.floats(allow_nan=False, allow_infinity=False, width=64))
def test_xsd_canonical_double_roundtrips(x):
    from morph_kgc_ray.engine.kernels import xsd_canonical_double
    s = xsd_canonical_double(repr(x))
    # canonical form must parse back to the same float and match the
    # mantissa-E-exponent shape
    assert float(s) == x
    assert 'E' in s and '.' in s.split('E')[0]


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet=st.characters(blacklist_characters='{}\\'), max_size=30),
       st.text(alphabet=st.characters(whitelist_categories=('Ll',), max_codepoint=122),
               min_size=1, max_size=8))
def test_template_segments_roundtrip(const, ref):
    from morph_kgc_ray.engine.kernels import parse_template_segments
    template = const + '{' + ref + '}' + const
    segs = parse_template_segments(template)
    rebuilt = ''.join(v if k == 'const' else '{' + v + '}' for k, v in segs)
    assert rebuilt == template
    assert ('ref', ref) in segs


@given(st.lists(st.one_of(st.none(), st.text(max_size=60)), max_size=40))
def test_char_class_counts_match_re2(values):
    """The byte-LUT single-pass counter (ops.text.char_class_counts) must
    agree with pyarrow's re2 kernels on every class it replaces, for
    arbitrary unicode text incl. nulls/empties (RE2 Perl classes are
    ASCII-only; non-ASCII codepoints match [^\\w\\s])."""
    import numpy as np
    import pyarrow.compute as pc

    from morph_kgc_ray.ops.text import char_class_counts

    col = pa.array(values, pa.string())
    got = char_class_counts(col)
    filled = pc.fill_null(col, '')
    ref = {
        'n_chars': pc.utf8_length(filled),
        'n_punct': pc.count_substring_regex(filled, r'[^\w\s]'),
        'n_upper': pc.count_substring_regex(filled, r'[A-Z]'),
        'n_digit': pc.count_substring_regex(filled, r'[0-9]'),
        'n_space': pc.count_substring_regex(filled, r'\s'),
    }
    for k, v in ref.items():
        assert got[k].tolist() == v.to_numpy(zero_copy_only=False).astype(np.int64).tolist(), k


@pytest.mark.parametrize('row_len', [100, 5000, 3_000_000])
def test_char_class_counts_all_width_paths(row_len):
    """The packed-field fast paths (12-bit rows < 4 KiB, 21-bit rows
    < 2 MiB) and the cumsum fallback (>= 2 MiB rows) must agree with a
    direct per-string computation — the widest row in the batch selects
    the path, so each parametrization pins one branch."""
    import numpy as np

    from morph_kgc_ray.ops.text import char_class_counts

    rng = np.random.RandomState(row_len % 99991)
    alphabet = 'aZ9_ .,!\tü'
    rows = ['', 'aA0 _!',
            ''.join(rng.choice(list(alphabet), size=row_len)), '']
    got = char_class_counts(pa.array(rows, pa.string()))
    import re
    for i, s in enumerate(rows):
        assert got['n_chars'][i] == len(s)
        assert got['n_punct'][i] == len(re.findall(r'[^\w\s]', s, re.ASCII))
        assert got['n_upper'][i] == sum(c.isupper() and c.isascii() for c in s)
        assert got['n_digit'][i] == sum(c.isdigit() and c.isascii() for c in s)
        assert got['n_space'][i] == len(re.findall(r'[\t\n\f\r ]', s))
