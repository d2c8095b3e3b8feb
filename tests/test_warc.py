"""Unit tests for the WARC/WET source and sink (sources/warc.py)."""

import gzip

import pyarrow as pa
import pytest


def _records():
    from morph_kgc_ray.sources.warc import format_wet_records
    return format_wet_records(
        ['https://a/x', 'https://b/y'],
        [1709251200123456, 1709251201000000],
        ['en', 'de'],
        ['hello\nworld', ''])


def test_parse_roundtrip_plain_and_gzip():
    from morph_kgc_ray.sources.warc import _warcinfo_record, parse_warc_bytes
    data = _warcinfo_record('t.warc') + _records()
    for blob in (data, gzip.compress(data)):
        out = parse_warc_bytes(blob)
        assert out['url'] == ['https://a/x', 'https://b/y']
        assert out['date_us'] == [1709251200123456, 1709251201000000]
        assert out['lang'] == ['en', 'de']
        assert out['text'] == ['hello\nworld', '']


def test_parse_multimember_gzip_and_seconds_date():
    """Per-record gzip members (the Common Crawl framing) and WARC-1.0
    second-granularity dates must both parse."""
    from morph_kgc_ray.sources.warc import _warcinfo_record, parse_warc_bytes
    recs = _records()
    mm = gzip.compress(_warcinfo_record('t.warc')) + gzip.compress(recs)
    assert parse_warc_bytes(mm)['url'] == ['https://a/x', 'https://b/y']
    raw = recs.replace(b'WARC-Date: 2024-03-01T00:00:00.123456Z',
                       b'WARC-Date: 2024-03-01T00:00:00Z')
    assert parse_warc_bytes(raw)['date_us'][0] == 1709251200000000


def test_parse_keep_types_filters_warcinfo():
    from morph_kgc_ray.sources.warc import _warcinfo_record, parse_warc_bytes
    data = _warcinfo_record('t.warc') + _records()
    assert len(parse_warc_bytes(data, keep_types=('warcinfo',))['url']) == 1
    assert len(parse_warc_bytes(data)['url']) == 2


def test_parse_malformed_raises():
    from morph_kgc_ray.sources.warc import parse_warc_bytes
    with pytest.raises(ValueError, match='malformed'):
        parse_warc_bytes(b'not a warc record\r\n\r\nbody')


def test_dataset_sink_source_roundtrip(ray_session, tmp_path):
    import ray.data as rd
    from morph_kgc_ray.sources.warc import read_wet, write_wet
    t = pa.table({
        'url': [f'https://s{i}.example.org/p/{i}' for i in range(50)],
        'warc_ts': pa.array([1709251200000000 + i * 1_000_003 for i in range(50)],
                            pa.int64()).cast(pa.timestamp('us')),
        'lang': ['en', 'de', 'fr', 'es', 'it'] * 10,
        'text': [f'doc {i} body with\nnewlines and ünïcode' for i in range(50)],
    })
    ds = rd.from_arrow(t).repartition(4)
    n = write_wet(ds, str(tmp_path / 'wet'), compress=True)
    assert n == 50
    back = read_wet(str(tmp_path / 'wet')).to_pandas().sort_values('url').reset_index(drop=True)
    orig = t.to_pandas().rename(columns={'warc_ts': 'warc_date'}) \
        .sort_values('url').reset_index(drop=True)
    import pandas as pd
    pd.testing.assert_frame_equal(back[sorted(back.columns)], orig[sorted(orig.columns)])


def test_write_wet_deterministic_names(ray_session, tmp_path):
    """Content-derived shard names: re-running the identical pipeline
    overwrites in place instead of accumulating files."""
    import os

    import ray.data as rd
    from morph_kgc_ray.sources.warc import write_wet
    t = pa.table({
        'url': ['https://a/1', 'https://a/2'],
        'warc_ts': pa.array([0, 1], pa.int64()).cast(pa.timestamp('us')),
        'lang': ['en', 'en'], 'text': ['x', 'y'],
    })
    out = str(tmp_path / 'wet')
    write_wet(rd.from_arrow(t), out)
    first = sorted(os.listdir(out))
    write_wet(rd.from_arrow(t), out)
    assert sorted(os.listdir(out)) == first
