"""WARC / WET web-archive source and sink (pure stdlib, no warcio).

Common Crawl ships webtext as WARC container files — raw ``response``
records in ``.warc.gz`` and extracted-text ``conversion`` records in
``.warc.wet.gz``.  The file is the unit of parallelism (a crawl segment is
~100k WET files of ~100-150 MB each), which maps 1:1 onto Ray Data:
``read_binary_files`` hands each file to one task, the record parser is a
single linear scan driven by ``Content-Length`` (bodies are sliced, never
re-scanned), and everything downstream is columnar.

- :func:`read_wet` — Dataset of (url, warc_date, lang, text) from WET
  ``conversion`` records; gzip (including the standard per-record
  multi-member framing) is detected per file.
- :func:`write_wet` — Dataset sink emitting valid WARC/1.1 WET shards,
  one file per input block, written INSIDE map_batches tasks (only counts
  reach the driver) with deterministic content-derived names so a re-run
  overwrites rather than duplicates.
- :func:`wet_shards_dir` — cached WET rendering of the deterministic
  synthetic pages corpus (tests / oracle gate).

Format notes (ISO 28500): records are ``WARC/1.1\\r\\n`` + headers +
``\\r\\n\\r\\n`` + exactly Content-Length body bytes + ``\\r\\n\\r\\n``.
``WARC-Identified-Content-Language`` is the header recent Common Crawl
WET files carry for per-record language; WARC-Date keeps fractional
seconds (permitted since WARC 1.1) so timestamp round-trips are exact.
"""

from __future__ import annotations

import gzip
import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

_CRLF2 = b'\r\n\r\n'
_DATE_FMT = '%Y-%m-%dT%H:%M:%S.%fZ'


# --------------------------------------------------------------------------
# record formatting (sink side)
# --------------------------------------------------------------------------

def format_wet_records(urls, dates_us, langs, texts) -> bytes:
    """Serialize parallel column lists into WET ``conversion`` records.
    ``dates_us`` are int64 microseconds since epoch.  Record IDs are
    content-derived (sha256 of the target URI) so output is deterministic."""
    days = np.asarray(dates_us, dtype='datetime64[us]')
    date_strs = np.datetime_as_string(days, unit='us')  # YYYY-MM-DDTHH:MM:SS.ffffff
    chunks: list[bytes] = []
    for url, dstr, lang, text in zip(urls, date_strs, langs, texts):
        body = (text or '').encode('utf-8')
        rid = hashlib.sha256((url or '').encode('utf-8')).hexdigest()[:32]
        hdr = (f'WARC/1.1\r\n'
               f'WARC-Type: conversion\r\n'
               f'WARC-Target-URI: {url}\r\n'
               f'WARC-Date: {dstr}Z\r\n'
               f'WARC-Record-ID: <urn:sha256:{rid}>\r\n'
               f'WARC-Identified-Content-Language: {lang}\r\n'
               f'Content-Type: text/plain\r\n'
               f'Content-Length: {len(body)}\r\n\r\n').encode('utf-8')
        chunks += [hdr, body, _CRLF2]
    return b''.join(chunks)


def _warcinfo_record(filename: str) -> bytes:
    body = b'software: morph_kgc_ray\r\nformat: WARC File Format 1.1\r\n'
    rid = hashlib.sha256(filename.encode()).hexdigest()[:32]
    hdr = (f'WARC/1.1\r\n'
           f'WARC-Type: warcinfo\r\n'
           f'WARC-Filename: {filename}\r\n'
           f'WARC-Record-ID: <urn:sha256:{rid}>\r\n'
           f'Content-Type: application/warc-fields\r\n'
           f'Content-Length: {len(body)}\r\n\r\n').encode('utf-8')
    return hdr + body + _CRLF2


# --------------------------------------------------------------------------
# record parsing (source side)
# --------------------------------------------------------------------------

def parse_warc_bytes(data: bytes, keep_types: tuple = ('conversion',)) -> dict:
    """Parse one WARC file's bytes into column lists.  One linear pass:
    header block located with a single ``find``, body sliced by
    Content-Length.  Returns dict of lists (url, date_us, lang, text)."""
    if data[:2] == b'\x1f\x8b':
        data = gzip.decompress(data)  # handles multi-member (per-record) gzip
    urls: list = []
    dates: list = []
    langs: list = []
    texts: list = []
    pos, n = 0, len(data)
    while pos < n:
        if data[pos:pos + 2] == b'\r\n':  # inter-record separators
            pos += 2
            continue
        hdr_end = data.find(_CRLF2, pos)
        if hdr_end < 0:
            break
        lines = data[pos:hdr_end].decode('utf-8', 'replace').split('\r\n')
        if not lines or not lines[0].startswith('WARC/'):
            raise ValueError(f'malformed WARC record at byte {pos}: {lines[:1]!r}')
        hdrs = {}
        for line in lines[1:]:
            k, _, v = line.partition(':')
            hdrs[k.strip().lower()] = v.strip()
        clen = int(hdrs.get('content-length', '0'))
        body = data[hdr_end + 4:hdr_end + 4 + clen]
        pos = hdr_end + 4 + clen
        if hdrs.get('warc-type') not in keep_types:
            continue
        urls.append(hdrs.get('warc-target-uri'))
        dates.append(_parse_warc_date(hdrs.get('warc-date')))
        langs.append(hdrs.get('warc-identified-content-language'))
        texts.append(body.decode('utf-8', 'replace'))
    return {'url': urls, 'date_us': dates, 'lang': langs, 'text': texts}


def _parse_warc_date(s: str | None) -> int | None:
    """WARC-Date -> int64 microseconds since epoch (fractional seconds
    optional, as in WARC 1.0 vs 1.1 files in the wild)."""
    if not s:
        return None
    from datetime import datetime, timezone
    base, dot, frac = s.rstrip('Z').partition('.')
    dt = datetime.strptime(base, '%Y-%m-%dT%H:%M:%S').replace(tzinfo=timezone.utc)
    us = int((frac + '000000')[:6]) if dot else 0
    return int(dt.timestamp()) * 1_000_000 + us


# --------------------------------------------------------------------------
# Dataset source / sink
# --------------------------------------------------------------------------

def read_wet(paths, filesystem=None, keep_types: tuple = ('conversion',),
             **read_kwargs) -> ray.data.Dataset:
    """WET files -> Dataset(url:string, warc_date:timestamp[us],
    lang:string, text:string).  Files are the parallel unit (the Common
    Crawl layout); each task parses its files in one linear pass."""
    ds = ray.data.read_binary_files(paths, filesystem=filesystem, **read_kwargs)

    def parse(t: pa.Table) -> pa.Table:
        cols = {'url': [], 'date_us': [], 'lang': [], 'text': []}
        for blob in t['bytes']:
            one = parse_warc_bytes(blob.as_py(), keep_types=keep_types)
            for k, v in one.items():
                cols[k].extend(v)
        return pa.table({
            'url': pa.array(cols['url'], pa.string()),
            'warc_date': pa.array(cols['date_us'], pa.int64()).cast(pa.timestamp('us')),
            'lang': pa.array(cols['lang'], pa.string()),
            'text': pa.array(cols['text'], pa.string()),
        })

    return ds.map_batches(parse, batch_format='pyarrow')


def write_wet(ds: ray.data.Dataset, out_dir: str, filesystem=None,
              compress: bool = True,
              url_col: str = 'url', ts_col: str = 'warc_ts',
              lang_col: str = 'lang', text_col: str = 'text') -> int:
    """Write a Dataset as WET shard files, one per input block, inside
    map_batches tasks.  Shard names are content-derived (sha256 of the
    record IDs), so re-running an identical pipeline rewrites the same
    names instead of accumulating duplicates.  Returns records written."""
    from ..sinks.writers import resolve_filesystem
    fs, root = resolve_filesystem(out_dir, filesystem)
    fs.create_dir(root, recursive=True)
    ext = '.warc.wet.gz' if compress else '.warc.wet'

    def write_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({'n': pa.array([], pa.int64())})
        urls = t[url_col].to_pylist()
        ts = pc.cast(t[ts_col], pa.int64()).to_pylist()
        langs = t[lang_col].to_pylist()
        texts = t[text_col].to_pylist()
        shard_key = hashlib.sha256('\n'.join(u or '' for u in urls).encode()).hexdigest()[:16]
        name = f'shard-{shard_key}{ext}'
        payload = _warcinfo_record(name) + format_wet_records(urls, ts, langs, texts)
        if compress:
            payload = gzip.compress(payload, mtime=0)
        with fs.open_output_stream(os.path.join(root, name)) as f:
            f.write(payload)
        return pa.table({'n': pa.array([t.num_rows], pa.int64())})

    counts = ds.map_batches(write_block, batch_format='pyarrow')
    return int(sum(r['n'] for r in counts.take_all()))


# --------------------------------------------------------------------------
# deterministic test corpus
# --------------------------------------------------------------------------

def wet_shards_dir(num_rows: int, seed: int = 42, num_files: int = 8,
                   compress: bool = True,
                   cache_root: str = '/tmp/morph_kgc_ray_wet') -> str:
    """Cached WET rendering of the synthetic pages corpus (mirrors
    ``pages_parquet_dir`` shard-for-shard so SQL oracles over the parquet
    compare against Ray pipelines over the WET files)."""
    from ..pipelines.pages import generate_pages_table
    tag = 'gz' if compress else 'raw'
    out = os.path.join(cache_root, f'v1_rows{num_rows}_seed{seed}_f{num_files}_{tag}')
    done = os.path.join(out, '_DONE')
    if os.path.exists(done):
        return out
    os.makedirs(out, exist_ok=True)
    ext = '.warc.wet.gz' if compress else '.warc.wet'
    per = max(1, num_rows // num_files)
    written = 0
    for f in range(num_files):
        n = per if f < num_files - 1 else num_rows - per * (num_files - 1)
        if n <= 0:
            break
        t = generate_pages_table(n, seed=seed + f)
        name = f'part-{f:04d}{ext}'
        payload = _warcinfo_record(name) + format_wet_records(
            t['url'].to_pylist(), pc.cast(t['warc_ts'], pa.int64()).to_pylist(),
            t['lang'].to_pylist(), t['text'].to_pylist())
        if compress:
            payload = gzip.compress(payload, mtime=0)
        with open(os.path.join(out, name), 'wb') as fh:
            fh.write(payload)
        written += n
    with open(done, 'w') as fh:
        fh.write(str(written))
    return out
