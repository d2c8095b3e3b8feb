"""Deterministic synthetic Common-Crawl-style pages table + the reference
HTML->text extractor.

Schema (BASELINE.json input_hint): url:string, warc_ts:timestamp,
html:binary, text:string, lang:string.

The generator is seeded and pure: page i of a given config is always the
same bytes.  ``extract_text(render_html(text)) == text`` byte-identically,
which is the per-row invariant the flagship pipeline verifies
(BASELINE.md "byte-identical extracted text per url").

Skew is built in: ~20% of pages share one hot domain and language so the
dedup/shuffle stages see realistic hot keys.
"""

from __future__ import annotations

import html as _html
import os
import re

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# deterministic vocabulary: plain words + linkable entity surface forms.
# Every canonical entity has several alias surface forms; the linker must
# canonicalize any alias to the entity IRI (the north-star's
# "IRI canonicalization" stage).
_WORDS = [f'w{i:03d}' for i in range(500)]
ENTITY_NAMES = [f'Acme{i:03d}' for i in range(100)] + [f'Globex{i:03d}' for i in range(100)]
ALIAS_SUFFIXES = ['', ' Inc', ' Corp', ' Ltd', ' Group', ' Holdings', ' Labs', ' Systems', ' AG', ' SA']
ENTITY_ALIASES = {f'{name}{suf}': name for name in ENTITY_NAMES for suf in ALIAS_SUFFIXES}
ENTITY_IRI_PREFIX = 'http://kg.example.org/entity/'
_LANGS = ['en', 'de', 'fr', 'es']
_ALIAS_LIST = list(ENTITY_ALIASES)

_BOILERPLATE_HEAD = ('<html><head><title></title>'
                     '<script>var x = 1; // tracking stub</script>'
                     '<style>body { font: serif }</style></head><body>')
_BOILERPLATE_TAIL = '</body></html>'


def render_html(text: str) -> bytes:
    """Render extracted text back to a deterministic HTML page."""
    paras = ''.join(f'<p>{_html.escape(p)}</p>' for p in text.split('\n'))
    return (_BOILERPLATE_HEAD + paras + _BOILERPLATE_TAIL).encode('utf-8')


_SCRIPT_RX = re.compile(rb'<(script|style)\b.*?</\1>', re.S | re.I)
_TAG_RX = re.compile(rb'<[^>]+>')


def extract_text(html: bytes) -> str:
    """The reference extractor: drop script/style, strip tags, unescape
    entities, keep non-empty stripped lines joined by newline.

    This function IS the per-row invariant target: the pipeline's extracted
    text must match it byte-identically for every url."""
    cleaned = _SCRIPT_RX.sub(b'', html)
    cleaned = _TAG_RX.sub(b'\n', cleaned)
    text = _html.unescape(cleaned.decode('utf-8', errors='replace'))
    lines = [ln.strip() for ln in text.split('\n')]
    return '\n'.join(ln for ln in lines if ln)


def _page_text(rng: np.random.Generator, hot: bool) -> str:
    n_paras = int(rng.integers(2, 6))
    paras = []
    for _ in range(n_paras):
        n_words = int(rng.integers(20, 60))
        words = [_WORDS[int(i)] for i in rng.integers(0, len(_WORDS), n_words)]
        # sprinkle entity mentions (hot pages mention hot entities)
        n_ents = int(rng.integers(1, 4))
        for _ in range(n_ents):
            ent_idx = int(rng.integers(0, 200)) if hot else int(rng.integers(0, len(_ALIAS_LIST)))
            pos = int(rng.integers(0, len(words)))
            words.insert(pos, _ALIAS_LIST[ent_idx])
        paras.append(' '.join(words))
    return '\n'.join(paras)


def generate_pages_table(num_rows: int, seed: int = 42, dup_fraction: float = 0.1) -> pa.Table:
    """Deterministic pages batch.  ``dup_fraction`` of rows duplicate an
    earlier page's text under a different url (exercises dedup)."""
    rng = np.random.default_rng(seed)
    urls, tss, htmls, texts, langs = [], [], [], [], []
    base_ts = np.datetime64('2024-03-01T00:00:00')
    for i in range(num_rows):
        hot = rng.random() < 0.2
        domain = 'hot.example.com' if hot else f'site{int(rng.integers(0, 997)):03d}.example.org'
        url = f'https://{domain}/page/{seed}/{i}'
        if texts and rng.random() < dup_fraction:
            text = texts[int(rng.integers(0, len(texts)))]
        else:
            text = _page_text(rng, hot)
        lang = 'en' if hot else _LANGS[int(rng.integers(0, len(_LANGS)))]
        urls.append(url)
        tss.append(base_ts + np.timedelta64(int(rng.integers(0, 86_400_000)), 'ms'))
        htmls.append(render_html(text))
        texts.append(text)
        langs.append(lang)
    return pa.table({
        'url': pa.array(urls, pa.string()),
        'warc_ts': pa.array(np.array(tss, dtype='datetime64[us]')),
        'html': pa.array(htmls, pa.binary()),
        'text': pa.array(texts, pa.string()),
        'lang': pa.array(langs, pa.string()),
    })


def pages_parquet_dir(num_rows: int, seed: int = 42, num_files: int = 8,
                      cache_root: str = '/tmp/morph_kgc_ray_pages') -> str:
    """Materialize (and cache) the pages table as a directory of parquet
    shards — one file per shard so reads parallelize."""
    out = os.path.join(cache_root, f'v2_rows{num_rows}_seed{seed}_f{num_files}')
    done = os.path.join(out, '_DONE')
    if os.path.exists(done):
        return out
    os.makedirs(out, exist_ok=True)
    per = max(1, num_rows // num_files)
    written = 0
    for f in range(num_files):
        n = per if f < num_files - 1 else num_rows - per * (num_files - 1)
        if n <= 0:
            break
        table = generate_pages_table(n, seed=seed + f)
        pq.write_table(table, os.path.join(out, f'part-{f:04d}.parquet'))
        written += n
    with open(done, 'w') as fh:
        fh.write(str(written))
    return out
