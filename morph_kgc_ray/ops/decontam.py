"""Benchmark decontamination: mark training documents whose text overlaps
an evaluation set by at least one word n-gram.

Public method (GPT-3, Brown et al. 2020, appendix C; standard in open
corpus reproductions): build the set of n-grams occurring in the held-out
benchmark, then flag every training document containing any of them.

Ray-Data-first shape: the benchmark side is SMALL by construction (an eval
set, not a corpus), so it is reduced to a sorted array of 64-bit n-gram
hashes on the driver and broadcast ONCE via ``ray.put``; the corpus side is
a single ``map_batches`` pass — tokenize (vectorized RE2 split), hash
tokens (one numpy pass per byte position), rolling k-gram window hashes,
``np.isin`` against the broadcast set, per-doc counts via ``bincount``.
No shuffle, no join: the classic broadcast-small-side pattern, linear in
the corpus at any scale.

Gram identity is the 64-bit rolling hash shared with the MinHash kernel
(``ops/dedup.py``): exact up to 2^-64-scale collisions, the same contract
the MinHash/SQL oracles already rely on.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from .dedup import _hash_tokens, _window_hashes
from .text import regex_tokens


def _gram_hash_set(texts, k: int, token_rx: str) -> np.ndarray:
    """Sorted unique k-gram hashes over a (small) list of texts —
    driver-side; rows with fewer than k tokens contribute nothing (their
    synthetic whole-doc window from ``_window_hashes`` is masked out)."""
    col = pa.array([t if t is not None else '' for t in texts],
                   pa.large_string())
    flat, counts = regex_tokens(col, token_rx)
    if not len(flat):
        return np.zeros(0, np.uint64)
    wh, wcounts = _window_hashes(_hash_tokens(flat), counts, k)
    doc = np.repeat(np.arange(len(counts)), wcounts)
    return np.unique(wh[(counts >= k)[doc]])


def ngram_decontaminate(ds: ray.data.Dataset, benchmark_texts,
                        text_col: str = 'text', k: int = 8,
                        token_rx: str = '[^0-9A-Za-z_]+',
                        out_col: str = 'n_contaminated') -> ray.data.Dataset:
    """Adds ``out_col``: how many of the document's word k-gram positions
    carry an n-gram that also occurs anywhere in ``benchmark_texts``
    (0 = clean; filter on it downstream to strip or audit contamination).
    Documents with fewer than k tokens have no k-grams and count 0."""
    bench = _gram_hash_set(list(benchmark_texts), k, token_rx)
    ref = ray.put(bench)

    def fn(t: pa.Table) -> pa.Table:
        b = ray.get(ref)  # zero-copy view from the local object store
        n = t.num_rows
        cnt = np.zeros(n, np.int64)
        if n and len(b):
            flat, counts = regex_tokens(t[text_col], token_rx)
            if len(flat):
                wh, wcounts = _window_hashes(_hash_tokens(flat), counts, k)
                doc = np.repeat(np.arange(n), wcounts)
                real = (counts >= k)[doc]
                hits = np.zeros(len(wh), bool)
                hits[real] = np.isin(wh[real], b)
                cnt = np.bincount(doc, weights=hits,
                                  minlength=n).astype(np.int64)
        return t.append_column(out_col, pa.array(cnt))

    return ds.map_batches(fn, batch_format='pyarrow')
