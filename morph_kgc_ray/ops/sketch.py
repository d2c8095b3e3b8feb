"""Cardinality sketches: K-Minimum-Values (KMV) distinct counting.

The classic streaming distinct-count estimator (Bar-Yossef et al. 2002,
"Counting distinct elements in a data stream") in its bottom-k form: hash
every element into ``[0, 2^63)`` and keep only the ``k`` smallest distinct
hash values; if fewer than ``k`` survive the count is exact, otherwise
``(k-1) * 2^63 // kth_min`` estimates the cardinality.

Unlike HyperLogLog, KMV is DETERMINISTIC given the hash function — so the
whole sketch (kept-hash count, k-th minimum, estimate) is replicable in
ANSI SQL from sha256 and gated hash-exactly by the DuckDB oracle, while
still being a genuine sublinear-communication sketch: each block ships at
most ``k`` int64s regardless of block size, and the merge is an
associative bottom-k union (one tiny single-task fold, exactly the
``top_ngrams`` fan-in shape — no global shuffle).

Hash: ``int.from_bytes(sha256(value)[:8], 'big') >> 1`` — 63 bits so the
value is non-negative in both int64 and SQL BIGINT.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

HASH_SPACE = 1 << 63


def _hash63(values: 'list[str]') -> np.ndarray:
    sha = hashlib.sha256
    return np.fromiter(
        (int.from_bytes(sha(v.encode()).digest()[:8], 'big') >> 1
         for v in values), dtype=np.int64, count=len(values))


def kmv_distinct(ds: ray.data.Dataset, col: str = 'text', k: int = 256,
                 token_rx: 'str | None' = None) -> ray.data.Dataset:
    """Bottom-k distinct-count sketch over a string column's values — or,
    with ``token_rx`` set, over the corpus token vocabulary (the column
    tokenized by the separator regex first).  Returns ONE row:
    ``(n_kept, kth_min_hash, est_distinct)`` — ``kth_min_hash`` is -1
    while the count is exact (fewer than ``k`` distinct hashes seen).
    Per-block work: block-distinct (Arrow unique), sha256 the distinct
    values only, local bottom-k; the merge unions the tiny partials."""
    from .text import regex_tokens

    def partial(t: pa.Table) -> pa.Table:
        if token_rx is not None:
            flat, _ = regex_tokens(t[col], token_rx)
        else:
            flat = pc.drop_null(pc.cast(t[col], pa.string()))
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        uniq = pc.unique(flat).to_pylist()
        hv = np.unique(_hash63(uniq))
        if len(hv) > k:
            hv = hv[:k]
        return pa.table({'hv': pa.array(hv, pa.int64())})

    def fold(t: pa.Table) -> pa.Table:
        hv = np.unique(pc.cast(t['hv'], pa.int64()).to_numpy(
            zero_copy_only=False)) if t.num_rows else np.empty(0, np.int64)
        hv = hv[:k]
        n_kept = len(hv)
        if n_kept < k:
            kth, est = -1, n_kept
        else:
            kth = int(hv[-1])
            est = min((k - 1) * HASH_SPACE // kth, HASH_SPACE - 1)
        return pa.table({'n_kept': pa.array([n_kept], pa.int64()),
                         'kth_min_hash': pa.array([kth], pa.int64()),
                         'est_distinct': pa.array([est], pa.int64())})

    partials = ds.map_batches(partial, batch_format='pyarrow')
    return partials.repartition(1).map_batches(fold, batch_format='pyarrow',
                                               batch_size=None)
