"""Bloom-filter-accelerated anti-join (exact blocklist filtering at scale).

The broadcast-set pattern (``ops/decontam.py``) stops working when the
blocklist no longer fits in every worker's heap.  This operator broadcasts
a fixed-size BITMAP sketch of the blocklist instead and keeps the result
EXACT: rows whose key definitely misses the Bloom filter (the overwhelming
majority at ~10 bits/key) bypass the join exchange entirely; only the
possible-hits take a distributed ``left_anti`` join against the key table
for exact verification.  At 100 TB the all-to-all shuffle therefore
carries the candidate fraction (true matches + the ~0.1-1% false-positive
rate), not the corpus.

The reference engine (morph-kgc) has no blocklist operator; this belongs
to the training-data-pipeline suite (SURVEY.md §2 LLM-ops) — the classic
use is removing exact-blocklisted documents (opt-outs, eval-set texts,
known-bad URLs) from a crawl.

Partitioning assumption: none on the inputs.  The filter build is a
per-block partial-bitmap fold (bitmaps OR-combine in tasks, the driver
pulls ONE bitmap); the probe is stateless per batch; the verify join hash-
partitions candidates only.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data


def _key_hashes(t: pa.Table, key_col: str, seed: int = 31) -> np.ndarray:
    """One 64-bit hash per row of the key column — polars ``hash_rows``
    (vectorized over full values, same idiom as engine/dedup row hashing)."""
    import polars as pl
    return pl.from_arrow(t.select([key_col])).hash_rows(seed=seed) \
             .to_numpy().astype(np.uint64)


def _positions(h: np.ndarray, num_bits: int, num_hashes: int) -> np.ndarray:
    """(num_hashes, n) bit positions via double hashing: h1 + i*h2 mod m
    (m a power of two, h2 forced odd so the stride cycles the whole table)."""
    mask = np.uint64(num_bits - 1)
    h1 = h & mask
    h2 = (h >> np.uint64(32)) | np.uint64(1)
    i = np.arange(num_hashes, dtype=np.uint64)[:, None]
    return ((h1[None, :] + i * h2[None, :]) & mask).astype(np.int64)


def build_bloom(keys_ds: ray.data.Dataset, key_col: str,
                num_bits: int = 1 << 23, num_hashes: int = 4) -> dict:
    """Distributed Bloom-filter build: per-block partial bitmaps inside
    ``map_batches`` (one ``num_bits/8``-byte row per block), OR-folded
    block-locally and once more after ``repartition(1)`` — a two-level
    task-side tree; the driver receives exactly one bitmap.  Size
    ``num_bits`` at ~10 bits per expected key for a ~1% false-positive
    rate (2^23 bits = 1 MiB covers ~800k keys)."""
    if num_bits & (num_bits - 1):
        raise ValueError('num_bits must be a power of two')
    nbytes = num_bits >> 3

    def partial(t: pa.Table) -> pa.Table:
        bm = np.zeros(nbytes, np.uint8)
        if t.num_rows:
            pos = _positions(_key_hashes(t, key_col), num_bits, num_hashes).ravel()
            np.bitwise_or.at(bm, pos >> 3,
                             np.left_shift(np.uint8(1), (pos & 7).astype(np.uint8)))
        return pa.table({'bm': pa.array([bm.tobytes()], pa.large_binary())})

    def fold(t: pa.Table) -> pa.Table:
        out = np.zeros(nbytes, np.uint8)
        for b in t['bm'].to_pylist():
            np.bitwise_or(out, np.frombuffer(b, np.uint8), out=out)
        return pa.table({'bm': pa.array([out.tobytes()], pa.large_binary())})

    folded = keys_ds.map_batches(partial, batch_format='pyarrow') \
                    .map_batches(fold, batch_format='pyarrow', batch_size=None) \
                    .repartition(1) \
                    .map_batches(fold, batch_format='pyarrow', batch_size=None) \
                    .take_all()
    bits = (np.frombuffer(folded[0]['bm'], np.uint8).copy() if folded
            else np.zeros(nbytes, np.uint8))
    return {'bits': bits, 'num_bits': num_bits, 'num_hashes': num_hashes}


def _bloom_mask(bloom: dict, t: pa.Table, key_col: str) -> np.ndarray:
    """Boolean possible-hit mask for the batch's keys (all k bits set)."""
    if not t.num_rows:
        return np.zeros(0, bool)
    pos = _positions(_key_hashes(t, key_col), bloom['num_bits'], bloom['num_hashes'])
    byte = bloom['bits'][pos >> 3]
    bit = np.left_shift(np.uint8(1), (pos & 7).astype(np.uint8))
    return ((byte & bit) != 0).all(axis=0)


_BLOOM_CACHE: dict = {}


def _split_fn(bloom_ref, key_col: str, keep_hits: bool):
    """Task-form batch filter with a per-worker-process bloom cache (the
    bitmap is fetched from the object store once per process)."""
    key = bloom_ref.hex()

    def fn(t: pa.Table) -> pa.Table:
        bloom = _BLOOM_CACHE.get(key)
        if bloom is None:
            bloom = ray.get(bloom_ref)
            _BLOOM_CACHE[key] = bloom
        mask = _bloom_mask(bloom, t, key_col)
        return t.filter(pa.array(mask if keep_hits else ~mask))
    return fn


def bloom_anti_join(left: ray.data.Dataset, keys_ds: ray.data.Dataset,
                    key_col: str, right_col: 'str | None' = None,
                    num_partitions: int = 32, num_bits: int = 1 << 23,
                    num_hashes: int = 4,
                    bloom: 'dict | None' = None,
                    small: bool = False) -> ray.data.Dataset:
    """Rows of ``left`` whose ``key_col`` value does NOT appear in
    ``keys_ds[right_col or key_col]`` — exact ``NOT IN`` semantics for
    non-null keys (a null key never equals anything, so it survives, like
    a join-based anti join and unlike SQL ``NOT IN`` with nulls present).

    Plan: build/broadcast the bitmap, then TWO column-pruned scans of
    ``left`` — the definite-miss branch is a pure passthrough that never
    enters an exchange, and the candidate branch prunes to possible-hits
    before a hash-partitioned ``left_anti`` join verifies them exactly.
    Two cheap scans beat one full-corpus shuffle at crawl scale; pass a
    prebuilt ``bloom`` to share one filter across many inputs.

    ``small=True`` (plan-time knowledge that the KEY SET fits in one heap)
    verifies candidates against an exact broadcast value set instead of
    the join — no exchange at all.  The bitmap is then redundant for
    correctness but still useful when ``left`` is huge: misses skip even
    the set lookup's batch copy."""
    rc = right_col or key_col
    if bloom is None:
        bloom = build_bloom(keys_ds, rc, num_bits, num_hashes)
    ref = ray.put(bloom)
    misses = left.map_batches(_split_fn(ref, key_col, keep_hits=False),
                              batch_format='pyarrow')
    cands = left.map_batches(_split_fn(ref, key_col, keep_hits=True),
                             batch_format='pyarrow')
    if small:
        key_tbl = pa.Table.from_pandas(keys_ds.select_columns([rc]).to_pandas())
        vals = pc.unique(key_tbl[rc].combine_chunks())

        def verify(t: pa.Table) -> pa.Table:
            idx = pc.index_in(t[key_col].combine_chunks(),
                              options=pc.SetLookupOptions(value_set=vals))
            return t.filter(pc.is_null(idx))

        survivors = cands.map_batches(verify, batch_format='pyarrow')
    else:
        survivors = cands.join(keys_ds.select_columns([rc]), 'left_anti',
                               num_partitions, on=(key_col,), right_on=(rc,))
    return misses.union(survivors)
