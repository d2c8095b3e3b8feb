"""Deterministic stratified sampling for training-data pipelines.

``stratified_sample`` keeps the k rows per group with the smallest seeded
multiplicative hash of their id — a reproducible per-group sample (same
seed -> same rows on any cluster layout, unlike random_shuffle().limit()).

Physical plan (no full shuffle of the losers):
  1. per block: rank rows within (group) by (hash, id) and keep rank <= k —
     a provable SUPERSET of the global sample (a row dropped locally has k
     smaller rows in its own block, hence >k globally);
  2. hash-keyed exchange co-locating each group's survivors (volume is at
     most k x groups x blocks, not the data size);
  3. the same rank filter again — now globally exact (every row smaller
     than a global top-k member is itself a global top-k member, so ranks
     among survivors equal true global ranks).

The hash is an explicit Knuth multiplicative formula so a SQL oracle can
replicate it bit-for-bit: h = (id * 2654435761 + seed) mod 2^32.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def _rank_filter(t: pa.Table, group_col: str, id_col: str, k: int,
                 seed: int, with_rank: bool,
                 order_cols: 'list[str] | None' = None) -> pa.Table:
    """Keep rank<=k rows per group.  Default order: seeded Knuth hash of
    ``id_col`` (stratified sampling); ``order_cols`` orders by explicit
    columns instead (per-key cap) — the caller must make the order total
    (include a unique id) for the local-prefilter superset proof to hold."""
    if '__bucket' in t.column_names:
        t = t.drop_columns(['__bucket'])
    if t.num_rows == 0:
        return t.append_column('rn', pa.array([], pa.int64())) if with_rank else t
    if order_cols is None:
        ids = pc.cast(t[id_col], pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
        h = (ids.astype(np.uint64) * np.uint64(2654435761) + np.uint64(seed)) \
            % np.uint64(1 << 32)
        t = t.append_column('__h', pa.array(h.astype(np.int64)))
        t = t.sort_by([(group_col, 'ascending'), ('__h', 'ascending'),
                       (id_col, 'ascending')])
    else:
        t = t.sort_by([(group_col, 'ascending')]
                      + [(c, 'ascending') for c in order_cols])
    g = t[group_col].combine_chunks().to_numpy(zero_copy_only=False)
    n = len(g)
    new_grp = np.empty(n, dtype=bool)
    new_grp[0] = True
    new_grp[1:] = g[1:] != g[:-1]
    seg_first = np.maximum.accumulate(np.where(new_grp, np.arange(n), 0))
    rn = np.arange(n) - seg_first + 1
    if '__h' in t.column_names:
        t = t.drop_columns(['__h'])
    if with_rank:
        t = t.append_column('rn', pa.array(rn.astype(np.int64)))
    return t.filter(pa.array(rn <= k))


def stratified_sample(ds: ray.data.Dataset, group_col: str, id_col: str,
                      k: int, seed: int = 0,
                      num_partitions: 'int | None' = None,
                      small: bool = False,
                      with_rank: bool = True) -> ray.data.Dataset:
    """k deterministic rows per ``group_col`` value (smallest seeded hash of
    ``id_col``, ties by id).  ``with_rank`` appends the 1-based within-group
    rank as ``rn``."""
    from .window import _keyed_blocks

    def local(t: pa.Table) -> pa.Table:
        return _rank_filter(t, group_col, id_col, k, seed, with_rank=False)

    pre = ds.map_batches(local, batch_format='pyarrow')
    co = _keyed_blocks(pre, group_col, num_partitions, small)
    return co.map_batches(
        lambda t: _rank_filter(t, group_col, id_col, k, seed, with_rank),
        batch_format='pyarrow', batch_size=None)


def cap_per_key(ds: ray.data.Dataset, group_col: str, k: int,
                order_cols: list[str],
                num_partitions: 'int | None' = None,
                small: bool = False,
                with_rank: bool = True) -> ray.data.Dataset:
    """Per-key cap (the crawl-curation "max N documents per domain"): keep
    the k rows per ``group_col`` that sort FIRST by ``order_cols``.  The
    order must be total — include a unique id as the last order column —
    both for determinism and for the local-prefilter proof.

    Same two-phase plan as ``stratified_sample`` (local per-block top-k is
    a provable superset of the global top-k; only survivors — at most
    k x groups x blocks rows — enter the keyed exchange), just ordered by
    explicit columns instead of the seeded hash.  ``with_rank`` appends
    the 1-based within-group rank as ``rn``."""
    from .window import _keyed_blocks

    def local(t: pa.Table) -> pa.Table:
        return _rank_filter(t, group_col, '', k, 0, with_rank=False,
                            order_cols=order_cols)

    pre = ds.map_batches(local, batch_format='pyarrow')
    co = _keyed_blocks(pre, group_col, num_partitions, small)
    return co.map_batches(
        lambda t: _rank_filter(t, group_col, '', k, 0, with_rank,
                               order_cols=order_cols),
        batch_format='pyarrow', batch_size=None)


def mixture_sample(ds: ray.data.Dataset, group_col: str, id_col: str,
                   rates: 'dict[str, float]', seed: int = 0,
                   default_rate: float = 0.0) -> ray.data.Dataset:
    """Deterministic weighted mixture sampling (training-mix construction):
    keep each row of group ``g`` iff its seeded Knuth hash falls below
    ``rates[g] * 2^32``.  Pure map stage — no shuffle at ANY scale, the
    same row set on any cluster layout, and exact SQL replication via the
    explicit hash formula (see module docstring).  Rates are clamped to
    [0, 1]; groups absent from ``rates`` use ``default_rate``."""
    items = sorted(rates.items())
    names = pa.array([k for k, _ in items], pa.string())
    thresholds = np.array(
        [min(max(float(v), 0.0), 1.0) * (1 << 32) for _, v in items],
        np.float64).astype(np.uint64)
    default_thr = np.uint64(min(max(float(default_rate), 0.0), 1.0) * (1 << 32))

    def fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        ids = pc.cast(t[id_col], pa.int64()).combine_chunks() \
            .to_numpy(zero_copy_only=False)
        h = (ids.astype(np.uint64) * np.uint64(2654435761) + np.uint64(seed)) \
            % np.uint64(1 << 32)
        idx = pc.index_in(t[group_col], value_set=names)
        idxn = idx.combine_chunks().to_numpy(zero_copy_only=False)  # float w/ nan for misses
        known = ~np.isnan(idxn.astype(np.float64)) if idxn.dtype.kind == 'f' \
            else np.ones(len(ids), bool)
        thr = np.full(len(ids), default_thr, np.uint64)
        if known.any():
            thr[known] = thresholds[idxn[known].astype(np.int64)]
        return t.filter(pa.array(h < thr))

    return ds.map_batches(fn, batch_format='pyarrow')


def split_by_hash(ds: ray.data.Dataset, id_col: str = 'doc_id',
                  boundaries: 'tuple[tuple[str, int], ...]' = (
                      ('train', 90), ('val', 95), ('test', 100)),
                  seed: int = 0,
                  split_col: str = 'split') -> ray.data.Dataset:
    """Deterministic train/val/test assignment: bucket = seeded Knuth hash
    of the id modulo 100; each ``(name, upper)`` boundary claims buckets
    ``[prev_upper, upper)``.  Same seed -> same split on any cluster
    layout or row order (unlike ``random_shuffle().split()``), and the
    explicit hash formula is SQL-replicable bit-for-bit.  One stateless
    zero-shuffle map stage."""
    uppers = [u for _, u in boundaries]
    if uppers != sorted(uppers) or uppers[-1] != 100:
        raise ValueError('boundaries must be ascending and end at 100')
    names = pa.array([n for n, _ in boundaries], pa.string())
    edges = np.asarray(uppers, dtype=np.int64)

    def fn(t: pa.Table) -> pa.Table:
        ids = pc.cast(t[id_col], pa.int64()).to_numpy(zero_copy_only=False)
        h = (ids.astype(np.uint64) * np.uint64(2654435761)
             + np.uint64(seed)) % np.uint64(1 << 32)
        bucket = (h % np.uint64(100)).astype(np.int64)
        idx = np.searchsorted(edges, bucket, side='right')
        return t.append_column(split_col, names.take(pa.array(idx)))

    return ds.map_batches(fn, batch_format='pyarrow')
