"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale design notes:
- exact dedup: block-local reduce -> hash-repartition by key -> block-local
  reduce again.  Both reduces are the same associative kernel, so the result
  is exact with one keyed exchange and no sort.
- MinHash-LSH: per-batch vectorized shingling+minhash (numpy), explode to
  (band, band_hash, doc_id) rows, groupby band buckets (the only shuffle —
  band hash distributes uniformly so no salting needed), emit candidate
  pairs per bucket, verify with exact n-gram Jaccard, connected components
  by iterated min-label propagation (a few keyed groupbys, not a driver
  loop).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..engine.dedup import distinct  # noqa: F401  (re-exported)
from .similarity import vectors_to_ndarray

# --------------------------------------------------------------------------
# exact dedup
# --------------------------------------------------------------------------


def exact_dedup(ds: ray.data.Dataset, key_cols: list[str], id_col: str,
                num_partitions: int = 32, small: bool = False) -> ray.data.Dataset:
    """Keep one representative (min id) per distinct key.  Associative
    min-reduce via ``ops.agg.grouped_agg``: local partial per block, then a
    single-task combine (``small=True``, plan-time knowledge) or the hash
    exchange."""
    from .agg import grouped_agg
    return grouped_agg(ds, list(key_cols), [(id_col, 'min', id_col)],
                       small=small, num_partitions=num_partitions)


# --------------------------------------------------------------------------
# shingling + minhash (vectorized)
# --------------------------------------------------------------------------

_M61 = (1 << 61) - 1

# FNV-1a 64-bit constants (token hashing) + the odd rolling base shared with
# ops/text.py's winnowing fingerprint (odd => invertible mod 2^64)
_FNV_OFFSET = np.uint64(0xcbf29ce484222325)
_FNV_PRIME = np.uint64(0x100000001b3)
_ROLL_B = np.uint64(1000003)
_ROLL_B_INV = np.uint64(pow(1000003, -1, 1 << 64))


def _hash_tokens(arr: 'pa.Array') -> np.ndarray:
    """Vectorized FNV-1a 64-bit over a flat Arrow string array: one numpy
    pass per BYTE POSITION (tokens are short) instead of a Python call per
    token — this is the bulk-compute kernel of MinHash at scale."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    if not pa.types.is_large_string(arr.type):
        arr = arr.cast(pa.large_string())
    bufs = arr.buffers()
    off = np.frombuffer(bufs[1], dtype=np.int64)[arr.offset:arr.offset + n + 1]
    data = np.frombuffer(bufs[2], dtype=np.uint8)
    lengths = np.diff(off)
    # sort by length DESC once so the tokens still alive at byte position j
    # are a contiguous prefix — each pass is pure slicing, no boolean scan
    order = np.argsort(-lengths, kind='stable')
    starts = off[:-1][order]
    slen = lengths[order]
    h = np.full(n, _FNV_OFFSET, dtype=np.uint64)
    neg = -slen  # ascending; count of slen > j == searchsorted(neg, -j)
    for j in range(int(slen[0]) if n else 0):
        cnt = int(np.searchsorted(neg, -j))
        b = data[starts[:cnt] + j].astype(np.uint64)
        h[:cnt] = (h[:cnt] ^ b) * _FNV_PRIME
    out = np.empty(n, dtype=np.uint64)
    out[order] = h
    return out


def _window_hashes(token_hashes: np.ndarray, counts: np.ndarray, k: int):
    """Flat k-gram window hashes over per-token hashes, documents delimited
    by ``counts`` (tokens per doc).  Rolling-polynomial combine via the
    modular-inverse prefix trick (same identity as ops/text.py's
    rolling_hash_fingerprint): window [s, e) hashes to
    ``(S[e] - S[s]) * B^(e-1) mod 2^64`` where ``S`` is the cumulative sum of
    ``th[i] * B^-i`` — every step a whole-array numpy op, no per-doc loop.

    Docs with 0 < m < k tokens contribute one whole-doc window; empty docs
    contribute one 0 hash (the zero-length window's sum is 0).  Returns
    (window_hashes, windows_per_doc) with windows_per_doc >= 1 everywhere."""
    m = counts.astype(np.int64)
    n_tok = len(token_hashes)
    wcounts = np.where(m >= k, m - k + 1, 1)
    widths = np.minimum(m, k)  # per-doc window width (0 for empty docs)
    total = int(wcounts.sum())
    doc_of_window = np.repeat(np.arange(len(m)), wcounts)
    tok_offsets = np.concatenate(([0], np.cumsum(m)))
    win_offsets = np.concatenate(([0], np.cumsum(wcounts)))
    within = np.arange(total) - np.repeat(win_offsets[:-1], wcounts)
    starts = np.repeat(tok_offsets[:-1], wcounts) + within
    ends = starts + widths[doc_of_window]

    # pows[i] = B^i, ipows[i] = B^-i (mod 2^64; uint64 arithmetic wraps)
    base = np.full(n_tok + 1, _ROLL_B, dtype=np.uint64)
    base[0] = 1
    pows = np.multiply.accumulate(base)
    base[:] = _ROLL_B_INV
    base[0] = 1
    ipows = np.multiply.accumulate(base)
    S = np.zeros(n_tok + 1, dtype=np.uint64)
    if n_tok:
        np.cumsum(token_hashes * ipows[:n_tok], out=S[1:])
    # ends == starts (empty doc) gives S diff 0 -> hash 0 regardless of pow
    wh = (S[ends] - S[starts]) * pows[np.maximum(ends, 1) - 1]
    return wh, wcounts


class MinHashKernel:
    """Per-batch MinHash signatures, vectorized end-to-end: Arrow whitespace
    tokenization -> flat FNV-1a token hashes (one numpy pass per byte
    position) -> rolling-polynomial k-gram window hashes -> per-permutation
    ``np.minimum.reduceat`` over doc segments.  The permutation coefficients
    are drawn ONCE per actor in __init__ from a fixed seed (state amortized
    across batches — actor-pool pattern)."""

    def __init__(self, num_perm: int = 64, k: int = 5, text_col: str = 'text', seed: int = 7):
        rng = np.random.RandomState(seed)
        # multiplication by an ODD constant is a bijection mod 2^64, so
        # v = (a*h + b) with wrap-around is a true 64-bit permutation — no
        # modulo needed (the classic (a*h+b) % prime costs ~2x per element)
        self.a = ((rng.randint(0, 1 << 31, size=num_perm).astype(np.uint64) << np.uint64(32))
                  | (rng.randint(0, 1 << 31, size=num_perm).astype(np.uint64) << np.uint64(1))
                  | np.uint64(1))
        self.b = ((rng.randint(0, 1 << 31, size=num_perm).astype(np.uint64) << np.uint64(32))
                  | rng.randint(0, 1 << 31, size=num_perm).astype(np.uint64))
        self.num_perm = num_perm
        self.k = k
        self.text_col = text_col

    def shingle_hashes(self, texts: 'pa.Array') -> 'tuple[np.ndarray, np.ndarray]':
        """(flat full-64-bit rolling window hashes, windows per doc)."""
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        texts = pc.fill_null(texts, '')
        d = len(texts)
        tokens = pc.utf8_split_whitespace(texts)
        flat = pc.list_flatten(tokens)
        tok_counts = pc.list_value_length(tokens).to_numpy(zero_copy_only=False).astype(np.int64)
        # Arrow's split emits boundary empty strings (leading/trailing
        # whitespace); python str.split() drops them
        keep = pc.greater(pc.binary_length(flat), 0)
        if not pc.all(keep).as_py():
            doc_ids = np.repeat(np.arange(d), tok_counts)
            mask = keep.to_numpy(zero_copy_only=False)
            flat = flat.filter(keep)
            tok_counts = np.bincount(doc_ids[mask], minlength=d)
        th = _hash_tokens(flat)
        return _window_hashes(th, tok_counts, self.k)

    def signature(self, text: str) -> np.ndarray:
        wh, _ = self.shingle_hashes(pa.array([text], pa.large_string()))
        vals = self.a[:, None] * wh[None, :] + self.b[:, None]  # wraps mod 2^64
        return vals.min(axis=1)

    def __call__(self, t: pa.Table) -> pa.Table:
        d = t.num_rows
        if d == 0:
            return t.append_column(
                'minhash', pa.FixedSizeListArray.from_arrays(
                    pa.array([], pa.uint64()), self.num_perm))
        wh, wcounts = self.shingle_hashes(t[self.text_col])
        seg = np.concatenate(([0], np.cumsum(wcounts)[:-1]))
        sig = np.empty((self.num_perm, d), dtype=np.uint64)
        buf = np.empty_like(wh)
        for p in range(self.num_perm):
            np.multiply(wh, self.a[p], out=buf)  # wraps mod 2^64: a is odd
            np.add(buf, self.b[p], out=buf)
            sig[p] = np.minimum.reduceat(buf, seg)
        col = pa.FixedSizeListArray.from_arrays(
            pa.array(np.ascontiguousarray(sig.T).ravel(), pa.uint64()), self.num_perm)
        return t.append_column('minhash', col)


def minhash_signatures(ds: ray.data.Dataset, num_perm: int = 64, k: int = 5,
                       text_col: str = 'text',
                       concurrency: 'int | None' = None) -> ray.data.Dataset:
    """``concurrency=None`` (default): task form with a per-process kernel
    cache — the permutation state (num_perm x 16 B) builds once per worker
    process and the stage fuses with the read, skipping actor-pool spin-up.
    Pass an int for a bounded (1, N) autoscaling actor pool (the right form
    when the per-kernel state is too big for every process)."""
    if concurrency is None:
        from .util import cached_kernel
        return ds.map_batches(
            cached_kernel(MinHashKernel, num_perm=num_perm, k=k, text_col=text_col),
            batch_format='pyarrow', batch_size=2048)
    return ds.map_batches(MinHashKernel, fn_constructor_kwargs={
                              'num_perm': num_perm, 'k': k, 'text_col': text_col},
                          batch_format='pyarrow',
                          concurrency=(1, concurrency), batch_size=2048)


def minhash_lsh_candidates(ds: ray.data.Dataset, id_col: str = 'doc_id', num_perm: int = 64,
                           bands: int = 16, text_col: str = 'text',
                           all_pairs_cap: int = 64,
                           small: bool = False) -> ray.data.Dataset:
    """Candidate near-duplicate pairs via banded LSH.

    Pipeline: signatures (actor pool) -> explode to (band, band_hash, id)
    -> groupby band bucket -> pairs within bucket.  Returns columns
    (id_a, id_b) with id_a < id_b, distinct.

    ``all_pairs_cap``: buckets up to this size emit ALL member pairs (a
    near-dup group of size >= 3 shares every band bucket, and star-pairing
    alone would omit its non-min pairs); hot buckets beyond the cap degrade
    to star-pairing on the bucket minimum (quadratic guard) — connectivity
    is preserved either way, only pair-level completeness needs the cap.

    ``small=True`` is the plan-time small-input fast path (the caller KNOWS
    the corpus is small, e.g. from file sizes): the band rows coalesce into
    ONE block for pairing and the final distinct runs single-block — the two
    keyed exchanges are pure spin-up cost at that size.  Semantics are
    identical; at scale leave it False."""
    rows_per_band = num_perm // bands
    sig_ds = minhash_signatures(ds.select_columns([id_col, text_col]), num_perm=num_perm,
                                text_col=text_col)

    def explode_bands(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        mh = t['minhash']
        if isinstance(mh, pa.ChunkedArray):
            mh = mh.combine_chunks()
        sigs = pc.list_flatten(mh).to_numpy(zero_copy_only=False) \
            .astype(np.uint64, copy=False).reshape(len(ids), -1) if len(ids) else \
            np.zeros((0, num_perm), dtype=np.uint64)
        if len(ids) == 0:
            return pa.table({'band': pa.array([], pa.int32()),
                             'band_hash': pa.array([], pa.uint64()),
                             id_col: pa.array([], pa.int64())})
        out_band, out_hash, out_id = [], [], []
        for b in range(bands):
            chunk = sigs[:, b * rows_per_band:(b + 1) * rows_per_band]
            # mix the band rows into one 64-bit bucket hash
            bh = np.zeros(len(ids), dtype=np.uint64)
            for c in range(chunk.shape[1]):
                bh = bh * np.uint64(1000003) + chunk[:, c]
            out_band.append(np.full(len(ids), b, dtype=np.int32))
            out_hash.append(bh)
            out_id.append(ids)
        return pa.table({'band': pa.array(np.concatenate(out_band)),
                         'band_hash': pa.array(np.concatenate(out_hash)),
                         id_col: pa.array(np.concatenate(out_id))})

    band_ds = sig_ds.map_batches(explode_bands, batch_format='pyarrow')
    pairs = _bucket_pairs(band_ds, id_col, all_pairs_cap=all_pairs_cap, small=small)
    return distinct(pairs, ['id_a', 'id_b'], small=small)


def _bucket_pairs(band_ds: ray.data.Dataset, id_col: str, all_pairs_cap: int = 0,
                  num_partitions: 'int | None' = None,
                  small: bool = False) -> ray.data.Dataset:
    """Candidate pairs from (band, band_hash, id) rows: ONE keyed exchange on
    a small int bucket column co-locates equal buckets, then each block
    builds its pairs with a vectorized lexsort + boundary scan (a per-bucket
    ``map_groups`` pays pandas-DataFrame overhead per bucket — tens of
    thousands of tiny groups made it the hottest stage).

    ``all_pairs_cap`` > 0 emits all pairs inside buckets up to that size
    (needed when x~y links must survive an unrelated smaller bucket-mate);
    larger buckets — and always, when the cap is 0 — fall back to pairing
    every member with the bucket minimum (hot-bucket quadratic guard)."""
    from ..engine.dedup import _ray_cpus

    buckets = num_partitions or max(8, _ray_cpus())

    def add_bucket(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({'band': pa.array([], pa.int32()),
                             'band_hash': pa.array([], pa.uint64()),
                             id_col: pa.array([], pa.int64()),
                             '__bucket': pa.array([], pa.int64())})
        bh = t['band_hash'].to_numpy(zero_copy_only=False)
        b = t['band'].to_numpy(zero_copy_only=False).astype(np.uint64)
        mix = (bh * np.uint64(0x9E3779B97F4A7C15) + b) % np.uint64(buckets)
        return t.append_column('__bucket', pa.array(mix.astype(np.int64)))

    if small:
        # one block holds every band row: groups form inside the single
        # pairs_in_block lexsort, no keyed exchange needed
        ds = band_ds.repartition(1)
    else:
        ds = band_ds.map_batches(add_bucket, batch_format='pyarrow')
        ds = ds.repartition(buckets, keys=['__bucket'], sort=False)

    def pairs_in_block(t: pa.Table) -> pa.Table:
        e = pa.array([], pa.int64())
        if t.num_rows == 0 or 'band' not in t.column_names:
            return pa.table({'id_a': e, 'id_b': e})
        band = t['band'].to_numpy(zero_copy_only=False)
        bh = t['band_hash'].to_numpy(zero_copy_only=False)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ids, bh, band))
        band, bh, ids = band[order], bh[order], ids[order]
        starts = np.flatnonzero(np.r_[True, (np.diff(band) != 0) | (np.diff(bh) != 0)])
        ends = np.r_[starts[1:], len(ids)]
        out_a, out_b = [], []
        for s, epos in zip(starts, ends):
            n = epos - s
            if n < 2:
                continue
            grp = ids[s:epos]
            if 0 < n <= all_pairs_cap:
                ii, jj = np.triu_indices(n, k=1)
                out_a.append(grp[ii])
                out_b.append(grp[jj])
            else:
                out_a.append(np.full(n - 1, grp[0]))
                out_b.append(grp[1:])
        if not out_a:
            return pa.table({'id_a': e, 'id_b': e})
        out = pa.table({'id_a': pa.array(np.concatenate(out_a)),
                        'id_b': pa.array(np.concatenate(out_b))})
        from ..engine.kernels import table_distinct
        return table_distinct(out)

    return ds.map_batches(pairs_in_block, batch_format='pyarrow', batch_size=None)


_LABEL_SENTINEL = 1 << 62


def _union_find_labels(nodes: np.ndarray, nbrs: np.ndarray) -> 'tuple[np.ndarray, np.ndarray]':
    """Driver union-find (path-halving) over an edge list of int64 node ids;
    returns (unique_nodes, min-reachable-id label per node)."""
    uniq, inv = np.unique(np.concatenate([nodes, nbrs]), return_inverse=True)
    parent = np.arange(len(uniq))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    half = len(nodes)
    for a, b in zip(inv[:half].tolist(), inv[half:].tolist()):
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by min-uniq-value so the root IS the min id of the tree
            if uniq[ra] <= uniq[rb]:
                parent[rb] = ra
            else:
                parent[ra] = rb
    labels = np.array([uniq[find(i)] for i in range(len(uniq))], dtype=np.int64)
    return uniq, labels


def min_label_clusters(pairs: ray.data.Dataset, id_col: str = 'doc_id',
                       rounds: 'int | None' = None, num_partitions: int = 16,
                       max_rounds: int = 50,
                       driver_edge_cap: int = 2_000_000) -> ray.data.Dataset:
    """Connected-component labels over a candidate-pair graph: each involved
    node gets cluster label = min id reachable in its component.  Fully in
    the data plane — each round is one keyed join + groupby-min (no
    driver-side label map, which would OOM at 100 TB).

    By default propagation iterates TO CONVERGENCE: every round also carries
    each node's previous label through the same exchange (a sentinel-tagged
    union — no extra join), so the round's changed-label count is one cheap
    aggregate; the loop stops when it hits zero.  A duplicate chain
    A~B~...~Z therefore collapses into ONE cluster regardless of length
    (up to ``max_rounds`` hops — min-label moves one hop per round; chains
    longer than that log a warning and keep the partial labels).
    ``rounds`` pins a fixed round count instead (skips the convergence
    aggregate; for benchmarking)."""
    pairs = pairs.select_columns(['id_a', 'id_b'])

    # directed edges both ways: (node, nbr).  Empty blocks can arrive
    # schema-less out of groupby/filter stages; rebuild them schema-complete
    # so the acero hash join always sees its key columns.
    def both_dirs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or 'id_a' not in t.column_names:
            e = pa.array([], pa.int64())
            return pa.table({'node': e, 'nbr': e})
        a = t['id_a'].combine_chunks()
        b = t['id_b'].combine_chunks()
        return pa.table({'node': pa.concat_arrays([a, b]), 'nbr': pa.concat_arrays([b, a])})

    # the coalescing repartition restores the dataset-level schema (empty
    # schema-less blocks would make the join build schema-less partitions)
    edges = pairs.map_batches(both_dirs, batch_format='pyarrow') \
                 .repartition(num_partitions).materialize()
    n_edges = edges.count()
    if n_edges == 0:  # empty graph: no clusters (all-empty datasets
        # lose their schema through groupby/join, so short-circuit)
        return ray.data.from_arrow(pa.table({id_col: pa.array([], pa.int64()),
                                             'cluster_id': pa.array([], pa.int64())}))

    # Small-graph fast path: the pair graph is the OUTPUT of LSH + exact
    # verification, typically orders of magnitude smaller than the corpus.
    # Below the cap (~32 MB of int64 edges) a driver union-find beats the
    # per-round join+groupby exchanges by a wide margin and converges exactly
    # regardless of chain length.  Above it, the join-based propagation below
    # is the plan that scales (no driver materialization).  The fixed-round
    # mode keeps the distributed plan so its semantics stay testable.
    if rounds is None and n_edges <= driver_edge_cap:
        chunks_n, chunks_b = [], []
        for t in edges.iter_batches(batch_format='pyarrow', batch_size=65536):
            chunks_n.append(t['node'].to_numpy(zero_copy_only=False).astype(np.int64))
            chunks_b.append(t['nbr'].to_numpy(zero_copy_only=False).astype(np.int64))
        uniq, labels = _union_find_labels(np.concatenate(chunks_n), np.concatenate(chunks_b))
        return ray.data.from_arrow(pa.table({id_col: pa.array(uniq),
                                             'cluster_id': pa.array(labels)}))

    def _as_labels(t: pa.Table) -> pa.Table:
        if t.num_columns != 2:
            e = pa.array([], pa.int64())
            return pa.table({'node': e, 'label': e})
        return t.rename_columns(['node', 'label'])

    def _as_rhs(t: pa.Table) -> pa.Table:
        if t.num_columns != 2:
            e = pa.array([], pa.int64())
            return pa.table({'__lnode': e, 'label': e})
        return t.rename_columns(['__lnode', 'label'])

    def _tag_new(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or 'node' not in t.column_names:
            e = pa.array([], pa.int64())
            return pa.table({'node': e, 'label': e, 'old': e})
        import numpy as np
        return pa.table({'node': t['node'], 'label': t['label'],
                         'old': pa.array(np.full(t.num_rows, _LABEL_SENTINEL,
                                                 dtype=np.int64))})

    def _tag_old(t: pa.Table) -> pa.Table:
        return pa.table({'node': t['node'], 'label': t['label'], 'old': t['label']})

    def _agg_rename(t: pa.Table) -> pa.Table:
        if t.num_columns != 3:
            e = pa.array([], pa.int64())
            return pa.table({'node': e, 'label': e, 'old': e})
        return t.rename_columns(['node', 'label', 'old'])

    labels = edges.groupby('node').min('nbr') \
                  .map_batches(_as_labels, batch_format='pyarrow') \
                  .map_batches(lambda t: t.set_column(
                      1, 'label', pc.min_element_wise(t['node'], t['label'])),
                      batch_format='pyarrow').materialize()

    converge = rounds is None
    n_rounds = max_rounds if converge else max(0, rounds - 1)
    for _ in range(n_rounds):
        # neighbor's current label: edges ⋈ labels on nbr  -> (node, label)
        rhs = labels.map_batches(_as_rhs, batch_format='pyarrow').repartition(num_partitions)
        nbr_labels = edges.join(rhs, 'inner', num_partitions,
                                on=('nbr',), right_on=('__lnode',)) \
                          .select_columns(['node', 'label'])
        from ray.data.aggregate import Min
        agg = nbr_labels.map_batches(_tag_new, batch_format='pyarrow') \
            .union(labels.map_batches(_tag_old, batch_format='pyarrow')) \
            .groupby('node').aggregate(Min('label'), Min('old')) \
            .map_batches(_agg_rename, batch_format='pyarrow').materialize()
        labels = agg.map_batches(lambda t: t.select(['node', 'label']),
                                 batch_format='pyarrow')
        if converge:
            changed = agg.map_batches(
                lambda t: pa.table({'c': pa.array(
                    [pc.sum(pc.less(t['label'], t['old'])).as_py() or 0], pa.int64())}),
                batch_format='pyarrow').sum('c')
            if not changed:
                break
    else:
        if converge:
            import logging
            logging.getLogger(__name__).warning(
                'min_label_clusters: not converged after %d rounds '
                '(component diameter exceeds the cap); labels are partial', max_rounds)

    def rename(t: pa.Table) -> pa.Table:
        return t.rename_columns([id_col, 'cluster_id'])
    return labels.map_batches(rename, batch_format='pyarrow')


def minhash_dedup_clusters(ds: ray.data.Dataset, id_col: str = 'doc_id', text_col: str = 'text',
                           num_perm: int = 64, bands: int = 16, rounds: 'int | None' = None,
                           verify_threshold: 'float | None' = 0.5,
                           num_partitions: int = 16,
                           small: bool = False) -> ray.data.Dataset:
    """Near-duplicate clusters: banded-LSH candidates, exact 5-word-shingle
    Jaccard verification via a bucketed JOIN against the doc texts (no corpus
    broadcast; drops LSH false positives before they merge unrelated
    clusters), then join-based min-label propagation iterated to
    convergence.  ``small=True``: plan-time small-corpus hint, see
    ``minhash_lsh_candidates``."""
    pairs = minhash_lsh_candidates(ds, id_col=id_col, num_perm=num_perm, bands=bands,
                                   text_col=text_col, small=small)
    if verify_threshold is not None:
        pairs = verify_pairs_jaccard(pairs, ds, id_col=id_col, text_col=text_col,
                                     threshold=verify_threshold,
                                     num_partitions=num_partitions)
    return min_label_clusters(pairs, id_col=id_col, rounds=rounds,
                              num_partitions=num_partitions)


# --------------------------------------------------------------------------
# embedding-cosine near-duplicate detection
# --------------------------------------------------------------------------

def _vec_normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def _unpack_f32(col) -> np.ndarray:
    """(n, d) float32 matrix from a large_binary column of packed-float32
    blobs (the acero-join vector transport): one buffer slice + view instead
    of a per-row ``np.frombuffer`` loop."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(arr)
    if n == 0:
        return np.zeros((0, 1), np.float32)
    bufs = arr.buffers()
    off = np.frombuffer(bufs[1], np.int64)[arr.offset:arr.offset + n + 1]
    data = np.frombuffer(bufs[2], np.uint8)
    widths = np.diff(off)
    if not (widths == widths[0]).all():
        raise ValueError('packed vectors have differing byte widths')
    # offsets are contiguous for join-materialized arrays; copy() realigns
    return data[off[0]:off[-1]].copy().view(np.float32).reshape(n, -1)


def embedding_neardup_pairs(ds: ray.data.Dataset, id_col: str = 'vec_id',
                            vec_col: str = 'embedding', threshold: float = 0.9,
                            corpus_cap: int = 2_000_000) -> ray.data.Dataset:
    """EXACT cosine near-duplicate pairs (id_a < id_b, cosine >= threshold).

    Baseline exact path: the normalized corpus matrix is built by STREAMING
    Arrow batches (never driver-side row dicts), broadcast once (ray.put),
    and every batch matmuls against it — O(n^2) compute distributed over
    batches, zero shuffles.  Right for dimension-scale corpora and as the
    recall oracle.  ``corpus_cap`` guards the driver: corpora beyond it
    raise with a pointer to ``embedding_neardup_clusters`` (sign-LSH
    bucketed candidates + verification), the 100-TB path."""
    import ray as _ray

    id_chunks: list = []
    vec_chunks: list = []
    n_seen = 0
    for batch in ds.select_columns([id_col, vec_col]).iter_batches(
            batch_format='pyarrow', batch_size=8192):
        n_seen += batch.num_rows
        if n_seen > corpus_cap:
            raise ValueError(
                f'embedding_neardup_pairs: corpus exceeds corpus_cap={corpus_cap} rows; '
                'the broadcast exact matrix would not fit the driver/object store. '
                'Use embedding_neardup_clusters (sign-LSH scale path) instead.')
        id_chunks.append(batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64))
        vec_chunks.append(vectors_to_ndarray(batch[vec_col], np.float64))
    ids = np.concatenate(id_chunks) if id_chunks else np.zeros(0, np.int64)
    V = _vec_normalize(np.concatenate(vec_chunks)
                       if vec_chunks else np.zeros((0, 1), np.float64))
    ref = _ray.put((ids, V))

    def fn(t: pa.Table) -> pa.Table:
        all_ids, allV = _ray.get(ref)
        bids = t[id_col].to_numpy(zero_copy_only=False)
        if len(bids) == 0:
            e = pa.array([], pa.int64())
            return pa.table({'id_a': e, 'id_b': e, 'cosine': pa.array([], pa.float64())})
        BV = _vec_normalize(vectors_to_ndarray(t[vec_col], np.float64))
        sims = BV @ allV.T                              # (b, n)
        bi, ni = np.nonzero(sims >= threshold)
        a = bids[bi]
        b = all_ids[ni]
        keep = a < b                                    # each pair once
        return pa.table({'id_a': pa.array(a[keep], pa.int64()),
                         'id_b': pa.array(b[keep], pa.int64()),
                         'cosine': pa.array(sims[bi[keep], ni[keep]], pa.float64())})

    return ds.map_batches(fn, batch_format='pyarrow')


class _SignLSHKernel:
    """Random-hyperplane signature bands per vector (hyperplanes drawn once
    per actor from a fixed seed).  Emits (band, band_hash, id) rows — the
    banded bucket groupby is the only shuffle of the scale path."""

    def __init__(self, dim: int, num_hyperplanes: int, bands: int, seed: int,
                 id_col: str, vec_col: str):
        rng = np.random.RandomState(seed)
        self.H = rng.normal(size=(num_hyperplanes, dim)).astype(np.float64)
        self.bands = bands
        self.rows_per_band = num_hyperplanes // bands
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t[self.id_col].to_numpy(zero_copy_only=False)
        if len(ids) == 0:
            return pa.table({'band': pa.array([], pa.int32()),
                             'band_hash': pa.array([], pa.uint64()),
                             self.id_col: pa.array([], pa.int64())})
        V = vectors_to_ndarray(t[self.vec_col], np.float64)
        bits = (V @ self.H.T) > 0                        # (n, H)
        out_band, out_hash, out_id = [], [], []
        for b in range(self.bands):
            chunk = bits[:, b * self.rows_per_band:(b + 1) * self.rows_per_band]
            bh = np.zeros(len(ids), dtype=np.uint64)
            for c in range(chunk.shape[1]):
                bh = bh * np.uint64(2) + chunk[:, c].astype(np.uint64)
            out_band.append(np.full(len(ids), b, dtype=np.int32))
            out_hash.append(bh)
            out_id.append(ids.astype(np.int64))
        return pa.table({'band': pa.array(np.concatenate(out_band)),
                         'band_hash': pa.array(np.concatenate(out_hash)),
                         self.id_col: pa.array(np.concatenate(out_id))})


def embedding_neardup_clusters(ds: ray.data.Dataset, id_col: str = 'vec_id',
                               vec_col: str = 'embedding', threshold: float = 0.8,
                               num_hyperplanes: int = 64, bands: int = 16,
                               rounds: 'int | None' = None, seed: int = 7,
                               num_partitions: int = 16) -> ray.data.Dataset:
    """Scale path for embedding near-dup: sign-LSH banded buckets (one
    shuffle) -> bucket-min candidate pairs -> exact cosine verification via
    bucketed joins against the vectors -> join-based min-label clusters."""
    first = ds.take(1)
    dim = len(first[0][vec_col]) if first else 1
    band_ds = ds.select_columns([id_col, vec_col]).map_batches(
        _SignLSHKernel, fn_constructor_args=(dim, num_hyperplanes, bands, seed, id_col, vec_col),
        batch_format='pyarrow', concurrency=(1, 2), batch_size=4096)

    # all pairs inside small buckets (bucket-min pairing would miss x~y links
    # whenever an unrelated smaller id shares a bucket); hot buckets degrade
    # to star-pairing on the bucket minimum
    pairs = _bucket_pairs(band_ds, id_col, all_pairs_cap=64)
    pairs = distinct(pairs, ['id_a', 'id_b'])

    # exact cosine verification: two keyed joins ship vectors only to pairs.
    # acero joins reject list<float> payloads, so vectors travel as packed
    # float32 bytes (large_binary) and are unpacked in the verify kernel.
    vecs = ds.select_columns([id_col, vec_col])

    def _pack(out_id, out_vec):
        def fn(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.table({out_id: pa.array([], pa.int64()),
                                 out_vec: pa.array([], pa.large_binary())})
            V = vectors_to_ndarray(t[vec_col], np.float32)
            blobs = pa.array([v.tobytes() for v in V], pa.large_binary())
            return pa.table({out_id: t[id_col], out_vec: blobs})
        return fn

    side_a = vecs.map_batches(_pack('id_a', '__v_a'), batch_format='pyarrow')
    side_b = vecs.map_batches(_pack('id_b', '__v_b'), batch_format='pyarrow')

    def _norm_pairs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or 'id_a' not in t.column_names:
            e = pa.array([], pa.int64())
            return pa.table({'id_a': e, 'id_b': e})
        return t.select(['id_a', 'id_b'])

    j = pairs.map_batches(_norm_pairs, batch_format='pyarrow').repartition(num_partitions)
    j = j.join(side_a, 'inner', num_partitions, on=('id_a',))
    j = j.join(side_b, 'inner', num_partitions, on=('id_b',))

    def verify(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            e = pa.array([], pa.int64())
            return pa.table({'id_a': e, 'id_b': e})
        A = _vec_normalize(_unpack_f32(t['__v_a']).astype(np.float64))
        B = _vec_normalize(_unpack_f32(t['__v_b']).astype(np.float64))
        sims = (A * B).sum(axis=1)
        t = t.drop_columns(['__v_a', '__v_b'])
        return t.filter(pa.array(sims >= threshold))

    verified = j.map_batches(verify, batch_format='pyarrow')
    return min_label_clusters(verified, id_col=id_col, rounds=rounds,
                              num_partitions=num_partitions)


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------

class SimHashKernel:
    """64-bit SimHash over word features.  The word -> ±1 bit-vector table is
    a per-worker cache (words repeat heavily in natural text, so each word is
    blake2b-hashed once per worker, not once per occurrence); per document
    the signed sum is one counts @ matrix product over the UNIQUE words."""

    _MAX_CACHE = 1 << 20

    def __init__(self, text_col: str = 'text'):
        self.text_col = text_col
        self._cache: dict = {}

    def _wordvec(self, w: str) -> np.ndarray:
        v = self._cache.get(w)
        if v is None:
            import hashlib
            # sha256 (not blake2b) so the signature is reproducible in plain
            # SQL (DuckDB sha256) — the driver's oracle recomputes it exactly
            h = int.from_bytes(hashlib.sha256(w.encode()).digest()[:8], 'little')
            bits = (np.uint64(h) >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
            v = np.where(bits.astype(bool), 1, -1).astype(np.int32)
            if len(self._cache) >= self._MAX_CACHE:
                self._cache.clear()  # bound worker memory; rebuilds lazily
            self._cache[w] = v
        return v

    def simhash64(self, text: str) -> int:
        words = text.split()
        if not words:
            return 0
        uniq, counts = np.unique(words, return_counts=True)
        acc = counts @ np.stack([self._wordvec(w) for w in uniq])
        out = 0
        for i in np.nonzero(acc > 0)[0]:
            out |= 1 << int(i)
        return out

    def __call__(self, t: pa.Table) -> pa.Table:
        # batch-vectorized: Arrow tokenization -> dictionary-encode ->
        # sha256 only the not-yet-cached UNIQUE words -> one scatter-add of
        # word bit-vectors into per-doc accumulators -> pack sign bits
        texts = t[self.text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        texts = pc.fill_null(texts, '')
        d = len(texts)
        if d == 0:
            return t.append_column('simhash', pa.array([], pa.uint64()))
        tokens = pc.utf8_split_whitespace(texts)
        flat = pc.list_flatten(tokens)
        tok_counts = pc.list_value_length(tokens).to_numpy(zero_copy_only=False).astype(np.int64)
        doc_ids = np.repeat(np.arange(d), tok_counts)
        keep = pc.greater(pc.binary_length(flat), 0)
        if not pc.all(keep).as_py():
            mask = keep.to_numpy(zero_copy_only=False)
            flat = flat.filter(keep)
            doc_ids = doc_ids[mask]
        enc = flat.dictionary_encode()
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        uniq = enc.dictionary.to_pylist()
        idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        M = np.stack([self._wordvec(w) for w in uniq]) if uniq else \
            np.zeros((0, 64), np.int32)
        # tokens arrive doc-ordered (np.repeat), so per-doc sums are one
        # contiguous-segment reduceat over the gathered bit-vector rows
        # (np.add.at scatter is ~5x slower: unbuffered ufunc)
        acc = np.zeros((d, 64), dtype=np.int64)
        cnt = np.bincount(doc_ids, minlength=d)
        nz = np.flatnonzero(cnt)
        if len(nz):
            offs = np.concatenate(([0], np.cumsum(cnt)))
            acc[nz] = np.add.reduceat(M[idx], offs[nz], axis=0)
        bits = (acc > 0).astype(np.uint64)
        hs = (bits << np.arange(64, dtype=np.uint64)[None, :]).sum(axis=1, dtype=np.uint64)
        return t.append_column('simhash', pa.array(hs, pa.uint64()))


def simhash(ds: ray.data.Dataset, text_col: str = 'text',
            concurrency: 'int | None' = None) -> ray.data.Dataset:
    """Task form with per-process kernel cache by default (fuses with the
    read; word-bit-vector caches are per-process state either way); pass an
    int for a bounded actor pool."""
    if concurrency is None:
        from .util import cached_kernel
        return ds.map_batches(cached_kernel(SimHashKernel, text_col=text_col),
                              batch_format='pyarrow', batch_size=2048)
    return ds.map_batches(SimHashKernel, fn_constructor_kwargs={'text_col': text_col},
                          batch_format='pyarrow',
                          concurrency=(1, concurrency), batch_size=2048)


# --------------------------------------------------------------------------
# n-gram Jaccard verification
# --------------------------------------------------------------------------

def ngram_jaccard(a: str, b: str, n: int = 3) -> float:
    """Character-n-gram Jaccard similarity of two strings."""
    inter, union = ngram_overlap_counts(a, b, n)
    if union == 0:
        return 1.0
    return inter / union


def ngram_overlap_counts(a: str, b: str, n: int = 3) -> 'tuple[int, int]':
    """(|intersection|, |union|) of the char-n-gram sets of two strings."""
    ga = {a[i:i + n] for i in range(max(1, len(a) - n + 1))}
    gb = {b[i:i + n] for i in range(max(1, len(b) - n + 1))}
    return len(ga & gb), len(ga | gb)


def _word_shingles(text: str, k: int = 5) -> set:
    """The k-word shingle SET of a document — the same shingling MinHash
    signatures are built from (``_shingle_hashes``), as strings."""
    words = text.split()
    if len(words) < k:
        return {' '.join(words)} if words else set()
    return {' '.join(words[i:i + k]) for i in range(len(words) - k + 1)}


def shingle_jaccard(a: str, b: str, k: int = 5) -> float:
    """k-word-shingle Jaccard similarity — the exact set similarity that
    MinHash approximates, so verification with this metric measures the same
    quantity candidate generation screened for."""
    ga, gb = _word_shingles(a, k), _word_shingles(b, k)
    if not ga and not gb:
        return 1.0
    return len(ga & gb) / max(1, len(ga | gb))


def _shingle_kernel(k: int) -> MinHashKernel:
    kern = _SHINGLE_KERNELS.get(k)
    if kern is None:
        kern = _SHINGLE_KERNELS[k] = MinHashKernel(num_perm=1, k=k)
    return kern


_SHINGLE_KERNELS: dict = {}


def shingle_jaccard_batch(texts_a, texts_b, k: int = 5) -> np.ndarray:
    """Vectorized pairwise k-word-shingle Jaccard: both text columns run
    through the SAME vectorized shingle-hash kernel MinHash signatures use
    (tokenize -> FNV-1a token hashes -> rolling window combine), then each
    pair intersects its sorted per-doc hash sets — no Python string-set
    building per pair.  Distinct shingles collide at ~2^-64, so scores equal
    ``shingle_jaccard`` exactly in practice (empty-doc semantics match: an
    empty doc hashes to the single sentinel window {0}, mirroring the
    empty-vs-empty = 1.0 / empty-vs-text = 0.0 contract)."""
    if isinstance(texts_a, pa.ChunkedArray):
        texts_a = texts_a.combine_chunks()
    if isinstance(texts_b, pa.ChunkedArray):
        texts_b = texts_b.combine_chunks()
    n = len(texts_a)
    if n == 0:
        return np.zeros(0, dtype=np.float64)
    combined = pa.concat_arrays([texts_a.cast(pa.large_string()),
                                 texts_b.cast(pa.large_string())])
    wh, wc = _shingle_kernel(k).shingle_hashes(combined)
    offs = np.concatenate(([0], np.cumsum(wc)))
    sims = np.empty(n, dtype=np.float64)
    for i in range(n):
        a = np.unique(wh[offs[i]:offs[i + 1]])
        b = np.unique(wh[offs[n + i]:offs[n + i + 1]])
        inter = np.intersect1d(a, b, assume_unique=True).size
        union = a.size + b.size - inter
        sims[i] = inter / union if union else 1.0
    return sims


def verify_pairs_jaccard(pairs: ray.data.Dataset, docs: ray.data.Dataset, id_col: str = 'doc_id',
                         text_col: str = 'text', threshold: float = 0.8,
                         num_partitions: int = 16, metric: str = 'word5',
                         broadcast_pair_cap: int = 20_000,
                         emit: str = 'filter') -> ray.data.Dataset:
    """Filter candidate pairs by exact Jaccard via two hash-partitioned
    joins against the doc texts (pairs ⋈ docs on id_a, then on id_b) — texts
    travel only to the pairs that need them, so this scales with the
    CANDIDATE volume rather than broadcasting the whole corpus.

    Small candidate sets (≤ ``broadcast_pair_cap``) skip the joins: the
    involved ids are collected (ints only), the matching texts are filtered
    out of ONE corpus scan and broadcast via ``ray.put`` (≤ 2·cap docs), and
    scoring runs as one map over the pairs — the two hash-shuffle joins are
    pure fixed overhead at that size.  The join plan remains the path that
    scales with candidate volume.

    ``metric='word5'`` (default) uses 5-word-shingle Jaccard — the metric
    MinHash-LSH candidates approximate, so thresholding here measures the
    same similarity the candidate stage screened for.  ``metric='char3'``
    uses character-3-gram Jaccard (edit-level similarity; note natural-text
    corpora share most char-3-grams, so background pairs score high).

    ``emit='counts'`` returns EVERY pair with integer overlap columns
    (``inter``, ``uni``) of the metric's set comparison instead of
    threshold-filtering — integer outputs hash stably against a SQL
    oracle."""
    docs = docs.select_columns([id_col, text_col])
    sim_fn = shingle_jaccard if metric == 'word5' else ngram_jaccard

    def _counts(a: str, b: str) -> 'tuple[int, int]':
        if metric == 'char3':
            return ngram_overlap_counts(a, b)
        ga, gb = _word_shingles(a), _word_shingles(b)
        return len(ga & gb), len(ga | gb)

    pairs = pairs.materialize()
    n_pairs = pairs.count()
    if n_pairs <= broadcast_pair_cap:
        import ray as _ray
        pt = pa.concat_tables(
            [t.select(['id_a', 'id_b']) for t in
             pairs.iter_batches(batch_format='pyarrow', batch_size=None)
             if t.num_rows and 'id_a' in t.column_names]
        ) if n_pairs else pa.table({'id_a': pa.array([], pa.int64()),
                                    'id_b': pa.array([], pa.int64())})
        if n_pairs == 0:
            return ray.data.from_arrow(pt.append_column(
                'jaccard', pa.array([], pa.float64())))
        ids_a = pt['id_a'].to_numpy(zero_copy_only=False).astype(np.int64)
        ids_b = pt['id_b'].to_numpy(zero_copy_only=False).astype(np.int64)
        involved = np.unique(np.concatenate([ids_a, ids_b]))
        inv_arr = pa.array(involved)

        def pick(t: pa.Table) -> pa.Table:
            m = pc.is_in(pc.cast(t[id_col], pa.int64()), value_set=inv_arr)
            return t.filter(m)

        texts: dict = {}
        for t in docs.map_batches(pick, batch_format='pyarrow') \
                     .iter_batches(batch_format='pyarrow', batch_size=None):
            for i, s in zip(t[id_col].to_pylist(), t[text_col].to_pylist()):
                texts[i] = s or ''
        ref = _ray.put(texts)

        def score_bcast(t: pa.Table) -> pa.Table:
            lookup = _ray.get(ref)
            a_ids = t['id_a'].to_pylist()
            b_ids = t['id_b'].to_pylist()
            if emit == 'counts':
                cs = [_counts(lookup.get(a, ''), lookup.get(b, ''))
                      for a, b in zip(a_ids, b_ids)]
                out = t.select(['id_a', 'id_b'])
                out = out.append_column('inter', pa.array([c[0] for c in cs], pa.int64()))
                return out.append_column('uni', pa.array([c[1] for c in cs], pa.int64()))
            if metric == 'word5':
                ta = pa.array([lookup.get(a, '') for a in a_ids], pa.large_string())
                tb = pa.array([lookup.get(b, '') for b in b_ids], pa.large_string())
                sims = pa.array(shingle_jaccard_batch(ta, tb), pa.float64())
            else:
                sims = pa.array([sim_fn(lookup.get(a, ''), lookup.get(b, ''))
                                 for a, b in zip(a_ids, b_ids)], pa.float64())
            out = t.select(['id_a', 'id_b']).append_column('jaccard', sims)
            return out.filter(pc.greater_equal(sims, threshold))

        return ray.data.from_arrow(pt).map_batches(score_bcast, batch_format='pyarrow')

    def _side(a_or_b: str):
        def fn(t: pa.Table) -> pa.Table:
            # fixed types (int64 id, large_string text) so empty-block
            # rebuilds elsewhere in the chain match exactly
            return pa.table({f'id_{a_or_b}': t[id_col].combine_chunks().cast(pa.int64()),
                             f'__text_{a_or_b}': t[text_col].combine_chunks().cast(pa.large_string())})
        return fn

    side_a = docs.map_batches(_side('a'), batch_format='pyarrow')
    side_b = docs.map_batches(_side('b'), batch_format='pyarrow')

    def _norm_pairs(t: pa.Table) -> pa.Table:
        # schema-less empty blocks (groupby on empty partitions) would break
        # the join's key-field resolution; rebuild schema-complete (int64 ids)
        if t.num_rows == 0 or 'id_a' not in t.column_names:
            e = pa.array([], pa.int64())
            return pa.table({'id_a': e, 'id_b': e})
        return t.select(['id_a', 'id_b'])

    def _norm_mid(t: pa.Table) -> pa.Table:
        # join #1's output can itself contain schema-less empty partitions
        # (sparse keys at small inputs); rebuild them schema-complete so the
        # CHAINED join resolves its key fields on every partition
        if t.num_rows == 0 or 'id_b' not in t.column_names:
            e = pa.array([], pa.int64())
            return pa.table({'id_a': e, 'id_b': e,
                             '__text_a': pa.array([], pa.large_string())})
        return t.select(['id_a', 'id_b', '__text_a'])

    # coalesce after the normalization: restores the dataset-level schema that
    # schema-less empty blocks destroyed (the join op builds its empty
    # partitions from it, and acero errors on missing key fields otherwise)
    pairs = pairs.map_batches(_norm_pairs, batch_format='pyarrow').repartition(num_partitions)
    j = pairs.join(side_a, 'inner', num_partitions, on=('id_a',))
    # the same coalescing repartition after the mid normalization: without it
    # the chained join can plan against a still-schema-less dataset view of
    # join #1's output (observed as a flaky acero 'no match for key field
    # id_b' depending on which partitions come up empty)
    j = j.map_batches(_norm_mid, batch_format='pyarrow').repartition(num_partitions)
    j = j.join(side_b, 'inner', num_partitions, on=('id_b',))

    sim_fn = shingle_jaccard if metric == 'word5' else ngram_jaccard

    def score(t: pa.Table) -> pa.Table:
        if emit == 'counts':
            cs = [_counts(a or '', b or '')
                  for a, b in zip(t['__text_a'].to_pylist(), t['__text_b'].to_pylist())]
            out = t.drop_columns(['__text_a', '__text_b'])
            out = out.append_column('inter', pa.array([c[0] for c in cs], pa.int64()))
            return out.append_column('uni', pa.array([c[1] for c in cs], pa.int64()))
        if metric == 'word5':
            sims = pa.array(shingle_jaccard_batch(t['__text_a'], t['__text_b']),
                            pa.float64())
        else:
            sims = pa.array([sim_fn(a or '', b or '')
                             for a, b in zip(t['__text_a'].to_pylist(), t['__text_b'].to_pylist())],
                            pa.float64())
        t = t.drop_columns(['__text_a', '__text_b']).append_column('jaccard', sims)
        return t.filter(pc.greater_equal(sims, threshold))

    return j.map_batches(score, batch_format='pyarrow')


# --------------------------------------------------------------------------
# exact duplicated-span detection (substring dedup, Lee et al. 2022 shape)
# --------------------------------------------------------------------------

def dup_spans(ds: 'ray.data.Dataset', id_col: str = 'doc_id',
              text_col: str = 'text', k: int = 8,
              token_rx: str = '[^0-9A-Za-z_]+',
              num_partitions: int = 16,
              small: bool = False) -> 'ray.data.Dataset':
    """Documents sharing an exact word ``k``-gram span with ANY other
    document: returns (id_col, n_dup_spans) for affected docs, where
    ``n_dup_spans`` counts the doc's DISTINCT k-grams that occur in at
    least one other document.  This is the detection half of exact
    substring deduplication ("Deduplicating Training Data Makes Language
    Models Better", Lee et al. 2022) expressed suffix-array-free: span
    identity is the 64-bit rolling k-gram hash shared with the MinHash /
    decontamination kernels.

    Scale shape — two keyed exchanges, nothing driver-side:
    1. map_batches: tokenize + window-hash + per-doc unique -> (gram, doc)
       pairs (a doc lives in one batch, so pairs are globally unique);
    2. keyed repartition on a gram-hash bucket co-locates each gram, a
       block-local sort + run-length scan keeps pairs whose gram run spans
       >= 2 docs AND collapses them to per-block (doc, partial-count) rows
       (no join, no per-pair rows past this point);
    3. grouped sum over the tiny partials (single task when the plan knows
       the corpus is small, hash groupby otherwise).
    Gram hashes are 8-byte fixed-width, so the gram exchange ships ~16
    bytes a pair regardless of span length; the count exchange ships at
    most one row per (block, doc)."""
    from ..engine.dedup import ensure_hash_shuffle
    from .agg import grouped_agg
    from .text import regex_tokens
    ensure_hash_shuffle()

    def pairs_fn(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        flat, counts = regex_tokens(t[text_col], token_rx)
        if not len(flat):
            e = pa.array([], pa.int64())
            return pa.table({'gram': pa.array([], pa.int64()), id_col: e})
        wh, wcounts = _window_hashes(_hash_tokens(flat), counts, k)
        doc = np.repeat(np.arange(len(counts)), wcounts)
        real = (counts >= k)[doc]
        wh, doc = wh[real], doc[real]
        if not len(wh):
            e = pa.array([], pa.int64())
            return pa.table({'gram': pa.array([], pa.int64()), id_col: e})
        # per-doc unique grams: lexsort + boundary scan (doc-major)
        order = np.lexsort((wh, doc))
        wh, doc = wh[order], doc[order]
        first = np.empty(len(wh), dtype=bool)
        first[0] = True
        first[1:] = (wh[1:] != wh[:-1]) | (doc[1:] != doc[:-1])
        # int64 bit-view of the uint64 hashes: Ray's hash shuffle keys on
        # native Arrow ints (uint64 keys fall back to pickled objects)
        return pa.table({'gram': pa.array(wh[first].view(np.int64)),
                         id_col: pa.array(ids[doc[first]])})

    pairs = ds.map_batches(pairs_fn, batch_format='pyarrow')

    def add_bucket(t: pa.Table) -> pa.Table:
        h = t['gram'].to_numpy(zero_copy_only=False) % num_partitions
        return t.append_column('__bucket', pa.array(np.abs(h)))

    colocated = (pairs.map_batches(add_bucket, batch_format='pyarrow')
                 .repartition(num_partitions, keys=['__bucket'], sort=False))

    def keep_shared(t: pa.Table) -> pa.Table:
        empty = pa.table({id_col: pa.array([], pa.int64()),
                          '__n': pa.array([], pa.int64())})
        if t.num_rows == 0 or 'gram' not in t.column_names:
            return empty
        g = t['gram'].to_numpy(zero_copy_only=False)
        docs = t[id_col].to_numpy(zero_copy_only=False)
        order = np.argsort(g, kind='stable')
        gs = g[order]
        new = np.empty(len(gs), dtype=bool)
        new[0] = True
        new[1:] = gs[1:] != gs[:-1]
        run_id = np.cumsum(new) - 1
        run_len = np.bincount(run_id)
        shared = run_len[run_id] >= 2   # pairs are globally (gram, doc) unique
        if not shared.any():
            return empty
        # collapse to per-doc partial counts before the final exchange
        d, n = np.unique(docs[order][shared], return_counts=True)
        return pa.table({id_col: pa.array(d),
                         '__n': pa.array(n.astype(np.int64))})

    flagged = colocated.map_batches(keep_shared, batch_format='pyarrow')
    return grouped_agg(flagged, [id_col],
                       [('__n', 'sum', 'n_dup_spans')], small=small)


def remove_dup_spans(ds: 'ray.data.Dataset', id_col: str = 'doc_id',
                     text_col: str = 'text', k: int = 8,
                     token_rx: str = '[^0-9A-Za-z_]+',
                     num_partitions: int = 16,
                     max_shared: int = 5_000_000) -> 'ray.data.Dataset':
    """The REWRITE half of exact substring deduplication (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"): every
    token covered by a word ``k``-gram occurring in >= 2 documents is
    dropped, and each document's kept tokens re-join with single spaces
    (token-level semantics — separators normalize, mirrored in SQL).
    Returns (id_col, clean_text, n_removed).

    Scale shape: pass A is the :func:`dup_spans` gram exchange, but the
    gram-partitioned blocks emit the globally-shared GRAM HASHES
    themselves (each gram lives in exactly one partition, so block-local
    distinct is global); the set streams to the driver under
    ``max_shared`` (the decontamination broadcast pattern — raise the
    threshold k or the cap when a corpus exceeds it) and broadcasts via
    one ``ray.put``.  Pass B is one zero-shuffle map per batch: recompute
    rolling window hashes, ``np.isin`` against the broadcast set, mark
    coverage with a difference array (+1 at span start, -1 past its end;
    spans never cross documents, so one global cumsum is exact), rebuild
    texts with an offset gather — no per-row Python anywhere."""
    import ray as _ray

    from ..engine.dedup import ensure_hash_shuffle
    from .text import regex_tokens
    ensure_hash_shuffle()

    def pairs_fn(t: pa.Table) -> pa.Table:
        flat, counts = regex_tokens(t[text_col], token_rx)
        if not len(flat):
            e = pa.array([], pa.int64())
            return pa.table({'gram': e, '__doc': e})
        wh, wcounts = _window_hashes(_hash_tokens(flat), counts, k)
        doc = np.repeat(np.arange(len(counts)), wcounts)
        real = (counts >= k)[doc]
        wh, doc = wh[real], doc[real]
        if not len(wh):
            e = pa.array([], pa.int64())
            return pa.table({'gram': e, '__doc': e})
        order = np.lexsort((wh, doc))
        wh, doc = wh[order], doc[order]
        first = np.empty(len(wh), dtype=bool)
        first[0] = True
        first[1:] = (wh[1:] != wh[:-1]) | (doc[1:] != doc[:-1])
        # block-scoped doc tags are fine: only gram identity leaves pass A
        return pa.table({'gram': pa.array(wh[first].view(np.int64)),
                         '__doc': pa.array(doc[first])})

    def add_bucket(t: pa.Table) -> pa.Table:
        h = t['gram'].to_numpy(zero_copy_only=False) % num_partitions
        return t.append_column('__bucket', pa.array(np.abs(h)))

    colocated = (ds.map_batches(pairs_fn, batch_format='pyarrow')
                 .map_batches(add_bucket, batch_format='pyarrow')
                 .repartition(num_partitions, keys=['__bucket'], sort=False))

    def shared_grams(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or 'gram' not in t.column_names:
            return pa.table({'gram': pa.array([], pa.int64())})
        g = t['gram'].to_numpy(zero_copy_only=False)
        # unique grams with >= 2 (gram, doc) pairs — pairs are per-doc
        # unique, so a repeat means a second document
        uniq, cnt = np.unique(g, return_counts=True)
        return pa.table({'gram': pa.array(uniq[cnt >= 2])})

    parts, total = [], 0
    for t in colocated.map_batches(shared_grams,
                                   batch_format='pyarrow',
                                   batch_size=None) \
                      .iter_batches(batch_format='pyarrow'):
        parts.append(t['gram'].to_numpy(zero_copy_only=False))
        total += t.num_rows
        if total > max_shared:
            raise ValueError(
                f'shared-gram set exceeds max_shared={max_shared}; raise k '
                f'or max_shared (the set must fit one broadcast)')
    shared = np.sort(np.concatenate(parts)) if parts else np.zeros(0, np.int64)
    ref = _ray.put(shared)

    def rewrite(t: pa.Table) -> pa.Table:
        sh = _ray.get(ref)
        flat, counts = regex_tokens(t[text_col], token_rx)
        ndoc = t.num_rows
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        ntok = int(counts.sum())
        keep = np.ones(ntok, dtype=bool)
        if ntok and len(sh):
            wh, wcounts = _window_hashes(_hash_tokens(flat), counts, k)
            wdoc = np.repeat(np.arange(ndoc), wcounts)
            win_off = np.concatenate(([0], np.cumsum(wcounts)))[:-1]
            within = (np.arange(int(wcounts.sum()))
                      - np.repeat(win_off, wcounts))
            tok_off = np.concatenate(([0], np.cumsum(counts)))[:-1]
            gstart = tok_off[wdoc] + within
            hit = np.isin(wh.view(np.int64), sh) & (counts >= k)[wdoc]
            diff = np.zeros(ntok + 1, np.int64)
            np.add.at(diff, gstart[hit], 1)
            np.add.at(diff, gstart[hit] + k, -1)
            keep = ~(np.cumsum(diff[:-1]) > 0)
        tdoc = np.repeat(np.arange(ndoc), counts)
        kept_per_doc = np.bincount(tdoc[keep], minlength=ndoc)
        offsets = pa.array(
            np.concatenate(([0], np.cumsum(kept_per_doc))).astype(np.int32))
        kept_flat = flat.filter(pa.array(keep))
        if isinstance(kept_flat, pa.ChunkedArray):
            kept_flat = kept_flat.combine_chunks()
        lists = pa.ListArray.from_arrays(offsets,
                                         pc.cast(kept_flat, pa.string()))
        return pa.table({
            id_col: t[id_col],
            'clean_text': pc.cast(pc.binary_join(lists, ' '), pa.string()),
            'n_removed': pa.array(
                (counts - kept_per_doc).astype(np.int64))})

    return ds.map_batches(rewrite, batch_format='pyarrow')


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount for uint64 arrays (numpy<2 has no
    bitwise_count): unpack the raw bytes to bits and sum per word."""
    return np.unpackbits(x.view(np.uint8)).reshape(-1, 64).sum(axis=1) \
        .astype(np.int64)


def simhash_neardup_pairs(ds: ray.data.Dataset, id_col: str = 'doc_id',
                          text_col: str = 'text', max_hamming: int = 3,
                          all_pairs_cap: int = 256,
                          num_partitions: 'int | None' = None,
                          small: bool = False,
                          sig_cap: int = 50_000_000) -> ray.data.Dataset:
    """The third near-dup family end-to-end (beside MinHash and embedding
    LSH): document pairs whose 64-bit SimHash signatures are within
    ``max_hamming``.  Hamming-ball banding by pigeonhole: the signature
    splits into ``max_hamming + 1`` equal segments, and a pair differing
    in ≤ ``max_hamming`` bits touches ≤ ``max_hamming`` segments, so it
    agrees EXACTLY on at least one — candidates come from one
    segment-keyed exchange (the MinHash ``_bucket_pairs`` machinery,
    hot-bucket guard included), then exact popcount verification runs
    against a broadcast (id → signature) table (``sig_cap`` bounds the
    broadcast; at web scale shard the verify by id range instead).
    Returns (id_a, id_b, hamming) with ``id_a < id_b``."""
    import ray as _ray

    # materialize the signatures ONCE: both the broadcast collect and the
    # banding pass read them, and a lazy Dataset would re-run the kernel
    # for each consumer (signatures are 16 bytes/doc — tiny vs the text)
    sigs = simhash(ds.select_columns([id_col, text_col])) \
        .select_columns([id_col, 'simhash']).materialize()
    nseg = max_hamming + 1
    width = 64 // nseg

    # collect + broadcast the signature table once (also used to band —
    # the corpus passes the kernel exactly once)
    parts_i, parts_s = [], []
    total = 0
    for t in sigs.iter_batches(batch_format='pyarrow'):
        parts_i.append(pc.cast(t[id_col], pa.int64()).to_numpy(
            zero_copy_only=False))
        parts_s.append(t['simhash'].to_numpy(zero_copy_only=False)
                       .astype(np.uint64))
        total += t.num_rows
        if total > sig_cap:
            raise ValueError(f'signature table exceeds sig_cap={sig_cap}')
    ids = np.concatenate(parts_i) if parts_i else np.empty(0, np.int64)
    sg = np.concatenate(parts_s) if parts_s else np.empty(0, np.uint64)
    order = np.argsort(ids, kind='stable')
    ids, sg = ids[order], sg[order]
    ref = _ray.put((ids, sg))

    def bands_fn(t: pa.Table) -> pa.Table:
        s = t['simhash'].to_numpy(zero_copy_only=False).astype(np.uint64)
        did = pc.cast(t[id_col], pa.int64()).to_numpy(zero_copy_only=False)
        mask = np.uint64((1 << width) - 1)
        bb, hh, ii = [], [], []
        for seg in range(nseg):
            bb.append(np.full(len(s), seg, np.int32))
            hh.append((s >> np.uint64(seg * width)) & mask)
            ii.append(did)
        return pa.table({'band': pa.array(np.concatenate(bb)),
                         'band_hash': pa.array(np.concatenate(hh)),
                         id_col: pa.array(np.concatenate(ii))})

    band_ds = sigs.map_batches(bands_fn, batch_format='pyarrow')
    pairs = _bucket_pairs(band_ds, id_col, all_pairs_cap=all_pairs_cap,
                          num_partitions=num_partitions, small=small)

    def verify(t: pa.Table) -> pa.Table:
        empty = pa.table({'id_a': pa.array([], pa.int64()),
                          'id_b': pa.array([], pa.int64()),
                          'hamming': pa.array([], pa.int64())})
        if t.num_rows == 0 or 'id_a' not in t.column_names:
            return empty
        sid, ssig = _ray.get(ref)
        a = pc.cast(t['id_a'], pa.int64()).to_numpy(zero_copy_only=False)
        b = pc.cast(t['id_b'], pa.int64()).to_numpy(zero_copy_only=False)
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        sa = ssig[np.searchsorted(sid, lo)]
        sb = ssig[np.searchsorted(sid, hi)]
        hd = _popcount64(sa ^ sb)
        keep = hd <= max_hamming
        return pa.table({'id_a': pa.array(lo[keep]),
                         'id_b': pa.array(hi[keep]),
                         'hamming': pa.array(hd[keep])})

    verified = pairs.map_batches(verify, batch_format='pyarrow')
    # the same pair can surface from different bands in DIFFERENT blocks;
    # a grouped min (hamming is identical for every copy) is the global
    # distinct — block partials first, so duplicates collapse pre-exchange
    from .agg import grouped_agg
    return grouped_agg(verified, ['id_a', 'id_b'],
                       [('hamming', 'min', 'hamming')], small=small)
