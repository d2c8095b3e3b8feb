"""Similarity search over an embedding column (list<float>).

- brute_force_topk: baseline — numpy matmul per batch against a broadcast
  query matrix (``ray.put`` once, read in every task), per-batch partial
  top-k then a tiny driver merge.  Linear scan, perfectly parallel.
- ivf_topk: scale path — bucket vectors by nearest of C centroids (one
  pass), search only the query's nprobe closest buckets.  Centroids are
  sampled deterministically; at 100 TB the bucketed layout would be written
  partitioned by centroid id so probes prune at the read.
"""

from __future__ import annotations

import heapq

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def vectors_to_ndarray(col, dtype=np.float64) -> np.ndarray:
    """(n, d) matrix from a fixed-dim ``list<float>`` column via
    ``pc.list_flatten(...).to_numpy().reshape`` — no Python-object
    round-trip (~10x over ``to_pylist()`` on the hot embedding kernels)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.zeros((0, 0), dtype=dtype)
    flat = pc.list_flatten(col)
    if len(flat) % n:
        raise ValueError(f'ragged embedding column: {len(flat)} values / {n} rows')
    arr = flat.to_numpy(zero_copy_only=False)
    return arr.astype(dtype, copy=False).reshape(n, len(flat) // n)


class _BatchTopK:
    """Stateless partial top-k per batch against the broadcast query matrix."""

    def __init__(self, queries_ref, k: int, id_col: str, vec_col: str):
        self.queries_ref = queries_ref
        self.k = k
        self.id_col = id_col
        self.vec_col = vec_col
        self._q = None

    def __call__(self, t: pa.Table) -> pa.Table:
        if self._q is None:
            self._q = ray.get(self.queries_ref)  # (qids, Q) read once per task/actor
        qids, Q = self._q
        ids = t[self.id_col].to_numpy(zero_copy_only=False)
        if len(ids) == 0:
            return pa.table({'query_id': pa.array([], pa.int64()), 'neighbor_id': pa.array([], pa.int64()),
                             'score': pa.array([], pa.float64())})
        V = _normalize(vectors_to_ndarray(t[self.vec_col], np.float64))
        sims = Q @ V.T  # (nq, nb)
        k = min(self.k, sims.shape[1])
        idx = np.argpartition(-sims, k - 1, axis=1)[:, :k]
        out_q, out_n, out_s = [], [], []
        for qi in range(sims.shape[0]):
            out_q.append(np.full(k, qids[qi], dtype=np.int64))
            out_n.append(ids[idx[qi]].astype(np.int64))
            out_s.append(sims[qi, idx[qi]].astype(np.float64))
        return pa.table({'query_id': pa.array(np.concatenate(out_q)),
                         'neighbor_id': pa.array(np.concatenate(out_n)),
                         'score': pa.array(np.concatenate(out_s))})


def brute_force_topk(ds: ray.data.Dataset, queries: np.ndarray, query_ids: np.ndarray,
                     k: int = 10, id_col: str = 'vec_id', vec_col: str = 'embedding') -> pa.Table:
    """Exact cosine top-k of each query over the dataset.

    Returns a pyarrow Table (query_id, neighbor_id, score) with exactly k
    neighbors per query (ties broken by ascending neighbor id)."""
    Q = _normalize(np.asarray(queries, dtype=np.float64))
    ref = ray.put((np.asarray(query_ids, dtype=np.int64), Q))
    partials = ds.map_batches(_BatchTopK(ref, k, id_col, vec_col), batch_format='pyarrow')

    # merge partial top-k on the driver (tiny: nq x k x num_blocks rows)
    best: dict[int, list] = {}
    for batch in partials.iter_batches(batch_size=65536, batch_format='pyarrow'):
        for qid, nid, s in zip(batch['query_id'].to_pylist(), batch['neighbor_id'].to_pylist(),
                               batch['score'].to_pylist()):
            heap = best.setdefault(qid, [])
            item = (s, -nid)  # ties -> smaller neighbor id wins
            if len(heap) < k:
                heapq.heappush(heap, item)
            elif item > heap[0]:
                heapq.heapreplace(heap, item)
    rows_q, rows_n, rows_s = [], [], []
    for qid in sorted(best):
        for s, negn in sorted(best[qid], reverse=True):
            rows_q.append(qid)
            rows_n.append(-negn)
            rows_s.append(s)
    return pa.table({'query_id': pa.array(rows_q, pa.int64()),
                     'neighbor_id': pa.array(rows_n, pa.int64()),
                     'score': pa.array(rows_s, pa.float64())})


def _hash_sample(ds: ray.data.Dataset, id_col: str, vec_col: str,
                 n_sample: int, seed: int) -> np.ndarray:
    """Deterministic distributed sample of ~n_sample vectors: keep rows whose
    Knuth-hashed id falls under the sampling threshold (uniform over ids, no
    sort, no first-N bias; each task filters its own batch)."""
    n = ds.count()
    frac = min(1.0, (1.25 * n_sample) / max(1, n))
    cutoff = np.uint64(int(frac * float(1 << 32)))
    mult = np.uint64(2654435761)
    s = np.uint64(seed)

    def keep(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = ((ids + s) * mult) & np.uint64(0xFFFFFFFF)
        return t.filter(pa.array(h < cutoff))

    chunks = [vectors_to_ndarray(b[vec_col], np.float32)
              for b in ds.map_batches(keep, batch_format='pyarrow')
                         .select_columns([vec_col])
                         .iter_batches(batch_format='pyarrow', batch_size=None)
              if b.num_rows]
    V = np.concatenate(chunks) if chunks else np.zeros((0, 1), np.float32)
    return V[:max(n_sample, 1)]


def kmeans_centroids(ds: ray.data.Dataset, num_centroids: int = 16, iters: int = 3,
                     seed: int = 42, id_col: str = 'vec_id',
                     vec_col: str = 'embedding') -> np.ndarray:
    """Spherical k-means centroids: seeded hash-sample init + ``iters`` Lloyd
    rounds where each batch emits only its (C x d) partial sums and counts —
    the full dataset never leaves the tasks, the driver reduces C x d x
    num_blocks floats (tiny)."""
    sample = _hash_sample(ds, id_col, vec_col, n_sample=max(50 * num_centroids, 256), seed=seed)
    rng = np.random.RandomState(seed)
    if len(sample) < num_centroids:  # degenerate tiny input
        reps = int(np.ceil(num_centroids / max(1, len(sample))))
        sample = np.tile(sample, (reps, 1))
    C = _normalize(sample[rng.permutation(len(sample))[:num_centroids]].astype(np.float64))

    for _ in range(iters):
        cref = ray.put(C.astype(np.float32))

        def partial(t: pa.Table) -> pa.Table:
            cents = ray.get(cref)
            V = _normalize(vectors_to_ndarray(t[vec_col], np.float32))
            if len(V) == 0:
                z = np.zeros_like(cents, dtype=np.float64)
                return pa.table({'cid': pa.array(np.arange(len(cents), dtype=np.int32)),
                                 'psum': pa.array(list(z), pa.list_(pa.float64())),
                                 'count': pa.array(np.zeros(len(cents), dtype=np.int64))})
            cid = (V @ cents.T).argmax(axis=1)
            onehot = np.zeros((len(V), len(cents)), dtype=np.float64)
            onehot[np.arange(len(V)), cid] = 1.0
            sums = onehot.T @ V.astype(np.float64)          # (C, d)
            counts = onehot.sum(axis=0).astype(np.int64)    # (C,)
            return pa.table({'cid': pa.array(np.arange(len(cents), dtype=np.int32)),
                             'psum': pa.array(list(sums), pa.list_(pa.float64())),
                             'count': pa.array(counts)})

        acc = np.zeros_like(C)
        cnt = np.zeros(len(C), dtype=np.int64)
        for r in ds.map_batches(partial, batch_format='pyarrow').take_all():
            acc[r['cid']] += np.asarray(r['psum'])
            cnt[r['cid']] += r['count']
        nonempty = cnt > 0
        C[nonempty] = _normalize(acc[nonempty] / cnt[nonempty, None])
        # empty centroids keep their previous position (spherical k-means)
    return C.astype(np.float32)


def ivf_assign(ds: ray.data.Dataset, num_centroids: int = 16, seed: int = 42,
               id_col: str = 'vec_id', vec_col: str = 'embedding',
               kmeans_iters: int = 3) -> tuple:
    """Assign each vector to its nearest k-means centroid (one matmul per
    batch against the ray.put-broadcast centroid matrix).  Returns
    (assigned_ds with 'centroid_id' column, centroids ndarray)."""
    C = kmeans_centroids(ds, num_centroids=num_centroids, iters=kmeans_iters,
                         seed=seed, id_col=id_col, vec_col=vec_col)
    cref = ray.put(C)

    def assign(t: pa.Table) -> pa.Table:
        cents = ray.get(cref)
        V = _normalize(vectors_to_ndarray(t[vec_col], np.float32))
        cid = (V @ cents.T).argmax(axis=1).astype(np.int32)
        return t.append_column('centroid_id', pa.array(cid))

    return ds.map_batches(assign, batch_format='pyarrow'), C


def ivf_build(ds: ray.data.Dataset, index_dir: str, num_centroids: int = 16,
              seed: int = 42, id_col: str = 'vec_id', vec_col: str = 'embedding') -> np.ndarray:
    """Materialize the IVF layout: vectors written as Parquet partitioned by
    ``centroid_id`` (one directory per bucket) so probes prune at the READ —
    a query touching nprobe buckets scans only those directories.  Returns
    the centroid matrix; persist it next to the index."""
    import json
    import os
    assigned, C = ivf_assign(ds, num_centroids=num_centroids, seed=seed,
                             id_col=id_col, vec_col=vec_col)
    assigned.write_parquet(index_dir, partition_cols=['centroid_id'])
    with open(os.path.join(index_dir, '_CENTROIDS.json'), 'w', encoding='utf-8') as f:
        json.dump(C.tolist(), f)
    return C


def ivf_probe(index_dir: str, queries: np.ndarray, query_ids: np.ndarray, k: int = 10,
              nprobe: int = 4, id_col: str = 'vec_id', vec_col: str = 'embedding') -> pa.Table:
    """Search a built IVF layout: read ONLY the nprobe bucket directories
    nearest each query (partition pruning at the read), then exact top-k."""
    import json
    import os
    import ray.data as rd
    with open(os.path.join(index_dir, '_CENTROIDS.json'), encoding='utf-8') as f:
        C = np.asarray(json.load(f), dtype=np.float32)
    Q = _normalize(np.asarray(queries, dtype=np.float32))
    probes = np.argsort(-(Q @ C.T), axis=1)[:, :nprobe]
    wanted = sorted({int(c) for row in probes for c in row})
    import glob
    paths = [f for c in wanted
             for f in sorted(glob.glob(os.path.join(index_dir, f'centroid_id={c}', '*.parquet')))]
    from ..sources.readers import read_parquet_clean
    ds = read_parquet_clean(paths, columns=[id_col, vec_col])
    return brute_force_topk(ds, queries, query_ids, k=k, id_col=id_col, vec_col=vec_col)


def ivf_topk(ds: ray.data.Dataset, queries: np.ndarray, query_ids: np.ndarray, k: int = 10,
             num_centroids: int = 16, nprobe: int = 4, id_col: str = 'vec_id',
             vec_col: str = 'embedding') -> pa.Table:
    """Approximate top-k: search only the nprobe buckets nearest each query."""
    assigned, C = ivf_assign(ds, num_centroids=num_centroids, id_col=id_col, vec_col=vec_col)
    Q = _normalize(np.asarray(queries, dtype=np.float32))
    probes = np.argsort(-(Q @ C.T), axis=1)[:, :nprobe]  # (nq, nprobe)
    wanted = sorted({int(c) for row in probes for c in row})

    def keep(t: pa.Table) -> pa.Table:
        mask = pa.compute.is_in(t['centroid_id'], value_set=pa.array(wanted, pa.int32()))
        return t.filter(mask)

    filtered = assigned.map_batches(keep, batch_format='pyarrow')
    return brute_force_topk(filtered, queries, query_ids, k=k, id_col=id_col, vec_col=vec_col)


def quantize_embeddings(ds: ray.data.Dataset, id_col: str = 'vec_id',
                        vec_col: str = 'embedding') -> ray.data.Dataset:
    """Symmetric per-vector int8 quantization — the standard 4x memory
    reduction before ANN at corpus scale.  q = floor(x * 127.0 / max|x|
    + 0.5) in float64 (an explicit formula a SQL oracle can replicate
    bit-for-bit; floor(+0.5) avoids the round-half-to-even vs
    half-away-from-zero mismatch between numpy and SQL engines), scale =
    max|x| / 127 recovers x ~= q * scale.  All-zero vectors quantize to
    zeros with scale 0."""

    def fn(t: pa.Table) -> pa.Table:
        m = vectors_to_ndarray(t[vec_col], dtype=np.float64)
        mx = np.abs(m).max(axis=1)
        safe = np.where(mx == 0, 1.0, mx)
        q = np.floor(m * 127.0 / safe[:, None] + 0.5)
        q[mx == 0] = 0.0
        qi = q.astype(np.int8)
        offsets = np.arange(0, (len(m) + 1) * m.shape[1], m.shape[1], dtype=np.int32)
        qlist = pa.ListArray.from_arrays(pa.array(offsets), pa.array(qi.ravel()))
        return pa.table({id_col: t[id_col],
                         'scale': pa.array(mx / 127.0),
                         'q': qlist})

    return ds.map_batches(fn, batch_format='pyarrow')
