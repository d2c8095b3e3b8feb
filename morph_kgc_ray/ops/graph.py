"""Graph operators over an edge Dataset: fixed-point PageRank.

The web-KG flagship materializes a graph; this module adds the canonical
whole-graph analytics step a crawl/KG pipeline runs next (link authority
for crawl prioritization / entity salience).  The reference engine has no
graph analytics; this extends the engine the same way the dedup/window
operators do.

Semantics (deliberately SQL-replicable so the DuckDB oracle can gate it
hash-exactly):

- ranks are int64 FIXED-POINT (``scale`` units of total mass, default
  1e12).  Integer sums are associative and order-independent, so the
  distributed result is bit-identical to the SQL twin — no float drift.
- ``r0(v) = scale // N`` for every node.
- per iteration: ``contrib(u) = r(u) // outdeg(u)`` for nodes with
  out-edges; ``r'(v) = (15 * (scale // N)) // 100 + (85 * inflow(v)) // 100``
  where ``inflow(v)`` sums contrib over in-edges (standard d=0.85 PageRank
  in fixed point; dangling-node mass leaks, i.e. no redistribution —
  documented, mirrored in SQL).

Three plans, coarsest honest fit wins (all bit-identical, parity-tested):

- driver fast path (``edges <= edge_cap``): one streamed collect of the
  integer edge list, then vectorized ``np.add.at`` iterations — exact, no
  per-row Python.  The cap bounds driver memory (the ops.dedup union-find
  precedent).
- broadcast plan (``nodes <= node_cap``): edges stay a Dataset of any
  size; the node-sized state vector broadcasts via ``ray.put`` per round,
  each edge block scatters into a dense local vector, and vectors
  tree-fold in the data plane — no joins, no row exchange (measured 34×
  the row-exchange plan at 3M edges: Ray's hash aggregate spent ~15 s on
  2.4M partial rows that the fold moves as a handful of 8n-byte buffers).
- distributed join plan (fallback): each iteration is ONE hash join
  (edges × ranks on src) + ONE grouped sum (inflow by dst), with the
  node-sized rank table materialized between iterations.  Nothing
  node-sized ever leaves the data plane; edges are never materialized.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def _base(scale: int, n: int) -> int:
    return (15 * (scale // n)) // 100


def pagerank(edges: ray.data.Dataset, num_nodes: int,
             src_col: str = 'src', dst_col: str = 'dst',
             num_iters: int = 3, scale: int = 10 ** 12,
             edge_cap: int = 5_000_000, node_cap: int = 4_000_000,
             num_partitions: 'int | None' = None) -> ray.data.Dataset:
    """Fixed-point PageRank over ``edges``; node ids must be dense ints in
    ``[0, num_nodes)``.  Returns a Dataset of ``(node, rank_fp)`` covering
    every node.  Three plans, coarsest honest fit wins (all bit-identical,
    parity-tested):

    - edges ≤ ``edge_cap``: driver fast path (one streamed collect).
    - nodes ≤ ``node_cap`` (32 MB of int64 ranks at the default — each
      edge block also allocates one such dense vector): edges stay a
      Dataset of any size; the rank vector broadcasts via ``ray.put``
      each iteration and per-block dense inflow vectors tree-fold in the
      data plane — no joins, no row exchange (the broadcast-small-side
      pattern; at web scale edges outnumber nodes ~10:1, so this is the
      common regime).
    - otherwise: fully distributed join-per-iteration plan (nothing
      node-sized ever leaves the data plane)."""
    n_edges = edges.count()
    if n_edges <= edge_cap:
        return _pagerank_local(edges, num_nodes, src_col, dst_col,
                               num_iters, scale)
    if num_nodes <= node_cap:
        return _pagerank_broadcast(edges, num_nodes, src_col, dst_col,
                                   num_iters, scale)
    return _pagerank_distributed(edges, num_nodes, src_col, dst_col,
                                 num_iters, scale, num_partitions)


def _pagerank_local(edges, n, src_col, dst_col, k, scale):
    src_parts, dst_parts = [], []
    for t in edges.iter_batches(batch_format='pyarrow'):
        src_parts.append(pc.cast(t[src_col], pa.int64()).to_numpy(
            zero_copy_only=False))
        dst_parts.append(pc.cast(t[dst_col], pa.int64()).to_numpy(
            zero_copy_only=False))
    src = np.concatenate(src_parts) if src_parts else np.empty(0, np.int64)
    dst = np.concatenate(dst_parts) if dst_parts else np.empty(0, np.int64)
    outdeg = np.bincount(src, minlength=n).astype(np.int64)
    ranks = np.full(n, scale // n, dtype=np.int64)
    base = _base(scale, n)
    for _ in range(k):
        contrib = np.where(outdeg > 0, ranks // np.maximum(outdeg, 1), 0)
        inflow = np.zeros(n, dtype=np.int64)
        np.add.at(inflow, dst, contrib[src])
        ranks = base + (85 * inflow) // 100
    return ray.data.from_arrow(pa.table({
        'node': pa.array(np.arange(n, dtype=np.int64)),
        'rank_fp': pa.array(ranks)}))


def _fold_dense_vectors(ds: ray.data.Dataset, n: int, fan_in: int = 8,
                        op=None, init: int = 0) -> np.ndarray:
    """Reduce a Dataset of one-row dense int64 vectors (``vec``
    large_binary, 8n bytes each) into one numpy vector with an
    associative elementwise ``op`` (default add; ``np.minimum`` for
    min-label folds): one data-plane fold level (``fan_in`` vectors per
    task) then a driver fold of the few survivors — the driver never
    touches more than a handful of vectors."""
    op = op or np.add

    def fold(t: pa.Table) -> pa.Table:
        acc = np.full(n, init, dtype=np.int64)
        for buf in t['vec'].to_pylist():
            acc = op(acc, np.frombuffer(buf, dtype=np.int64))
        return pa.table({'vec': pa.array([acc.tobytes()], pa.large_binary())})

    n_rows = ds.count()
    if n_rows > fan_in:
        ds = ds.repartition(max(1, n_rows // fan_in)) \
               .map_batches(fold, batch_format='pyarrow', batch_size=None)
    acc = np.full(n, init, dtype=np.int64)
    for t in ds.iter_batches(batch_format='pyarrow'):
        for buf in t['vec'].to_pylist():
            acc = op(acc, np.frombuffer(buf, dtype=np.int64))
    return acc


def _pagerank_broadcast(edges, n, src_col, dst_col, k, scale):
    """Edges distributed, node-sized state broadcast: per iteration each
    edge block gathers its sources' (rank // outdeg) from the broadcast
    vector and partial-sums inflow block-locally (np.add.at) into a DENSE
    8n-byte vector; vectors tree-fold in the data plane (no row exchange —
    Ray's hash aggregate cost ~15 s on the same partials) and the driver
    folds the node-sized result into the next broadcast.  Driver and
    broadcast memory are O(nodes), never O(edges)."""
    import ray as _ray

    def deg_vec(t: pa.Table) -> pa.Table:
        s = pc.cast(t[src_col], pa.int64()).to_numpy(zero_copy_only=False)
        acc = np.bincount(s, minlength=n).astype(np.int64)
        return pa.table({'vec': pa.array([acc.tobytes()], pa.large_binary())})

    outdeg = _fold_dense_vectors(
        edges.map_batches(deg_vec, batch_format='pyarrow'), n)
    deg_ref = _ray.put(np.maximum(outdeg, 1))

    base = _base(scale, n)
    ranks = np.full(n, scale // n, dtype=np.int64)
    for _ in range(k):
        rank_ref = _ray.put(ranks)

        def inflow_vec(t: pa.Table, _r=rank_ref, _d=deg_ref) -> pa.Table:
            r, d = _ray.get(_r), _ray.get(_d)
            s = pc.cast(t[src_col], pa.int64()).to_numpy(zero_copy_only=False)
            dst = pc.cast(t[dst_col], pa.int64()).to_numpy(
                zero_copy_only=False)
            contrib = r[s] // d[s]  # d >= 1; zero-outdeg nodes never appear as src
            acc = np.zeros(n, dtype=np.int64)
            np.add.at(acc, dst, contrib)
            return pa.table({'vec': pa.array([acc.tobytes()],
                                             pa.large_binary())})

        inflow = _fold_dense_vectors(
            edges.map_batches(inflow_vec, batch_format='pyarrow'), n)
        ranks = base + (85 * inflow) // 100
    return ray.data.from_arrow(pa.table({
        'node': pa.array(np.arange(n, dtype=np.int64)),
        'rank_fp': pa.array(ranks)}))


def _pagerank_distributed(edges, n, src_col, dst_col, k, scale,
                          num_partitions):
    from .agg import grouped_agg
    from ..engine.dedup import _ray_cpus, ensure_hash_shuffle
    ensure_hash_shuffle()
    nparts = num_partitions or max(8, _ray_cpus())

    deg = grouped_agg(edges.select_columns([src_col]), [src_col],
                      [(None, 'count', '__outdeg')])
    # static across iterations: every edge annotated with its source degree
    edeg = edges.select_columns([src_col, dst_col]).join(
        deg, 'inner', nparts, on=(src_col,)).materialize()

    base = _base(scale, n)
    nodes = ray.data.range(n).map_batches(
        lambda t: pa.table({'node': pc.cast(t['id'], pa.int64()),
                            'rank_fp': pa.array(
                                np.full(t.num_rows, scale // n, np.int64))}),
        batch_format='pyarrow')
    ranks = nodes.materialize()

    def contrib_fn(t: pa.Table) -> pa.Table:
        c = (pc.cast(t['rank_fp'], pa.int64()).to_numpy(zero_copy_only=False)
             // pc.cast(t['__outdeg'], pa.int64()).to_numpy(
                 zero_copy_only=False))
        return pa.table({'node': t[dst_col], '__in': pa.array(c)})

    def zero_inflow(t: pa.Table) -> pa.Table:
        return pa.table({'node': t['node'],
                         '__in': pa.array(np.zeros(t.num_rows, np.int64))})

    def finish(t: pa.Table) -> pa.Table:
        inflow = pc.cast(t['__in'], pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({'node': t['node'],
                         'rank_fp': pa.array(base + (85 * inflow) // 100)})

    for _ in range(k):
        joined = edeg.join(ranks, 'inner', nparts, on=(src_col,),
                           right_on=('node',))
        inflow = joined.map_batches(contrib_fn, batch_format='pyarrow')
        # union with zero rows so sink-less nodes keep their base rank
        both = inflow.union(ranks.map_batches(zero_inflow,
                                              batch_format='pyarrow'))
        summed = grouped_agg(both, ['node'], [('__in', 'sum', '__in')])
        ranks = summed.map_batches(finish,
                                   batch_format='pyarrow').materialize()
    return ranks


def connected_components(edges: ray.data.Dataset, src_col: str = 'src',
                         dst_col: str = 'dst', id_col: str = 'node',
                         num_nodes: 'int | None' = None,
                         node_cap: int = 4_000_000, max_rounds: int = 50,
                         **kwargs) -> ray.data.Dataset:
    """Connected-component labels (label = min id reachable in the
    component) over an arbitrary integer edge Dataset.  Only nodes
    incident to an edge are labeled; isolated nodes are their own trivial
    components by definition and are omitted, matching the SQL closure.

    Plans: with ``num_nodes`` given (ids dense in ``[0, num_nodes)``) and
    ≤ ``node_cap``, min-label propagation runs on the PageRank broadcast
    pattern — labels vector ``ray.put`` per round, per-block dense
    ``np.minimum`` scatter, data-plane min tree-fold, converging in
    diameter rounds with no joins (bit-identical to the general plan,
    parity-tested).  Otherwise it is a thin lift of
    :func:`morph_kgc_ray.ops.dedup.min_label_clusters` (convergent
    min-label propagation via keyed joins, driver union-find fast path
    below its edge cap) onto ``(src, dst)`` naming."""
    if num_nodes is not None and num_nodes <= node_cap:
        return _cc_broadcast(edges, num_nodes, src_col, dst_col, id_col,
                             max_rounds)
    from .dedup import min_label_clusters

    def rename(t: pa.Table) -> pa.Table:
        return pa.table({'id_a': pc.cast(t[src_col], pa.int64()),
                         'id_b': pc.cast(t[dst_col], pa.int64())})

    return min_label_clusters(edges.map_batches(rename, batch_format='pyarrow'),
                              id_col=id_col, **kwargs)


_SENT = np.iinfo(np.int64).max


def _cc_broadcast(edges, n, src_col, dst_col, id_col, max_rounds):
    import ray as _ray

    def incident_vec(t: pa.Table) -> pa.Table:
        s = pc.cast(t[src_col], pa.int64()).to_numpy(zero_copy_only=False)
        d = pc.cast(t[dst_col], pa.int64()).to_numpy(zero_copy_only=False)
        acc = np.zeros(n, dtype=np.int64)
        acc[s] = 1
        acc[d] = 1
        return pa.table({'vec': pa.array([acc.tobytes()], pa.large_binary())})

    incident = _fold_dense_vectors(
        edges.map_batches(incident_vec, batch_format='pyarrow'), n,
        op=np.maximum, init=0).astype(bool)

    labels = np.where(incident, np.arange(n, dtype=np.int64), _SENT)
    for _ in range(max_rounds):
        ref = _ray.put(labels)

        def min_nbr_vec(t: pa.Table, _r=ref) -> pa.Table:
            lab = _ray.get(_r)
            s = pc.cast(t[src_col], pa.int64()).to_numpy(zero_copy_only=False)
            d = pc.cast(t[dst_col], pa.int64()).to_numpy(zero_copy_only=False)
            acc = np.full(n, _SENT, dtype=np.int64)
            np.minimum.at(acc, s, lab[d])
            np.minimum.at(acc, d, lab[s])
            return pa.table({'vec': pa.array([acc.tobytes()],
                                             pa.large_binary())})

        folded = _fold_dense_vectors(
            edges.map_batches(min_nbr_vec, batch_format='pyarrow'), n,
            op=np.minimum, init=_SENT)
        new = np.minimum(labels, folded)
        if (new == labels).all():
            break
        labels = new
    idx = np.nonzero(incident)[0]
    return ray.data.from_arrow(pa.table({
        id_col: pa.array(idx.astype(np.int64)),
        'cluster_id': pa.array(labels[idx])}))
