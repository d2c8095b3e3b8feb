"""PageRank operator: driver fast path vs distributed join-per-iteration
plan must agree bit-for-bit (fixed-point integer semantics)."""

import numpy as np
import pyarrow as pa
import pytest

import ray


def _edges_table(n: int, seed: int = 7) -> pa.Table:
    rng = np.random.default_rng(seed)
    m = n * 3
    src = rng.integers(0, n, m).astype(np.int64)
    dst = rng.integers(0, n, m).astype(np.int64)
    # leave some nodes dangling / sink-only
    keep = src % 5 != 0
    return pa.table({'src': pa.array(src[keep]), 'dst': pa.array(dst[keep])})


def test_pagerank_plans_agree(ray_session):
    from morph_kgc_ray.ops.graph import pagerank

    n = 200
    edges = ray.data.from_arrow(_edges_table(n)).repartition(4)
    local = pagerank(edges, n).to_pandas().sort_values('node')
    bcast = pagerank(edges, n, edge_cap=0).to_pandas().sort_values('node')
    dist = pagerank(edges, n, edge_cap=0,
                    node_cap=0).to_pandas().sort_values('node')
    assert len(local) == n and len(bcast) == n and len(dist) == n
    assert (local['rank_fp'].to_numpy() == bcast['rank_fp'].to_numpy()).all()
    assert (local['rank_fp'].to_numpy() == dist['rank_fp'].to_numpy()).all()
    # total mass is bounded by the scale and every rank is >= the base term
    base = (15 * (10 ** 12 // n)) // 100
    assert (local['rank_fp'] >= base).all()
    assert local['rank_fp'].sum() <= 10 ** 12


def test_pagerank_no_edges(ray_session):
    from morph_kgc_ray.ops.graph import pagerank

    edges = ray.data.from_arrow(pa.table({
        'src': pa.array([], pa.int64()), 'dst': pa.array([], pa.int64())}))
    out = pagerank(edges, 5).to_pandas()
    base = (15 * (10 ** 12 // 5)) // 100
    assert sorted(out['rank_fp']) == [base] * 5


def test_connected_components_wrapper(ray_session):
    from morph_kgc_ray.ops.graph import connected_components

    edges = ray.data.from_arrow(pa.table({
        'src': pa.array([1, 2, 10, 30], pa.int64()),
        'dst': pa.array([2, 3, 11, 30], pa.int64())}))
    # driver union-find path and fixed-round distributed propagation agree
    fast = connected_components(edges).to_pandas()
    dist = connected_components(edges, rounds=4).to_pandas()
    want = {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 30: 30}
    for out in (fast, dist):
        assert dict(zip(out['node'], out['cluster_id'])) == want


def test_connected_components_broadcast_plan_parity(ray_session):
    """Dense-id broadcast CC (min-fold rounds) must match the union-find /
    join plans exactly, including long chains (convergence, not a fixed
    round count) and isolated nodes omitted."""
    from morph_kgc_ray.ops.graph import connected_components

    # chain 0-1-2-...-19 plus a separate pair and isolated nodes 30..39
    n = 40
    src = list(range(19)) + [25]
    dst = list(range(1, 20)) + [26]
    edges = ray.data.from_arrow(pa.table({
        'src': pa.array(src, pa.int64()),
        'dst': pa.array(dst, pa.int64())})).repartition(3)
    general = connected_components(edges).to_pandas()
    dense = connected_components(edges, num_nodes=n).to_pandas()
    as_map = lambda df: dict(zip(df['node'], df['cluster_id']))
    assert as_map(dense) == as_map(general)
    assert as_map(dense)[19] == 0 and as_map(dense)[26] == 25
    assert 30 not in as_map(dense)


def test_pagerank_broadcast_many_blocks(ray_session):
    """>fan_in edge blocks force the data-plane tree-fold level of
    _fold_dense_vectors; result must still match the driver fast path."""
    from morph_kgc_ray.ops.graph import pagerank

    n = 500
    edges = ray.data.from_arrow(_edges_table(n, seed=3)).repartition(20)
    local = pagerank(edges, n).to_pandas().sort_values('node')
    bcast = pagerank(edges, n, edge_cap=0).to_pandas().sort_values('node')
    assert (local['rank_fp'].to_numpy() == bcast['rank_fp'].to_numpy()).all()
