"""Distributed exact distinct for Datasets.

Strategy (scale-first):
  1. block-local distinct inside map_batches (Arrow group_by, no shuffle) —
     cuts shuffle volume before any exchange;
  2. hash-repartition by key columns (``repartition(keys=...)``, hash-shuffle
     based) so equal rows co-locate;
  3. block-local distinct again — now globally exact.

Falls back to a sort-based ``groupby().count()`` pipeline when the installed
Ray lacks key-based repartitioning.  This replaces the reference's per-group
in-memory ``set(data['triple'])`` (materializer.py:1043-1064) with an
exchange that scales past a single node's RAM.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data


def _local_distinct(cols):
    from .kernels import table_distinct
    colset = list(cols)

    def fn(table: pa.Table) -> pa.Table:
        if table.num_rows == 0:
            return table
        return table_distinct(table.select(colset))
    return fn


def ensure_hash_shuffle() -> bool:
    """Key-based repartition needs the hash-shuffle strategy; enable it once
    per process.  Returns False if this Ray build lacks it (sort fallback)."""
    try:
        import os

        from ray.data.context import ShuffleStrategy
        ctx = ray.data.DataContext.get_current()
        if ctx.shuffle_strategy != ShuffleStrategy.HASH_SHUFFLE:
            ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
        # cap shuffle-aggregator actors and their CPU claims so they never
        # starve (or deadlock) the map/actor stages: Ray sizes aggregator CPU
        # demand as num_partitions x per-partition override, and its defaults
        # (200 partitions, 1 CPU per aggregator) exceed a small node.  These
        # settings keep total aggregator demand well under the smallest bench
        # cluster (8 CPUs) while still fanning out on larger ones.
        ncpu = os.cpu_count() or 8
        ctx.max_hash_shuffle_aggregators = max(2, min(8, ncpu // 4))
        ctx.default_hash_shuffle_parallelism = 32
        ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = 0.01
        ctx.hash_aggregate_operator_actor_num_cpus_per_partition_override = 0.01
        return True
    except Exception:
        return False


def distinct(ds: ray.data.Dataset, cols: list[str], num_partitions: int | None = None) -> ray.data.Dataset:
    """Globally exact distinct over ``cols`` (which must be all columns)."""
    cols = list(cols)
    ds = ds.map_batches(_local_distinct(cols), batch_format='pyarrow')
    if ensure_hash_shuffle():
        ds = ds.repartition(num_blocks=num_partitions or 16, keys=cols, sort=False)
        return ds.map_batches(_local_distinct(cols), batch_format='pyarrow')
    # fallback: sort-based grouped count, then drop the count column
    agg = ds.groupby(cols, num_partitions=num_partitions).count()
    return agg.select_columns(cols)
