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


def distinct(ds: ray.data.Dataset, cols: list[str], num_partitions: int | None = None) -> ray.data.Dataset:
    """Globally exact distinct over ``cols`` (which must be all columns)."""
    cols = list(cols)
    ds = ds.map_batches(_local_distinct(cols), batch_format='pyarrow')
    try:
        ds = ds.repartition(num_blocks=num_partitions, keys=cols, sort=False)
    except Exception:
        # fallback: sort-based grouped count, then drop the count column
        agg = ds.groupby(cols, num_partitions=num_partitions).count()
        return agg.select_columns(cols)
    return ds.map_batches(_local_distinct(cols), batch_format='pyarrow')
