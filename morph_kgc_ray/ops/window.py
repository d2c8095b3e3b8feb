"""Windowed event operators Ray Data lacks natively: sessionization
(gaps-and-islands windowed aggregate) and a point-in-time as-of join.

Both share ONE physical plan — co-locate every row of a key into a single
block with a hash-keyed exchange, then run a fully-vectorized numpy scan
over the block sorted by (key, ts, id):

  read (pruned columns) -> map_batches(bucket = hash(key) % P)
    -> repartition(P, keys=['__bucket'])         [the ONE shuffle]
    -> map_batches(sorted gap-scan / forward-fill, batch_size=None)

Partitioning assumption (documented per the custom-operator contract): all
events of one key fit in one partition — the same assumption every
sessionizer makes (a key's timeline cannot be split without breaking gap
semantics).  Skewed keys cost partition imbalance, not correctness; at
100 TB size ``num_partitions`` so the hottest key's events fit a worker.

The reference engine has no event operators; these extend the engine for
training-data pipelines (the brief's windowed-aggregate / as-of-join
custom operators).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def _keyed_blocks(ds: ray.data.Dataset, key: str,
                  num_partitions: 'int | None' = None,
                  small: bool = False) -> ray.data.Dataset:
    """Co-locate all rows of each ``key`` value into one block.  ``small``
    skips the exchange entirely (single-block plan — no shuffle actors for
    KB-scale inputs, mirroring ops.agg's plan-time choice)."""
    if small:
        return ds.repartition(1)
    from ..engine.dedup import _ray_cpus, ensure_hash_shuffle
    ensure_hash_shuffle()
    nparts = num_partitions or max(8, _ray_cpus() * 2)

    def add_bucket(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column('__bucket', pa.array([], pa.int64()))
        import polars as pl
        h = pl.from_arrow(t.select([key])).hash_rows(seed=5).to_numpy() % nparts
        return t.append_column('__bucket', pa.array(h.astype('int64')))

    ds = ds.map_batches(add_bucket, batch_format='pyarrow')
    return ds.repartition(nparts, keys=['__bucket'], sort=False)


def _sorted_block(t: pa.Table, key: str, ts_col: str, id_col: str):
    """(sorted table, key array, ts-us int64 array, segment-start index per
    row) for one co-located block."""
    t = t.sort_by([(key, 'ascending'), (ts_col, 'ascending'), (id_col, 'ascending')])
    k = t[key].combine_chunks()
    ts = pc.cast(t[ts_col], pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
    kn = k.to_numpy(zero_copy_only=False)
    n = len(kn)
    new_key = np.empty(n, dtype=bool)
    if n:
        new_key[0] = True
        new_key[1:] = kn[1:] != kn[:-1]
    seg_first = np.maximum.accumulate(np.where(new_key, np.arange(n), 0))
    return t, kn, ts, new_key, seg_first


def sessionize(ds: ray.data.Dataset, key: str = 'user_id', ts_col: str = 'ts',
               id_col: str = 'event_id', gap_us: int = 8 * 3600 * 1_000_000,
               value_col: 'str | None' = None,
               num_partitions: 'int | None' = None,
               small: bool = False) -> ray.data.Dataset:
    """Per-key sessionization: consecutive events ≤ ``gap_us`` apart share a
    session.  Returns one row per (key, session_id) with ``n_events``,
    ``start_us``/``end_us``/``duration_us`` and (if ``value_col``)
    ``sum_value_cents`` (cent-quantized sum — exact integer semantics both
    here and in the SQL oracle).  ``session_id`` is 1-based in (ts, id)
    order within each key — deterministic because ``id_col`` breaks ties."""
    value_cols = [value_col] if value_col else []
    ds = _keyed_blocks(ds.select_columns([key, ts_col, id_col] + value_cols),
                       key, num_partitions, small)

    def scan(t: pa.Table) -> pa.Table:
        if '__bucket' in t.column_names:
            t = t.drop_columns(['__bucket'])
        if t.num_rows == 0:
            # preserve the key's real type so empty blocks union cleanly
            ktype = t.schema.field(key).type if key in t.column_names else pa.int64()
            out_schema = {key: ktype, 'session_id': pa.int64(),
                          'n_events': pa.int64(), 'start_us': pa.int64(),
                          'end_us': pa.int64(), 'duration_us': pa.int64()}
            if value_col:
                out_schema['sum_value_cents'] = pa.int64()
            return pa.table({c: pa.array([], tp) for c, tp in out_schema.items()})
        t, kn, ts, new_key, _ = _sorted_block(t, key, ts_col, id_col)
        n = len(kn)
        new_sess = new_key | (np.diff(ts, prepend=ts[0]) > gap_us)
        starts = np.nonzero(new_sess)[0]
        counts = np.diff(np.append(starts, n))
        # session_id: 1-based rank of the session within its key
        key_first_sess = np.maximum.accumulate(
            np.where(new_key[starts], np.arange(len(starts)), 0))
        sess_id = np.arange(len(starts)) - key_first_sess + 1
        cols = {key: pa.array(kn[starts]),
                'session_id': pa.array(sess_id.astype(np.int64)),
                'n_events': pa.array(counts.astype(np.int64)),
                'start_us': pa.array(ts[starts]),
                'end_us': pa.array(ts[np.append(starts[1:], n) - 1])}
        cols['duration_us'] = pa.array(
            cols['end_us'].to_numpy() - cols['start_us'].to_numpy())
        if value_col:
            v = pc.cast(pc.floor(pc.multiply(
                t[value_col].combine_chunks(), pa.scalar(100.0))), pa.int64())
            cents = v.to_numpy(zero_copy_only=False)
            cols['sum_value_cents'] = pa.array(
                np.add.reduceat(cents, starts).astype(np.int64))
        return pa.table(cols)

    return ds.map_batches(scan, batch_format='pyarrow', batch_size=None)


def rolling_agg(ds: ray.data.Dataset, key: str = 'user_id', ts_col: str = 'ts',
                id_col: str = 'event_id', value_col: str = 'value',
                window: int = 3,
                num_partitions: 'int | None' = None,
                small: bool = False) -> ray.data.Dataset:
    """Per-key rolling aggregate over the last ``window`` events (current
    row inclusive), in (ts, id) order: running event rank, rolling sum and
    rolling min of the cent-quantized value.  One row out per event —
    the feature-engineering shape (each event annotated with its trailing
    window), computed as cumsum differences / sliding-minimum over the
    sorted block, never a per-row loop."""
    ds = _keyed_blocks(ds.select_columns([key, ts_col, id_col, value_col]),
                       key, num_partitions, small)

    def scan(t: pa.Table) -> pa.Table:
        if '__bucket' in t.column_names:
            t = t.drop_columns(['__bucket'])
        if t.num_rows == 0:
            ktype = t.schema.field(key).type if key in t.column_names else pa.int64()
            return pa.table({id_col: pa.array([], pa.int64()),
                             key: pa.array([], ktype),
                             'ts_us': pa.array([], pa.int64()),
                             'rn': pa.array([], pa.int64()),
                             'roll_sum_cents': pa.array([], pa.int64()),
                             'roll_min_cents': pa.array([], pa.int64())})
        t, kn, ts, _, seg_first = _sorted_block(t, key, ts_col, id_col)
        n = t.num_rows
        idx = np.arange(n)
        rn = idx - seg_first + 1  # 1-based rank within the key
        ids = t[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        cents = pc.cast(pc.floor(pc.multiply(
            t[value_col].combine_chunks(), pa.scalar(100.0))),
            pa.int64()).to_numpy(zero_copy_only=False)
        # rolling sum: csum[i+1] - csum[window start], clipped to the segment
        csum = np.concatenate(([0], np.cumsum(cents)))
        w_start = np.maximum(idx - (window - 1), seg_first)
        roll_sum = csum[idx + 1] - csum[w_start]
        # rolling min via a (n x window) strided gather over a padded copy
        # (window is a small constant; out-of-window / out-of-segment slots
        # are masked to +inf)
        pad = np.full(window - 1, np.iinfo(np.int64).max, dtype=np.int64)
        padded = np.concatenate((pad, cents))
        gather = np.lib.stride_tricks.sliding_window_view(padded, window)
        pos = idx[:, None] - np.arange(window - 1, -1, -1)[None, :]
        masked = np.where(pos >= w_start[:, None], gather, np.iinfo(np.int64).max)
        roll_min = masked.min(axis=1)
        return pa.table({id_col: pa.array(ids),
                         key: pa.array(kn),
                         'ts_us': pa.array(ts),
                         'rn': pa.array(rn.astype(np.int64)),
                         'roll_sum_cents': pa.array(roll_sum.astype(np.int64)),
                         'roll_min_cents': pa.array(roll_min.astype(np.int64))})

    return ds.map_batches(scan, batch_format='pyarrow', batch_size=None)


def asof_join_prior(ds: ray.data.Dataset, key: str = 'user_id',
                    ts_col: str = 'ts', id_col: str = 'event_id',
                    type_col: str = 'event_type',
                    left_type: str = 'click', right_type: str = 'view',
                    num_partitions: 'int | None' = None,
                    small: bool = False) -> ray.data.Dataset:
    """Point-in-time as-of join within one event stream: for every
    ``left_type`` row, attach the most recent ``right_type`` row of the
    same key at-or-before it ((ts, id) order — a view at the same
    microsecond with a smaller id counts as prior).  Left rows with no
    prior right row keep null match columns (left-outer semantics).

    Vectorized forward-fill: after the keyed sort, the last-seen right-row
    index is ``np.maximum.accumulate(where(is_right, idx, -1))``; a match
    is valid only if it lies inside the row's own key segment."""
    ds = _keyed_blocks(ds.select_columns([key, ts_col, id_col, type_col]),
                       key, num_partitions, small)

    def scan(t: pa.Table) -> pa.Table:
        if '__bucket' in t.column_names:
            t = t.drop_columns(['__bucket'])
        ktype = t.schema.field(key).type if key in t.column_names else pa.int64()
        empty = pa.table({'click_id': pa.array([], pa.int64()),
                          key: pa.array([], ktype),
                          'click_ts_us': pa.array([], pa.int64()),
                          'view_event_id': pa.array([], pa.int64()),
                          'view_ts_us': pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        t, kn, ts, _, seg_first = _sorted_block(t, key, ts_col, id_col)
        n = t.num_rows
        ids = t[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        types = t[type_col].combine_chunks()
        is_right = pc.equal(types, right_type).to_numpy(zero_copy_only=False)
        is_left = pc.equal(types, left_type).to_numpy(zero_copy_only=False)
        idx = np.arange(n)
        acc = np.maximum.accumulate(np.where(is_right, idx, -1))
        valid = acc >= seg_first  # the match must be in the same key segment
        li = idx[is_left]
        if not len(li):
            return empty
        m_ok = valid[li]
        m_idx = np.where(m_ok, acc[li], 0)
        return pa.table({
            'click_id': pa.array(ids[li]),
            key: pa.array(kn[li]),
            'click_ts_us': pa.array(ts[li]),
            'view_event_id': pa.array(ids[m_idx], mask=~m_ok),
            'view_ts_us': pa.array(ts[m_idx], mask=~m_ok)})

    return ds.map_batches(scan, batch_format='pyarrow', batch_size=None)
