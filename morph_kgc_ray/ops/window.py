"""Windowed event operators Ray Data lacks natively: sessionization
(gaps-and-islands windowed aggregate), a point-in-time as-of join, and an
interval (range) join (:func:`range_join` — banded hash join or broadcast,
chosen by plan-time knowledge of the interval side).

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


def range_join(left: ray.data.Dataset, right: ray.data.Dataset,
               key: str = 'user_id', ts_col: str = 'ts',
               lo_col: str = 'lo_us', hi_col: str = 'hi_us',
               band_us: int = 24 * 3600 * 1_000_000,
               num_partitions: 'int | None' = None,
               broadcast: bool = False) -> ray.data.Dataset:
    """Interval (range) join — an operator Ray Data lacks natively: every
    ``left`` row joins each ``right`` interval of the same ``key`` with
    ``lo_us <= ts < hi_us`` (half-open, microsecond int64 bounds).

    Two plans, chosen by plan-time knowledge of the interval side:

    - ``broadcast=True``: the interval table is collected once, ``ray.put``
      once, and each left batch joins it in-task with an acero hash join —
      zero shuffles (the brief's broadcast-small-side pattern; use when
      intervals fit a worker heap).
    - banded distributed join (default): left rows band by
      ``ts // band_us``; each interval replicates into every band its
      ``[lo, hi)`` overlaps (vectorized ``np.repeat`` explode — replication
      factor is interval_width/band_us + 1, so pick ``band_us`` near the
      typical interval width); then ONE hash-partitioned ``Dataset.join``
      on ``(key, __band)`` followed by the exact bound filter.  A (row,
      interval) pair meets in exactly one band — the row's own — so no
      post-join dedup is needed.

    Columns: output carries all left columns plus all right columns;
    non-key names must be disjoint.  Rows with null key/ts/bounds drop
    (inner-join semantics).
    """
    band = int(band_us)

    def tag_left(t: pa.Table) -> pa.Table:
        ts = pc.cast(t[ts_col], pa.int64()).combine_chunks()
        b = ts.to_numpy(zero_copy_only=False) // band
        return t.append_column('__band', pa.array(b.astype('int64')))

    def explode_right(t: pa.Table) -> pa.Table:
        lo = pc.cast(t[lo_col], pa.int64()).to_numpy(zero_copy_only=False)
        hi = pc.cast(t[hi_col], pa.int64()).to_numpy(zero_copy_only=False)
        keep = hi > lo
        t = t.filter(pa.array(keep))
        lo, hi = lo[keep], hi[keep]
        b_lo = lo // band
        n_bands = (hi - 1) // band - b_lo + 1
        idx = np.repeat(np.arange(len(b_lo)), n_bands)
        # offset within each row's band run: arange minus the run's start
        starts = np.concatenate(([0], np.cumsum(n_bands)))[:-1]
        off = np.arange(int(n_bands.sum())) - np.repeat(starts, n_bands)
        out = t.take(pa.array(idx))
        return out.append_column('__band',
                                 pa.array((b_lo[idx] + off).astype('int64')))

    def bound_filter(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.drop_columns([c for c in ('__band',) if c in t.column_names])
        ts = pc.cast(t[ts_col], pa.int64())
        ok = pc.and_(pc.greater_equal(ts, pc.cast(t[lo_col], pa.int64())),
                     pc.less(ts, pc.cast(t[hi_col], pa.int64())))
        t = t.filter(pc.fill_null(ok, False))
        return t.drop_columns([c for c in ('__band',) if c in t.column_names])

    if broadcast:
        import ray as _ray
        iv = pa.concat_tables(
            [_ray.get(r) for r in right.to_arrow_refs()], promote_options='default')
        iv_ref = _ray.put(explode_right(iv.combine_chunks()))

        def bjoin(t: pa.Table) -> pa.Table:
            ivt = _ray.get(iv_ref)
            out = tag_left(t).join(ivt, keys=[key, '__band'],
                                   join_type='inner')
            return bound_filter(out)

        return left.map_batches(bjoin, batch_format='pyarrow')

    from ..engine.dedup import _ray_cpus, ensure_hash_shuffle
    ensure_hash_shuffle()
    nparts = num_partitions or max(8, _ray_cpus())
    lt = left.map_batches(tag_left, batch_format='pyarrow')
    rt = right.map_batches(explode_right, batch_format='pyarrow')
    # Ray's hash join cannot resolve key fields when EVERY block of one
    # side is empty (0-row bundles carry no schema); limit(1) probes
    # short-circuit the streaming executor, so the degenerate cases cost
    # one block read each.
    if not rt.limit(1).take_all() or not left.limit(1).take_all():
        l_schema = left.schema()
        r_schema = right.schema()
        fields = list(zip(l_schema.names, l_schema.types))
        fields += [(n, t) for n, t in zip(r_schema.names, r_schema.types)
                   if n != key]
        return ray.data.from_arrow(pa.table(
            {n: pa.array([], t) for n, t in fields}))
    joined = lt.join(rt, 'inner', nparts, on=(key, '__band'))
    return joined.map_batches(bound_filter, batch_format='pyarrow')
