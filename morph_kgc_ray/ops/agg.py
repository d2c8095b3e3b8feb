"""Grouped aggregation with block-local partials.

Ray Data's ``groupby().aggregate()`` is the right plan at cluster scale,
but its hash-shuffle aggregator actors cost seconds of spin-up PER
EXECUTION — which dominates small and mid-size inputs (a 5k-row
``lang_count`` paid ~2.5 s for 8 output rows).  ``grouped_agg`` always
reduces per block first (the aggregates are associative, so partials cut
the exchange volume at any scale — the brief's pre-aggregate-before-
groupby pattern), then picks the combine plan:

- ``small=True`` (plan-time knowledge, e.g. input file size): coalesce
  the already-tiny partials to ONE block and finish in a single task —
  no shuffle actors;
- otherwise: Ray's hash ``groupby`` over the REDUCED partials (the
  correct distributed plan for high-cardinality keys at 100 TB, where
  per-block partials may not shrink the data much).

Supported aggregate fns (all associative): ``sum`` ``min`` ``max``
``count``.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data


def grouped_agg(ds: ray.data.Dataset, keys: list[str],
                aggs: 'list[tuple]', small: bool = False,
                num_partitions: 'int | None' = None) -> ray.data.Dataset:
    """``aggs``: (in_col, fn, out_name) triples; ``fn='count'`` ignores
    ``in_col``.  Output columns: ``keys + [out_name...]``; row order is
    unspecified (grouped results are set-shaped)."""
    keys = list(keys)
    aggs = [(c, f, o) for (c, f, o) in aggs]
    out_cols = keys + [o for _, _, o in aggs]
    # after the per-block partial, counts combine by SUM; sum/min/max by
    # themselves (associativity)
    combine_fns = {o: ('sum' if f in ('sum', 'count') else f) for _, f, o in aggs}

    def _partial(t: pa.Table, fns: dict) -> pa.Table:
        """One arrow group_by pass; ``fns`` maps out_name -> (src, fn)."""
        import numpy as np
        cols: dict = {k: t[k] for k in keys}
        for o, (src, fn) in fns.items():
            if fn == 'count':
                cols[o] = pa.array(np.ones(t.num_rows, dtype=np.int64))
            else:
                cols[o] = t[src]
        g = pa.table(cols)
        spec = [(o, 'sum' if fn == 'count' else fn) for o, (_, fn) in fns.items()]
        out = g.group_by(keys, use_threads=False).aggregate(spec)
        # arrow names results '<col>_<fn>'
        rename = {f"{o}_{'sum' if fn == 'count' else fn}": o
                  for o, (_, fn) in fns.items()}
        return out.rename_columns([rename.get(c, c) for c in out.column_names]) \
                  .select(out_cols)

    first_fns = {o: (c, f) for c, f, o in aggs}
    ds = ds.map_batches(lambda t: _partial(t, first_fns), batch_format='pyarrow')

    second_fns = {o: (o, combine_fns[o]) for _, _, o in aggs}
    if small:
        ds = ds.repartition(1)
        return ds.map_batches(lambda t: _partial(t, second_fns),
                              batch_format='pyarrow', batch_size=None)
    from ray.data.aggregate import Max, Min, Sum
    ray_aggs = []
    for _, _, o in aggs:
        fn = combine_fns[o]
        cls = {'sum': Sum, 'min': Min, 'max': Max}[fn]
        ray_aggs.append(cls(o, alias_name=o))
    from ..engine.dedup import ensure_hash_shuffle
    ensure_hash_shuffle()
    out = ds.groupby(keys).aggregate(*ray_aggs)
    return out.map_batches(lambda t: t.select(out_cols), batch_format='pyarrow')


def grouped_quantiles(ds: ray.data.Dataset, key: str, value_col: str,
                      percents: 'tuple[int, ...]' = (50, 90),
                      num_partitions: 'int | None' = None,
                      small: bool = False) -> ray.data.Dataset:
    """Exact per-key quantiles with INTEGER index semantics: percentile
    ``p`` is the element at rank ``(p * (n-1)) // 100`` of the key's
    ascending-sorted values — pure integer arithmetic, so the result is
    bit-replicable in SQL via ROW_NUMBER (ties within equal values pick
    the same value regardless of tiebreak).  Output: one row per key with
    ``n`` and one ``p<p>`` column per requested percentile.

    Plan: ONE hash-keyed exchange co-locating each key's rows (the
    ops.window pattern — partitioning assumption: one key's rows fit one
    partition), then a fully vectorized sorted segment scan per block."""
    import numpy as np
    import pyarrow.compute as pc

    from .window import _keyed_blocks

    def scan(t: pa.Table) -> pa.Table:
        if '__bucket' in t.column_names:
            t = t.drop_columns(['__bucket'])
        ktype = (t.schema.field(key).type if key in t.column_names
                 else pa.int64())
        cols = {key: pa.array([], ktype), 'n': pa.array([], pa.int64())}
        for p in percents:
            cols[f'p{p}'] = pa.array([], pa.int64())
        if t.num_rows == 0:
            return pa.table(cols)
        t = t.sort_by([(key, 'ascending'), (value_col, 'ascending')])
        kn = t[key].combine_chunks().to_numpy(zero_copy_only=False)
        v = pc.cast(t[value_col], pa.int64()).combine_chunks().to_numpy(
            zero_copy_only=False)
        m = len(kn)
        new = np.empty(m, bool)
        new[0] = True
        new[1:] = kn[1:] != kn[:-1]
        starts = np.nonzero(new)[0]
        n = np.diff(np.append(starts, m)).astype(np.int64)
        out = {key: t[key].take(pa.array(starts)), 'n': pa.array(n)}
        for p in percents:
            idx = starts + (p * (n - 1)) // 100
            out[f'p{p}'] = pa.array(v[idx])
        return pa.table(out)

    return _keyed_blocks(ds.select_columns([key, value_col]), key,
                         num_partitions, small) \
        .map_batches(scan, batch_format='pyarrow', batch_size=None)
