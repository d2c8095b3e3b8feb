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

import ray
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
        try:  # prefer the actual Ray CPU budget once a session exists
            if ray.is_initialized():
                ncpu = int(ray.cluster_resources().get('CPU', ncpu))
        except Exception:
            pass
        ctx.max_hash_shuffle_aggregators = max(2, ncpu // 2)
        ctx.default_hash_shuffle_parallelism = max(8, ncpu)
        ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = 0.01
        ctx.hash_aggregate_operator_actor_num_cpus_per_partition_override = 0.01
        ctx.join_operator_actor_num_cpus_per_partition_override = 0.01
        return True
    except Exception:
        return False


def _ray_cpus(default: int = 8) -> int:
    try:
        if ray.is_initialized():
            return int(ray.cluster_resources().get('CPU', default))
    except Exception:
        pass
    import os
    return os.cpu_count() or default


class _HashBucketState:
    """Tiny zero-CPU reducer for the OVERLAPPED hash exchange: producer
    tasks push their (h1, h2) hash rows here keyed by a retry-stable block
    id WHILE the payload pass is still running, so by the time the payload
    finishes materializing the exchange has already happened — no second
    barrier, no hash-shuffle aggregator spin-up (which measured 11-24 s of
    fixed cost at bench scale and ANTI-scaled 8->32 CPUs).

    All state is scoped by ``run``, an opaque per-``distinct_in_place``-call
    token, so ONE session-wide pool of reducers serves every call (including
    concurrent ones) without re-paying actor spawn per call.

    Idempotence: parts are stored per (run, block id), so a retried or
    speculatively re-executed producer task REPLACES its prior submission
    instead of double-counting.  ``total_received(run)`` lets the driver
    verify every payload row's hash arrived (a reducer that died and
    silently restarted empty would fail that check and the caller reroutes
    through the pull-based exchange)."""

    def __init__(self):
        self.runs: dict[str, dict] = {}

    def add(self, run: str, bid: int, h1, h2) -> int:
        self.runs.setdefault(run, {})[bid] = (h1, h2)
        return len(h1)

    def total_received(self, run: str) -> int:
        return sum(len(h1) for h1, _ in self.runs.get(run, {}).values())

    def clear(self, run: str) -> None:
        """Free one run's hash state once its winners were read (the actor
        stays alive for the pool; a lost payload block's lineage
        re-execution simply re-adds to an empty run dict)."""
        self.runs.pop(run, None)

    def winners(self, run: str):
        """(h1, h2, winner_bid) numpy arrays for hashes seen in >1 block.

        Two-stage: a value-only ``np.sort`` over h1 finds candidate
        duplicate h1 values (cheap — no permutation gathers), then the full
        (h1, h2, bid) group logic runs on just those rows.  On mostly-unique
        corpora (the normal web-crawl case) this is ~4x the full lexsort."""
        import numpy as np
        z = np.array([], dtype=np.uint64)
        parts = self.runs.get(run, {})
        if not parts:
            return z, z, np.array([], dtype=np.int64)
        h1 = np.concatenate([p[0] for p in parts.values()])
        s = np.sort(h1)
        dup_vals = s[1:][s[1:] == s[:-1]]  # h1 values appearing >1 time
        if not len(dup_vals):
            return z, z, np.array([], dtype=np.int64)
        dup_vals = np.unique(dup_vals)
        h2 = np.concatenate([p[1] for p in parts.values()])
        bid = np.concatenate([np.full(len(p[0]), b, dtype=np.int64)
                              for b, p in parts.items()])
        m = np.isin(h1, dup_vals)
        h1, h2, bid = h1[m], h2[m], bid[m]
        order = np.lexsort((h2, h1))
        h1, h2, bid = h1[order], h2[order], bid[order]
        new_grp = np.empty(len(h1), dtype=bool)
        new_grp[0] = True
        new_grp[1:] = (h1[1:] != h1[:-1]) | (h2[1:] != h2[:-1])
        starts = np.nonzero(new_grp)[0]
        counts = np.diff(np.append(starts, len(h1)))
        mins = np.minimum.reduceat(bid, starts)
        dup = counts > 1
        return h1[starts][dup], h2[starts][dup], mins[dup]


# actor form (zero CPUs: reducers must never take slots from the producer
# stage they overlap with); plain-class form above stays unit-testable
_HashBucketReducer = ray.remote(num_cpus=0)(_HashBucketState)

# session-wide reducer pool, keyed by Ray job id so a ray.shutdown()/init()
# cycle in the same process gets fresh actors instead of dead handles
_REDUCER_POOL: dict = {}


def _reducer_pool() -> list:
    try:
        job = ray.get_runtime_context().get_job_id()
    except Exception:
        job = 'nojob'
    pool = _REDUCER_POOL.get(job)
    if pool is None:
        n = max(2, min(32, _ray_cpus() // 4))
        pool = [_HashBucketReducer.remote() for _ in range(n)]
        # fire-and-forget ping: spawn the worker processes NOW so their
        # startup overlaps the caller's read/extract warm-up instead of
        # stalling the first wave of prep() acks (~1.5 s at 32 CPUs)
        for r in pool:
            r.total_received.remote('_warm')
        _REDUCER_POOL.clear()  # at most one live session per process
        _REDUCER_POOL[job] = pool
    return pool

# per-worker-process counter disambiguating multiple prep() calls inside one
# fused task (call order within a task is deterministic, so (task, seq) is
# retry-stable); entries are ~100 bytes per producer task
_PREP_CALL_SEQ: dict = {}


def _pull_exchange_winners(mat: ray.data.Dataset):
    """Pull-based fallback: bucket the (h1,h2,bid) columns of the already-
    materialized payload and aggregate per bucket with Ray Data's hash
    shuffle.  Correct at any scale but pays the aggregator-actor spin-up;
    only used when the overlapped push exchange could not be verified."""
    import numpy as np
    import pandas as pd

    buckets = max(8, _ray_cpus() * 2)

    def add_bucket(t: pa.Table) -> pa.Table:
        b = (t['__h1'].to_numpy(zero_copy_only=False) % np.uint64(buckets)).astype(np.int64)
        return t.append_column('__bucket', pa.array(b))

    def winners_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        grp = g.groupby(['__h1', '__h2'])['__bid'].agg(['min', 'count'])
        dup = grp[grp['count'] > 1].reset_index()
        dup = dup.rename(columns={'min': 'winner'})
        return dup[['__h1', '__h2', 'winner']]

    dup_pd = mat.select_columns(['__h1', '__h2', '__bid']) \
                .map_batches(add_bucket, batch_format='pyarrow') \
                .groupby('__bucket').map_groups(winners_in_bucket, batch_format='pandas') \
                .to_pandas()
    if '__h1' not in dup_pd.columns:  # empty results lose their schema
        dup_pd = pd.DataFrame({'__h1': [], '__h2': [], 'winner': []})
    return (np.asarray(dup_pd['__h1'], dtype=np.uint64),
            np.asarray(dup_pd['__h2'], dtype=np.uint64),
            np.asarray(dup_pd['winner'], dtype=np.int64))


def distinct_in_place(ds: ray.data.Dataset, cols: list[str],
                      local_first: bool = True,
                      driver_dup_cap: int = 2_000_000,
                      num_buckets: 'int | None' = None) -> ray.data.Dataset:
    """Exact distinct that never shuffles the payload.

    1. per block: local distinct + two 64-bit row hashes (h1,h2) + a
       retry-stable block id; the (h1,h2) rows are PUSHED to ``num_buckets``
       zero-CPU reducer actors (bucketed by h1) while the payload pass runs
       — the hash exchange fully OVERLAPS payload production, then the
       payload materializes in place;
    2. the reducers compute hashes present in >1 block and their winner
       (min block id) — a few ms of numpy each, no second barrier;
    3. broadcast the (small) cross-block-duplicate map and filter each block
       locally: keep a row unless its hash lost to another block.

    Scales with the DUPLICATE volume, not the data volume: the wide columns
    cross the wire zero times, and the 16-byte hash rows move concurrently
    with the pass that produces them.  Safety rails, in order:
    - the driver verifies the reducers received exactly one hash row per
      payload row (a reducer lost+restarted mid-run would under-count);
      on mismatch the already-materialized payload re-derives winners via
      the pull-based hash-shuffle exchange (``_pull_exchange_winners``);
    - above ``driver_dup_cap`` cross-block duplicates (where the broadcast
      winner map would bottleneck the driver — e.g. a 10% dup rate at
      100 TB) the payload reroutes through the bucket-keyed ``distinct``
      exchange instead, automatically — one payload shuffle, no driver
      state.

    100-TB sizing: reducers each hold (total_rows x 16 B) / pool_size of
    hash state and receive one push per producer block — on a real cluster
    size ``num_buckets`` ~ (hash volume / 256 MB) and spread actors across
    nodes.  By default a SESSION-WIDE pool sized from the CPU count is
    reused across calls (state is scoped per call by a run token), so
    repeated small materializations don't re-pay actor spawn."""
    import uuid as _uuid

    import numpy as np

    cols = list(cols)
    ensure_hash_shuffle()
    if num_buckets:  # dedicated reducers on request (tests, explicit sizing)
        reducers = [_HashBucketReducer.remote() for _ in range(num_buckets)]
        for r in reducers:
            r.total_received.remote('_warm')
    else:
        reducers = _reducer_pool()
    nbuckets = len(reducers)
    run = _uuid.uuid4().hex

    def _schema_empty() -> pa.Table:
        data: dict = {c: pa.array([], pa.large_string()) for c in cols}
        data['__h1'] = pa.array([], pa.uint64())
        data['__h2'] = pa.array([], pa.uint64())
        data['__bid'] = pa.array([], pa.int64())
        return pa.table(data)

    def prep(t: pa.Table) -> pa.Table:
        from .kernels import table_distinct
        import polars as pl
        # empty blocks can arrive schema-less (e.g. an empty rule dataset in
        # a union); rebuild a schema-complete empty table
        if t.num_rows == 0 or not set(cols) <= set(t.column_names):
            return _schema_empty()
        t = t.select(cols)
        if local_first:  # skip when the producer already emits block-distinct batches
            t = table_distinct(t)
        h1 = pl.from_arrow(t).hash_rows(seed=11).to_numpy().astype('uint64')
        h2 = pl.from_arrow(t).hash_rows(seed=13).to_numpy().astype('uint64')
        # retry-stable block id: Ray keeps the TaskID across retries of the
        # same task, so a re-executed producer REPLACES its reducer parts
        # instead of faking a cross-block duplicate of itself (which would
        # silently drop the retried payload).  The per-task call counter
        # disambiguates multiple batches inside one fused task (the call
        # order within a task is deterministic).
        import hashlib as _hl
        tid = ray.get_runtime_context().get_task_id() or 'driver'
        seq = _PREP_CALL_SEQ.get(tid, 0)
        _PREP_CALL_SEQ[tid] = seq + 1
        bid = int.from_bytes(_hl.blake2b(f'{tid}:{seq}'.encode(),
                                         digest_size=8).digest(), 'big') & ((1 << 63) - 1)
        if t.num_rows:
            b = (h1 % np.uint64(nbuckets)).astype(np.int64)
            try:
                acks = []
                for k in np.unique(b):
                    m = b == k
                    acks.append(reducers[int(k)].add.remote(run, int(bid), h1[m], h2[m]))
                ray.get(acks)  # delivery completes before the task output commits
            except Exception:
                # a dead/restarted reducer loses these rows; the driver's
                # delivery verification below catches the shortfall and
                # reroutes through the pull-based exchange
                pass
        t = t.append_column('__h1', pa.array(h1))
        t = t.append_column('__h2', pa.array(h2))
        return t.append_column('__bid', pa.array(np.full(t.num_rows, bid, dtype=np.int64)))

    mat = ds.map_batches(prep, batch_format='pyarrow', batch_size=None).materialize()

    # the hash exchange already happened during the pass above; verify
    # delivery, then pull the (tiny) winner sets straight from the reducers
    try:
        received = sum(ray.get([r.total_received.remote(run) for r in reducers]))
    except Exception:
        received = -1  # pool actor died: take the pull-based fallback
    if received == mat.count():
        wins = ray.get([r.winners.remote(run) for r in reducers])
        dup_h1 = np.concatenate([w[0] for w in wins])
        dup_h2 = np.concatenate([w[1] for w in wins])
        dup_win = np.concatenate([w[2] for w in wins])
    else:
        import logging
        logging.getLogger(__name__).warning(
            'distinct_in_place: push exchange received %d hash rows for %d '
            'payload rows (a reducer restarted?); re-deriving winners via '
            'the pull-based exchange', received, mat.count())
        dup_h1, dup_h2, dup_win = _pull_exchange_winners(mat)
    for r in reducers:
        r.clear.remote(run)

    if len(dup_h1) > driver_dup_cap:
        # duplicate volume too large for a driver-side map: reroute the
        # materialized payload through the keyed-exchange distinct (rows are
        # already block-locally distinct, skip that pass)
        import logging
        logging.getLogger(__name__).info(
            'distinct_in_place: %d cross-block duplicate hashes exceed the '
            'driver map cap (%d); falling back to the keyed-exchange distinct',
            len(dup_h1), driver_dup_cap)
        payload = mat.map_batches(
            lambda t: t.drop_columns(['__h1', '__h2', '__bid']),
            batch_format='pyarrow')
        return distinct(payload, cols, local_first=False)
    winners = {(int(a), int(b)): int(w)
               for a, b, w in zip(dup_h1, dup_h2, dup_win)}
    ref = ray.put(winners)

    def keep(t: pa.Table) -> pa.Table:
        wmap = ray.get(ref)
        if not wmap:
            return t.drop_columns(['__h1', '__h2', '__bid'])
        h1 = t['__h1'].to_numpy(zero_copy_only=False)
        h2 = t['__h2'].to_numpy(zero_copy_only=False)
        bid = t['__bid'].to_numpy(zero_copy_only=False)
        mask = np.ones(len(h1), dtype=bool)
        # vectorized candidate prefilter: only rows whose h1 is among the
        # (few) cross-block-duplicate hashes need the python map lookup
        for i in np.nonzero(np.isin(h1, dup_h1))[0]:
            w = wmap.get((int(h1[i]), int(h2[i])))
            if w is not None and w != bid[i]:
                mask[i] = False
        return t.filter(pa.array(mask)).drop_columns(['__h1', '__h2', '__bid'])

    return mat.map_batches(keep, batch_format='pyarrow')


def distinct(ds: ray.data.Dataset, cols: list[str], num_partitions: int | None = None,
             local_first: bool = True, coalesce: bool = True,
             small: bool = False) -> ray.data.Dataset:
    """Globally exact distinct over ``cols`` (which must be all columns).

    Implementation: coalesce blocks, add a 64-bit row-hash bucket column
    (vectorized via polars), exchange keyed on the small integer bucket
    (equal rows share a bucket), then drop duplicates per bucket group.
    Benchmarked ~1.7-2.6x faster than Ray's hash-shuffle keyed repartition on
    wide string rows at both 8 and 32 CPUs; bucket count = 2x CPUs bounds
    skew while keeping per-group work chunky.

    ``local_first=False`` skips the pre-exchange block-local distinct — pass
    it when the producer already emits block-locally-distinct batches (e.g.
    the web emit kernel), the stage would re-sort every wide row for nothing.
    ``coalesce=False`` skips the block-count coalesce exchange when the input
    is already reasonably sized (≤ ~2 blocks per CPU).
    ``small=True`` is the plan-time small-input fast path: block-local
    distinct, coalesce to ONE block (task-based streaming merge — no
    hash-shuffle aggregator actors, whose per-execution spin-up costs seconds
    regardless of data volume), final exact distinct in a single task.  Only
    pass it when the caller KNOWS the source is small (e.g. plan-time file
    sizes); at real scale the keyed exchange below is the right plan."""
    import pandas as pd

    cols = list(cols)
    ensure_hash_shuffle()
    ncpu = _ray_cpus()
    buckets = num_partitions or max(8, ncpu * 2)

    def _final_local(t: pa.Table) -> pa.Table:
        from .kernels import table_distinct
        if t.num_rows == 0 or not set(cols) <= set(t.column_names):
            return pa.table({c: pa.array([], pa.large_string()) for c in cols})
        return table_distinct(t.select(cols))

    if small:
        ds = ds.map_batches(_local_distinct(cols), batch_format='pyarrow')
        ds = ds.repartition(1)
        return ds.map_batches(_final_local, batch_format='pyarrow', batch_size=None)

    if local_first:
        ds = ds.map_batches(_local_distinct(cols), batch_format='pyarrow')
    if coalesce:
        ds = ds.repartition(max(2, ncpu))  # coalesce: exchange cost scales with block count

    def _schema_empty() -> pa.Table:
        data = {c: pa.array([], pa.large_string()) for c in cols}
        data['__bucket'] = pa.array([], pa.int64())
        return pa.table(data)

    def add_bucket(t: pa.Table) -> pa.Table:
        import polars as pl
        # empty blocks can arrive schema-less (e.g. an empty rule dataset in
        # a union); rebuild a schema-complete empty table so the exchange's
        # sort key exists in every block
        if t.num_rows == 0 or not set(cols) <= set(t.column_names):
            return _schema_empty()
        h = pl.from_arrow(t.select(cols)).hash_rows(seed=7).to_numpy() % buckets
        return t.append_column('__bucket', pa.array(h.astype('int64')))

    def block_distinct(t: pa.Table) -> pa.Table:
        from .kernels import table_distinct
        if t.num_rows == 0 or not set(cols) <= set(t.column_names):
            return _schema_empty().drop_columns(['__bucket'])
        return table_distinct(t.select(cols))

    ds = ds.map_batches(add_bucket, batch_format='pyarrow')
    # keyed repartition co-locates equal buckets (hash exchange on the small
    # int key; no aggregator-side sort, so empty partitions are harmless)
    ds = ds.repartition(buckets, keys=['__bucket'], sort=False)
    return ds.map_batches(block_distinct, batch_format='pyarrow', batch_size=None)
