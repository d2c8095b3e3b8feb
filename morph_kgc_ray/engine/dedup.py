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

    # slot-bitmap size (bits).  2^26 slots = 8 MiB x 2 bitmaps per run: at
    # ~2M hash rows per reducer the false-candidate rate is ~3%, so the
    # report-time exact pass touches a few-% subset.  Slots come from h1's
    # HIGH bits — the low bits picked the reducer (h1 % nbuckets), so they
    # are constant within one reducer and would alias everything.
    SLOT_BITS = 26

    def __init__(self):
        self.runs: dict[str, dict] = {}

    def _slots(self, h1):
        import numpy as np
        return ((h1 >> np.uint64(64 - self.SLOT_BITS))
                & np.uint64((1 << self.SLOT_BITS) - 1)).astype(np.int64)

    def add(self, run: str, bid: int, h1, h2) -> int:
        """Store one producer block's hash rows AND fold them into the
        run's seen/dup slot bitmaps, so duplicate detection happens HERE —
        inside the overlapped exchange — and the post-materialize report
        only has to verify the (few) candidate slots.

        The dup bitmap is a SUPERSET marker (slot collisions and re-added
        retry parts only ever create false candidates, never false
        negatives — the exact (h1,h2,bid) group logic runs on candidates):
        a row whose slot was seen by ANY earlier add marks dup, and
        within-chunk repeated slots are caught by a chunk-local sort."""
        import numpy as np
        st = self.runs.setdefault(
            run, {'parts': {},
                  'seen': np.zeros((1 << self.SLOT_BITS) >> 6, np.uint64),
                  'dup': np.zeros((1 << self.SLOT_BITS) >> 6, np.uint64)})
        st['parts'][bid] = (h1, h2)
        if len(h1):
            slot = self._slots(np.asarray(h1, dtype=np.uint64))
            w = slot >> 6
            b = np.uint64(1) << (slot & 63).astype(np.uint64)
            seen, dup = st['seen'], st['dup']
            hit = (seen[w] & b) != 0
            if hit.any():
                np.bitwise_or.at(dup, w[hit], b[hit])
            # within-chunk repeats: both occurrences read seen=0 above, so
            # detect repeated slots inside this chunk directly
            s = np.sort(slot)
            rep = np.unique(s[1:][s[1:] == s[:-1]])
            if len(rep):
                np.bitwise_or.at(dup, rep >> 6,
                                 np.uint64(1) << (rep & 63).astype(np.uint64))
            np.bitwise_or.at(seen, w, b)
        return len(h1)

    def total_received(self, run: str) -> int:
        return sum(len(h1) for h1, _ in
                   self.runs.get(run, {}).get('parts', {}).values())

    def clear(self, run: str) -> None:
        """Free one run's hash state once its winners were read (the actor
        stays alive for the pool; a lost payload block's lineage
        re-execution simply re-adds to an empty run dict)."""
        self.runs.pop(run, None)

    def dup_occurrences(self, run: str):
        """(h1, h2, bid) numpy arrays of EVERY occurrence of a hash seen in
        >1 block (the winner selection happens driver-side, so the filter
        can test exact (hash, bid) membership — fail-open by construction).

        The dup-slot bitmap built during ``add`` (i.e. during the overlapped
        exchange, in parallel across reducers) prefilters candidates with
        ONE vectorized gather per stored part — no full-state sort on the
        critical path; the exact (h1, h2) group logic then keeps only true
        multi-occurrence hashes among the candidates."""
        import numpy as np
        z = np.array([], dtype=np.uint64)
        zb = np.array([], dtype=np.int64)
        st = self.runs.get(run)
        if not st or not st['parts']:
            return z, z, zb
        parts = st['parts']
        dup = st['dup']
        cand1, cand2, candb = [], [], []
        for b_, (p1, p2) in parts.items():
            if not len(p1):
                continue
            p1 = np.asarray(p1, dtype=np.uint64)
            slot = self._slots(p1)
            m = (dup[slot >> 6] & (np.uint64(1) << (slot & 63).astype(np.uint64))) != 0
            if m.any():
                cand1.append(p1[m])
                cand2.append(np.asarray(p2, dtype=np.uint64)[m])
                candb.append(np.full(int(m.sum()), b_, dtype=np.int64))
        if not cand1:
            return z, z, zb
        h1 = np.concatenate(cand1)
        h2 = np.concatenate(cand2)
        bid = np.concatenate(candb)
        order = np.lexsort((h2, h1))
        h1, h2, bid = h1[order], h2[order], bid[order]
        new_grp = np.empty(len(h1), dtype=bool)
        new_grp[0] = True
        new_grp[1:] = (h1[1:] != h1[:-1]) | (h2[1:] != h2[:-1])
        starts = np.nonzero(new_grp)[0]
        counts = np.diff(np.append(starts, len(h1)))
        dup_rows = np.repeat(counts > 1, counts)
        return h1[dup_rows], h2[dup_rows], bid[dup_rows]


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
        # cpus//4 keeps the overlapped phase's message count low (a 16-pool
        # A/B measured materialize +1.3-1.8 s from the doubled pushes); the
        # report tail no longer scales with per-reducer volume because dup
        # detection happens in the slot bitmaps during add.  On a real
        # cluster size via GRAFT_DEDUP_REDUCERS ~ (rows x 16 B / 256 MB)
        # spread across nodes.
        import os as _os
        n = int(_os.environ.get('GRAFT_DEDUP_REDUCERS', 0)) \
            or max(2, min(32, _ray_cpus() // 4))
        pool = [_HashBucketReducer.remote() for _ in range(n)]
        # fire-and-forget ping: spawn the worker processes NOW so their
        # startup overlaps the caller's read/extract warm-up instead of
        # stalling the first wave of prep() acks (~1.5 s at 32 CPUs)
        for r in pool:
            r.total_received.remote('_warm')
        _REDUCER_POOL.clear()  # at most one live session per process
        _REDUCER_POOL[job] = pool
    return pool

def _row_hashes(t: pa.Table):
    """Two independent 64-bit row hashes (the 128-bit equality proxy)."""
    import polars as pl
    h1 = pl.from_arrow(t).hash_rows(seed=11).to_numpy().astype('uint64')
    h2 = pl.from_arrow(t).hash_rows(seed=13).to_numpy().astype('uint64')
    return h1, h2


def _content_bid(h1) -> int:
    """Deterministic block id from the block's OWN hash column: recomputable
    by any later pass over the same block (no id column needs to ride on
    the payload), stable across task retries (same content -> same id).
    Two DIFFERENT blocks colliding (twin content or a 2^-64 hash accident)
    overwrite each other in the reducer dict — which the driver's delivery
    verification catches (received < payload rows), degrading to the
    payload exchange; a collision can therefore never produce a wrong
    answer, only a slower plan."""
    import hashlib as _hl
    return int.from_bytes(
        _hl.blake2b(h1.tobytes() + len(h1).to_bytes(8, 'little'),
                    digest_size=8).digest(), 'big') & ((1 << 63) - 1)


def distinct_in_place(ds: ray.data.Dataset, cols: list[str],
                      local_first: bool = True,
                      driver_dup_cap: int = 2_000_000,
                      num_buckets: 'int | None' = None) -> ray.data.Dataset:
    """Exact distinct that never shuffles the payload — and, when there are
    no cross-block duplicates (the normal web-crawl case), never rewrites
    it either.

    1. per block: local distinct + two 64-bit row hashes (h1,h2); the hash
       rows are PUSHED to zero-CPU reducer actors (bucketed by h1, keyed by
       a block id derived from the block's own hash content) while the
       payload pass runs — the exchange fully OVERLAPS payload production
       and NOTHING is appended to the payload, which materializes with its
       caller-visible schema;
    2. the reducers report every occurrence of a hash seen in >1 block
       (a few ms of numpy each, no second barrier);
    3. zero cross-block duplicates -> the materialized payload IS the
       result (no filter pass, no second plasma write); otherwise a filter
       pass RECOMPUTES each block's hashes + content id and drops exactly
       the broadcast (hash, block) loser set — a drop requires exact
       membership, so any anomaly fails OPEN (the copy survives) rather
       than losing data.

    Scales with the DUPLICATE volume, not the data volume: the wide columns
    cross the wire zero times, and the 16-byte hash rows move concurrently
    with the pass that produces them.  Safety rails, in order:
    - the driver verifies the reducers received exactly one hash row per
      payload row (a reducer lost+restarted mid-run, a twin-content block
      pair, or a block-id collision all under-count); on mismatch the
      already-materialized payload reroutes through the bucket-keyed
      ``distinct`` payload exchange — always correct, just not overlapped;
    - above ``driver_dup_cap`` duplicate OCCURRENCES (where the broadcast
      loser set would bottleneck the driver — e.g. a 10% dup rate at
      100 TB) the payload reroutes the same way, automatically.

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
        return pa.table({c: pa.array([], pa.large_string()) for c in cols})

    def prep(t: pa.Table) -> pa.Table:
        from .kernels import table_distinct
        # empty blocks can arrive schema-less (e.g. an empty rule dataset in
        # a union); rebuild a schema-complete empty table
        if t.num_rows == 0 or not set(cols) <= set(t.column_names):
            return _schema_empty()
        t = t.select(cols)
        if local_first:  # skip when the producer already emits block-distinct batches
            t = table_distinct(t)
        h1, h2 = _row_hashes(t)
        bid = _content_bid(h1)
        if t.num_rows:
            b = (h1 % np.uint64(nbuckets)).astype(np.int64)
            try:
                # FIRE-AND-FORGET: waiting on the acks here would serialize
                # reducer round trips into every producer task (measured
                # ~25 s of non-CPU in-UDF wall across the 600k-page headline
                # at 32 CPUs, zero at 8 — an anti-scaling tax).  Producer
                # worker processes outlive the task, so the in-flight pushes
                # drain on their own; the driver POLLS total_received up to
                # the payload row count before reading the dup reports, and
                # any genuinely lost push (worker death after commit) fails
                # that check -> payload-exchange fallback, never a wrong
                # answer.
                for k in np.unique(b):
                    m = b == k
                    reducers[int(k)].add.remote(run, bid, h1[m], h2[m])
            except Exception:
                # a dead/restarted reducer loses these rows; the driver's
                # delivery verification below catches the shortfall
                pass
        return t  # payload unchanged: the hashes travelled out of band

    import os as _os
    import time as _time
    _timing = _os.environ.get('GRAFT_DEDUP_TIMING')
    _t0 = _time.monotonic()
    mat = ds.map_batches(prep, batch_format='pyarrow', batch_size=None).materialize()
    _t_mat = _time.monotonic()

    # the hash exchange already happened during the pass above; the pushes
    # are fire-and-forget, so POLL until every payload row's hash has
    # arrived (tasks are done — the residue is mailbox drain, normally
    # milliseconds), then pull the (tiny) duplicate-occurrence sets.  A
    # shortfall that persists past the deadline means a push was truly lost
    # (producer worker died after its task committed) -> reroute.
    try:
        expected = mat.count()
        deadline = _time.monotonic() + 10.0
        last_rx, last_change = -1, _time.monotonic()
        while True:
            received = sum(ray.get([r.total_received.remote(run) for r in reducers]))
            now = _time.monotonic()
            if received != last_rx:
                last_rx, last_change = received, now
            # received is monotone; a multi-second stall means the reducer
            # mailboxes have drained and the shortfall is REAL — fail fast
            # to the payload exchange instead of burning the full deadline
            if received >= expected or now > deadline or now - last_change > 3.0:
                break
            _time.sleep(0.02)
        _t_poll = _time.monotonic()
        occs = ray.get([r.dup_occurrences.remote(run) for r in reducers]) \
            if received == expected else None
        for r in reducers:
            r.clear.remote(run)
        if _timing:
            import sys as _sys
            print(f'[dedup-timing] materialize={_t_mat - _t0:.2f}s '
                  f'poll={_t_poll - _t_mat:.2f}s '
                  f'reports={_time.monotonic() - _t_poll:.2f}s '
                  f'received={received} expected={expected}', file=_sys.stderr)
    except Exception:
        occs = None  # pool actor died mid-run
    if occs is None:
        import logging
        logging.getLogger(__name__).warning(
            'distinct_in_place: push exchange delivery could not be verified '
            '(reducer restart, twin-content blocks, or an id collision); '
            'rerouting through the keyed payload exchange')
        return distinct(mat, cols, local_first=False)

    dup_h1 = np.concatenate([o[0] for o in occs])
    if not len(dup_h1):  # no cross-block duplicates: the payload IS the result
        return mat
    dup_h2 = np.concatenate([o[1] for o in occs])
    dup_bid = np.concatenate([o[2] for o in occs])
    if len(dup_h1) > driver_dup_cap:
        # duplicate volume too large for a driver-side set: reroute the
        # materialized payload through the keyed-exchange distinct (rows are
        # already block-locally distinct, skip that pass)
        import logging
        logging.getLogger(__name__).info(
            'distinct_in_place: %d cross-block duplicate occurrences exceed '
            'the driver cap (%d); falling back to the keyed-exchange distinct',
            len(dup_h1), driver_dup_cap)
        return distinct(mat, cols, local_first=False)

    # winner per (h1,h2) group = min block id; every other occurrence is a
    # loser, identified by EXACT (h1, h2, bid) membership
    order = np.lexsort((dup_h2, dup_h1))
    g1, g2, gb = dup_h1[order], dup_h2[order], dup_bid[order]
    new_grp = np.empty(len(g1), dtype=bool)
    new_grp[0] = True
    new_grp[1:] = (g1[1:] != g1[:-1]) | (g2[1:] != g2[:-1])
    grp_id = np.cumsum(new_grp) - 1
    mins = np.minimum.reduceat(gb, np.nonzero(new_grp)[0])
    loser_mask = gb != mins[grp_id]
    losers = {(int(a), int(b), int(w))
              for a, b, w in zip(g1[loser_mask], g2[loser_mask], gb[loser_mask])}
    ref = ray.put(losers)
    cand_h1 = np.unique(dup_h1)

    def keep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        lset = ray.get(ref)
        h1, h2 = _row_hashes(t)  # same block content -> same hashes as prep
        bid = _content_bid(h1)
        mask = np.ones(len(h1), dtype=bool)
        # vectorized candidate prefilter: only rows whose h1 is among the
        # (few) duplicated hashes need the python set probe
        for i in np.nonzero(np.isin(h1, cand_h1))[0]:
            if (int(h1[i]), int(h2[i]), bid) in lset:
                mask[i] = False
        return t.filter(pa.array(mask))

    return mat.map_batches(keep, batch_format='pyarrow', batch_size=None)


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
