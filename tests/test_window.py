"""Sessionization + as-of join operators (ops/window.py)."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from morph_kgc_ray.ops.window import asof_join_prior, sessionize

US = 1_000_000


def _events(rows):
    """rows: (event_id, user_id, ts_seconds, event_type, value)"""
    return ray.data.from_arrow(pa.table({
        'event_id': pa.array([r[0] for r in rows], pa.int64()),
        'user_id': pa.array([r[1] for r in rows], pa.int64()),
        'ts': pa.array([r[2] * US for r in rows], pa.timestamp('us')),
        'event_type': pa.array([r[3] for r in rows], pa.string()),
        'value': pa.array([r[4] for r in rows], pa.float64()),
    }))


@pytest.mark.parametrize('small', [True, False])
def test_sessionize_gap_boundaries(ray_session, small):
    # user 7: events at t=0, 100 (inside gap), 301 (new session: gap 201 > 200)
    # user 9: single event
    ds = _events([(1, 7, 0, 'view', 1.0), (2, 7, 100, 'click', 2.5),
                  (3, 7, 301, 'view', 0.25), (4, 9, 50, 'view', 10.0)])
    out = sessionize(ds, gap_us=200 * US, value_col='value',
                     small=small).to_pandas()
    out = out.sort_values(['user_id', 'session_id']).reset_index(drop=True)
    assert list(out['user_id']) == [7, 7, 9]
    assert list(out['session_id']) == [1, 2, 1]
    assert list(out['n_events']) == [2, 1, 1]
    assert list(out['start_us']) == [0, 301 * US, 50 * US]
    assert list(out['duration_us']) == [100 * US, 0, 0]
    assert list(out['sum_value_cents']) == [350, 25, 1000]


def test_sessionize_exact_gap_is_same_session(ray_session):
    # gap equal to the threshold stays in the session (<= gap, not <)
    ds = _events([(1, 1, 0, 'view', 0.0), (2, 1, 200, 'view', 0.0)])
    out = sessionize(ds, gap_us=200 * US, small=True).to_pandas()
    assert len(out) == 1
    assert out['n_events'][0] == 2


@pytest.mark.parametrize('small', [True, False])
def test_asof_prior_view_per_user(ray_session, small):
    ds = _events([
        (1, 7, 0, 'view', 0.0),     # view A
        (2, 7, 10, 'click', 0.0),   # -> view A
        (3, 7, 20, 'view', 0.0),    # view B
        (4, 7, 30, 'click', 0.0),   # -> view B
        (5, 9, 5, 'click', 0.0),    # no prior view for user 9 -> null
        (6, 9, 6, 'view', 0.0),
        (7, 9, 7, 'click', 0.0),    # -> event 6
    ])
    out = asof_join_prior(ds, small=small).to_pandas()
    out = out.sort_values('click_id').reset_index(drop=True)
    assert list(out['click_id']) == [2, 4, 5, 7]
    matched = out['view_event_id']
    assert list(matched[:2]) == [1, 3]
    assert pd.isna(matched[2])  # left-outer: no prior view
    assert matched[3] == 6
    assert out['view_ts_us'][3] == 6 * US


def test_asof_same_timestamp_tie_order(ray_session):
    # a view at the SAME microsecond with a smaller event_id counts as prior;
    # with a larger event_id it does not
    ds = _events([(1, 1, 5, 'view', 0.0), (2, 1, 5, 'click', 0.0),
                  (4, 2, 5, 'view', 0.0), (3, 2, 5, 'click', 0.0)])
    out = asof_join_prior(ds, small=True).to_pandas().set_index('click_id')
    assert out.loc[2, 'view_event_id'] == 1
    assert pd.isna(out.loc[3, 'view_event_id'])


def test_window_cross_user_isolation_distributed(ray_session):
    # 40 users x 3 events; the view of user u must never attribute a click
    # of user u+1 even when co-located in one hash bucket
    rows = []
    eid = 0
    for u in range(40):
        rows.append((eid, u, 1000 * u, 'view', 1.0)); eid += 1
        rows.append((eid, u, 1000 * u + 1, 'click', 1.0)); eid += 1
        rows.append((eid, u, 1000 * u + 2, 'purchase', 1.0)); eid += 1
    ds = _events(rows)
    out = asof_join_prior(ds, small=False, num_partitions=4).to_pandas()
    assert len(out) == 40
    assert (out['view_event_id'] == out['click_id'] - 1).all()
    sess = sessionize(ds, gap_us=10 * US, small=False,
                      num_partitions=4).to_pandas()
    assert len(sess) == 40  # one session per user
    assert (sess['n_events'] == 3).all()
    assert sorted(sess['user_id']) == list(range(40))


@pytest.mark.parametrize('small', [True, False])
def test_rolling_agg_window_and_segment_clipping(ray_session, small):
    from morph_kgc_ray.ops.window import rolling_agg
    # user 1: values 1.00, 3.00, 2.00, 5.00 -> trailing-3 sums/mins
    # user 2: single event (window clipped to the segment)
    ds = _events([(1, 1, 0, 'view', 1.0), (2, 1, 1, 'view', 3.0),
                  (3, 1, 2, 'view', 2.0), (4, 1, 3, 'view', 5.0),
                  (5, 2, 0, 'view', 9.0)])
    out = rolling_agg(ds, window=3, small=small).to_pandas()
    out = out.sort_values('event_id').reset_index(drop=True)
    assert list(out['rn']) == [1, 2, 3, 4, 1]
    assert list(out['roll_sum_cents']) == [100, 400, 600, 1000, 900]
    assert list(out['roll_min_cents']) == [100, 100, 100, 200, 900]


def test_redact_pii_sequential_semantics(ray_session):
    from morph_kgc_ray.ops.text import redact_pii
    ds = ray.data.from_arrow(pa.table({'text': pa.array([
        'mail a.b+c@x.co or 192.168.0.1 then +1 555-0100 done',
        'no pii here', None], pa.string())}))
    out = redact_pii(ds).to_pandas()
    assert out['text_redacted'][0] == 'mail <EMAIL> or <IP> then <PHONE> done'
    assert (out['n_email'].tolist(), out['n_ipv4'].tolist(),
            out['n_phone'].tolist()) == ([1, 0, 0], [1, 0, 0], [1, 0, 0])
    assert out['text_redacted'][1] == 'no pii here'
    assert out['text_redacted'][2] == ''  # null text -> empty, not a crash


@pytest.mark.parametrize('small', [True, False])
def test_paragraph_counts_finds_repeats(ray_session, small):
    from morph_kgc_ray.ops.text import paragraph_counts
    docs = ['unique one\nshared footer', 'unique two\nshared footer',
            'unique three\nshared footer\nother']
    ds = ray.data.from_arrow(pa.table({'text': pa.array(docs, pa.string())}))
    out = paragraph_counts(ds, min_count=2, small=small).to_pandas()
    assert out.set_index('paragraph')['n_occurrences'].to_dict() == {
        'shared footer': 3}
    full = paragraph_counts(ds, min_count=1, small=small).to_pandas()
    assert full['n_occurrences'].sum() == 7  # every paragraph counted once


@pytest.mark.parametrize('small', [True, False])
def test_stratified_sample_global_exactness(ray_session, small):
    """The local-prefilter plan must equal a driver-side global computation
    even when each group's rows are spread across many blocks."""
    import numpy as np

    from morph_kgc_ray.ops.sample import stratified_sample
    ids = np.arange(400, dtype=np.int64)
    groups = [f'g{int(i) % 7}' for i in ids]
    ds = ray.data.from_arrow(pa.table({
        'doc_id': pa.array(ids), 'lang': pa.array(groups, pa.string()),
    })).repartition(8)  # spread every group across blocks
    out = stratified_sample(ds, group_col='lang', id_col='doc_id', k=3,
                            seed=7, small=small).to_pandas()
    # driver-side reference
    h = (ids.astype(np.uint64) * np.uint64(2654435761) + np.uint64(7)) % np.uint64(1 << 32)
    import pandas as pd
    ref = pd.DataFrame({'doc_id': ids, 'lang': groups, 'h': h.astype('int64')})
    ref = ref.sort_values(['lang', 'h', 'doc_id'])
    ref['rn'] = ref.groupby('lang').cumcount() + 1
    ref = ref[ref['rn'] <= 3][['doc_id', 'lang', 'rn']]
    got = out.sort_values(['lang', 'rn']).reset_index(drop=True)
    exp = ref.sort_values(['lang', 'rn']).reset_index(drop=True)
    assert got.to_dict('list') == exp.to_dict('list')


def test_sessionize_random_matches_pandas_reference(ray_session):
    """Randomized cross-check: sessionize over 600 events / 25 users must
    match a straightforward pandas gaps-and-islands computation."""
    import numpy as np
    import pandas as pd

    from morph_kgc_ray.ops.window import sessionize
    rng = np.random.default_rng(1234)
    n = 600
    df = pd.DataFrame({
        'event_id': np.arange(n, dtype=np.int64),
        'user_id': rng.integers(0, 25, n).astype(np.int64),
        'ts_us': rng.integers(0, 10_000, n).astype(np.int64) * 1_000_000,
        'value': np.round(rng.uniform(0, 50, n), 2),
    })
    gap = 500 * 1_000_000
    ds = ray.data.from_arrow(pa.table({
        'event_id': pa.array(df['event_id']),
        'user_id': pa.array(df['user_id']),
        'ts': pa.array(df['ts_us'], pa.timestamp('us')),
        'value': pa.array(df['value']),
    })).repartition(6)
    got = sessionize(ds, gap_us=gap, value_col='value', small=False) \
        .to_pandas().sort_values(['user_id', 'session_id']).reset_index(drop=True)

    r = df.sort_values(['user_id', 'ts_us', 'event_id']).reset_index(drop=True)
    new_s = (r['user_id'].diff() != 0) | (r['ts_us'].diff() > gap)
    r['sid'] = new_s.groupby(r['user_id']).cumsum().astype('int64')
    r['cents'] = np.floor(r['value'] * 100).astype('int64')
    exp = r.groupby(['user_id', 'sid']).agg(
        n_events=('event_id', 'size'), start_us=('ts_us', 'min'),
        end_us=('ts_us', 'max'), sum_value_cents=('cents', 'sum')).reset_index()
    exp = exp.sort_values(['user_id', 'sid']).reset_index(drop=True)
    assert got['n_events'].tolist() == exp['n_events'].tolist()
    assert got['start_us'].tolist() == exp['start_us'].tolist()
    assert got['end_us'].tolist() == exp['end_us'].tolist()
    assert got['sum_value_cents'].tolist() == exp['sum_value_cents'].tolist()
    assert got['session_id'].tolist() == exp['sid'].tolist()


def test_window_ops_string_keys(ray_session):
    """The keyed exchange + sorted scans must work with string keys too
    (polars hash + object-dtype boundary comparison)."""
    from morph_kgc_ray.ops.window import sessionize

    t = pa.table({
        'event_id': pa.array([1, 2, 3, 4], pa.int64()),
        'user_id': pa.array(['alice', 'alice', 'bob', 'bob'], pa.string()),
        'ts': pa.array([0, 5 * US, 0, 500 * US], pa.timestamp('us')),
    })
    out = sessionize(ray.data.from_arrow(t).repartition(3), gap_us=100 * US,
                     small=False, num_partitions=2).to_pandas()
    got = out.set_index(['user_id', 'session_id'])['n_events'].to_dict()
    assert got == {('alice', 1): 2, ('bob', 1): 1, ('bob', 2): 1}


def test_window_ops_empty_buckets_string_keys(ray_session):
    """More partitions than keys -> empty blocks; their synthesized schema
    must carry the key's REAL type (string) or the union fails."""
    from morph_kgc_ray.ops.window import asof_join_prior, rolling_agg, sessionize

    t = pa.table({
        'event_id': pa.array([1, 2, 3], pa.int64()),
        'user_id': pa.array(['a', 'a', 'b'], pa.string()),
        'ts': pa.array([0, US, 2 * US], pa.timestamp('us')),
        'event_type': pa.array(['view', 'click', 'click'], pa.string()),
        'value': pa.array([1.0, 2.0, 3.0], pa.float64()),
    })
    ds = ray.data.from_arrow(t)
    s = sessionize(ds, gap_us=10 * US, value_col='value',
                   num_partitions=8).to_pandas()
    assert len(s) == 2
    a = asof_join_prior(ds, num_partitions=8).to_pandas()
    assert len(a) == 2
    r = rolling_agg(ds, window=2, num_partitions=8).to_pandas()
    assert len(r) == 3


def test_range_join_plans_agree(ray_session):
    """Banded and broadcast range-join plans produce identical matches,
    including multi-band intervals, half-open upper bounds, and keys with
    no intervals."""
    import pandas as pd

    from morph_kgc_ray.ops.window import range_join

    left = ray.data.from_arrow(pa.table({
        'user_id': pa.array([1, 1, 1, 2, 2, 3], pa.int64()),
        'ts': pa.array([10 * US, 50 * US, 120 * US, 10 * US, 200 * US,
                        5 * US], pa.timestamp('us')),
        'event_id': pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
    })).repartition(3)
    right = ray.data.from_arrow(pa.table({
        'user_id': pa.array([1, 2, 9], pa.int64()),
        'wid': pa.array([100, 200, 900], pa.int64()),
        # user 1: [0, 50s) — hi exclusive, event at exactly 50s must NOT
        # match; user 2: [150s, 260s) spans 4+ bands at band=30s
        'lo_us': pa.array([0, 150 * US, 0], pa.int64()),
        'hi_us': pa.array([50 * US, 260 * US, 1000 * US], pa.int64()),
    }))
    want = [(1, 100), (5, 200)]
    for bc in (True, False):
        out = range_join(left, right, band_us=30 * US,
                         broadcast=bc).to_pandas()
        got = sorted(zip(out['event_id'], out['wid']))
        assert got == want, (bc, got)


def test_range_join_empty_interval_dropped(ray_session):
    from morph_kgc_ray.ops.window import range_join

    left = ray.data.from_arrow(pa.table({
        'user_id': pa.array([1], pa.int64()),
        'ts': pa.array([0], pa.timestamp('us')),
        'event_id': pa.array([1], pa.int64())}))
    right = ray.data.from_arrow(pa.table({
        'user_id': pa.array([1], pa.int64()),
        'wid': pa.array([7], pa.int64()),
        'lo_us': pa.array([0], pa.int64()),
        'hi_us': pa.array([0], pa.int64())}))  # zero-width: matches nothing
    for bc in (True, False):
        assert range_join(left, right, band_us=US, broadcast=bc).count() == 0


def test_range_join_empty_left_side(ray_session):
    """An all-empty LEFT side must not crash the banded hash join (Ray's
    shuffle drops schemas of 0-row bundles) — the probe guard returns a
    correctly-typed empty result on either empty side."""
    from morph_kgc_ray.ops.window import range_join

    left = ray.data.from_arrow(pa.table({
        'user_id': pa.array([], pa.int64()),
        'ts': pa.array([], pa.timestamp('us')),
        'event_id': pa.array([], pa.int64())}))
    right = ray.data.from_arrow(pa.table({
        'user_id': pa.array([1], pa.int64()),
        'wid': pa.array([7], pa.int64()),
        'lo_us': pa.array([0], pa.int64()),
        'hi_us': pa.array([US], pa.int64())}))
    for bc in (True, False):
        out = range_join(left, right, band_us=US, broadcast=bc)
        assert out.count() == 0
    # the banded guard synthesizes a typed empty result
    banded = range_join(left, right, band_us=US, broadcast=False)
    assert set(banded.schema().names) >= {'user_id', 'ts', 'event_id', 'wid'}


def test_grouped_quantiles(ray_session):
    """Exact integer-index quantiles: p50 at rank (50*(n-1))//100 of the
    sorted values, per key, both plans."""
    from morph_kgc_ray.ops.agg import grouped_quantiles

    t = pa.table({
        'k': pa.array([1, 1, 1, 1, 2, 2, 3], pa.int64()),
        'v': pa.array([40, 10, 30, 20, 7, 5, 9], pa.int64())})
    for small in (True, False):
        out = grouped_quantiles(ray.data.from_arrow(t).repartition(3),
                                'k', 'v', percents=(0, 50, 100),
                                small=small).to_pandas().set_index('k')
        # k=1 sorted [10,20,30,40]: p0=10, p50 rank (50*3)//100=1 -> 20, p100=40
        assert (out.loc[1, 'p0'], out.loc[1, 'p50'], out.loc[1, 'p100']) \
            == (10, 20, 40)
        assert (out.loc[2, 'p50'], out.loc[3, 'p50']) == (5, 9)
        assert out['n'].to_dict() == {1: 4, 2: 2, 3: 1}
