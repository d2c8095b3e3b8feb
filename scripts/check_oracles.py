"""Driver-mimicking correctness harness: run each queries() entry and its
oracle_sql() side-by-side over a testdata dir and compare row count, schema
(column names) and an order-insensitive value multiset.

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

TABLES = ['region', 'nation', 'customer', 'supplier', 'part', 'orders',
          'lineitem', 'events', 'documents', 'embeddings']


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data
    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def canon(df: pd.DataFrame) -> list:
    df = df[sorted(df.columns)]
    rows = []
    for tup in df.itertuples(index=False):
        rows.append(tuple(_norm(v) for v in tup))
    return sorted(rows)


def _norm(v):
    import numpy as np
    if isinstance(v, (float, np.floating)):
        return round(float(v), 9)
    if isinstance(v, (int, np.integer)):
        return int(v)
    if isinstance(v, bytes):
        return v
    return str(v)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.01'
    only = set(sys.argv[2:])

    import ray
    if not ray.is_initialized():
        ray.init(address='local', num_cpus=8, include_dashboard=False,
                 logging_level='ERROR')
    sys.path.insert(0, '/root/repo')
    import __ray_entry__ as entrymod

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    failures = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        sql = oracles.get(name)
        t0 = time.time()
        try:
            got = canon(to_pandas(fn(sf_dir)))
        except Exception as e:
            print(f'{name}: RAY ERROR {type(e).__name__}: {e}')
            failures += 1
            continue
        t_ray = time.time() - t0
        if sql is None:
            print(f'{name}: rows-only ({len(got)} rows, {t_ray:.1f}s ray)')
            continue
        t0 = time.time()
        try:
            want_df = con.execute(sql).fetch_df()
            want = canon(want_df)
        except Exception as e:
            print(f'{name}: SQL ERROR {type(e).__name__}: {e}')
            failures += 1
            continue
        t_sql = time.time() - t0
        ok_rows = len(got) == len(want)
        ok_vals = got == want
        status = 'OK' if (ok_rows and ok_vals) else 'MISMATCH'
        if status != 'OK':
            failures += 1
        print(f'{name}: {status} ray={len(got)} sql={want_df.shape[0]} '
              f'({t_ray:.1f}s ray, {t_sql:.1f}s sql)')
        if not ok_vals and ok_rows:
            diff_g = [r for r in got if r not in set(want)][:3]
            diff_w = [r for r in want if r not in set(got)][:3]
            print('  only-ray:', diff_g)
            print('  only-sql:', diff_w)
        elif not ok_rows:
            sg, sw = set(got), set(want)
            print('  only-ray:', list(sg - sw)[:3])
            print('  only-sql:', list(sw - sg)[:3])
    print('FAILURES:', failures)
    return failures


if __name__ == '__main__':
    sys.exit(1 if main() else 0)
