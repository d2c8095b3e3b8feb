"""Local replica of the driver's DuckDB-oracle comparison: run every
queries() entry at the given sf and compare against oracle_sql() —
row count, column names, order-insensitive value hash."""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ray

ray.init(address='local', num_cpus=int(os.environ.get('NCPU', '8')),
         include_dashboard=False, logging_level='ERROR')
from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False

import duckdb
import pandas as pd

import __ray_entry__ as entrymod

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.01'
ONLY = sys.argv[2:] or None

con = duckdb.connect()
for t in ['region', 'nation', 'customer', 'supplier', 'part', 'orders', 'lineitem',
          'events', 'documents', 'embeddings']:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    import ray.data
    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].copy()
    rows = sorted(df.astype(str).itertuples(index=False, name=None))
    return hashlib.sha256(repr(rows).encode()).hexdigest()[:16]


Q = entrymod.queries()
O = entrymod.oracle_sql()
for name, fn in Q.items():
    if ONLY and name not in ONLY:
        continue
    t0 = time.time()
    try:
        ours = to_pandas(fn(SF_DIR))
    except Exception as e:
        print(f'{name}: ERROR {type(e).__name__}: {str(e)[:200]}')
        continue
    took = time.time() - t0
    if name not in O:
        print(f'{name}: rows-only  rows={len(ours)}  cols={sorted(ours.columns)}  {took:.1f}s')
        continue
    golden = con.execute(O[name]).df()
    ok_rows = len(ours) == len(golden)
    ok_cols = sorted(ours.columns) == sorted(golden.columns)
    ok_hash = value_hash(ours) == value_hash(golden) if ok_rows and ok_cols else False
    status = 'OK' if (ok_rows and ok_cols and ok_hash) else 'MISMATCH'
    print(f'{name}: {status}  rows={len(ours)}/{len(golden)}  cols_ok={ok_cols}  hash_ok={ok_hash}  {took:.1f}s')
    if status == 'MISMATCH' and ok_cols and len(ours) and len(golden):
        a = ours[sorted(ours.columns)].astype(str)
        b = golden[sorted(golden.columns)].astype(str)
        sa = set(map(tuple, a.itertuples(index=False, name=None)))
        sb = set(map(tuple, b.itertuples(index=False, name=None)))
        for r in list(sb - sa)[:2]:
            print('   miss :', str(r)[:180])
        for r in list(sa - sb)[:2]:
            print('   extra:', str(r)[:180])
ray.shutdown()
