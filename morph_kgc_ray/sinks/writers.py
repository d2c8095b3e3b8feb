"""Resumable partitioned N-Triples / N-Quads sink — task-side shard writes.

Layout (designed for idempotent re-execution at cluster scale):

    out_dir/
      part=<mapping_partition>/
        shard_<uuid>.nt         # one file per output block, written BY THE TASK
        _MANIFEST.json          # committed AFTER all shards: row count + names

Every shard file is written inside the ``map_batches`` task that owns the
block — the driver never sees triple payloads, only the tiny per-shard count
rows returned by the writer stage (partition, shard, rows).  A partition
directory missing its manifest is considered incomplete and is re-executed
from scratch on resume (writes go to a temp dir first, then an atomic
rename).  This is the Ray-scale replacement for the reference's
append-with-fsync per-group files (utils.py:285-297, config.py:282-297).

Task-retry idempotence: a Ray task that fails AFTER writing its shard (or a
block recomputed by lineage reconstruction) leaves an orphan file in the tmp
dir whose count row never reached the driver.  The manifest therefore
records every committed shard NAME, and the commit step PRUNES any ``*.nt``
file not in that list before the atomic rename — consumers globbing
``part=*/*.nt`` see exactly the manifest's shards, never duplicates.

On a multi-node cluster ``out_dir`` is shared storage (NFS / fuse-mounted
object store); the shard-per-block + rename-on-commit protocol is the same.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

import pyarrow as pa
import pyarrow.compute as pc


def _sanitize(partition_id: str) -> str:
    return ''.join(c if (c.isalnum() or c in '-_.') else '_' for c in str(partition_id))


def _prune_unlisted(dir_path: str, committed: set) -> None:
    """Delete ``*.nt`` files not in the committed-shard set (orphans from
    retried/re-executed tasks whose count rows never reached the driver)."""
    for name in os.listdir(dir_path):
        if name.endswith('.nt') and name not in committed:
            os.unlink(os.path.join(dir_path, name))


def _join_lines(arr: pa.Array) -> bytes:
    """Vectorized ``<line> .\n`` file body from an array of triple strings."""
    arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    if len(arr) == 0:
        return b''
    if pa.types.is_large_string(arr.type):
        lst = pa.LargeListArray.from_arrays(
            pa.array([0, len(arr)], pa.int64()), arr)
    else:
        lst = pa.ListArray.from_arrays(pa.array([0, len(arr)], pa.int32()), arr)
    sep = pa.scalar(' .\n', pa.large_string() if pa.types.is_large_string(arr.type)
                    else pa.string())
    body = pc.binary_join(lst, sep)[0].as_py()
    return body.encode('utf-8') + b' .\n'


_COUNT_SCHEMA = pa.schema([('partition', pa.string()), ('shard', pa.string()),
                           ('rows', pa.int64())])


class _TripleShardWriter:
    """map_batches writer for single-partition triple datasets: writes one
    ``shard_<uuid>.nt`` per block into ``tmp_dir`` and returns a count row."""

    def __init__(self, tmp_dir: str, partition: str, column: str = 'triple'):
        self.tmp_dir = tmp_dir
        self.partition = partition
        self.column = column

    def __call__(self, t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _COUNT_SCHEMA.empty_table()
        name = f'shard_{uuid.uuid4().hex[:12]}.nt'
        os.makedirs(self.tmp_dir, exist_ok=True)
        with open(os.path.join(self.tmp_dir, name), 'wb') as f:
            f.write(_join_lines(t[self.column]))
        return pa.table({'partition': pa.array([self.partition], pa.string()),
                         'shard': pa.array([name], pa.string()),
                         'rows': pa.array([t.num_rows], pa.int64())})


class _PartitionedShardWriter:
    """map_batches writer for datasets carrying a ``partition`` column plus
    (subject, predicate, object[, graph]): splits the block by partition and
    writes one shard per (block, partition) into ``tmp_dir/part=<p>/``."""

    def __init__(self, tmp_dir: str, partition_col: str = 'partition'):
        self.tmp_dir = tmp_dir
        self.partition_col = partition_col

    def __call__(self, t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _COUNT_SCHEMA.empty_table()
        term_cols = [c for c in ('subject', 'predicate', 'object', 'graph')
                     if c in t.column_names]
        lines = pc.binary_join_element_wise(
            *[t[c].combine_chunks().cast(pa.large_string()) for c in term_cols],
            pa.scalar(' ', pa.large_string()))
        parts = t[self.partition_col]
        out_part, out_shard, out_rows = [], [], []
        for part in pc.unique(parts.combine_chunks()).to_pylist():
            sel = lines.filter(pc.equal(parts, part).combine_chunks())
            pdir = os.path.join(self.tmp_dir, f'part={_sanitize(part)}')
            os.makedirs(pdir, exist_ok=True)
            name = f'shard_{uuid.uuid4().hex[:12]}.nt'
            with open(os.path.join(pdir, name), 'wb') as f:
                f.write(_join_lines(sel))
            out_part.append(part)
            out_shard.append(name)
            out_rows.append(len(sel))
        return pa.table({'partition': pa.array(out_part, pa.string()),
                         'shard': pa.array(out_shard, pa.string()),
                         'rows': pa.array(out_rows, pa.int64())})


def write_partitioned_ntriples(partitions: dict, out_dir: str, resume: bool = True) -> dict:
    """Write each mapping-partition Dataset as ``<triple> .`` lines, one shard
    file per block, written inside the tasks that hold the blocks.

    Returns {partition_id: {'rows': n, 'skipped': bool}}."""
    os.makedirs(out_dir, exist_ok=True)
    report = {}
    for pid, ds in partitions.items():
        pdir = os.path.join(out_dir, f'part={_sanitize(pid)}')
        manifest_path = os.path.join(pdir, '_MANIFEST.json')
        if resume and os.path.exists(manifest_path):
            with open(manifest_path, encoding='utf-8') as f:
                manifest = json.load(f)
            report[pid] = {'rows': manifest['rows'], 'skipped': True}
            continue
        tmp_dir = pdir + '.tmp'
        shutil.rmtree(tmp_dir, ignore_errors=True)
        shutil.rmtree(pdir, ignore_errors=True)
        os.makedirs(tmp_dir)

        # task-side writes; only (partition, shard, rows) rows reach the driver
        counts = ds.map_batches(_TripleShardWriter(tmp_dir, pid),
                                batch_format='pyarrow').take_all()
        rows = sum(r['rows'] for r in counts)
        shards = sorted(r['shard'] for r in counts)
        os.makedirs(tmp_dir, exist_ok=True)  # 0-block datasets never created it
        _prune_unlisted(tmp_dir, set(shards))
        with open(os.path.join(tmp_dir, '_MANIFEST.json'), 'w', encoding='utf-8') as f:
            json.dump({'partition': pid, 'rows': rows, 'shards': shards}, f)
        os.replace(tmp_dir, pdir)
        report[pid] = {'rows': rows, 'skipped': False}
    return report


def write_partition_column_ntriples(triples, out_dir: str, resume: bool = True,
                                    partition_col: str = 'partition') -> dict:
    """Sink for a (partition, subject, predicate, object[, graph]) Dataset:
    each task splits its block by partition label and writes
    ``part=<p>/shard_<uuid>.nt`` files directly; the driver aggregates only
    the tiny count rows and commits the manifest (atomic rename)."""
    manifest_path = os.path.join(out_dir, '_MANIFEST.json')
    if resume and os.path.exists(manifest_path):
        with open(manifest_path, encoding='utf-8') as f:
            return json.load(f)

    tmp = out_dir + '.tmp'
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)
    counts: dict[str, int] = {}
    shards: dict[str, list] = {}
    for r in triples.map_batches(_PartitionedShardWriter(tmp, partition_col),
                                 batch_format='pyarrow').take_all():
        counts[r['partition']] = counts.get(r['partition'], 0) + r['rows']
        shards.setdefault(r['partition'], []).append(r['shard'])
    committed_by_dir = {f'part={_sanitize(p)}': set(v) for p, v in shards.items()}
    for entry in os.listdir(tmp):
        if entry.startswith('part=') and os.path.isdir(os.path.join(tmp, entry)):
            committed = committed_by_dir.get(entry, set())
            _prune_unlisted(os.path.join(tmp, entry), committed)
            if not committed:  # directory holds only orphans: drop it
                shutil.rmtree(os.path.join(tmp, entry), ignore_errors=True)
    for names in shards.values():
        names.sort()
    report = {'partitions': counts, 'total': sum(counts.values()),
              'shards': shards}
    with open(os.path.join(tmp, '_MANIFEST.json'), 'w', encoding='utf-8') as f:
        json.dump(report, f)
    shutil.rmtree(out_dir, ignore_errors=True)
    os.replace(tmp, out_dir)
    return report
