"""Resumable partitioned N-Triples / N-Quads sink — task-side shard writes
over any ``pyarrow.fs.FileSystem`` (local disk, S3/GCS, or a caller-supplied
filesystem such as ``SubTreeFileSystem``).

Layout (designed for idempotent re-execution at cluster scale):

    out_dir/
      part=<mapping_partition>/
        shard_<uuid>.nt         # one file per output block, written BY THE TASK
        _MANIFEST.json          # committed AFTER all shards: row count + names

Every shard file is written inside the ``map_batches`` task that owns the
block — the driver never sees triple payloads, only the tiny per-shard count
rows returned by the writer stage (partition, shard, rows).  A partition
directory missing its manifest is considered incomplete and is re-executed
from scratch on resume.  This is the Ray-scale replacement for the
reference's append-with-fsync per-group files (utils.py:285-297,
config.py:282-297).

Commit protocol, per filesystem capability:

- **Local filesystems** (plain paths, ``file://`` URIs): shards go to a
  ``<dir>.tmp`` staging directory; the commit is a POSIX-atomic directory
  rename (``pyarrow.fs.LocalFileSystem.move`` == ``rename(2)``), so readers
  never observe a partial partition directory.
- **Object stores / remote filesystems** (``s3://`` etc., or any non-local
  ``FileSystem`` instance): directory rename does not exist, so shards are
  written to their final prefix and the ``_MANIFEST.json`` PUT is the commit
  marker — single-object writes are atomic on every real object store.
  Readers (and resume) treat a prefix without a manifest as incomplete.

Task-retry idempotence (both protocols): a Ray task that fails AFTER writing
its shard (or a block recomputed by lineage reconstruction) leaves an orphan
file whose count row never reached the driver.  The manifest therefore
records every committed shard NAME, and the commit step PRUNES any ``*.nt``
file not in that list before committing — consumers globbing
``part=*/*.nt`` after commit see exactly the manifest's shards, never
duplicates.

``FileSystem`` instances are picklable, so the writer callables ship to Ray
workers with the filesystem inside them; on a multi-node cluster every task
writes straight to the shared store with no driver funnel.
"""

from __future__ import annotations

import json
import os
import posixpath
import uuid

import pyarrow as pa
import pyarrow.compute as pc
from pyarrow import fs as pafs


# --------------------------------------------------------------------------
# filesystem resolution + small fs helpers
# --------------------------------------------------------------------------

def resolve_filesystem(uri: str, filesystem: 'pafs.FileSystem | None' = None):
    """(filesystem, path) for an output location.  ``uri`` may be a plain
    local path, a ``file://``/``s3://``-style URI, or any path when an
    explicit ``filesystem`` is given."""
    if filesystem is not None:
        return filesystem, uri.rstrip('/')
    if isinstance(uri, str) and '://' in uri:
        f, path = pafs.FileSystem.from_uri(uri)
        return f, path.rstrip('/')
    return pafs.LocalFileSystem(), os.path.abspath(uri)


def _atomic_rename(f: pafs.FileSystem) -> bool:
    """True when the filesystem supports atomic directory rename (local
    disk); object stores and wrapped filesystems use manifest-commit."""
    return isinstance(f, pafs.LocalFileSystem)


def _exists(f: pafs.FileSystem, path: str) -> bool:
    return f.get_file_info(path).type != pafs.FileType.NotFound


def _delete_dir(f: pafs.FileSystem, path: str) -> None:
    if _exists(f, path):
        f.delete_dir(path)


def _list_names(f: pafs.FileSystem, dir_path: str) -> list:
    """Base names of regular files directly under ``dir_path``."""
    sel = pafs.FileSelector(dir_path, recursive=False, allow_not_found=True)
    return [posixpath.basename(info.path) for info in f.get_file_info(sel)
            if info.type == pafs.FileType.File]


def _read_json(f: pafs.FileSystem, path: str) -> dict:
    with f.open_input_stream(path) as stream:
        return json.loads(stream.read().decode('utf-8'))


def _write_json(f: pafs.FileSystem, path: str, obj) -> None:
    """Manifest write.  On local filesystems go through a temp file + rename
    so a crash mid-write can never leave a truncated manifest that resume
    would misread as a completed partition; object-store PUTs are atomic."""
    data = json.dumps(obj).encode('utf-8')
    if _atomic_rename(f):
        tmp = f'{path}.inprogress'
        with f.open_output_stream(tmp) as stream:
            stream.write(data)
        f.move(tmp, path)
    else:
        with f.open_output_stream(path) as stream:
            stream.write(data)


def _prune_unlisted(f: pafs.FileSystem, dir_path: str, committed: set) -> None:
    """Delete ``*.nt`` files not in the committed-shard set (orphans from
    retried/re-executed tasks whose count rows never reached the driver)."""
    for name in _list_names(f, dir_path):
        if name.endswith('.nt') and name not in committed:
            f.delete_file(posixpath.join(dir_path, name))


def _sanitize(partition_id: str) -> str:
    return ''.join(c if (c.isalnum() or c in '-_.') else '_' for c in str(partition_id))


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
    ``shard_<uuid>.nt`` per block into ``tmp_dir`` (the staging dir on local
    filesystems, the final prefix on object stores) and returns a count row.
    ``fs`` pickles with the callable, so every Ray task writes directly to
    the target filesystem."""

    def __init__(self, fs: pafs.FileSystem, tmp_dir: str, partition: str,
                 column: str = 'triple'):
        self.fs = fs
        self.tmp_dir = tmp_dir
        self.partition = partition
        self.column = column

    def __call__(self, t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _COUNT_SCHEMA.empty_table()
        name = f'shard_{uuid.uuid4().hex[:12]}.nt'
        self.fs.create_dir(self.tmp_dir, recursive=True)
        with self.fs.open_output_stream(posixpath.join(self.tmp_dir, name)) as f:
            f.write(_join_lines(t[self.column]))
        return pa.table({'partition': pa.array([self.partition], pa.string()),
                         'shard': pa.array([name], pa.string()),
                         'rows': pa.array([t.num_rows], pa.int64())})


class _PartitionedShardWriter:
    """map_batches writer for datasets carrying a ``partition`` column plus
    (subject, predicate, object[, graph]): splits the block by partition and
    writes one shard per (block, partition) into ``tmp_dir/part=<p>/``."""

    def __init__(self, fs: pafs.FileSystem, tmp_dir: str,
                 partition_col: str = 'partition'):
        self.fs = fs
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
            pdir = posixpath.join(self.tmp_dir, f'part={_sanitize(part)}')
            self.fs.create_dir(pdir, recursive=True)
            name = f'shard_{uuid.uuid4().hex[:12]}.nt'
            with self.fs.open_output_stream(posixpath.join(pdir, name)) as f:
                f.write(_join_lines(sel))
            out_part.append(part)
            out_shard.append(name)
            out_rows.append(len(sel))
        return pa.table({'partition': pa.array(out_part, pa.string()),
                         'shard': pa.array(out_shard, pa.string()),
                         'rows': pa.array(out_rows, pa.int64())})


def _write_one_partition(f: pafs.FileSystem, root: str, pid, ds,
                         resume: bool, atomic: bool) -> dict:
    """Write one mapping-partition Dataset into ``part=<pid>/`` and commit
    its manifest.  Shares no state with other partitions (distinct staging
    dirs, distinct manifests), so callers may run many of these
    concurrently."""
    pdir = posixpath.join(root, f'part={_sanitize(pid)}')
    manifest_path = posixpath.join(pdir, '_MANIFEST.json')
    if resume and _exists(f, manifest_path):
        manifest = _read_json(f, manifest_path)
        return {'rows': manifest['rows'], 'skipped': True}
    if ds is None:  # plan-time skip placeholder whose manifest disappeared
        raise ValueError(f'partition {pid!r} was planned as committed but '
                         f'{manifest_path} is missing — re-run without resume')
    if atomic:
        stage = pdir + '.tmp'
        _delete_dir(f, stage)
        _delete_dir(f, pdir)
    else:
        # object store: no rename — stage IS the final prefix; clear any
        # incomplete previous attempt (no manifest == incomplete)
        stage = pdir
        _delete_dir(f, pdir)
    f.create_dir(stage, recursive=True)

    # task-side writes; only (partition, shard, rows) rows reach the driver
    import time as _time
    t0 = _time.time()
    counts = ds.map_batches(_TripleShardWriter(f, stage, pid),
                            batch_format='pyarrow').take_all()
    rows = sum(r['rows'] for r in counts)
    shards = sorted(r['shard'] for r in counts)
    f.create_dir(stage, recursive=True)  # 0-block datasets never created it
    _prune_unlisted(f, stage, set(shards))
    # per-partition lineage METRICS alongside the commit record: byte size
    # (from the staged shards' file info) and write wall time — readers
    # that only consume 'rows'/'shards' are unaffected by extra keys
    n_bytes = sum(
        (fi.size or 0) for fi in f.get_file_info(
            [posixpath.join(stage, s) for s in shards]))
    _write_json(f, posixpath.join(stage, '_MANIFEST.json'),
                {'partition': pid, 'rows': rows, 'shards': shards,
                 'bytes': int(n_bytes),
                 'write_sec': round(_time.time() - t0, 3)})
    if atomic:
        f.move(stage, pdir)
    return {'rows': rows, 'skipped': False}


def write_partitioned_ntriples(partitions: dict, out_dir: str, resume: bool = True,
                               filesystem: 'pafs.FileSystem | None' = None,
                               max_concurrent: int = 4) -> dict:
    """Write each mapping-partition Dataset as ``<triple> .`` lines, one shard
    file per block, written inside the tasks that hold the blocks.

    The per-partition pipelines share no state (disjoint staging dirs and
    manifests — the partitioner's disjointness theorem), so up to
    ``max_concurrent`` of them execute CONCURRENTLY from driver threads;
    each Dataset execution has its own streaming executor and they share
    the cluster's resources, so a mapping with many small partitions no
    longer serializes its output phase on per-execution fixed costs.

    ``out_dir`` may be a local path or a filesystem URI; pass ``filesystem``
    to supply an explicit ``pyarrow.fs.FileSystem`` for plain paths.

    Returns {partition_id: {'rows': n, 'skipped': bool}}."""
    from concurrent.futures import ThreadPoolExecutor

    f, root = resolve_filesystem(out_dir, filesystem)
    f.create_dir(root, recursive=True)
    atomic = _atomic_rename(f)
    items = list(partitions.items())
    if len(items) <= 1 or max_concurrent <= 1:
        return {pid: _write_one_partition(f, root, pid, ds, resume, atomic)
                for pid, ds in items}
    with ThreadPoolExecutor(max_workers=min(max_concurrent, len(items))) as pool:
        futures = {pid: pool.submit(_write_one_partition, f, root, pid, ds,
                                    resume, atomic)
                   for pid, ds in items}
        return {pid: fut.result() for pid, fut in futures.items()}


def write_partition_column_ntriples(triples, out_dir: str, resume: bool = True,
                                    partition_col: str = 'partition',
                                    filesystem: 'pafs.FileSystem | None' = None) -> dict:
    """Sink for a (partition, subject, predicate, object[, graph]) Dataset:
    each task splits its block by partition label and writes
    ``part=<p>/shard_<uuid>.nt`` files directly; the driver aggregates only
    the tiny count rows and commits the manifest (atomic rename on local
    disk, manifest-PUT commit marker on object stores)."""
    f, root = resolve_filesystem(out_dir, filesystem)
    manifest_path = posixpath.join(root, '_MANIFEST.json')
    if resume and _exists(f, manifest_path):
        return _read_json(f, manifest_path)

    atomic = _atomic_rename(f)
    if atomic:
        stage = root + '.tmp'
        _delete_dir(f, stage)
    else:
        stage = root
        _delete_dir(f, root)
    f.create_dir(stage, recursive=True)
    counts: dict[str, int] = {}
    shards: dict[str, list] = {}
    for r in triples.map_batches(_PartitionedShardWriter(f, stage, partition_col),
                                 batch_format='pyarrow').take_all():
        counts[r['partition']] = counts.get(r['partition'], 0) + r['rows']
        shards.setdefault(r['partition'], []).append(r['shard'])
    committed_by_dir = {f'part={_sanitize(p)}': set(v) for p, v in shards.items()}
    sel = pafs.FileSelector(stage, recursive=False, allow_not_found=True)
    for info in f.get_file_info(sel):
        entry = posixpath.basename(info.path)
        if entry.startswith('part=') and info.type == pafs.FileType.Directory:
            committed = committed_by_dir.get(entry, set())
            _prune_unlisted(f, posixpath.join(stage, entry), committed)
            if not committed:  # directory holds only orphans: drop it
                _delete_dir(f, posixpath.join(stage, entry))
    for names in shards.values():
        names.sort()
    report = {'partitions': counts, 'total': sum(counts.values()),
              'shards': shards}
    _write_json(f, posixpath.join(stage, '_MANIFEST.json'), report)
    if atomic:
        _delete_dir(f, root)
        f.move(stage, root)
    return report
