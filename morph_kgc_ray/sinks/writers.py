"""Resumable partitioned N-Triples / N-Quads sink.

Layout (designed for idempotent re-execution at cluster scale):

    out_dir/
      part=<mapping_partition>/
        shard_<i>.nt            # one file per output block
        _MANIFEST.json          # committed AFTER all shards: row count + names

A partition directory missing its manifest is considered incomplete and is
re-executed from scratch on resume (writes go to a temp dir first, then an
atomic rename).  This is the Ray-scale replacement for the reference's
append-with-fsync per-group files (utils.py:285-297, config.py:282-297).
"""

from __future__ import annotations

import json
import os
import shutil

import pyarrow as pa


def _sanitize(partition_id: str) -> str:
    return ''.join(c if (c.isalnum() or c in '-_.') else '_' for c in str(partition_id))


def write_partitioned_ntriples(partitions: dict, out_dir: str, resume: bool = True) -> dict:
    """Write each mapping-partition Dataset as `<triple> .` lines.

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

        rows = 0
        shards = []
        # stream blocks to shard files; shard granularity = output batch
        for i, batch in enumerate(ds.iter_batches(batch_size=1 << 20, batch_format='pyarrow')):
            name = f'shard_{i:05d}.nt'
            with open(os.path.join(tmp_dir, name), 'w', encoding='utf-8') as f:
                for t in batch['triple'].to_pylist():
                    f.write(f'{t} .\n')
            rows += batch.num_rows
            shards.append(name)
        with open(os.path.join(tmp_dir, '_MANIFEST.json'), 'w', encoding='utf-8') as f:
            json.dump({'partition': pid, 'rows': rows, 'shards': shards}, f)
        os.replace(tmp_dir, pdir)
        report[pid] = {'rows': rows, 'skipped': False}
    return report
