"""Shared helper to run a reference conformance test-case directory through
the Ray engine and compare against its golden output.nq."""

from __future__ import annotations

import glob
import os

from morph_kgc_ray import Config, materialize_set
from morph_kgc_ray.testing import graphs_equal, parse_nquads, triples_set_to_quads

REFERENCE_TEST_ROOT = '/root/reference/test'


def run_tc(tc_dir: str, output_format: str = 'N-QUADS', python_source=None):
    mapping_candidates = sorted(glob.glob(os.path.join(tc_dir, 'mapping*.ttl')))
    if not mapping_candidates:  # YARRRML-only test case
        mapping_candidates = sorted(glob.glob(os.path.join(tc_dir, 'mapping*.yml'))
                                    + glob.glob(os.path.join(tc_dir, 'mapping*.yaml')))
    assert mapping_candidates, f'no mapping in {tc_dir}'
    cfg = Config({
        'DataSource1': {'mappings': ','.join(mapping_candidates)},
        'source_base_dir': '/root/reference',
        'source_fallback_dir': tc_dir,
        'output_format': output_format,
    })
    return materialize_set(cfg, python_source=python_source)


def expects_error(tc_dir: str) -> bool:
    """The (forked) reference marks expected-failure TCs with a
    try/except-assert-True test body; detect that to skip golden compare."""
    for path in glob.glob(os.path.join(tc_dir, 'test_*.py')):
        src = open(path, encoding='utf-8').read()
        if 'assert False' in src and 'except' in src:
            return True
    return False


def assert_tc_matches(tc_dir: str, output_format: str = 'N-QUADS'):
    triples = run_tc(tc_dir, output_format=output_format)
    golden_path = os.path.join(tc_dir, 'output.nq')
    with open(golden_path, encoding='utf-8') as f:
        golden = parse_nquads(f.read())
    ours = triples_set_to_quads(triples)
    assert graphs_equal(ours, golden), (
        f'{tc_dir}: mismatch\n  missing: {sorted(golden - ours)[:5]}\n  extra:   {sorted(ours - golden)[:5]}')
