"""Representative conformance subset (the full corpus runs via
scripts/sweep_conformance.py; latest full-sweep status is recorded in
BASELINE.md).  Uses one session-scoped Ray fixture."""

import glob
import os

import pytest

from tc_harness import assert_tc_matches, expects_error, run_tc

ROOT = '/root/reference/test'

SUBSET = (
    # rml-core across source formats
    'rml-core/csv/RMLTC0000', 'rml-core/csv/RMLTC0001a', 'rml-core/csv/RMLTC0002a',
    'rml-core/csv/RMLTC0004a', 'rml-core/csv/RMLTC0006a', 'rml-core/csv/RMLTC0007d',
    'rml-core/csv/RMLTC0009a', 'rml-core/csv/RMLTC0010b', 'rml-core/csv/RMLTC0015a',
    'rml-core/csv/RMLTC0019a', 'rml-core/csv/RMLTC0020a',
    'rml-core/json/RMLTC0001a', 'rml-core/json/RMLTC0007a', 'rml-core/json/RMLTC0009a',
    'rml-core/json/complex',
    'rml-core/xml/RMLTC0002a', 'rml-core/xml/attributes',
    'rml-core/tabular/RMLTC0002a_PARQUET',
    # joins / star / views / functions / in-memory
    'rml-star/RMLSTARTC002a', 'rml-star/RMLSTARTC004a', 'rml-star/RMLSTARTC008a',
    'rml-tv/RMLTVTC0002d', 'rml-tv/RMLTVTC0015a',
    'rml-fnml/RMLFNOTC0004-CSV', 'rml-fnml/controls_if', 'rml-fnml/udf',
    'rml-in-memory/json_dictionary/RMLIMTC0001a', 'rml-in-memory/dataframe/RMLIMTC0001a',
    'issues/issue_81', 'issues/issue_118',
)


@pytest.mark.parametrize('tc', SUBSET)
def test_conformance_case(ray_session, tc):
    tc_dir = os.path.join(ROOT, tc)
    if not os.path.isdir(tc_dir):
        pytest.skip(f'{tc} not in corpus snapshot')
    if expects_error(tc_dir):
        with pytest.raises(Exception):
            run_tc(tc_dir)
    else:
        assert_tc_matches(tc_dir)


def test_yarrrml_complex_matches_golden(ray_session):
    """The YARRRML form of the complex TC must be isomorphic to the same
    golden as its Turtle twin."""
    from morph_kgc_ray import Config, materialize_set
    from morph_kgc_ray.mapping.yarrrml import yarrrml_to_turtle
    from morph_kgc_ray.testing import graphs_equal, parse_nquads, triples_set_to_quads

    tc = os.path.join(ROOT, 'rml-core/json/complex')
    ttl = yarrrml_to_turtle(open(os.path.join(tc, 'mapping.yaml'), encoding='utf-8').read())
    cfg = Config({'DS1': {}, 'source_base_dir': tc, 'output_format': 'N-QUADS'})
    cfg.set_mappings_document('DS1', ttl)
    ours = triples_set_to_quads(materialize_set(cfg))
    golden = parse_nquads(open(os.path.join(tc, 'output.nq'), encoding='utf-8').read())
    assert graphs_equal(ours, golden)


def test_tabular_views_concurrent_pipelines(ray_session):
    """Two pipelines with DIFFERENT source_base_dirs built and consumed
    interleaved: the DuckDB view evaluation must not mutate process-global
    state (the old os.chdir around view SQL raced exactly here)."""
    import threading

    from tc_harness import run_tc

    results = {}

    def run(name, tc):
        results[name] = run_tc(tc)

    t1 = threading.Thread(target=run, args=('a', '/root/reference/test/rml-tv/RMLTVTC0003b'))
    t2 = threading.Thread(target=run, args=('b', '/root/reference/test/rml-core/csv/RMLTC0001a'))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert len(results['a']) > 0 and len(results['b']) > 0
