"""Shared helper to run a reference conformance test-case directory through
the Ray engine and compare against its golden output.nq."""

from __future__ import annotations

import glob
import os

from morph_kgc_ray import Config, materialize_set
from morph_kgc_ray.testing import graphs_equal, parse_nquads, triples_set_to_quads

REFERENCE_TEST_ROOT = '/root/reference/test'


def run_tc(tc_dir: str, output_format: str = 'N-QUADS', python_source=None,
           extra_options: 'dict | None' = None):
    mapping_candidates = sorted(glob.glob(os.path.join(tc_dir, 'mapping*.ttl')))
    if not mapping_candidates:  # YARRRML-only test case
        mapping_candidates = sorted(glob.glob(os.path.join(tc_dir, 'mapping*.yml'))
                                    + glob.glob(os.path.join(tc_dir, 'mapping*.yaml')))
    assert mapping_candidates, f'no mapping in {tc_dir}'
    options = {
        'DataSource1': {'mappings': ','.join(mapping_candidates)},
        'source_base_dir': '/root/reference',
        'source_fallback_dir': tc_dir,
        'output_format': output_format,
    }
    udfs = glob.glob(os.path.join(tc_dir, 'udf*.py'))
    if udfs:
        options['udfs'] = udfs[0]
    if extra_options:
        options.update(extra_options)
    dbs = glob.glob(os.path.join(tc_dir, '*.db'))
    if dbs:
        options['DataSource1']['db_url'] = f'sqlite:///{dbs[0]}'
    cfg = Config(options)
    if python_source is None:
        python_source = extract_python_source(tc_dir)
    return materialize_set(cfg, python_source=python_source)


def extract_python_source(tc_dir: str):
    """The in-memory TCs define their python_source dicts inline in the test
    file and pass them to ``materialize(config, data_dict)``.  Recover that
    dict by literal-evaluating the assignments in the test function (the
    corpus uses pure literals plus pandas.DataFrame(...) construction)."""
    import ast

    import pandas as pd

    for path in sorted(glob.glob(os.path.join(tc_dir, 'test_*.py'))):
        tree = ast.parse(open(path, encoding='utf-8').read())
        env: dict = {}
        data_arg_name = None
        for node in ast.walk(tree):
            if isinstance(node, ast.Assign) and len(node.targets) == 1 and isinstance(node.targets[0], ast.Name):
                name = node.targets[0].id
                try:
                    env[name] = ast.literal_eval(node.value)
                    continue
                except Exception:
                    pass
                # pd.DataFrame(<literal>) / DataFrame(data=<literal>)
                v = node.value
                if isinstance(v, ast.Call) and getattr(v.func, 'attr', getattr(v.func, 'id', '')) == 'DataFrame':
                    try:
                        args = [ast.literal_eval(a) for a in v.args]
                        kwargs = {k.arg: ast.literal_eval(k.value) for k in v.keywords}
                        env[name] = pd.DataFrame(*args, **kwargs)
                    except Exception:
                        pass
            if isinstance(node, ast.Call) and getattr(node.func, 'attr', '') in ('materialize', 'materialize_set'):
                if len(node.args) >= 2 and isinstance(node.args[1], ast.Name):
                    data_arg_name = node.args[1].id
                elif len(node.args) >= 2:
                    try:
                        return ast.literal_eval(node.args[1])
                    except Exception:
                        pass
        if data_arg_name is not None and data_arg_name in env:
            value = env[data_arg_name]
            if isinstance(value, dict):
                # values may themselves be names resolved in env
                return value
    # second pass: dict whose values are env names
    for path in sorted(glob.glob(os.path.join(tc_dir, 'test_*.py'))):
        tree = ast.parse(open(path, encoding='utf-8').read())
        env = {}
        for node in ast.walk(tree):
            if isinstance(node, ast.Assign) and len(node.targets) == 1 and isinstance(node.targets[0], ast.Name):
                name = node.targets[0].id
                v = node.value
                try:
                    env[name] = ast.literal_eval(v)
                except Exception:
                    import pandas as pd
                    if isinstance(v, ast.Call) and getattr(v.func, 'attr', getattr(v.func, 'id', '')) == 'DataFrame':
                        try:
                            args = [ast.literal_eval(a) for a in v.args]
                            kwargs = {k.arg: ast.literal_eval(k.value) for k in v.keywords}
                            env[name] = pd.DataFrame(*args, **kwargs)
                        except Exception:
                            pass
                    elif isinstance(v, ast.Dict):
                        try:
                            keys = [ast.literal_eval(k) for k in v.keys]
                            vals = []
                            for val in v.values:
                                if isinstance(val, ast.Name) and val.id in env:
                                    vals.append(env[val.id])
                                else:
                                    vals.append(ast.literal_eval(val))
                            env[name] = dict(zip(keys, vals))
                        except Exception:
                            pass
        for name, value in env.items():
            if isinstance(value, dict) and 'variable' in str(list(value.keys())):
                return value
    return None


def expects_error(tc_dir: str) -> bool:
    """The (forked) reference marks expected-failure TCs with a
    try/except-assert-True test body; detect that to skip golden compare."""
    for path in glob.glob(os.path.join(tc_dir, 'test_*.py')):
        src = open(path, encoding='utf-8').read()
        if 'assert False' in src and 'except' in src:
            return True
    return False


def assert_tc_matches(tc_dir: str, output_format: str = 'N-QUADS',
                      extra_options: 'dict | None' = None):
    triples = run_tc(tc_dir, output_format=output_format, extra_options=extra_options)
    golden_path = os.path.join(tc_dir, 'output.nq')
    with open(golden_path, encoding='utf-8') as f:
        golden = parse_nquads(f.read())
    ours = triples_set_to_quads(triples)
    assert graphs_equal(ours, golden), (
        f'{tc_dir}: mismatch\n  missing: {sorted(golden - ours)[:5]}\n  extra:   {sorted(ours - golden)[:5]}')
