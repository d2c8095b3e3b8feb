"""Offline conformance scoreboard: run reference TC dirs through the Ray
engine and report pass/fail per suite.  Usage:

    python scripts/sweep_conformance.py [suite ...]   # default: rml-core

Suites: rml-core rml-star rml-fnml rml-tv rml-cc rml-in-memory issues
"""

from __future__ import annotations

import glob
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ray

ray.init(address='local', num_cpus=8, include_dashboard=False, logging_level='ERROR')
from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False
import logging

logging.getLogger('ray.data').setLevel(logging.ERROR)

from tests.tc_harness import assert_tc_matches, expects_error, run_tc

SUITES = sys.argv[1:] or ['rml-core']
ROOT = '/root/reference/test'

# Documented deviations / environment gaps (see tests/test_conformance.py).
# Each entry maps the skipped TC to the EXACT golden-vs-spec evidence so a
# reviewer can re-adjudicate without re-deriving.  Context for the r2rml
# group: these goldens keep W3C canonical-datatype forms while the fork's
# sqlite path never infers datatypes (typeof('col') bug, relational_db.py:105)
# and its other 40+ adapted goldens match that no-inference behavior (which
# we replicate); 0003a/0020a/0020b goldens additionally disagree with their
# own bundled data.
KNOWN_SKIPS = {
    'RMLFNOTC0000-CSV':
        "uuid() built-in is nondeterministic; golden pins one value "
        "(output.nq hardcodes 'e911c639-...' which no engine can reproduce)",
    'r2rml/R2RMLTC0003a':
        'fork golden output.nq is 0 BYTES while mapping.ttl + resource.db '
        '(2 rows, 4 term maps) produce triples — golden inconsistent with '
        'its own data',
    'r2rml/R2RMLTC0012a':
        'golden says \'"30"^^xsd:integer\' but resource.sql declares '
        '"amount" FLOAT (R2RML natural mapping => xsd:double "3.0E1") — '
        'golden/data disagree',
    'r2rml/R2RMLTC0012e':
        'golden annotates the inferred double (\'"3.0E1"^^xsd:double\') '
        'while 0016b\'s golden leaves the identical FLOAT inference '
        'UNannotated — the two fork goldens are mutually inconsistent',
    'r2rml/R2RMLTC0020a':
        "golden subject is <...base/http%3A%2F%2Fexample.com%2Fcompany%2F"
        "Alice> but resource.db's Student.Name row is "
        "'http://company.com/Alice' (company.com, not example.com) — "
        'golden/data disagree',
    'r2rml/R2RMLTC0020b':
        "same bundled resource.db as 0020a: golden IRIs say example.com/"
        "company/Alice, the data says http://company.com/Alice — "
        'golden/data disagree',
    'r2rml/R2RMLTC0002b':
        'fork test driver expects an environment-specific ERROR, but the '
        'bundled W3C golden output.nq is a normal 6-triple output '
        '(_:students10 foaf:name "Venus" ...), which this engine produces',
}

# TCs whose goldens keep the W3C natural-mapping datatype forms: run them
# with SQL datatype inference enabled (the fork's sqlite inference is a no-op
# — typeof('col') bug, relational_db.py:102 — so its other r2rml goldens were
# adapted to no-inference output; these kept canonical forms)
INFER_DT_TCS = (
    'r2rml/R2RMLTC0005b', 'r2rml/R2RMLTC0007e', 'r2rml/R2RMLTC0007f',
    'r2rml/R2RMLTC0008a', 'r2rml/R2RMLTC0016b', 'r2rml/R2RMLTC0016c',
    'r2rml/R2RMLTC0016d',
)

# W3C "undefined reference" error TCs: run with strict_undefined_references
# (default is the reference's effective file behavior — missing references
# fill with nulls and the rule generates nothing, which real corpus mappings
# like rml-core/json/complex rely on)
STRICT_REF_TCS = (
    'json/RMLTC0002c', 'xml/RMLTC0002c', 'json_dictionary/RMLIMTC0002c',
)

# e.g. GRAFT_PARTITIONING=MAXIMAL re-runs the sweep under the other
# mapping-partition algorithm (results must be partition-invariant)
EXTRA = ({'mapping_partitioning': os.environ['GRAFT_PARTITIONING']}
         if os.environ.get('GRAFT_PARTITIONING') else {})

results = {}
failures = []
for suite in SUITES:
    tc_dirs = sorted(
        d for d in glob.glob(os.path.join(ROOT, suite, '**/'), recursive=True)
        if os.path.exists(os.path.join(d, 'output.nq')) and (
            glob.glob(os.path.join(d, 'mapping*.ttl')) or glob.glob(os.path.join(d, 'mapping*.yml'))))
    npass = nfail = 0
    for d in tc_dirs:
        name = os.path.relpath(d, ROOT)
        try:
            if any(x in name for x in KNOWN_SKIPS):
                continue
            if expects_error(d):
                strict = ({'strict_undefined_references': 'yes'}
                          if any(x in name for x in STRICT_REF_TCS) else None)
                try:
                    run_tc(d, extra_options=strict)
                    raise AssertionError('expected an error, but materialization succeeded')
                except AssertionError:
                    raise
                except Exception:
                    pass  # error expected
            elif any(x in name for x in INFER_DT_TCS):
                assert_tc_matches(d, extra_options={'infer_sql_datatypes': 'yes', **EXTRA})
            else:
                assert_tc_matches(d, extra_options=EXTRA or None)
            npass += 1
        except Exception as e:
            nfail += 1
            failures.append((name, e))
    results[suite] = (npass, nfail, len(tc_dirs))

print()
for suite, (npass, nfail, total) in results.items():
    print(f'{suite}: {npass}/{total} pass, {nfail} fail')
print()
for name, e in failures[:int(os.environ.get("SHOW_FAILS", "20"))]:
    msg = str(e).splitlines()
    print('FAIL', name, '::', msg[0][:160] if msg else type(e).__name__)
    for line in msg[1:3]:
        print('      ', line[:200])
ray.shutdown()
