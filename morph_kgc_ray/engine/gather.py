"""RML-CC (collections & containers) gather materialization.

The reference builds rdf:List / Bag / Seq / Alt structures with globally
sequential blank-node counters over a sorted DataFrame
(/root/reference/src/morph_kgc/materializer.py:237-892).  Those labels are
arbitrary under RDF graph isomorphism, so the Ray design derives
deterministic per-group labels from (rule id, group key) and builds each
collection inside ``groupby(key).map_groups`` — a keyed shuffle instead of a
global sequential scan.

Implemented in a later milestone of this round; the dispatch hook exists so
the planner can route CC rules here.
"""

from __future__ import annotations


def materialize_gather_rule(data, rule, config):
    raise NotImplementedError(
        'RML-CC gather materialization is scheduled after the core conformance '
        'suites; rule: ' + str(rule.get('triples_map_id')))
