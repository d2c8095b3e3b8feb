"""RML-CC (collections & containers) gather materialization.

The reference builds rdf:List / Bag / Seq / Alt structures with globally
sequential blank-node counters over sorted DataFrames
(/root/reference/src/morph_kgc/materializer.py:237-892).  Those labels are
arbitrary under RDF graph isomorphism, so this implementation derives
deterministic per-group labels from a hash of (rule id, group key) and
builds each collection after co-locating its rows:

    read_source(keep_order, null_ok_refs=gather refs if allowEmpty)
      -> hash repartition keyed on the group columns   [one exchange]
      -> per-block pandas groupby -> collection triples [map_batches]

Semantics:
- group key: the subject-template references (named subjects) or the source
  record id (__record) for unnamed subject gathers;
- element order: source-row order (__order) within a group; multi-reference
  gathers append ref-by-ref in gather-list order (rml:append strategy);
- empty collections (allowEmptyListAndContainer): List -> rdf:nil object;
  Bag/Seq/Alt -> typed empty container head.

Partitioning assumption: all rows of one collection group land in one block
(guaranteed by the keyed repartition).
"""

from __future__ import annotations

import hashlib

import pandas as pd
import pyarrow as pa

from ..constants import (
    RDF_ALT,
    RDF_BAG,
    RDF_FIRST,
    RDF_LIST,
    RDF_NAMESPACE,
    RDF_NIL,
    RDF_REST,
    RDF_SEQ,
    RDF_TYPE,
    RML_GATHER,
    RML_TEMPLATE,
)
from .kernels import escape_literal_array, materialize_term

_FIRST = f'<{RDF_FIRST}>'
_REST = f'<{RDF_REST}>'
_NIL = f'<{RDF_NIL}>'
_TYPE = f'<{RDF_TYPE}>'
_CONTAINER_TYPES = {RDF_BAG: f'<{RDF_BAG}>', RDF_SEQ: f'<{RDF_SEQ}>', RDF_ALT: f'<{RDF_ALT}>'}


def _bnode(rule_id: str, group_key: str, suffix: str = '') -> str:
    h = hashlib.blake2b(f'{rule_id}|{group_key}|{suffix}'.encode(), digest_size=10).hexdigest()
    return f'_:g{h}'


def _collection_triples(head: str, elements: list[str], gather_as: str,
                        rule_id: str, group_key: str) -> list[tuple[str, str, str]]:
    out = []
    if gather_as == RDF_LIST:
        nodes = [head] + [_bnode(rule_id, group_key, f'n{i}') for i in range(1, len(elements))]
        for i, el in enumerate(elements):
            out.append((nodes[i], _FIRST, el))
            out.append((nodes[i], _REST, nodes[i + 1] if i + 1 < len(elements) else _NIL))
    else:
        out.append((head, _TYPE, _CONTAINER_TYPES[gather_as]))
        for i, el in enumerate(elements, start=1):
            out.append((head, f'<{RDF_NAMESPACE}_{i}>', el))
    return out


def _group_elements(g: pd.DataFrame, refs: list[str]) -> list[str]:
    """Element terms of one group: append refs in gather-list order, each
    ref's distinct non-null values in source order (rml:append).  ``g`` is
    already __order-sorted (the batch presorts once — per-group sorts were
    the hot spot for many-group batches)."""
    elements: list[str] = []
    for ref in refs:
        col = f'__elem_{ref}'
        vals = g[col].dropna()
        seen = set()
        for v in vals:
            if v not in seen:
                seen.add(v)
                elements.append(v)
    return elements


def materialize_gather_rule(data, rule, config):
    """(subject, predicate, object) Dataset for a gather rule; covers named
    and unnamed collections in object maps and subject maps."""
    from .materializer import _nn, _plan_for_position

    from .kernels import get_references_in_template

    rule_id = str(rule['triples_map_id'])
    gather_as = _nn(rule.get('gatherAs')) or _nn(rule.get('gatherAs_subject'))
    allow_empty = _nn(rule.get('allowEmptyListAndContainer')).lower() == 'true'
    refs = [r.strip() for r in _nn(rule.get('gather_references')).split(',') if r.strip()]
    subject_gather = pd.notna(rule.get('gather_subject')) or rule.get('subject_map_type') == RML_GATHER

    subject_is_template = rule['subject_map_type'] == RML_TEMPLATE
    subject_plan = _plan_for_position(rule, 'subject', config) if subject_is_template else None
    subject_refs = get_references_in_template(rule['subject_map_value']) if subject_is_template else []
    predicate_plan = _plan_for_position(rule, 'predicate', config) if pd.notna(rule['predicate_map_type']) else None

    named_object = (not subject_gather) and rule['object_map_type'] == RML_TEMPLATE
    head_plan = _plan_for_position(rule, 'object', config) if named_object else None

    om_plan = None
    if subject_gather and pd.notna(rule['object_map_type']) and not pd.notna(rule.get('gather')):
        om_plan = _plan_for_position(rule, 'object', config)

    if subject_is_template:
        group_cols = list(subject_refs)
    else:
        group_cols = ['__record']

    def build(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        empty = pa.table({'subject': pa.array([], pa.large_string()),
                          'predicate': pa.array([], pa.large_string()),
                          'object': pa.array([], pa.large_string())})
        if df.empty:
            return empty
        arrow = pa.Table.from_pandas(df, preserve_index=False)
        for ref in refs:
            col = arrow[ref].combine_chunks().cast(pa.large_string())
            esc = escape_literal_array(col)
            df[f'__elem_{ref}'] = ['"' + v + '"' if v is not None else None for v in esc.to_pylist()]
        if subject_plan is not None:
            df['__subj'] = materialize_term(arrow, subject_plan).to_pylist()
        if predicate_plan is not None:
            df['__pred'] = materialize_term(arrow, predicate_plan).to_pylist()
        if head_plan is not None:
            df['__head'] = materialize_term(arrow, head_plan).to_pylist()
        if om_plan is not None:
            df['__obj'] = materialize_term(arrow, om_plan).to_pylist()

        triples: list[tuple[str, str, str]] = []
        # ONE presort by (group, source order): groupby preserves row order
        # within groups, so _group_elements never re-sorts per group
        df = df.sort_values(group_cols + ['__order'], kind='stable')
        for key, g in df.groupby(group_cols, sort=True, dropna=False):
            gkey = '|'.join(str(k) for k in (key if isinstance(key, tuple) else (key,)))
            elements = _group_elements(g, refs)
            if not elements and not allow_empty:
                continue  # empty collection disallowed -> rule emits nothing
            if subject_gather:
                head = g['__subj'].iloc[0] if subject_is_template else _bnode(rule_id, gkey, 'head')
                if not elements and gather_as == RDF_LIST:
                    head = _NIL
                triples.extend(_collection_triples(head, elements, gather_as, rule_id, gkey)
                               if (elements or gather_as != RDF_LIST) else [])
                if predicate_plan is not None and om_plan is not None:
                    triples.append((head, g['__pred'].iloc[0], g['__obj'].iloc[0]))
            else:
                subj = g['__subj'].iloc[0]
                pred = g['__pred'].iloc[0]
                if gather_as == RDF_LIST and not elements:
                    triples.append((subj, pred, _NIL))
                    continue
                head = g['__head'].iloc[0] if named_object else _bnode(rule_id, gkey, 'head')
                triples.append((subj, pred, head))
                triples.extend(_collection_triples(head, elements, gather_as, rule_id, gkey))

        if not triples:
            return empty
        s, p, o = zip(*triples)
        return pa.table({'subject': pa.array(list(s), pa.large_string()),
                         'predicate': pa.array(list(p), pa.large_string()),
                         'object': pa.array(list(o), pa.large_string())})

    from .dedup import _ray_cpus
    try:
        # scale the keyed exchange with the session, not a hard-coded 8
        data = data.repartition(max(8, _ray_cpus()), keys=group_cols, sort=False)
    except Exception:
        data = data.repartition(1)
    return data.map_batches(build, batch_format='pyarrow')
