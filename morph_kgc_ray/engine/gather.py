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


def _group_digest(rule_id: str, group_key: str) -> str:
    """ONE deterministic digest per (rule, group); every blank node of the
    group derives from it by a cheap suffix (``h`` for the head, ``n<i>``
    for list tail nodes) instead of re-hashing per node — labels are
    arbitrary under RDF graph isomorphism, only determinism and uniqueness
    matter."""
    return hashlib.blake2b(f'{rule_id}|{group_key}'.encode(), digest_size=10).hexdigest()


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
        """Vectorized collection assembly over the presorted block.

        One stable presort by (group, source order), then every step is a
        numpy/pandas array pass over the block — group boundaries from
        run-length changes, per-(group, value) dedup via ``duplicated``,
        element indices via run arithmetic, list ``rdf:rest`` chaining via a
        shifted node array.  Blank-node labels hash ONCE per group
        (``_group_digest``) and derive per-node by suffix — labels are free
        under graph isomorphism (the golden comparison canonicalizes
        bnodes).  Replaces the per-group loop that was ~20x slower on
        many-group batches."""
        import numpy as np
        import pyarrow.compute as pc

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
            quoted = pc.binary_join_element_wise(
                pa.scalar('"', pa.large_string()), esc,
                pa.scalar('"', pa.large_string()), pa.scalar('', pa.large_string()))
            df[f'__elem_{ref}'] = quoted.to_pandas()
        if subject_plan is not None:
            df['__subj'] = materialize_term(arrow, subject_plan).to_pylist()
        if predicate_plan is not None:
            df['__pred'] = materialize_term(arrow, predicate_plan).to_pylist()
        if head_plan is not None:
            df['__head'] = materialize_term(arrow, head_plan).to_pylist()
        if om_plan is not None:
            df['__obj'] = materialize_term(arrow, om_plan).to_pylist()

        return assemble_collections(
            df, group_cols, refs, rule_id=rule_id, gather_as=gather_as,
            allow_empty=allow_empty, subject_gather=subject_gather,
            subject_is_template=subject_is_template, named_object=named_object,
            emit_pred_obj=predicate_plan is not None and om_plan is not None)

    if data is None:  # testing seam: hand the batch kernel to the caller
        return build

    from .dedup import _ray_cpus
    try:
        # scale the keyed exchange with the session, not a hard-coded 8
        data = data.repartition(max(8, _ray_cpus()), keys=group_cols, sort=False)
    except Exception:
        data = data.repartition(1)
    return data.map_batches(build, batch_format='pyarrow')


def assemble_collections(df, group_cols, refs, *, rule_id, gather_as,
                         allow_empty, subject_gather, subject_is_template,
                         named_object, emit_pred_obj) -> pa.Table:
    """Vectorized collection assembly over an enriched block (``__elem_*``
    quoted-literal columns plus ``__subj``/``__pred``/``__head``/``__obj``
    term columns).  ONE stable presort by (group, source order), then every
    step is a numpy/pandas array pass: group boundaries from run-length
    changes, per-(group, value) dedup via ``duplicated``, element indices
    via run arithmetic, list ``rdf:rest`` chaining via a shifted node
    array.  Blank-node labels hash ONCE per group (``_group_digest``) and
    derive per-node by suffix — labels are free under graph isomorphism
    (the golden comparison canonicalizes bnodes).  Module-level so the
    kernel test can time it against the per-group loop it replaced (~19x
    at 20k groups x 10 elements)."""
    import numpy as np

    empty = pa.table({'subject': pa.array([], pa.large_string()),
                      'predicate': pa.array([], pa.large_string()),
                      'object': pa.array([], pa.large_string())})
    df = df.sort_values(group_cols + ['__order'], kind='stable').reset_index(drop=True)
    n = len(df)
    if not n:
        return empty
    kdf = df[group_cols]
    prev = kdf.shift()
    changed = (kdf.ne(prev) & ~(kdf.isna() & prev.isna())).any(axis=1).to_numpy()
    changed[0] = True
    gid = np.cumsum(changed) - 1                    # contiguous group id per row
    starts = np.nonzero(changed)[0]                 # first row of each group
    G = len(starts)
    gkeys = ['|'.join(str(k) for k in tup)
             for tup in kdf.iloc[starts].itertuples(index=False, name=None)]
    digests = [_group_digest(rule_id, gk) for gk in gkeys]  # one hash per group

    # --- elements: per ref, distinct non-null values in source order;
    # refs append in gather-list order (rml:append) ---
    e_g_parts, e_val_parts, e_ref_parts, e_pos_parts = [], [], [], []
    pos = np.arange(n)
    for j, ref in enumerate(refs):
        col = f'__elem_{ref}'
        m = (df[col].notna() & ~df.duplicated(subset=group_cols + [col])).to_numpy()
        if not m.any():
            continue
        e_g_parts.append(gid[m])
        e_val_parts.append(df[col].to_numpy()[m])
        e_ref_parts.append(np.full(int(m.sum()), j, dtype=np.int64))
        e_pos_parts.append(pos[m])
    if e_g_parts:
        e_g = np.concatenate(e_g_parts)
        e_val = np.concatenate(e_val_parts)
        order = np.lexsort((np.concatenate(e_pos_parts),
                            np.concatenate(e_ref_parts), e_g))
        e_g, e_val = e_g[order], e_val[order]
    else:
        e_g = np.array([], dtype=np.int64)
        e_val = np.array([], dtype=object)
    E = len(e_g)
    counts_g = np.bincount(e_g, minlength=G)
    if E:
        efirst = np.zeros(E, dtype=bool)
        efirst[0] = True
        efirst[1:] = e_g[1:] != e_g[:-1]
        estarts = np.nonzero(efirst)[0]
        eidx = np.arange(E) - np.repeat(estarts, np.diff(np.append(estarts, E)))
    else:
        eidx = np.array([], dtype=np.int64)

    has_el = counts_g > 0
    part = has_el | allow_empty                     # groups that emit anything

    def g_col(name):
        return df[name].to_numpy()[starts]

    out_s, out_p, out_o = [], [], []

    def emit(s_arr, p_arr, o_arr):
        out_s.append(np.asarray(s_arr, dtype=object))
        out_p.append(np.asarray(p_arr, dtype=object))
        out_o.append(np.asarray(o_arr, dtype=object))

    def const(v, k):
        return np.full(k, v, dtype=object)

    def list_triples(head_g):
        """(node, rdf:first, el) + (node, rdf:rest, next|nil) for every
        element; node 0 of a group is its head, the rest are bnodes."""
        if not E:
            return
        node = np.empty(E, dtype=object)
        fm = eidx == 0
        node[fm] = head_g[e_g[fm]]
        nz = np.nonzero(~fm)[0]
        node[nz] = [f'_:g{digests[e_g[i]]}n{eidx[i]}' for i in nz]
        nxt_same = np.zeros(E, dtype=bool)
        nxt_same[:E - 1] = e_g[1:] == e_g[:-1]
        rest = np.where(nxt_same, np.roll(node, -1), _NIL)
        emit(node, const(_FIRST, E), e_val)
        emit(node, const(_REST, E), rest)

    def container_triples(head_g, group_mask):
        """(head, rdf:type, C) per participating group + numbered
        membership triples per element."""
        gm = np.nonzero(group_mask)[0]
        emit(head_g[gm], const(_TYPE, len(gm)),
             const(_CONTAINER_TYPES[gather_as], len(gm)))
        if E:
            lut = np.array([f'<{RDF_NAMESPACE}_{i}>'
                            for i in range(1, int(eidx.max()) + 2)], dtype=object)
            emit(head_g[e_g], lut[eidx], e_val)

    if subject_gather:
        head_g = g_col('__subj') if subject_is_template else \
            np.array([f'_:g{d}h' for d in digests], dtype=object)
        if gather_as == RDF_LIST:
            eff_head = np.where(has_el, head_g, _NIL)
            list_triples(head_g)
        else:
            eff_head = head_g
            container_triples(head_g, part)
        if emit_pred_obj:
            gm = np.nonzero(part)[0]
            emit(eff_head[gm], g_col('__pred')[gm], g_col('__obj')[gm])
    else:
        subj_g, pred_g = g_col('__subj'), g_col('__pred')
        head_g = g_col('__head') if named_object else \
            np.array([f'_:g{d}h' for d in digests], dtype=object)
        if gather_as == RDF_LIST:
            nil_m = np.nonzero(part & ~has_el)[0]
            emit(subj_g[nil_m], pred_g[nil_m], const(_NIL, len(nil_m)))
            hm = np.nonzero(has_el)[0]
            emit(subj_g[hm], pred_g[hm], head_g[hm])
            list_triples(head_g)
        else:
            gm = np.nonzero(part)[0]
            emit(subj_g[gm], pred_g[gm], head_g[gm])
            container_triples(head_g, part)

    if not out_s or not sum(len(a) for a in out_s):
        return empty
    return pa.table({'subject': pa.array(np.concatenate(out_s), pa.large_string()),
                     'predicate': pa.array(np.concatenate(out_p), pa.large_string()),
                     'object': pa.array(np.concatenate(out_o), pa.large_string())})

