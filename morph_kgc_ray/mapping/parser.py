"""Mapping front-end: R2RML / RML / RML-star / RML-FNML / RML-CC Turtle
documents -> normalized rule table (pandas DataFrame, driver-side metadata).

Re-implements, procedurally over morph_kgc_ray.rdf.Graph, the semantics of the
reference front-end (rdflib + SPARQL):
  - normalization passes: /root/reference/src/morph_kgc/mapping/mapping_parser.py:27-313
  - rule extraction query: /root/reference/src/morph_kgc/mapping/mapping_constants.py:38-152
  - RML-star normalization: mapping_parser.py:760-804
  - self-join elimination:  mapping_parser.py:807-831

The resulting DataFrame is a *plan* (one row per normalized mapping rule); it
is metadata-scale and is shipped to Ray tasks by closure capture.
"""

from __future__ import annotations

import json
import os
import re

import pandas as pd

from ..config import Config
from ..constants import *  # noqa: F401,F403 - vocabulary surface
from ..rdf import Graph, IRI, Literal, is_bnode, is_iri, is_literal, new_bnode, parse_turtle

RML_DATAFRAME_COLUMNS = [
    'source_name', 'triples_map_id', 'triples_map_type', 'logical_source_type', 'logical_source_value', 'iterator',
    'reference_formulation',
    'subject_map_type', 'subject_map_value', 'subject_termtype',
    'predicate_map_type', 'predicate_map_value',
    'object_map_type', 'object_map_value', 'object_termtype',
    'lang_datatype', 'lang_datatype_map_type', 'lang_datatype_map_value',
    'graph_map_type', 'graph_map_value',
    'subject_join_conditions', 'object_join_conditions',
    'gather', 'gather_subject', 'gather_references', 'gatherAs', 'gatherAs_subject',
    'strategy', 'allowEmptyListAndContainer',
]

FNML_DATAFRAME_COLUMNS = [
    'function_execution', 'function_map_value', 'parameter_map_value', 'value_map_type', 'value_map_value'
]

_SM_TYPES = (RML_CONSTANT, RML_TEMPLATE, RML_REFERENCE, RML_QUOTED_TRIPLES_MAP, RML_EXECUTION, RML_GATHER)
_PM_TYPES = (RML_CONSTANT, RML_TEMPLATE, RML_REFERENCE, RML_EXECUTION)
_OM_TYPES = (RML_CONSTANT, RML_TEMPLATE, RML_REFERENCE, RML_QUOTED_TRIPLES_MAP, RML_EXECUTION)
_LD_TYPES = (RML_CONSTANT, RML_TEMPLATE, RML_REFERENCE, RML_EXECUTION)
_GM_TYPES = (RML_CONSTANT, RML_TEMPLATE, RML_REFERENCE, RML_EXECUTION)


def _term_value(term) -> str:
    """Lexical value of a term, matching rdflib str() semantics."""
    return str(term)


# --------------------------------------------------------------------------
# normalization passes over the mapping graph
# --------------------------------------------------------------------------

def _r2rml_to_rml(g: Graph) -> None:
    # rr:tableName / rr:sqlQuery imply SQL2008 source
    for s, _, _ in list(g.triples((None, R2RML_TABLE_NAME, None))):
        g.add((s, IRI(RML_SQL_VERSION), IRI(RML_SQL2008)))
    for s, _, _ in list(g.triples((None, R2RML_SQL_QUERY, None))):
        g.add((s, IRI(RML_SQL_VERSION), IRI(RML_SQL2008)))
        g.add((s, IRI(RML_REFERENCE_FORMULATION), IRI(RML_SQL2008)))

    predicate_map = {
        R2RML_LOGICAL_TABLE: RML_LOGICAL_SOURCE,
        R2RML_TABLE_NAME: RML_TABLE_NAME,
        R2RML_SQL_QUERY: RML_QUERY,
        R2RML_PARENT_TRIPLES_MAP: RML_PARENT_TRIPLES_MAP,
        R2RML_SUBJECT_MAP: RML_SUBJECT_MAP,
        R2RML_PREDICATE_OBJECT_MAP: RML_PREDICATE_OBJECT_MAP,
        R2RML_PREDICATE_MAP: RML_PREDICATE_MAP,
        R2RML_OBJECT_MAP: RML_OBJECT_MAP,
        R2RML_GRAPH_MAP: RML_GRAPH_MAP,
        R2RML_SUBJECT_SHORTCUT: RML_SUBJECT_SHORTCUT,
        R2RML_PREDICATE_SHORTCUT: RML_PREDICATE_SHORTCUT,
        R2RML_OBJECT_SHORTCUT: RML_OBJECT_SHORTCUT,
        R2RML_GRAPH_SHORTCUT: RML_GRAPH_SHORTCUT,
        R2RML_COLUMN: RML_REFERENCE,
        R2RML_TEMPLATE: RML_TEMPLATE,
        R2RML_CONSTANT: RML_CONSTANT,
        R2RML_CLASS: RML_CLASS,
        R2RML_CHILD: RML_CHILD,
        R2RML_PARENT: RML_PARENT,
        R2RML_JOIN_CONDITION: RML_JOIN_CONDITION,
        R2RML_DATATYPE: RML_DATATYPE_SHORTCUT,
        R2RML_LANGUAGE: RML_LANGUAGE_SHORTCUT,
        R2RML_SQL_VERSION: RML_SQL_VERSION,
        R2RML_TERM_TYPE: RML_TERM_TYPE,
    }
    for old, new in predicate_map.items():
        g.replace_predicate(old, IRI(new))

    object_map = {
        R2RML_TRIPLES_MAP_CLASS: RML_TRIPLES_MAP_CLASS,
        R2RML_LOGICAL_TABLE_CLASS: RML_LOGICAL_TABLE,
        R2RML_DEFAULT_GRAPH: RML_DEFAULT_GRAPH,
        R2RML_IRI: RML_IRI,
        R2RML_LITERAL: RML_LITERAL,
        R2RML_BLANK_NODE: RML_BLANK_NODE,
        R2RML_SQL2008: RML_SQL2008,
        RML_ASSERTED_TRIPLES_MAP_CLASS: RML_TRIPLES_MAP_CLASS,
    }
    for old, new in object_map.items():
        g.replace_object(old, IRI(new))


def _rml_legacy_to_rml(g: Graph) -> None:
    predicate_map = {
        RML_LEGACY_LOGICAL_SOURCE: RML_LOGICAL_SOURCE,
        RML_LEGACY_SOURCE: RML_SOURCE,
        RML_LEGACY_QUERY: RML_QUERY,
        RML_LEGACY_ITERATOR: RML_ITERATOR,
        RML_LEGACY_REFERENCE: RML_REFERENCE,
        RML_LEGACY_REFERENCE_FORMULATION: RML_REFERENCE_FORMULATION,
        FNML_EXECUTION: RML_EXECUTION,
        FNML_INPUT: RML_INPUT,
        FNML_FUNCTION_MAP: RML_FUNCTION_MAP,
        FNML_RETURN_MAP: RML_RETURN_MAP,
        FNML_PARAMETER_MAP: RML_PARAMETER_MAP,
        FNML_VALUE_MAP: RML_VALUE_MAP,
        FNML_FUNCTION_SHORTCUT: RML_FUNCTION_SHORTCUT,
        FNML_RETURN_SHORTCUT: RML_RETURN_SHORTCUT,
        FNML_PARAMETER_SHORTCUT: RML_PARAMETER_SHORTCUT,
        FNML_VALUE_SHORTCUT: RML_VALUE_SHORTCUT,
        RML_LEGACY_QUOTED_TRIPLES_MAP: RML_QUOTED_TRIPLES_MAP,
        RML_LEGACY_SUBJECT_MAP: RML_SUBJECT_MAP,
        RML_LEGACY_OBJECT_MAP: RML_OBJECT_MAP,
    }
    for old, new in predicate_map.items():
        g.replace_predicate(old, IRI(new))
    g.replace_object(RML_LEGACY_NON_ASSERTED_TRIPLES_MAP_CLASS, IRI(RML_NON_ASSERTED_TRIPLES_MAP_CLASS))


def _rdf_class_to_pom(g: Graph) -> None:
    for tm, _, sm in list(g.triples((None, RML_SUBJECT_MAP, None))):
        for c in list(g.objects(sm, RML_CLASS)):
            pom = new_bnode()
            g.add((tm, IRI(RML_PREDICATE_OBJECT_MAP), pom))
            g.add((pom, IRI(RML_PREDICATE_SHORTCUT), IRI(RDF_TYPE)))
            g.add((pom, IRI(RML_OBJECT_SHORTCUT), c))
    g.remove((None, RML_CLASS, None))


def _expand_constant_shortcut_properties(g: Graph) -> None:
    shortcuts = {
        RML_SUBJECT_SHORTCUT: RML_SUBJECT_MAP,
        RML_PREDICATE_SHORTCUT: RML_PREDICATE_MAP,
        RML_OBJECT_SHORTCUT: RML_OBJECT_MAP,
        RML_LANGUAGE_SHORTCUT: RML_LANGUAGE_MAP,
        RML_DATATYPE_SHORTCUT: RML_DATATYPE_MAP,
        RML_GRAPH_SHORTCUT: RML_GRAPH_MAP,
        RML_FUNCTION_SHORTCUT: RML_FUNCTION_MAP,
        RML_RETURN_SHORTCUT: RML_RETURN_MAP,
        RML_PARAMETER_SHORTCUT: RML_PARAMETER_MAP,
        RML_VALUE_SHORTCUT: RML_VALUE_MAP,
    }
    for shortcut, prop in shortcuts.items():
        for s, _, o in list(g.triples((None, shortcut, None))):
            b = new_bnode()
            g.add((s, IRI(prop), b))
            g.add((b, IRI(RML_CONSTANT), o))
        g.remove((None, shortcut, None))


def _subject_graph_maps_to_pom(g: Graph) -> None:
    for tm, _, sm in list(g.triples((None, RML_SUBJECT_MAP, None))):
        gms = list(g.objects(sm, RML_GRAPH_MAP))
        if not gms:
            continue
        for pom in g.objects(tm, RML_PREDICATE_OBJECT_MAP):
            for gm in gms:
                g.add((pom, IRI(RML_GRAPH_MAP), gm))
        for gm in gms:
            g.discard((sm, IRI(RML_GRAPH_MAP), gm))


def _complete_pom_with_default_graph(g: Graph) -> None:
    for tm, _, pom in list(g.triples((None, RML_PREDICATE_OBJECT_MAP, None))):
        if g.value(pom, RML_GRAPH_MAP) is None:
            b = new_bnode()
            g.add((pom, IRI(RML_GRAPH_MAP), b))
            g.add((b, IRI(RML_CONSTANT), IRI(RML_DEFAULT_GRAPH)))


def _complete_termtypes(g: Graph) -> None:
    # quoted triples maps default to RDFstarTriple
    for term_map, _, _ in list(g.triples((None, RML_QUOTED_TRIPLES_MAP, None))):
        if g.value(term_map, RML_TERM_TYPE) is None:
            g.add((term_map, IRI(RML_TERM_TYPE), IRI(RML_RDF_STAR_TRIPLE)))
    # constant-valued maps: bnode constants -> BlankNode, literal constants -> Literal
    for term_map, _, const in list(g.triples((None, RML_CONSTANT, None))):
        if g.value(term_map, RML_TERM_TYPE) is None:
            if is_bnode(const):
                g.add((term_map, IRI(RML_TERM_TYPE), IRI(RML_BLANK_NODE)))
            elif is_literal(const):
                g.add((term_map, IRI(RML_TERM_TYPE), IRI(RML_LITERAL)))
    # object maps with reference/execution/languageMap/datatypeMap -> Literal
    for pom, _, om in list(g.triples((None, RML_OBJECT_MAP, None))):
        if g.value(om, RML_TERM_TYPE) is None:
            if (g.value(om, RML_REFERENCE) is not None or g.value(om, RML_EXECUTION) is not None
                    or g.value(om, RML_LANGUAGE_MAP) is not None or g.value(om, RML_DATATYPE_MAP) is not None):
                g.add((om, IRI(RML_TERM_TYPE), IRI(RML_LITERAL)))
    # referencing object maps inherit the parent subject's termtype
    for term_map, _, parent_tm in list(g.triples((None, RML_PARENT_TRIPLES_MAP, None))):
        for sm in g.objects(parent_tm, RML_SUBJECT_MAP):
            tt = g.value(sm, RML_TERM_TYPE)
            if tt is not None:
                g.add((term_map, IRI(RML_TERM_TYPE), IRI(str(tt))))
    # all remaining term maps default to IRI
    for prop in (RML_SUBJECT_MAP, RML_PREDICATE_MAP, RML_OBJECT_MAP, RML_GRAPH_MAP):
        for _, _, term_map in list(g.triples((None, prop, None))):
            if g.value(term_map, RML_TERM_TYPE) is None:
                g.add((term_map, IRI(RML_TERM_TYPE), IRI(RML_IRI)))


def _complete_triples_map_class(g: Graph) -> None:
    for tm, _, _ in list(g.triples((None, RML_LOGICAL_SOURCE, None))):
        if g.value(tm, RDF_TYPE) is None:
            g.add((tm, IRI(RDF_TYPE), IRI(RML_TRIPLES_MAP_CLASS)))
    # triples maps without POMs generate no triples -> non-asserted
    for tm, _, _ in list(g.triples((None, RML_LOGICAL_SOURCE, None))):
        if g.value(tm, RML_PREDICATE_OBJECT_MAP) is None:
            g.add((tm, IRI(RDF_TYPE), IRI(RML_NON_ASSERTED_TRIPLES_MAP_CLASS)))
    # non-asserted wins over asserted typing
    for tm, _, _ in list(g.triples((None, RML_LOGICAL_SOURCE, None))):
        types = set(g.objects(tm, RDF_TYPE))
        if RML_TRIPLES_MAP_CLASS in types and RML_NON_ASSERTED_TRIPLES_MAP_CLASS in types:
            g.discard((tm, IRI(RDF_TYPE), IRI(RML_TRIPLES_MAP_CLASS)))


def _remove_string_datatypes(g: Graph) -> None:
    g.remove((None, RML_CONSTANT, XSD_STRING))


def _validate_termtypes(g: Graph) -> None:
    def termtypes_of(prop):
        tts = set()
        for _, _, tm in g.triples((None, prop, None)):
            for tt in g.objects(tm, RML_TERM_TYPE):
                tts.add(str(tt))
        return tts

    if not termtypes_of(RML_PREDICATE_MAP) <= {RML_IRI}:
        raise ValueError('Predicate maps must have termtype rml:IRI.')
    if not termtypes_of(RML_GRAPH_MAP) <= {RML_IRI}:
        raise ValueError('Graph maps must have termtype rml:IRI.')
    if not termtypes_of(RML_SUBJECT_MAP) <= {RML_IRI, RML_BLANK_NODE, RML_RDF_STAR_TRIPLE, RML_GATHER_MAP_CLASS}:
        raise ValueError('Invalid subject termtype.')
    if not termtypes_of(RML_OBJECT_MAP) <= {RML_IRI, RML_BLANK_NODE, RML_LITERAL, RML_RDF_STAR_TRIPLE,
                                            RML_GATHER_MAP_CLASS}:
        raise ValueError('Invalid object termtype.')


# --------------------------------------------------------------------------
# rule extraction (procedural equivalent of RML_PARSING_QUERY)
# --------------------------------------------------------------------------

def _typed_pairs(g: Graph, node, allowed) -> list[tuple[str, object]]:
    pairs = []
    for _, p, o in g.triples((node, None, None)):
        if str(p) in allowed:
            pairs.append((str(p), o))
    pairs.sort(key=lambda x: (x[0], str(x[1])))
    return pairs


def dump_join_conditions(jcs: dict) -> str:
    """Serialize a join-conditions dict into the rule-table column (JSON —
    consumers use parse_join_conditions, never eval)."""
    return json.dumps(jcs, sort_keys=True) if jcs else ''


def parse_join_conditions(jc) -> dict:
    """{cond_id: {'child_value': ..., 'parent_value': ...}} from the rule
    column; empty dict for null/empty."""
    if jc is None or (isinstance(jc, float) and pd.isna(jc)) or not jc:
        return {}
    return json.loads(jc)


def _join_conditions_of(g: Graph, term_map) -> str:
    jcs = {}
    for jc in g.objects(term_map, RML_JOIN_CONDITION):
        child = g.value(jc, RML_CHILD)
        parent = g.value(jc, RML_PARENT)
        if child is not None and parent is not None:
            jcs[str(jc)] = {'child_value': str(child), 'parent_value': str(parent)}
    return dump_join_conditions(jcs)


def _gather_info(g: Graph, term_map):
    """Returns (gather, gather_references, gatherAs, strategy, allow_empty) or Nones."""
    gather = g.value(term_map, RML_GATHER)
    gather_as = g.value(term_map, RML_GATHER_AS)
    if gather is None or gather_as is None:
        return None, None, None, None, None
    refs = []
    for item in g.rdf_list_items(gather):
        ref = g.value(item, RML_REFERENCE)
        if ref is not None:
            refs.append(str(ref))
    strategy = g.value(term_map, RML_STRATEGY)
    strategy = str(strategy) if strategy is not None else RML_APPEND
    allow_empty = g.value(term_map, RML_ALLOW_EMPTY_LIST_AND_CONTAINER)
    allow_empty = str(allow_empty).lower() if allow_empty is not None else 'false'
    return str(gather), ', '.join(refs), str(gather_as), strategy, allow_empty


def _extract_rules(g: Graph, source_name: str) -> tuple[pd.DataFrame, pd.DataFrame]:
    rows = []

    for tm in sorted(set(g.subjects(RML_LOGICAL_SOURCE)), key=str):
        tm_types = sorted({str(t) for t in g.objects(tm, RDF_TYPE)
                           if str(t) in (RML_TRIPLES_MAP_CLASS, RML_NON_ASSERTED_TRIPLES_MAP_CLASS)})
        source_node = g.value(tm, RML_LOGICAL_SOURCE)

        ls_entries = []
        for ls_type in (RML_SOURCE, RML_TABLE_NAME, RML_QUERY):
            for v in g.objects(source_node, ls_type):
                value = str(v)
                # in-memory source declared via sd:name
                mem_name = g.value(v, f'{SD_NAMESPACE}name')
                if mem_name is not None:
                    value = '{' + str(mem_name) + '}'
                ls_entries.append((ls_type, value))
        if not ls_entries:
            ls_entries.append((None, None))  # file_path can come from config (#119)

        iterator = g.value(source_node, RML_ITERATOR)
        iterator = str(iterator) if iterator is not None else None
        ref_form = g.value(source_node, RML_REFERENCE_FORMULATION)
        ref_form = str(ref_form) if ref_form is not None else None

        sm_variants = []  # (sm_node, sm_type, sm_value, termtype, gather_subject..., join_conditions)
        for sm in g.objects(tm, RML_SUBJECT_MAP):
            tt = g.value(sm, RML_TERM_TYPE)
            tt = str(tt) if tt is not None else None
            g_s, g_refs_s, g_as_s, _, _ = _gather_info(g, sm)
            sm_jc = _join_conditions_of(g, sm)
            pairs = _typed_pairs(g, sm, _SM_TYPES)
            if g_s is not None:
                # CC subject map: the defining pair is its template (named) or
                # the gather itself (unnamed); drop auxiliary gather pairs
                pairs = [p for p in pairs if p[0] in (RML_CONSTANT, RML_TEMPLATE, RML_REFERENCE)]
                if not pairs:
                    pairs = [(RML_GATHER, Literal(str(g_s)))]
            for sm_type, sm_value in pairs:
                sm_variants.append((sm, sm_type, str(sm_value), tt, g_s, g_refs_s, g_as_s, sm_jc))

        poms = list(g.objects(tm, RML_PREDICATE_OBJECT_MAP))

        def base_row(sm_variant):
            sm, sm_type, sm_value, sm_tt, g_s, g_refs_s, g_as_s, sm_jc = sm_variant
            return {
                'source_name': source_name,
                'triples_map_id': str(tm),
                'logical_source_type': None, 'logical_source_value': None,
                'iterator': iterator, 'reference_formulation': ref_form,
                'subject_map_type': sm_type, 'subject_map_value': sm_value,
                'subject_termtype': sm_tt,
                'predicate_map_type': None, 'predicate_map_value': None,
                'object_map_type': None, 'object_map_value': None, 'object_termtype': None,
                'lang_datatype': None, 'lang_datatype_map_type': None, 'lang_datatype_map_value': None,
                'graph_map_type': None, 'graph_map_value': None,
                'subject_join_conditions': sm_jc, 'object_join_conditions': '',
                'gather': None, 'gather_subject': g_s, 'gather_references': None,
                'gatherAs': None, 'gatherAs_subject': g_as_s,
                'strategy': None, 'allowEmptyListAndContainer': None,
            }

        emitted = False
        for tm_type in (tm_types or [RML_TRIPLES_MAP_CLASS]):
            for ls_type, ls_value in ls_entries:
                for sm_variant in sm_variants:
                    if not poms:
                        row = base_row(sm_variant)
                        row['triples_map_type'] = tm_type
                        row['logical_source_type'] = ls_type
                        row['logical_source_value'] = ls_value
                        if sm_variant[4] is not None:  # subject gather references
                            row['gather_references'] = sm_variant[5]
                        rows.append(row)
                        emitted = True
                        continue
                    for pom in poms:
                        pm_pairs = []
                        for pm in g.objects(pom, RML_PREDICATE_MAP):
                            pm_pairs.extend(_typed_pairs(g, pm, _PM_TYPES))
                        gm_pairs = []
                        for gm in g.objects(pom, RML_GRAPH_MAP):
                            gm_pairs.extend(_typed_pairs(g, gm, _GM_TYPES))
                        if not gm_pairs:
                            gm_pairs = [(None, None)]

                        om_variants = []
                        for om in g.objects(pom, RML_OBJECT_MAP):
                            om_tt = g.value(om, RML_TERM_TYPE)
                            om_tt = str(om_tt) if om_tt is not None else None
                            om_jc = _join_conditions_of(g, om)
                            gather, gather_refs, gather_as, strategy, allow_empty = _gather_info(g, om)

                            parent = g.value(om, RML_PARENT_TRIPLES_MAP)
                            if parent is not None:
                                om_variants.append(dict(
                                    node=om, type=RML_PARENT_TRIPLES_MAP, value=str(parent), termtype=om_tt,
                                    ld=None, ld_type=None, ld_value=None, jc=om_jc,
                                    gather=None, gather_refs=None, gather_as=None, strategy=None,
                                    allow_empty=None))
                                continue

                            pairs = _typed_pairs(g, om, _OM_TYPES)
                            # language / datatype map bindings
                            ld_bindings = [(None, None, None)]
                            lds = []
                            for ld_pred in (RML_LANGUAGE_MAP, RML_DATATYPE_MAP):
                                for ld_node in g.objects(om, ld_pred):
                                    for ld_type, ld_value in _typed_pairs(g, ld_node, _LD_TYPES):
                                        if str(ld_value) == XSD_STRING:
                                            continue
                                        lds.append((ld_pred, ld_type, str(ld_value)))
                            if lds:
                                ld_bindings = lds

                            if not pairs and gather is not None:
                                # unnamed collection/container object map
                                om_variants.append(dict(
                                    node=om, type=None, value=None, termtype=om_tt,
                                    ld=None, ld_type=None, ld_value=None, jc=om_jc,
                                    gather=gather, gather_refs=gather_refs, gather_as=gather_as,
                                    strategy=strategy, allow_empty=allow_empty))
                                continue

                            for om_type, om_value in pairs:
                                for ld, ld_type, ld_value in ld_bindings:
                                    om_variants.append(dict(
                                        node=om, type=om_type, value=str(om_value), termtype=om_tt,
                                        ld=ld, ld_type=ld_type, ld_value=ld_value, jc=om_jc,
                                        gather=gather, gather_refs=gather_refs, gather_as=gather_as,
                                        strategy=strategy, allow_empty=allow_empty))
                        if not om_variants:
                            om_variants = [None]

                        for pm_type, pm_value in (pm_pairs or [(None, None)]):
                            for om_v in om_variants:
                                for gm_type, gm_value in gm_pairs:
                                    row = base_row(sm_variant)
                                    row['triples_map_type'] = tm_type
                                    row['logical_source_type'] = ls_type
                                    row['logical_source_value'] = ls_value
                                    row['predicate_map_type'] = pm_type
                                    row['predicate_map_value'] = str(pm_value) if pm_value is not None else None
                                    row['graph_map_type'] = gm_type
                                    row['graph_map_value'] = str(gm_value) if gm_value is not None else None
                                    if sm_variant[4] is not None:
                                        row['gather_references'] = sm_variant[5]
                                    if om_v is not None:
                                        row['object_map_type'] = om_v['type']
                                        row['object_map_value'] = om_v['value']
                                        row['object_termtype'] = om_v['termtype']
                                        row['lang_datatype'] = om_v['ld']
                                        row['lang_datatype_map_type'] = om_v['ld_type']
                                        row['lang_datatype_map_value'] = om_v['ld_value']
                                        row['object_join_conditions'] = om_v['jc']
                                        if om_v['gather'] is not None:
                                            row['gather'] = om_v['gather']
                                            row['gather_references'] = om_v['gather_refs']
                                            row['gatherAs'] = om_v['gather_as']
                                            row['strategy'] = om_v['strategy']
                                            row['allowEmptyListAndContainer'] = om_v['allow_empty']
                                    rows.append(row)
                                    emitted = True
        if not emitted:
            pass

    rml_df = pd.DataFrame(rows, columns=RML_DATAFRAME_COLUMNS)

    # ---- FNML executions (procedural FNML_PARSING_QUERY) ----
    fnml_rows = []
    for fe in sorted(set(g.subjects(RML_FUNCTION_MAP)), key=str):
        fm = g.value(fe, RML_FUNCTION_MAP)
        fm_value = g.value(fm, RML_CONSTANT)
        if fm_value is None:
            continue
        inputs = list(g.objects(fe, RML_INPUT))
        if not inputs:
            fnml_rows.append({'function_execution': str(fe), 'function_map_value': str(fm_value),
                              'parameter_map_value': None, 'value_map_type': None, 'value_map_value': None})
        for inp in inputs:
            pm = g.value(inp, RML_PARAMETER_MAP)
            pm_value = g.value(pm, RML_CONSTANT) if pm is not None else None
            vm = g.value(inp, RML_VALUE_MAP)
            if vm is None:
                continue
            for vm_type, vm_value in _typed_pairs(g, vm, _LD_TYPES):
                fnml_rows.append({'function_execution': str(fe), 'function_map_value': str(fm_value),
                                  'parameter_map_value': str(pm_value) if pm_value is not None else None,
                                  'value_map_type': vm_type, 'value_map_value': str(vm_value)})
    fnml_df = pd.DataFrame(fnml_rows, columns=FNML_DATAFRAME_COLUMNS)

    return rml_df, fnml_df


# --------------------------------------------------------------------------
# post-extraction normalization over the rule table
# --------------------------------------------------------------------------

def _complete_source_types(rml_df: pd.DataFrame, config: Config) -> pd.DataFrame:
    """Mirrors mapping_parser.py:582-621 (_complete_source_types)."""
    source_types = []
    for _, rule in rml_df.iterrows():
        ref_form = rule['reference_formulation']
        if pd.notna(ref_form) and 'SQL' in str(ref_form).upper():
            source_types.append(RDB)
        elif pd.notna(ref_form) and 'CYPHER' in str(ref_form).upper():
            source_types.append(PGDB)
        elif config.has_db_url(rule['source_name']):
            source_types.append(RDB)
        elif rule['logical_source_type'] == RML_QUERY:
            source_types.append(CSV)  # tabular view (CSV or Parquet, format inferred by DuckDB)
        elif rule['logical_source_type'] == RML_SOURCE and str(rule['logical_source_value']).startswith('{') \
                and str(rule['logical_source_value']).endswith('}'):
            source_types.append(PYTHON_SOURCE)
        elif rule['logical_source_type'] == RML_SOURCE:
            ext = os.path.splitext(str(rule['logical_source_value']))[1][1:].strip().upper()
            if ext in FILE_SOURCE_TYPES:
                source_types.append(ext)
            elif pd.notna(ref_form):
                source_types.append(str(ref_form).replace(RML_NAMESPACE, '').upper())
            else:
                raise ValueError('No source type could be retrieved for some mapping rules.')
        else:
            raise ValueError('No source type could be retrieved for some mapping rules.')
    rml_df = rml_df.copy()
    rml_df['source_type'] = source_types
    return rml_df.drop(columns='reference_formulation')


# SQL declared type -> RDF datatype for the R2RML natural mapping
# (spec constant table; reference relational_db.py:18-57)
_SQL_RDF_DATATYPE = {
    'BINARY': XSD_HEX_BINARY, 'VARBINARY': XSD_HEX_BINARY, 'BLOB': XSD_HEX_BINARY,
    'BFILE': XSD_HEX_BINARY, 'RAW': XSD_HEX_BINARY, 'LONG RAW': XSD_HEX_BINARY,
    'INTEGER': XSD_INTEGER, 'INT': XSD_INTEGER, 'SMALLINT': XSD_INTEGER,
    'INT8': XSD_INTEGER, 'INT4': XSD_INTEGER, 'BIGINT': XSD_INTEGER,
    'BIGSERIAL': XSD_INTEGER, 'SMALLSERIAL': XSD_INTEGER, 'INT2': XSD_INTEGER,
    'SERIAL2': XSD_INTEGER, 'SERIAL4': XSD_INTEGER, 'SERIAL8': XSD_INTEGER,
    'DECIMAL': XSD_DECIMAL, 'NUMERIC': XSD_DECIMAL,
    'FLOAT': XSD_DOUBLE, 'FLOAT8': XSD_DOUBLE, 'REAL': XSD_DOUBLE,
    'DOUBLE': XSD_DOUBLE, 'DOUBLE PRECISION': XSD_DOUBLE, 'NUMBER': XSD_DOUBLE,
    'BOOL': XSD_BOOLEAN, 'TINYINT': XSD_BOOLEAN, 'BOOLEAN': XSD_BOOLEAN,
    'DATE': XSD_DATE, 'TIME': XSD_TIME, 'DATETIME': XSD_DATETIME,
    'TIMESTAMP': XSD_DATETIME,
}


def _sqlite_column_type(db_path: str, table: str, column: str) -> 'str | None':
    """DECLARED column type from sqlite metadata.  (The reference's sqlite
    branch runs typeof('col') — typeof of a string literal — so it never
    infers anything, relational_db.py:102; PRAGMA table_info is the correct
    sqlite analogue of information_schema.)"""
    import sqlite3
    con = sqlite3.connect(db_path)
    try:
        for row in con.execute(f'PRAGMA table_info("{table}")'):
            if row[1] == column:
                return (row[2] or '').upper() or None
    finally:
        con.close()
    return None


def _infer_sql_datatypes(rml_df: pd.DataFrame, config: Config) -> pd.DataFrame:
    """R2RML natural-mapping datatype inference for relational sources
    (W3C R2RML §10.2; reference mapping_parser.py:682-721), gated on the
    ``infer_sql_datatypes`` config flag.  Applies to literal object
    REFERENCES without an explicit language/datatype.  The inferred datatype
    drives the value's canonical lexical form; xsd:double stays unannotated
    (matching the corpus goldens) while the other types also gain the ^^
    annotation."""
    rml_df = rml_df.copy()
    rml_df['inferred_datatype'] = None
    if not config.infer_sql_datatypes():
        return rml_df
    for i, rule in rml_df.iterrows():
        if rule['source_type'] != RDB or rule['object_map_type'] != RML_REFERENCE \
                or str(rule['object_termtype']) != RML_LITERAL or pd.notna(rule['lang_datatype']):
            continue
        db_url = config.get_db_url(rule['source_name']) if config.has_db_url(rule['source_name']) else ''
        if not db_url.startswith('sqlite'):
            continue  # other dialects need their drivers (information_schema path)
        db_path = db_url.split('///', 1)[-1]
        column = _undelimit(str(rule['object_map_value']))
        if rule['logical_source_type'] == RML_TABLE_NAME:
            tables = [_undelimit(str(rule['logical_source_value']))]
        else:  # rml:query — try every table named in the query
            tables = re.findall(r'(?:FROM|JOIN)\s+["`]?([A-Za-z_][\w$]*)',
                                str(rule['logical_source_value']), re.IGNORECASE)
        decl = None
        for table in tables:
            decl = _sqlite_column_type(db_path, table, column)
            if decl:
                break
        if not decl:
            continue
        # exact match on the base type name (parenthesized length stripped:
        # VARCHAR(30) -> VARCHAR) first — substring matching misclassifies
        # declared types that merely CONTAIN a key (POINT contains INT,
        # SERIAL contains REAL); fall back to longest-key substring so
        # TIMESTAMP/DATETIME still win over their TIME substring
        decl_base = re.sub(r'\(.*\)', '', decl).strip()
        datatype = _SQL_RDF_DATATYPE.get(decl_base)
        if datatype is None:
            datatype = next((_SQL_RDF_DATATYPE[k]
                             for k in sorted(_SQL_RDF_DATATYPE, key=len, reverse=True)
                             if k in decl), None)
        if datatype is None:
            continue
        rml_df.at[i, 'inferred_datatype'] = datatype
        if datatype != XSD_DOUBLE:
            rml_df.at[i, 'lang_datatype'] = RML_DATATYPE_MAP
            rml_df.at[i, 'lang_datatype_map_type'] = RML_CONSTANT
            rml_df.at[i, 'lang_datatype_map_value'] = datatype
    return rml_df


def _is_delimited(identifier: str) -> bool:
    return len(identifier) > 2 and identifier[0] == '"' and identifier[-1] == '"'


def _undelimit(identifier: str) -> str:
    return identifier[1:-1] if _is_delimited(identifier) else identifier


def _undelimit_template(template: str) -> str:
    return template.replace('{"', '{').replace('"}', '}')


def _remove_delimiters(rml_df: pd.DataFrame) -> pd.DataFrame:
    rml_df = rml_df.copy()
    for i, rule in rml_df.iterrows():
        if rule['logical_source_type'] == RML_TABLE_NAME:
            rml_df.at[i, 'logical_source_value'] = _undelimit(str(rule['logical_source_value']))
        for pos in ('subject', 'predicate', 'object', 'graph'):
            t = rule[f'{pos}_map_type']
            if t == RML_TEMPLATE:
                rml_df.at[i, f'{pos}_map_value'] = _undelimit_template(str(rule[f'{pos}_map_value']))
            elif t == RML_REFERENCE:
                rml_df.at[i, f'{pos}_map_value'] = _undelimit(str(rule[f'{pos}_map_value']))
        for jc_pos in ('subject_join_conditions', 'object_join_conditions'):
            if pd.notna(rule[jc_pos]) and rule[jc_pos]:
                jcs = parse_join_conditions(rule[jc_pos])
                for key in jcs:
                    jcs[key]['child_value'] = _undelimit(jcs[key]['child_value'])
                    jcs[key]['parent_value'] = _undelimit(jcs[key]['parent_value'])
                rml_df.at[i, jc_pos] = dump_join_conditions(jcs)
    return rml_df


def _normalize_rml_star(rml_df: pd.DataFrame) -> pd.DataFrame:
    """Expand quoted-triples-map references to normalized rule ids (#TM<i>).

    Mirrors mapping_parser.py:760-804.
    """
    num_before = len(rml_df)
    while True:
        rml_df = _expand_rml_star_once(rml_df)
        if len(rml_df) == num_before:
            return rml_df
        num_before = len(rml_df)


def _expand_rml_star_once(rml_df: pd.DataFrame) -> pd.DataFrame:
    rml_df = rml_df.reset_index(drop=True).copy()
    rml_df.insert(0, 'id', '#TM' + rml_df.index.astype(str))

    tm_to_id_list: dict[str, list[str]] = {}
    tm_to_id: dict[str, str] = {}
    for rule_id, rule_tm in zip(rml_df['id'], rml_df['triples_map_id']):
        if rule_tm in tm_to_id_list:
            tm_to_id_list[rule_tm].append(rule_id)
        else:
            tm_to_id[rule_tm] = rule_id
            tm_to_id_list[rule_tm] = [rule_id]

    new_rows = []
    for position in ('subject', 'object'):
        quoted = rml_df.loc[rml_df[f'{position}_map_type'] == RML_QUOTED_TRIPLES_MAP]
        for _, rule in quoted.iterrows():
            for tm_id in tm_to_id_list.get(rule[f'{position}_map_value'], []):
                new_rule = rule.copy()
                new_rule[f'{position}_map_value'] = tm_id
                new_rows.append(new_rule)
    if new_rows:
        rml_df = pd.concat([rml_df, pd.DataFrame(new_rows)], ignore_index=True)

    rml_df['subject_map_value'] = rml_df['subject_map_value'].map(lambda v: tm_to_id.get(v, v))
    rml_df['object_map_value'] = rml_df['object_map_value'].map(lambda v: tm_to_id.get(v, v))
    rml_df = rml_df.drop_duplicates()

    rml_df['triples_map_id'] = rml_df['id']
    return rml_df.drop(columns='id')


def get_rml_rule(rml_df: pd.DataFrame, triples_map_id: str) -> pd.Series:
    """First rule of a triples map (used to reach a parent's subject map)."""
    return rml_df[rml_df['triples_map_id'] == triples_map_id].iloc[0]


def _remove_self_joins_no_condition(rml_df: pd.DataFrame) -> pd.DataFrame:
    """Plan-time optimizer: referencing object map over the same source with
    child==parent references collapses to a direct subject-map materialization
    (mapping_parser.py:807-831)."""
    rml_df = rml_df.copy()
    for i, rule in rml_df.iterrows():
        if rule['object_map_type'] != RML_PARENT_TRIPLES_MAP:
            continue
        parent = get_rml_rule(rml_df, rule['object_map_value'])
        if rule['logical_source_value'] != parent['logical_source_value'] or \
                str(rule['iterator']) != str(parent['iterator']):
            continue
        remove_join = True
        try:
            jcs = parse_join_conditions(rule['object_join_conditions'])
            for jc in jcs.values():
                if jc['child_value'] != jc['parent_value']:
                    remove_join = False
        except Exception:
            remove_join = True
        if remove_join and pd.notna(rule['object_join_conditions']):
            rml_df.at[i, 'object_map_type'] = parent['subject_map_type']
            rml_df.at[i, 'object_map_value'] = parent['subject_map_value']
            rml_df.at[i, 'object_termtype'] = parent['subject_termtype']
            rml_df.at[i, 'object_join_conditions'] = None
    return rml_df


def _validate(rml_df: pd.DataFrame) -> None:
    aux = rml_df[['source_name', 'triples_map_id']].drop_duplicates()
    counts = aux['triples_map_id'].value_counts()
    repeated = list(counts[counts > 1].index)
    if repeated:
        raise ValueError(f'Triples maps repeated across data sources: {repeated}')


# --------------------------------------------------------------------------
# entry point
# --------------------------------------------------------------------------

_warned_default_base = [False]


def load_mapping_graph(text: 'str | list[str]') -> Graph:
    """Parse one or more Turtle mapping documents into a single graph.

    Each document is parsed with its OWN TurtleParser so @base/@prefix
    declarations stay document-scoped and blank-node labels from different
    files never unify (the reference parses files separately into one rdflib
    graph, mapping_parser.py); bnode labels are namespaced per document."""
    from ..rdf.terms import BNode
    from ..rdf.turtle import TurtleParser

    texts = [text] if isinstance(text, str) else list(text)
    triples: list = []
    base = None
    doc_base: dict = {}  # subject str -> owning document's @base (first wins)
    for di, doc_text in enumerate(texts):
        tp = TurtleParser(doc_text)
        doc = tp.parse()
        if len(texts) > 1:
            def fix(term, _di=di):
                if isinstance(term, BNode):
                    return BNode(f'd{_di}.{term}')
                if isinstance(term, tuple):  # RDF-star quoted triple
                    return tuple(fix(x, _di) for x in term)
                return term
            doc = [tuple(fix(x) for x in t) for t in doc]
        triples.extend(doc)
        # per-DOCUMENT base: relative template/constant results of a rule
        # resolve against the @base of the document that declared its
        # triples map, not the first document's (reference: rdflib resolves
        # per document at parse time)
        this_base = tp.base or 'http://example.com/base/'
        for s, _, _ in doc:
            doc_base.setdefault(str(s), this_base)
        if base is None and tp.base:
            base = tp.base
    g = Graph(triples)
    g.doc_base = doc_base
    # stash the document base IRI for relative-IRI resolution at term time
    if base is None and not _warned_default_base[0]:
        import logging
        logging.getLogger('morph_kgc_ray').warning(
            'Mapping document declares no @base; relative IRIs resolve against '
            'the default base http://example.com/base/ (W3C test-suite '
            'convention). Declare @base for real-world mappings.')
        _warned_default_base[0] = True
    g.base = base or 'http://example.com/base/'
    _r2rml_to_rml(g)
    _rml_legacy_to_rml(g)
    _rdf_class_to_pom(g)
    _expand_constant_shortcut_properties(g)
    _subject_graph_maps_to_pom(g)
    _complete_pom_with_default_graph(g)
    _complete_termtypes(g)
    _complete_triples_map_class(g)
    _remove_string_datatypes(g)
    _validate_termtypes(g)
    return g


def retrieve_mappings(config: Config) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Parse + normalize + partition all mapping documents of all sources."""
    from .partitioner import partition_mappings

    rml_dfs, fnml_dfs = [], []
    for section in config.get_data_sources_sections():
        texts = []
        inline = config.get_inline_mappings(section)
        if inline:
            texts.append(inline)
        for path in config.get_mappings_files(section):
            if path.endswith(('.yarrrml', '.yml', '.yaml')):
                from .yarrrml import yarrrml_to_turtle
                texts.append(yarrrml_to_turtle(open(path, encoding='utf-8').read()))
            else:
                texts.append(open(path, encoding='utf-8').read())
        g = load_mapping_graph(texts)
        rml_df, fnml_df = _extract_rules(g, section)
        rml_df['base_iri'] = rml_df['triples_map_id'].map(
            lambda tm: g.doc_base.get(str(tm), g.base))
        rml_dfs.append(rml_df)
        fnml_dfs.append(fnml_df)

    rml_df = pd.concat(rml_dfs, ignore_index=True) if rml_dfs else pd.DataFrame(columns=RML_DATAFRAME_COLUMNS)
    fnml_df = pd.concat(fnml_dfs, ignore_index=True) if fnml_dfs else pd.DataFrame(columns=FNML_DATAFRAME_COLUMNS)

    rml_df = rml_df.drop_duplicates()

    # complete rml:source with file_path from config
    for section in config.get_data_sources_sections():
        if config.has_file_path(section):
            mask = rml_df['source_name'] == section
            rml_df.loc[mask, 'logical_source_type'] = RML_SOURCE
            rml_df.loc[mask, 'logical_source_value'] = config.get_file_path(section)

    rml_df = _complete_source_types(rml_df, config)
    rml_df = _remove_delimiters(rml_df)
    rml_df = _infer_sql_datatypes(rml_df, config)
    rml_df = _normalize_rml_star(rml_df)
    rml_df = _remove_self_joins_no_condition(rml_df)
    _validate(rml_df)

    # empty strings -> None for uniform NaN handling
    rml_df = rml_df.replace(r'^\s*$', None, regex=True)

    rml_df = partition_mappings(rml_df, config)

    return rml_df.reset_index(drop=True), fnml_df.reset_index(drop=True)
