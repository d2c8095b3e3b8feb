"""Mapping partitioner (PARTIAL-AGGREGATIONS algorithm).

Assigns each normalized mapping rule a ``mapping_partition`` label such that
rules in *different* partitions can never generate the same triple (the
reference's signature disjointness theorem).  Dedup therefore only needs to
run *within* a partition, which is what lets the Ray engine run partitions as
independent streaming pipelines with no cross-partition shuffle.

Semantics mirror /root/reference/src/morph_kgc/mapping/mapping_partitioner.py:
invariant computation (:360-406) and partial-aggregations grouping (:230-358).
"""

from __future__ import annotations

import pandas as pd

from ..config import Config
from ..constants import (
    AUXILIAR_UNIQUE_REPLACING_STRING,
    RML_BLANK_NODE,
    RML_CONSTANT,
    RML_LITERAL,
    RML_PARENT_TRIPLES_MAP,
    RML_REFERENCE,
    RML_TEMPLATE,
)


def get_invariant_of_template(template: str) -> str:
    """Constant prefix of a template (text before the first reference)."""
    template = template.replace('\\{', AUXILIAR_UNIQUE_REPLACING_STRING)
    pos = template.find('{')
    invariant = template if pos == -1 else template[:pos]
    return invariant.replace(AUXILIAR_UNIQUE_REPLACING_STRING, '\\{')


def _get_rml_rule(rml_df: pd.DataFrame, triples_map_id: str) -> pd.Series:
    return rml_df[rml_df['triples_map_id'] == triples_map_id].iloc[0]


def _compute_invariants(rml_df: pd.DataFrame) -> pd.DataFrame:
    rml_df = rml_df.copy()
    for col in ('subject_invariant', 'predicate_invariant', 'object_invariant', 'graph_invariant'):
        rml_df[col] = ''
    for i, rule in rml_df.iterrows():
        if rule['subject_map_type'] == RML_TEMPLATE:
            rml_df.at[i, 'subject_invariant'] = get_invariant_of_template(str(rule['subject_map_value']))
        elif rule['subject_map_type'] == RML_CONSTANT:
            rml_df.at[i, 'subject_invariant'] = str(rule['subject_map_value'])

        if rule['predicate_map_type'] == RML_CONSTANT:
            rml_df.at[i, 'predicate_invariant'] = str(rule['predicate_map_value'])
        elif rule['predicate_map_type'] == RML_TEMPLATE:
            rml_df.at[i, 'predicate_invariant'] = get_invariant_of_template(str(rule['predicate_map_value']))

        if rule['object_map_type'] == RML_CONSTANT:
            rml_df.at[i, 'object_invariant'] = str(rule['object_map_value'])
        elif rule['object_map_type'] == RML_TEMPLATE:
            rml_df.at[i, 'object_invariant'] = get_invariant_of_template(str(rule['object_map_value']))
        elif rule['object_map_type'] == RML_PARENT_TRIPLES_MAP:
            parent = _get_rml_rule(rml_df, rule['object_map_value'])
            if parent['subject_map_type'] == RML_CONSTANT:
                rml_df.at[i, 'object_invariant'] = str(parent['subject_map_value'])
            elif parent['subject_map_type'] == RML_TEMPLATE:
                rml_df.at[i, 'object_invariant'] = get_invariant_of_template(str(parent['subject_map_value']))

        if rule['graph_map_type'] == RML_CONSTANT:
            rml_df.at[i, 'graph_invariant'] = str(rule['graph_map_value'])
        elif rule['graph_map_type'] == RML_TEMPLATE:
            rml_df.at[i, 'graph_invariant'] = get_invariant_of_template(str(rule['graph_map_value']))
    return rml_df


def _prefix_grouping(rml_df: pd.DataFrame, invariant_col: str, partition_col: str,
                     enforce_full_match: bool, blank_zero_termtype_col: str | None = None) -> pd.DataFrame:
    """Sort by invariant; a rule whose invariant starts with (or equals, when
    all maps are constant) the running invariant joins the current group."""
    rml_df = rml_df.sort_values(by=[invariant_col], ascending=True)
    current_group = 0
    current_invariant = AUXILIAR_UNIQUE_REPLACING_STRING
    for i, rule in rml_df.iterrows():
        if blank_zero_termtype_col is not None and rule[blank_zero_termtype_col] == RML_BLANK_NODE:
            rml_df.at[i, partition_col] = '0'
        elif enforce_full_match and rule[invariant_col] == current_invariant:
            rml_df.at[i, partition_col] = str(current_group)
        elif not enforce_full_match and str(rule[invariant_col]).startswith(current_invariant):
            rml_df.at[i, partition_col] = str(current_group)
        else:
            current_group += 1
            current_invariant = str(rule[invariant_col])
            rml_df.at[i, partition_col] = str(current_group)
    return rml_df


def _maximal_refine(df: pd.DataFrame, position: str) -> pd.DataFrame:
    """Refine the running ``mapping_partition`` groups by one position
    (reference mapping_partitioner.py:408-520 semantics: hierarchical
    grouping — the per-position counters reset at every enclosing group
    boundary; the literal-type tracker deliberately persists, matching the
    reference exactly)."""
    if position == 'S':
        df = df.sort_values(by=['mapping_partition', 'subject_invariant'], ascending=True)
    elif position == 'P':
        df = df.sort_values(by=['mapping_partition', 'predicate_invariant'], ascending=True)
    elif position == 'O':
        df = df.sort_values(by=['mapping_partition', 'object_termtype', 'literal_type',
                                'object_invariant'], ascending=True, na_position='first')
    else:
        df = df.sort_values(by=['mapping_partition', 'graph_invariant'], ascending=True)

    enforce_full = False
    if position == 'P':
        enforce_full = set(df['predicate_map_type'].dropna()) == {RML_CONSTANT}
    elif position == 'G':
        enforce_full = set(df['graph_map_type'].dropna()) == {RML_CONSTANT}

    current_global = df.iloc[0]['mapping_partition'] if len(df) else ''
    current_group = 0
    current_invariant = AUXILIAR_UNIQUE_REPLACING_STRING
    current_literal_type = AUXILIAR_UNIQUE_REPLACING_STRING
    for i, rule in df.iterrows():
        if current_global != rule['mapping_partition']:
            current_group = 0
            current_invariant = AUXILIAR_UNIQUE_REPLACING_STRING
            current_global = rule['mapping_partition']

        if position == 'S':
            if rule['subject_termtype'] == RML_BLANK_NODE:
                df.at[i, 'mapping_partition'] += '-0'
            elif str(rule['subject_invariant']).startswith(current_invariant):
                df.at[i, 'mapping_partition'] += f'-{current_group}'
            else:
                current_group += 1
                current_invariant = str(rule['subject_invariant'])
                df.at[i, 'mapping_partition'] += f'-{current_group}'
        elif position == 'O':
            if rule['object_termtype'] == RML_BLANK_NODE:
                df.at[i, 'mapping_partition'] += '-0'
            elif rule['object_termtype'] == RML_LITERAL:
                if str(rule['literal_type']) != current_literal_type:
                    current_group += 1
                    current_literal_type = str(rule['literal_type'])
                df.at[i, 'mapping_partition'] += f'-{current_group}'
            elif str(rule['object_invariant']).startswith(current_invariant):
                df.at[i, 'mapping_partition'] += f'-{current_group}'
            else:
                current_group += 1
                current_invariant = str(rule['object_invariant'])
                df.at[i, 'mapping_partition'] += f'-{current_group}'
        else:  # P / G
            inv_col = 'predicate_invariant' if position == 'P' else 'graph_invariant'
            if enforce_full and str(rule[inv_col]) == current_invariant:
                df.at[i, 'mapping_partition'] += f'-{current_group}'
            elif not enforce_full and str(rule[inv_col]).startswith(current_invariant):
                df.at[i, 'mapping_partition'] += f'-{current_group}'
            else:
                current_group += 1
                current_invariant = str(rule[inv_col])
                df.at[i, 'mapping_partition'] += f'-{current_group}'
    return df


def _partition_maximal(rml_df: pd.DataFrame) -> pd.DataFrame:
    """MAXIMAL algorithm (reference mapping_partitioner.py:186-228): try all
    24 S/P/O/G orderings of hierarchical refinement, keep the ordering that
    yields the most groups.  More groups = more partition-level parallelism
    and smaller per-partition dedup domains on wide mappings."""
    from itertools import permutations

    best, best_n = None, -1
    for ordering in permutations('SPOG'):
        df = rml_df.copy()
        df['mapping_partition'] = ''
        for pos in ordering:
            df = _maximal_refine(df, pos)
        n = df['mapping_partition'].nunique()
        if n > best_n:
            best_n, best = n, df
    best['mapping_partition'] = best['mapping_partition'].str[1:]
    return best.sort_index()


def partition_mappings(rml_df: pd.DataFrame, config: Config) -> pd.DataFrame:
    if not len(rml_df):
        rml_df = rml_df.copy()
        rml_df['mapping_partition'] = pd.Series(dtype=str)
        return rml_df

    rml_df = _compute_invariants(rml_df)

    if config.get_mapping_partitioning() == 'MAXIMAL':
        if {RML_REFERENCE, RML_TEMPLATE}.intersection(set(rml_df['lang_datatype_map_type'].dropna())):
            rml_df['literal_type'] = rml_df['lang_datatype']
        else:
            rml_df['literal_type'] = rml_df['lang_datatype_map_value']
        rml_df = _partition_maximal(rml_df)
        return rml_df.drop(columns=[
            'subject_invariant', 'predicate_invariant', 'object_invariant',
            'graph_invariant', 'literal_type'])
    for col in ('subject_partition', 'predicate_partition', 'object_partition', 'graph_partition'):
        rml_df[col] = ''

    if {RML_REFERENCE, RML_TEMPLATE}.intersection(set(rml_df['lang_datatype_map_type'].dropna())):
        rml_df['literal_type'] = rml_df['lang_datatype']
    else:
        rml_df['literal_type'] = rml_df['lang_datatype_map_value']

    # SUBJECT
    rml_df = _prefix_grouping(rml_df, 'subject_invariant', 'subject_partition',
                              enforce_full_match=False, blank_zero_termtype_col='subject_termtype')

    # PREDICATE (full-match grouping if every predicate map is constant)
    enforce = set(rml_df['predicate_map_type'].dropna()) == {RML_CONSTANT}
    rml_df = _prefix_grouping(rml_df, 'predicate_invariant', 'predicate_partition', enforce_full_match=enforce)

    # OBJECT: literals group by literal type; blank nodes all share group 0
    rml_df = rml_df.sort_values(by=['object_termtype', 'literal_type', 'object_invariant'],
                                ascending=True, na_position='first')
    current_group = 0
    current_literal_type = AUXILIAR_UNIQUE_REPLACING_STRING
    current_invariant = AUXILIAR_UNIQUE_REPLACING_STRING
    for i, rule in rml_df.iterrows():
        if rule['object_termtype'] == RML_BLANK_NODE:
            rml_df.at[i, 'object_partition'] = '0'
        elif rule['object_termtype'] == RML_LITERAL:
            if str(rule['literal_type']) != current_literal_type:
                current_group += 1
                current_literal_type = str(rule['literal_type'])
            rml_df.at[i, 'object_partition'] = str(current_group)
        elif str(rule['object_invariant']).startswith(current_invariant):
            rml_df.at[i, 'object_partition'] = str(current_group)
        else:
            current_group += 1
            current_invariant = str(rule['object_invariant'])
            rml_df.at[i, 'object_partition'] = str(current_group)

    # GRAPH
    enforce = set(rml_df['graph_map_type'].dropna()) == {RML_CONSTANT}
    rml_df = _prefix_grouping(rml_df, 'graph_invariant', 'graph_partition', enforce_full_match=enforce)

    rml_df['mapping_partition'] = (rml_df['subject_partition'] + '-' + rml_df['predicate_partition'] + '-'
                                   + rml_df['object_partition'] + '-' + rml_df['graph_partition'])

    return rml_df.drop(columns=[
        'subject_partition', 'subject_invariant', 'predicate_partition', 'predicate_invariant',
        'object_partition', 'object_invariant', 'graph_partition', 'graph_invariant', 'literal_type'])
