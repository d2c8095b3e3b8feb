"""Rule materialization as Ray Data pipelines.

The reference materializes each rule as one pandas DataFrame in one process
(/root/reference/src/morph_kgc/materializer.py:910-1040).  Here each rule is
a lazy ``ray.data.Dataset`` pipeline:

    read(source, columns=refs)                       [distributed scan]
      -> prologue: stringify/null-drop/local-dedup   [map_batches, stateless]
      -> (joins: broadcast or hash-partitioned)      [map_batches | Dataset.join]
      -> term materialization (S, P, O, G)           [map_batches, vectorized]
      -> triple serialization                        [map_batches]
    union over rules of a mapping partition
      -> exact distinct within the partition         [hash repartition + local distinct]

Mapping partitions are provably disjoint in their generated triples
(mapping_partitioner semantics), so dedup never crosses partitions: each
partition is an independent streaming pipeline and the engine's unit of
coarse-grained parallelism, exactly like the reference's process pool but
with intra-partition data parallelism the reference lacks.
"""

from __future__ import annotations

import logging

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..config import Config
from ..constants import (
    NQUADS,
    RML_BLANK_NODE,
    RML_CONSTANT,
    RML_DEFAULT_GRAPH,
    RML_EXECUTION,
    RML_GATHER,
    RML_IRI,
    RML_LITERAL,
    RML_PARENT_TRIPLES_MAP,
    RML_QUOTED_TRIPLES_MAP,
    RML_REFERENCE,
    RML_TEMPLATE,
    RML_TRIPLES_MAP_CLASS,
    RML_DATATYPE_MAP,
    RML_LANGUAGE_MAP,
)
from ..mapping import get_rml_rule, parse_join_conditions, retrieve_mappings
from ..sources.readers import read_source
from .kernels import compile_term_plan, get_references_in_template, ljoin, materialize_term
from .dedup import distinct

logger = logging.getLogger(__name__)

_PLAIN_TYPES = (RML_TEMPLATE, RML_CONSTANT, RML_REFERENCE)


# --------------------------------------------------------------------------
# reference extraction (materializer.py:73-103)
# --------------------------------------------------------------------------

def get_references_in_join_condition(rule, position_col: str):
    references, parent_references = [], []
    jc = rule[position_col]
    if pd.notna(jc) and jc:
        for cond in parse_join_conditions(jc).values():
            references.append(cond['child_value'])
            parent_references.append(cond['parent_value'])
    return references, parent_references


def get_references_in_rule(rule, rml_df, fnml_df, only_subject_map=False) -> list[str]:
    from .fnml import get_references_in_fnml_execution

    references: list[str] = []
    positions = ['subject'] if only_subject_map else ['subject', 'predicate', 'object', 'graph', 'lang_datatype']
    for position in positions:
        map_type = rule.get(f'{position}_map_type')
        if map_type == RML_TEMPLATE:
            references.extend(get_references_in_template(rule[f'{position}_map_value']))
        elif map_type == RML_REFERENCE:
            references.append(rule[f'{position}_map_value'])
        elif map_type == RML_EXECUTION:
            references.extend(get_references_in_fnml_execution(fnml_df, rule[f'{position}_map_value']))

    if pd.notna(rule.get('gather')) or pd.notna(rule.get('gather_subject')):
        refs = rule.get('gather_references')
        if pd.notna(refs) and refs:
            references.extend(r.strip() for r in str(refs).split(','))

    positions = ['subject'] if only_subject_map else ['subject', 'object']
    for position in positions:
        if rule.get(f'{position}_map_type') == RML_QUOTED_TRIPLES_MAP and \
                (pd.isna(rule.get(f'{position}_join_conditions')) or not rule.get(f'{position}_join_conditions')):
            parent_rule = get_rml_rule(rml_df, rule[f'{position}_map_value'])
            references.extend(get_references_in_rule(parent_rule, rml_df, fnml_df))
        refs_join, _ = get_references_in_join_condition(rule, f'{position}_join_conditions')
        references.extend(refs_join)

    return references


# --------------------------------------------------------------------------
# term materialization stage
# --------------------------------------------------------------------------

def _nn(value, default=''):
    """NaN-safe string coercion for rule fields."""
    return default if value is None or (isinstance(value, float) and pd.isna(value)) else str(value)


def _plan_for_position(rule, position: str, config: Config, columns_alias: str = ''):
    map_type = rule[f'{position}_map_type']
    map_value = rule[f'{position}_map_value']
    inferred = False
    if position == 'subject':
        termtype = _nn(rule['subject_termtype'])
        datatype = ''
    elif position == 'predicate':
        termtype = RML_IRI
        datatype = ''
    elif position == 'object':
        termtype = _nn(rule['object_termtype'])
        # a datatype from SQL-type inference (infer_sql_datatypes) drives the
        # canonical lexical form even when no ^^ suffix is emitted; an
        # explicit mapping datatype passes through as-is and non-XSD values
        # simply match no natural-mapping branch (materializer.py:222)
        inferred_dt = rule['inferred_datatype'] if 'inferred_datatype' in rule else None
        if pd.notna(inferred_dt) and inferred_dt:
            datatype = inferred_dt
            inferred = True
        else:
            datatype = rule['lang_datatype_map_value'] if pd.notna(rule['lang_datatype_map_value']) else ''
    elif position == 'graph':
        termtype = RML_IRI
        datatype = ''
    else:  # lang_datatype
        termtype = RML_IRI if rule['lang_datatype'] == RML_DATATYPE_MAP else ''
        datatype = ''
    return compile_term_plan(
        map_type, map_value, position, termtype=termtype, datatype=datatype,
        columns_alias=columns_alias if position == 'object' else '',
        only_printable=config.only_write_printable_characters(),
        safe_encoding=config.get_safe_percent_encoding(),
        base_iri=_nn(rule.get('base_iri') if hasattr(rule, 'get') else ''),
        inferred_datatype=inferred)


def make_term_stage(rule, fnml_df, config: Config, columns_alias: str = '',
                    positions=('subject', 'predicate', 'object')):
    """Build the vectorized map_batches fn adding serialized term columns.

    Mirrors _materialize_rml_rule_terms (materializer.py:194-230): S/P/O
    plans, optional language/datatype suffix on the object.  FNML-valued
    positions are computed through the fnml executor kernel."""
    from .fnml import make_fnml_term_fn

    plans = {}
    fnml_fns = {}
    for position in positions:
        map_type = rule[f'{position}_map_type']
        if map_type in _PLAIN_TYPES:
            plans[position] = _plan_for_position(rule, position, config, columns_alias)
        elif map_type == RML_EXECUTION:
            fnml_fns[position] = make_fnml_term_fn(rule, fnml_df, position, config)
        elif position in ('subject', 'object') and map_type == RML_QUOTED_TRIPLES_MAP:
            pass  # handled by the star pipeline before this stage
        elif map_type is None or pd.isna(map_type):
            pass
        else:
            raise NotImplementedError(f'term map type {map_type} at {position}')

    ld_plan = None
    ld_fnml = None
    ld_kind = rule['lang_datatype'] if pd.notna(rule['lang_datatype']) else None
    if ld_kind is not None and 'object' in positions:
        if rule['lang_datatype_map_type'] in _PLAIN_TYPES:
            ld_plan = _plan_for_position(rule, 'lang_datatype', config)
        elif rule['lang_datatype_map_type'] == RML_EXECUTION:
            ld_fnml = make_fnml_term_fn(rule, fnml_df, 'lang_datatype', config)

    sep = '@' if ld_kind == RML_LANGUAGE_MAP else '^^'

    def stage(table: pa.Table) -> pa.Table:
        out = table
        for position, plan in plans.items():
            arr = materialize_term(table, plan)
            out = _set_column(out, position, arr)
        for position, fn in fnml_fns.items():
            out = fn(out, position)
        if ld_plan is not None or ld_fnml is not None:
            if ld_plan is not None:
                ld_arr = materialize_term(out, ld_plan)
            else:
                out = ld_fnml(out, 'lang_datatype')
                ld_arr = out['lang_datatype']
                if isinstance(ld_arr, pa.ChunkedArray):
                    ld_arr = ld_arr.combine_chunks()
            obj = out['object']
            if isinstance(obj, pa.ChunkedArray):
                obj = obj.combine_chunks()
            obj = ljoin(obj.cast(pa.large_string()), sep, ld_arr.cast(pa.large_string()))
            out = _set_column(out, 'object', obj)
        return out

    return stage


def _set_column(table: pa.Table, name: str, arr) -> pa.Table:
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if name in table.column_names:
        idx = table.column_names.index(name)
        return table.set_column(idx, name, arr)
    return table.append_column(name, arr)


def _drop_columns(table: pa.Table, names) -> pa.Table:
    keep = [c for c in table.column_names if c not in names]
    return table.select(keep)


# --------------------------------------------------------------------------
# joins (referencing object maps / RML-star joins)
# --------------------------------------------------------------------------

class _BroadcastJoin:
    """Inner join against a broadcast parent table inside map_batches.

    Used when the parent side (a projected+deduped dimension) is small: the
    parent Arrow table is put in the object store ONCE (ray.put) and read by
    every task, never re-shipped per batch.  Duplicate join keys multiply
    rows (cross product), matching pandas merge semantics in _merge_data
    (materializer.py:896-907); the acero hash join stays zero-copy Arrow."""

    def __init__(self, parent_ref, child_keys, parent_keys):
        self.parent_ref = parent_ref
        self.child_keys = list(child_keys)
        self.parent_keys = list(parent_keys)
        self._parent = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._parent is None:
            self._parent = ray.get(self.parent_ref)
        if batch.num_rows == 0 or not set(self.child_keys) <= set(batch.column_names):
            cols = {c: pa.array([], pa.large_string())
                    for c in list(batch.column_names) + self.parent_keys}
            for c in self._parent.column_names:
                cols.setdefault(c, pa.array([], pa.large_string()))
            return pa.table(cols)
        # acero needs equal key types on both sides
        for k, pk in zip(self.child_keys, self.parent_keys):
            want = self._parent.schema.field(pk).type
            if batch.schema.field(k).type != want:
                batch = batch.set_column(batch.column_names.index(k), k,
                                         batch[k].cast(want))
        out = batch.join(self._parent, keys=self.child_keys,
                         right_keys=self.parent_keys, join_type='inner')
        # acero drops the right key columns; downstream parent term plans
        # reference them, and in an inner equi-join they equal the child keys
        for k, pk in zip(self.child_keys, self.parent_keys):
            if pk not in out.column_names:
                out = out.append_column(pk, out[k])
        return out


def merge_datasets(child_ds, parent_ds, join_conditions: str, config: Config):
    """Inner equi-join; parent columns arrive prefixed ``parent_``.

    Side selection: probe the parent with ``limit(cap+1)`` — the streaming
    executor short-circuits, so a huge parent is never fully materialized
    just to discover it is huge.  Small parents broadcast (ray.put once,
    read per task); large parents go through the hash-partitioned
    distributed join."""
    jcs = parse_join_conditions(join_conditions)
    child_keys = [c['child_value'] for c in jcs.values()]
    parent_keys = ['parent_' + c['parent_value'] for c in jcs.values()]

    def prefix_parent(table: pa.Table) -> pa.Table:
        return table.rename_columns(['parent_' + c for c in table.column_names])

    parent_ds = parent_ds.map_batches(prefix_parent, batch_format='pyarrow')

    cap = config.get_broadcast_join_max_rows()
    probe = parent_ds.limit(cap + 1).materialize()
    if probe.count() <= cap:
        parent_tbl = pa.concat_tables(
            [b for b in probe.iter_batches(batch_size=None, batch_format='pyarrow')
             if b.num_columns], promote_options='permissive') \
            if probe.count() else pa.table({})
        for k in parent_keys:  # empty parent datasets lose their schema
            if k not in parent_tbl.column_names:
                parent_tbl = parent_tbl.append_column(
                    k, pa.nulls(parent_tbl.num_rows, pa.large_string()))
        ref = ray.put(parent_tbl)
        return child_ds.map_batches(_BroadcastJoin(ref, child_keys, parent_keys),
                                    batch_format='pyarrow')
    # large parent: hash-partitioned distributed join keyed on the join refs
    # (parent re-executes and streams into the join, never driver-collected)
    num_partitions = max(16, config.get_dedup_partitions() or 16)
    return child_ds.join(parent_ds, 'inner', num_partitions,
                         on=tuple(child_keys), right_on=tuple(parent_keys))


# --------------------------------------------------------------------------
# per-rule pipeline (dispatch mirroring _materialize_rml_rule)
# --------------------------------------------------------------------------

class _TermStageActor:
    """Actor-pool wrapper for FNML-bearing rules (reference fnml_executer
    loads UDF modules once per mp.Pool worker): UDF module import and
    term-plan compilation happen ONCE per actor in __init__, per-batch work
    is only the function evaluation (vectorized where a pc.* variant
    exists)."""

    def __init__(self, rule, fnml_df, config, columns_alias='',
                 positions=('subject', 'predicate', 'object')):
        from .fnml import load_udfs
        if config.get_udfs_path():
            load_udfs(config.get_udfs_path())
        self._stage = make_term_stage(rule, fnml_df, config, columns_alias,
                                      positions=positions)

    def __call__(self, table: pa.Table) -> pa.Table:
        return self._stage(table)


def _rule_has_fnml(rule, positions=('subject', 'predicate', 'object')) -> bool:
    if any(rule[f'{p}_map_type'] == RML_EXECUTION for p in positions):
        return True
    return pd.notna(rule['lang_datatype_map_type']) and \
        rule['lang_datatype_map_type'] == RML_EXECUTION


def _apply_term_stage(ds, rule, fnml_df, config: Config, columns_alias='',
                      positions=('subject', 'predicate', 'object')):
    """Plain task for pure-kernel rules; a small actor pool when the rule
    evaluates FNML functions AND a UDF module is configured (the stateful
    case — module import bound once per actor).  Built-in-only FNML rules
    stay task-form: their hot kernels are vectorized and actor spin-up would
    cost more than it saves."""
    if _rule_has_fnml(rule, positions) and config.get_udfs_path():
        return ds.map_batches(_TermStageActor,
                              fn_constructor_args=(rule, fnml_df, config, columns_alias, positions),
                              batch_format='pyarrow', concurrency=(1, 4))
    return ds.map_batches(make_term_stage(rule, fnml_df, config, columns_alias,
                                          positions=positions),
                          batch_format='pyarrow')


def _finalize_triples(ds, rule, fnml_df, config: Config, nest_level: int, as_columns: bool = False):
    """Concatenate the `triple` column (and graph for N-Quads at top level).

    ``as_columns=True`` keeps (subject, predicate, object[, graph]) as
    separate columns instead (structured output for downstream analytics /
    the DuckDB oracle harness)."""
    nquads = nest_level == 0 and config.get_output_format() == NQUADS
    graph_stage = None
    if nquads:
        g_type = rule['graph_map_type']
        if g_type in _PLAIN_TYPES and rule['graph_map_value'] != RML_DEFAULT_GRAPH:
            plan = _plan_for_position(rule, 'graph', config)
            graph_stage = lambda t: _set_column(t, 'graph', materialize_term(t, plan))  # noqa: E731
        elif g_type == RML_EXECUTION:
            from .fnml import make_fnml_term_fn
            fn = make_fnml_term_fn(rule, fnml_df, 'graph', config)
            graph_stage = lambda t: fn(t, 'graph')  # noqa: E731

    def stage(table: pa.Table) -> pa.Table:
        s = table['subject'].combine_chunks().cast(pa.large_string())
        p = table['predicate'].combine_chunks().cast(pa.large_string())
        o = table['object'].combine_chunks().cast(pa.large_string())
        if as_columns:
            g = None
            if nquads:
                if graph_stage is not None:
                    table = graph_stage(table)
                    g = table['graph'].combine_chunks().cast(pa.large_string())
                else:
                    g = pa.array([''] * table.num_rows, pa.large_string())
            cols = {'subject': s, 'predicate': p, 'object': o}
            if g is not None:
                cols['graph'] = g
            out = pa.table(cols)
            mask = pc.and_(pc.and_(pc.is_valid(s), pc.is_valid(p)), pc.is_valid(o))
            return out.filter(mask)
        triple = ljoin(s, p, o, sep=' ')
        if nquads:
            if graph_stage is not None:
                table = graph_stage(table)
                g = table['graph'].combine_chunks().cast(pa.large_string())
            else:
                g = pa.array([''] * table.num_rows, pa.large_string())
            triple = ljoin(triple, g, sep=' ')
        table = _set_column(table, 'triple', triple)
        table = _drop_columns(table, ('subject', 'predicate', 'object'))
        # null triples = R2RML data errors (e.g. invalid IRI) — generate nothing
        return table.filter(pc.is_valid(table['triple']))

    return ds.map_batches(stage, batch_format='pyarrow')


def materialize_rule(rule, rml_df, fnml_df, config: Config, data=None,
                     parent_join_references=(), nest_level=0, python_source=None,
                     as_columns=False):
    """Build the Dataset pipeline for one normalized rule.

    Returns a Dataset containing the source columns plus a serialized
    ``triple`` column (reference contract of _materialize_rml_rule)."""
    references = set(get_references_in_rule(rule, rml_df, fnml_df))
    references.update(parent_join_references)

    refs_subject_join, parent_refs_subject_join = get_references_in_join_condition(rule, 'subject_join_conditions')
    refs_object_join, parent_refs_object_join = get_references_in_join_condition(rule, 'object_join_conditions')

    sm_type, om_type = rule['subject_map_type'], rule['object_map_type']

    if sm_type == RML_CONSTANT and rule['predicate_map_type'] == RML_CONSTANT and \
            om_type == RML_CONSTANT and rule['graph_map_type'] == RML_CONSTANT:
        ds = ray.data.from_items([{'placeholder': 'placeholder'}])
        ds = _apply_term_stage(ds, rule, fnml_df, config)

    elif sm_type == RML_QUOTED_TRIPLES_MAP or om_type == RML_QUOTED_TRIPLES_MAP:
        if data is None:
            data = read_source(rule, sorted(references), config, python_source)
        ds = data
        if sm_type == RML_QUOTED_TRIPLES_MAP:
            parent_rule = get_rml_rule(rml_df, rule['subject_map_value'])
            if pd.notna(rule['subject_join_conditions']) and rule['subject_join_conditions']:
                parent_ds = materialize_rule(parent_rule, rml_df, fnml_df, config,
                                             parent_join_references=set(parent_refs_subject_join),
                                             nest_level=nest_level + 1, python_source=python_source)
                ds = merge_datasets(ds, parent_ds, rule['subject_join_conditions'], config)
                ds = ds.map_batches(_quote_stage('parent_triple', 'subject', drop=True), batch_format='pyarrow')
            else:
                ds = materialize_rule(parent_rule, rml_df, fnml_df, config, data=ds,
                                      nest_level=nest_level + 1, python_source=python_source)
                ds = ds.map_batches(_quote_stage('triple', 'subject'), batch_format='pyarrow')
            keep_col = f'keep_subject{nest_level}'
            ds = ds.map_batches(_copy_stage('subject', keep_col), batch_format='pyarrow')
        if om_type == RML_QUOTED_TRIPLES_MAP:
            parent_rule = get_rml_rule(rml_df, rule['object_map_value'])
            if pd.notna(rule['object_join_conditions']) and rule['object_join_conditions']:
                parent_ds = materialize_rule(parent_rule, rml_df, fnml_df, config,
                                             parent_join_references=set(parent_refs_object_join),
                                             nest_level=nest_level + 1, python_source=python_source)
                ds = merge_datasets(ds, parent_ds, rule['object_join_conditions'], config)
                ds = ds.map_batches(_quote_stage('parent_triple', 'object', drop=True), batch_format='pyarrow')
            else:
                ds = materialize_rule(parent_rule, rml_df, fnml_df, config, data=ds,
                                      nest_level=nest_level + 1, python_source=python_source)
                ds = ds.map_batches(_quote_stage('triple', 'object'), batch_format='pyarrow')
            if sm_type == RML_QUOTED_TRIPLES_MAP:
                keep_col = f'keep_subject{nest_level}'
                ds = ds.map_batches(_copy_stage(keep_col, 'subject'), batch_format='pyarrow')
        positions = [p for p in ('subject', 'predicate', 'object')
                     if rule[f'{p}_map_type'] != RML_QUOTED_TRIPLES_MAP]
        ds = _apply_term_stage(ds, rule, fnml_df, config, positions=tuple(positions))

    elif om_type == RML_PARENT_TRIPLES_MAP:
        references.update(refs_object_join)
        parent_rule = get_rml_rule(rml_df, rule['object_map_value'])
        parent_references = set(get_references_in_rule(parent_rule, rml_df, fnml_df, only_subject_map=True))
        parent_references.update(parent_refs_object_join)

        if data is None:
            data = read_source(rule, sorted(references), config, python_source)
        parent_data = read_source(parent_rule, sorted(parent_references), config, python_source)
        ds = merge_datasets(data, parent_data, rule['object_join_conditions'], config)

        joined_rule = rule.copy()
        joined_rule['object_map_type'] = parent_rule['subject_map_type']
        joined_rule['object_map_value'] = parent_rule['subject_map_value']
        ds = _apply_term_stage(ds, joined_rule, fnml_df, config, columns_alias='parent_')
        rule = joined_rule

    elif pd.notna(rule.get('gather')) or pd.notna(rule.get('gather_subject')) or sm_type == RML_GATHER:
        from .gather import materialize_gather_rule
        if data is None:
            # gather references tolerate nulls at read time: a record with a
            # missing/empty gather list still forms a (possibly empty)
            # collection; emptiness policy is applied during construction
            gather_refs = [r.strip() for r in str(rule.get('gather_references') or '').split(',') if r.strip()]
            data = read_source(rule, sorted(references), config, python_source, keep_order=True,
                               null_ok_refs=tuple(gather_refs))
        ds = materialize_gather_rule(data, rule, config)

    else:
        if data is None:
            data = read_source(rule, sorted(references), config, python_source)
        ds = _apply_term_stage(data, rule, fnml_df, config)

    return _finalize_triples(ds, rule, fnml_df, config, nest_level,
                             as_columns=as_columns and nest_level == 0)


def _quote_stage(src_col: str, dst_col: str, drop: bool = False):
    def stage(table: pa.Table) -> pa.Table:
        col = table[src_col].combine_chunks().cast(pa.large_string())
        quoted = ljoin('<< ', col, ' >>')
        # '<< ' + x + ' >>' via join with empty separator
        table = _set_column(table, dst_col, quoted)
        if drop:
            table = _drop_columns(table, (src_col,))
        return table
    return stage


def _copy_stage(src_col: str, dst_col: str):
    def stage(table: pa.Table) -> pa.Table:
        return _set_column(table, dst_col, table[src_col].combine_chunks())
    return stage


# --------------------------------------------------------------------------
# top-level entry points
# --------------------------------------------------------------------------

# Below this total mapping-source volume the per-partition dedup takes the
# single-task fast path (coalesce to ONE block + exact distinct): per-
# execution fixed costs dominate tiny jobs (conformance TCs, dimension
# tables).  Above it, dedup runs through the push-based in-place distinct —
# the hash exchange overlaps the materialization pass itself (see
# engine/dedup.py) — which replaced both the single-task plan at mid size
# (a 600k-triple lineitem mapping spent ~2 s in the one serial task) and
# the keyed payload exchange at large size.
_SMALL_DISTINCT_BYTES = int(__import__('os').environ.get('MKR_SMALL_DISTINCT_BYTES',
                                                         4 * 1024 * 1024))


def _mapping_sources_small(rml_df, config: Config) -> bool:
    """True when every logical source is file-backed and their total size is
    below the small-distinct threshold (plan-time decision, no data read)."""
    from ..sources.readers import estimate_rule_source_bytes
    total = 0
    seen: set = set()
    for _, rule in rml_df.iterrows():
        key = (rule.get('source_name'), rule.get('logical_source_value'))
        if key in seen:
            continue
        seen.add(key)
        if rule.get('source_type') == 'PYTHON_SOURCE':
            continue  # in-memory sources are driver-held lists: small by construction
        b = estimate_rule_source_bytes(rule, config)
        if b is None:
            return False  # unknown size (RDB/view): the exchange plan is always correct
        total += b
        if total > _SMALL_DISTINCT_BYTES:
            return False
    return True


def _partition_datasets(config: Config, python_source=None, as_columns=False,
                        skip_ids: 'set | None' = None):
    """One deduped triples Dataset per mapping partition.  ``skip_ids``
    (partition ids already committed by a resumable sink) are built as
    EMPTY placeholders so no compute is planned or executed for them."""
    rml_df, fnml_df = retrieve_mappings(config)
    asserted = rml_df[rml_df['triples_map_type'] == RML_TRIPLES_MAP_CLASS]

    out_cols = ['triple']
    if as_columns:
        out_cols = ['subject', 'predicate', 'object']
        if config.get_output_format() == NQUADS:
            out_cols.append('graph')

    small = _mapping_sources_small(asserted, config)

    partitions = {}
    group_cols = 'mapping_partition'
    for partition_id, group in asserted.groupby(group_cols, dropna=False, sort=True):
        if skip_ids and str(partition_id) in skip_ids:
            partitions[str(partition_id)] = None  # sink skips it via its manifest
            continue
        rule_datasets = []
        for _, rule in group.iterrows():
            ds = materialize_rule(rule, rml_df, fnml_df, config, python_source=python_source,
                                  as_columns=as_columns)
            rule_datasets.append(ds.select_columns(out_cols))
        ds = rule_datasets[0]
        if len(rule_datasets) > 1:
            ds = ds.union(*rule_datasets[1:])
        # the partition-disjointness theorem keeps this dedup partition-local
        if small:
            ds = distinct(ds, out_cols, num_partitions=config.get_dedup_partitions() or None,
                          small=True)
        else:
            # push-based in-place distinct: the 16-byte hash exchange
            # overlaps the materialization pass (engine/dedup.py); NOTE this
            # executes the partition's pipeline eagerly (the winners must
            # exist before the keep filter), which is why committed
            # partitions are skipped above instead of in the sink
            from .dedup import distinct_in_place
            ds = distinct_in_place(ds, out_cols)
        partitions[str(partition_id)] = ds
    return partitions


def materialize_dataset(config, python_source=None, as_columns=False) -> ray.data.Dataset:
    """Full KG as one Dataset: columns (triple, mapping_partition), or with
    as_columns=True (subject, predicate, object[, graph], mapping_partition)."""
    if not isinstance(config, Config):
        config = Config(config)
    parts = _partition_datasets(config, python_source, as_columns=as_columns)

    tagged = []
    for pid, ds in parts.items():
        def tag(table: pa.Table, pid=pid) -> pa.Table:
            return table.append_column('mapping_partition',
                                       pa.array([pid] * table.num_rows, pa.string()))
        tagged.append(ds.map_batches(tag, batch_format='pyarrow'))
    out = tagged[0]
    if len(tagged) > 1:
        out = out.union(*tagged[1:])
    return out


def materialize_set(config, python_source=None) -> set[str]:
    """Driver-side set of serialized triples (tests / small outputs only)."""
    ds = materialize_dataset(config, python_source)
    triples = set()
    for batch in ds.iter_batches(batch_size=65536, batch_format='pyarrow'):
        triples.update(batch['triple'].to_pylist())
    return triples


def materialize_to_dir(config, out_dir: str, python_source=None, resume: bool = True,
                       filesystem=None) -> dict:
    """Materialize to a resumable partitioned N-Triples/N-Quads layout.

    One subdirectory per mapping partition plus a manifest; on resume,
    partitions with a committed manifest are skipped (idempotent re-runs).
    ``out_dir`` may be a local path or a filesystem URI (``file://``,
    ``s3://``); pass ``filesystem`` for an explicit ``pyarrow.fs.FileSystem``."""
    import posixpath

    from ..sinks.writers import (
        _exists,
        _sanitize,
        resolve_filesystem,
        write_partitioned_ntriples,
    )
    if not isinstance(config, Config):
        config = Config(config)
    skip_ids: set = set()
    if resume:
        # identify committed partitions BEFORE building their datasets: the
        # mid/large dedup plan executes eagerly, so the skip must happen at
        # plan time, not inside the sink (which still re-checks manifests)
        f, root = resolve_filesystem(out_dir, filesystem)
        rml_df, _ = retrieve_mappings(config)
        asserted = rml_df[rml_df['triples_map_type'] == RML_TRIPLES_MAP_CLASS]
        for pid in asserted['mapping_partition'].dropna().unique():
            mpath = posixpath.join(root, f'part={_sanitize(str(pid))}',
                                   '_MANIFEST.json')
            if _exists(f, mpath):
                skip_ids.add(str(pid))
    parts = _partition_datasets(config, python_source, skip_ids=skip_ids)
    return write_partitioned_ntriples(parts, out_dir, resume=resume,
                                      filesystem=filesystem)
