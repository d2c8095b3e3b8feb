"""RML-FNML: function registry + batch executor.

Re-implements the reference's function surface
(/root/reference/src/morph_kgc/fnml/built_in_functions.py — GREL / IDLab /
morph-kgc built-ins referenced by their public function-ontology IRIs) and
executor semantics (fnml_executer.py:69-122: recursive composite resolution,
parameter binding from constants/templates/references/nested executions,
per-row invocation, null drop, list-result explosion).

Execution runs inside ``map_batches`` on Arrow batches — parameters bind as
Arrow arrays, vectorized built-ins consume them zero-copy, and only the
per-row scalar fallback materializes Python values.  When UDFs are configured
the stage should be an actor pool so the UDF module loads once per worker
(load_udfs is memoized per process here).
"""

from __future__ import annotations

import html as _html
from datetime import datetime
from hashlib import sha256
from uuid import uuid4

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..config import Config
from ..constants import (
    RML_BLANK_NODE,
    RML_CONSTANT,
    RML_EXECUTION,
    RML_IRI,
    RML_LITERAL,
    RML_REFERENCE,
    RML_TEMPLATE,
)
from .kernels import escape_literal_array, get_references_in_template, ljoin, natural_mapping_array

_GREL = 'http://users.ugent.be/~bjdmeest/function/grel.ttl#'
_MORPH = 'https://github.com/morph-kgc/morph-kgc/function/built-in.ttl#'
_IDLAB = 'http://example.com/idlab/function/'

bif_dict: dict[str, dict] = {}


def bif(fun_id, **params):
    def wrapper(funct):
        bif_dict[fun_id] = {'function': funct, 'parameters': params}
        return funct
    return wrapper


@bif(fun_id=f'{_GREL}escape', string=f'{_GREL}valueParam', mode=f'{_GREL}modeParam')
def _escape(string, mode):
    if mode == 'html':
        return _html.escape(string)
    return None


@bif(fun_id=f'{_GREL}string_toString', string=f'{_GREL}param_any_e')
def _to_string(string):
    return str(string)


@bif(fun_id=f'{_GREL}date_toDate', string=f'{_GREL}valueParam', format_code=f'{_GREL}param_string_pattern')
def _to_date(string, format_code):
    return str(datetime.strptime(string, format_code).date())


@bif(fun_id=f'{_GREL}string_split', string=f'{_GREL}valueParam', separator=f'{_GREL}param_string_sep')
def _split_stringified(string, separator):
    return str(string.split(separator))


def _maybe_list(value):
    try:
        return eval(value)  # noqa: S307 - stringified python list round-trip
    except Exception:
        return value


@bif(fun_id=f'{_GREL}array_get', string_list=f'{_GREL}param_a',
     start=f'{_GREL}p_int_i_from', end=f'{_GREL}p_int_i_opt_to')
def _array_get(string_list, start, end=None):
    string_list = _maybe_list(string_list)
    start = int(start)
    if end:
        return str(string_list[start:int(end)])
    return string_list[start]


@bif(fun_id=f'{_GREL}array_slice', string_list=f'{_GREL}param_a',
     start=f'{_GREL}p_int_i_from', end=f'{_GREL}p_int_i_opt_to')
def _array_slice(string_list, start, end=None):
    string_list = _maybe_list(string_list)
    start = int(start)
    if end:
        return str(string_list[start:int(end)])
    return str(string_list[start:])


@bif(fun_id=f'{_GREL}string_replace', string=f'{_GREL}valueParam',
     old_substring=f'{_GREL}param_find', new_substring=f'{_GREL}param_replace')
def _replace(string, old_substring, new_substring):
    return string.replace(old_substring, new_substring)


@bif(fun_id=f'{_GREL}toLowerCase', string=f'{_GREL}valueParam')
def _lower(string):
    return string.lower()


@bif(fun_id=f'{_GREL}toUpperCase', string=f'{_GREL}valueParam')
def _upper(string):
    return string.upper()


@bif(fun_id=f'{_GREL}toTitleCase', string=f'{_GREL}valueParam')
def _title(string):
    return string.title()


@bif(fun_id=f'{_GREL}reverse', string=f'{_GREL}valueParam')
def _reverse(string):
    return string[::-1]


@bif(fun_id=f'{_GREL}string_trim', string=f'{_GREL}valueParam')
def _trim(string):
    return string.strip()


@bif(fun_id=f'{_GREL}controls_if', boolean_expression=f'{_GREL}bool_b',
     value_true=f'{_GREL}any_true', value_false=f'{_GREL}any_false')
def _controls_if(boolean_expression, value_true, value_false=None):
    return value_true if eval(boolean_expression) else value_false  # noqa: S307


@bif(fun_id=f'{_GREL}math_round', number=f'{_GREL}param_dec_n')
def _round(number):
    if ',' in number and '.' in number:
        number = number.replace(',', '')
    elif ',' in number:
        number = number.replace(',', '.')
    return str(round(float(number)))


@bif(fun_id=f'{_MORPH}controls_if_cast', string=f'{_GREL}bool_b',
     value_true=f'{_GREL}any_true', value_false=f'{_GREL}any_false')
def _controls_if_cast(string, value_true, value_false=None):
    if string.lower() in ('', 'false', 'no', 'off', '0'):
        return value_false
    return value_true


@bif(fun_id=f'{_MORPH}uuid')
def _uuid():
    return str(uuid4())


@bif(fun_id=f'{_MORPH}string_split_explode', string=f'{_GREL}valueParam', separator=f'{_GREL}param_string_sep')
def _split_explode(string, separator):
    return string.split(separator)


@bif(fun_id=f'{_MORPH}concat', string1=f'{_GREL}valueParam1',
     string2=f'{_GREL}valueParam2', separator=f'{_GREL}param_string_sep')
def _concat(string1, string2, separator=''):
    return f'{string1}{separator}{string2}'


@bif(fun_id=f'{_IDLAB}toUpperCaseURL', url=f'{_IDLAB}str')
def _to_upper_case_url(url):
    from urllib.parse import quote
    low = url.lower()
    # NOTE: replicates the reference exactly, including acting on the
    # scheme-length prefix only (built_in_functions.py:226-240)
    if low.startswith('https://'):
        return f'https://{quote(url[:8].upper(), safe="")}'
    if low.startswith('http://'):
        return f'http://{quote(url[:7].upper(), safe="")}'
    return f'http://{quote(url.upper(), safe="")}'


@bif(fun_id=f'{_MORPH}hash', string=f'{_GREL}valueParam')
def _hash(string):
    return sha256(string.encode('UTF-8')).hexdigest()


@bif(fun_id=f'{_MORPH}hash_iri', string=f'{_GREL}valueParam')
def _hash_iri(string):
    return f'http://example.com/ns#{sha256(string.encode("UTF-8")).hexdigest()}'


# --------------------------------------------------------------------------
# UDF loading (once per worker process)
# --------------------------------------------------------------------------

_UDF_CACHE: dict[str, dict] = {}

_UDF_PREAMBLE = """
udf_dict = {}
def udf(fun_id, **params):
    def wrapper(funct):
        udf_dict[fun_id] = {'function': funct, 'parameters': params}
        return funct
    return wrapper
"""


def load_udfs(udfs_path: str) -> dict:
    if not udfs_path:
        return {}
    if udfs_path not in _UDF_CACHE:
        with open(udfs_path, encoding='utf-8') as f:
            code = f.read()
        namespace: dict = {}
        exec(_UDF_PREAMBLE + code, namespace)  # noqa: S102 - user-configured UDF module
        _UDF_CACHE[udfs_path] = namespace['udf_dict']
    return _UDF_CACHE[udfs_path]


# --------------------------------------------------------------------------
# executor
# --------------------------------------------------------------------------

def get_references_in_fnml_execution(fnml_df, execution: str) -> list[str]:
    rules = fnml_df[fnml_df['function_execution'] == execution]
    references: list[str] = []
    for _, p in rules.iterrows():
        if p['value_map_type'] == RML_TEMPLATE:
            references.extend(get_references_in_template(p['value_map_value']))
        elif p['value_map_type'] == RML_REFERENCE:
            references.append(p['value_map_value'])
        elif p['value_map_type'] == RML_EXECUTION:
            references.extend(get_references_in_fnml_execution(fnml_df, p['value_map_value']))
    return references


# --------------------------------------------------------------------------
# vectorized variants of the hot element-wise built-ins
# --------------------------------------------------------------------------
# execute_fnml uses these when available: constant params arrive as Python
# scalars, reference/template params as pyarrow large_string arrays.  A
# variant may return None to decline (e.g. non-constant replace pattern),
# falling back to the per-row scalar path.

def _vec_replace(string, old_substring, new_substring):
    import pyarrow.compute as pc
    if isinstance(old_substring, str) and isinstance(new_substring, str):
        return pc.replace_substring(string, old_substring, new_substring)
    return None


def _vec_concat(string1, string2, separator=''):
    from .kernels import ljoin
    if not isinstance(separator, str):
        return None
    return ljoin(string1, separator, string2)


def _make_pc_vec(kernel_name):
    def vec(string):
        import pyarrow.compute as pc
        return getattr(pc, kernel_name)(string)
    return vec


VECTORIZED_BIFS = {
    f'{_GREL}toLowerCase': _make_pc_vec('utf8_lower'),
    f'{_GREL}toUpperCase': _make_pc_vec('utf8_upper'),
    # toTitleCase is NOT vectorized: pc.utf8_title diverges from str.title()
    # on special-casing ('ß'->'ẞ' vs 'Ss', digraphs 'ǳ'->'Ǳ' vs 'ǲ',
    # ligatures 'ﬁ' left as-is vs 'Fi'), so the scalar bif is authoritative
    f'{_GREL}string_trim': _make_pc_vec('utf8_trim_whitespace'),
    f'{_GREL}reverse': _make_pc_vec('utf8_reverse'),
    f'{_GREL}string_replace': _vec_replace,
    f'{_MORPH}concat': _vec_concat,
}


def _expand_template_array(table: pa.Table, template: str) -> pa.Array:
    """Vectorized template expansion over an Arrow batch (scanner-based
    segments; reference columns stringified to large_string)."""
    from .kernels import parse_template_segments
    parts: list = []
    for kind, val in parse_template_segments(template):
        if kind == 'const':
            parts.append(val)
        else:
            parts.append(_stringify_col(table[val]))
    if all(isinstance(p, str) for p in parts):
        return pa.array([''.join(parts)] * table.num_rows, pa.large_string())
    return ljoin(*parts)


def _stringify_col(col) -> pa.Array:
    """Canonical parameter stringification: python-str/pandas rendering via
    kernels.stringify_column (float 30.0 -> '30.0', bool -> 'True'), matching
    the reference's ``data.map(str)`` prologue (materializer.py:44).  In the
    real pipeline columns arrive pre-stringified from source_prologue (no-op
    fast path); when called on raw typed columns, nulls stay null, propagate
    through the function, and drop the row — the same outcome the reference's
    default na_values produce after its str() rendering."""
    from .kernels import stringify_column
    return stringify_column(col)


def execute_fnml(table: pa.Table, fnml_df: pd.DataFrame, execution_id: str,
                 config: Config) -> pa.Table:
    """Returns ``table`` with a large_string column named ``execution_id``
    holding the function results; null/na results dropped, list results
    exploded via ``take`` (reference fnml_executer.py:69-122).  Parameters
    bind as Arrow arrays end-to-end — the vectorized built-ins consume them
    zero-copy; only the per-row scalar fallback materializes Python values."""
    rules = fnml_df[fnml_df['function_execution'] == execution_id]
    function_id = rules.iloc[0]['function_map_value']

    for _, p in rules.iterrows():
        if p['value_map_type'] == RML_EXECUTION:
            table = execute_fnml(table, fnml_df, p['value_map_value'], config)

    param_types = dict(zip(rules['parameter_map_value'], rules['value_map_type']))
    param_values = dict(zip(rules['parameter_map_value'], rules['value_map_value']))

    if function_id in bif_dict:
        entry = bif_dict[function_id]
    else:
        udfs = load_udfs(config.get_udfs_path())
        entry = udfs[function_id]
    function = entry['function']
    decorator_params = entry['parameters']

    const_args: dict = {}
    arr_args: dict = {}
    for arg_name, param_iri in decorator_params.items():
        if param_iri in param_types:
            if param_types[param_iri] == RML_CONSTANT:
                const_args[arg_name] = param_values[param_iri]
            elif param_types[param_iri] == RML_TEMPLATE:
                arr_args[arg_name] = _expand_template_array(table, param_values[param_iri])
            else:  # reference or nested execution result column
                arr_args[arg_name] = _stringify_col(table[param_values[param_iri]])

    n = table.num_rows
    na_values = config.get_na_values()

    vec = VECTORIZED_BIFS.get(function_id)
    if vec is not None and n and arr_args:  # all-constant args: scalar path
        try:
            res = vec(**const_args, **arr_args)
        except Exception:  # ArrowInvalid/ArrowNotImplementedError/TypeError:
            res = None     # decline to the per-row scalar path, which may succeed
        if isinstance(res, pa.ChunkedArray):
            res = res.combine_chunks()
        if isinstance(res, pa.Array):
            res = res.cast(pa.large_string())
            keep = pc.is_valid(res)
            if na_values:
                keep = pc.and_(keep, pc.invert(pc.is_in(
                    res, value_set=pa.array(list(na_values), pa.large_string()))))
            out = table.append_column(execution_id, res)
            return out.filter(keep) if not pc.all(keep).as_py() else out

    # scalar fallback: per-row Python invocation; list results explode by
    # emitting one (row-index, item) per element, then table.take(indices)
    lists = {k: v.to_pylist() for k, v in arr_args.items()}
    na_set = set(na_values)
    idx: list[int] = []
    vals: list[str] = []
    for i in range(n):
        kwargs = dict(const_args)
        for k, v in lists.items():
            kwargs[k] = v[i]
        r = function(**kwargs)
        if isinstance(r, (list, tuple)):
            # reference order is remove-nulls-then-explode (fnml_executer
            # explodes after the scalar-level na filter): na-valued ITEMS
            # inside a list survive; only None items drop
            items = [it for it in r if it is not None]
        elif r is None or (isinstance(r, str) and r in na_set):
            continue
        else:
            items = (r,)
        for item in items:
            idx.append(i)
            vals.append(item if isinstance(item, str) else str(item))
    out = table if len(idx) == n and idx == list(range(n)) \
        else table.take(pa.array(idx, pa.int64()))
    return out.append_column(execution_id, pa.array(vals, pa.large_string()))


def make_fnml_term_fn(rule, fnml_df, position: str, config: Config):
    """Returns fn(table, out_col) -> table adding the serialized term column
    for an execution-valued term map (_materialize_fnml_execution,
    materializer.py:166-191).  Arrow-native end-to-end: no pandas
    round-trip per batch."""
    execution_id = rule[f'{position}_map_value'] if position != 'lang_datatype' \
        else rule['lang_datatype_map_value']
    def _nn(v, default):
        return default if v is None or (isinstance(v, float) and pd.isna(v)) else str(v)

    if position == 'subject':
        termtype = _nn(rule['subject_termtype'], RML_IRI).strip()
        datatype = ''
    elif position == 'object':
        termtype = _nn(rule['object_termtype'], RML_LITERAL).strip()
        datatype = rule['lang_datatype_map_value'] if pd.notna(rule['lang_datatype_map_value']) else ''
    elif position in ('predicate', 'graph'):
        termtype = RML_IRI
        datatype = ''
    else:
        termtype = ''
        datatype = ''

    def fn(table: pa.Table, out_col: str) -> pa.Table:
        table = execute_fnml(table, fnml_df, execution_id, config)
        res = _stringify_col(table[execution_id])
        if termtype == RML_LITERAL:
            res = natural_mapping_array(res, datatype)
            res = escape_literal_array(res)
            res = ljoin('"', res, '"')
        elif termtype == RML_IRI:
            res = pa.compute.utf8_trim_whitespace(res)
            res = ljoin('<', res, '>')
        elif termtype == RML_BLANK_NODE:
            res = ljoin('_:', res)
        return table.drop_columns([execution_id]).append_column(out_col, res)

    return fn
