from urllib.parse import quote

import numpy as np
import pyarrow as pa
import pytest

from morph_kgc_ray.constants import RML_CONSTANT, RML_IRI, RML_LITERAL, RML_REFERENCE, RML_TEMPLATE, XSD_BOOLEAN, XSD_DATETIME, XSD_INTEGER
from morph_kgc_ray.engine.kernels import (
    compile_term_plan,
    escape_literal_array,
    get_references_in_template,
    materialize_term,
    natural_mapping_array,
    parse_template_segments,
    percent_encode_array,
    source_prologue,
    stringify_column,
)


def test_percent_encoder_matches_urllib_quote():
    vals = ['abc', 'a b', 'a/b:c?d', '100%', 'émile', '漢字', '', 'x~y_z-9.Q',
            'already%20enc', 'Bob/Charles', '\n\t"quote"', 'a' * 1000 + ' ']
    arr = pa.array(vals, pa.large_string())
    out = percent_encode_array(arr).to_pylist()
    for v, o in zip(vals, out):
        assert o == quote(v, safe=''), v


def test_escape_chain_matches_reference_order():
    arr = pa.array(['a\\b\nc\td"e\'f'], pa.large_string())
    assert escape_literal_array(arr).to_pylist() == ['a\\\\b\\nc\\td\\"e\\\'f']


def test_natural_mapping():
    assert natural_mapping_array(pa.array(['True', 'False'], pa.large_string()),
                                 XSD_BOOLEAN).to_pylist() == ['true', 'false']
    assert natural_mapping_array(pa.array(['2020-01-02 03:04:05'], pa.large_string()),
                                 XSD_DATETIME).to_pylist() == ['2020-01-02T03:04:05']
    assert natural_mapping_array(pa.array(['3.0', '3.7', '-2.9', '15'], pa.large_string()),
                                 XSD_INTEGER).to_pylist() == ['3', '3', '-2', '15']


def test_template_parsing_with_escaped_braces():
    assert get_references_in_template('http://e/{A}/{B}') == ['A', 'B']
    segs = parse_template_segments(r'x\{y\}{R}z')
    assert segs == [('const', 'x{y}'), ('ref', 'R'), ('const', 'z')]


def test_materialize_template_iri_encoding_and_wrap():
    plan = compile_term_plan(RML_TEMPLATE, 'http://e/{Name}', 'subject', termtype=RML_IRI)
    t = pa.table({'Name': pa.array(['a b', 'x'], pa.large_string())})
    assert materialize_term(t, plan).to_pylist() == ['<http://e/a%20b>', '<http://e/x>']


def test_materialize_reference_literal_escapes_but_does_not_encode():
    plan = compile_term_plan(RML_REFERENCE, 'Name', 'object', termtype=RML_LITERAL)
    t = pa.table({'Name': pa.array(['say "hi"'], pa.large_string())})
    assert materialize_term(t, plan).to_pylist() == ['"say \\"hi\\""']


def test_constant_literal_not_escaped():
    plan = compile_term_plan(RML_CONSTANT, 'a"b', 'object', termtype=RML_LITERAL)
    t = pa.table({'x': pa.array(['1'], pa.large_string())})
    assert materialize_term(t, plan).to_pylist() == ['"a"b"']


def test_base_iri_resolution_per_row():
    plan = compile_term_plan(RML_REFERENCE, 'Name', 'subject', termtype=RML_IRI,
                             base_iri='http://base/')
    t = pa.table({'Name': pa.array(['rel', 'http://abs/x'], pa.large_string())})
    assert materialize_term(t, plan).to_pylist() == ['<http://base/rel>', '<http://abs/x>']


def test_invalid_iri_rows_become_null():
    plan = compile_term_plan(RML_REFERENCE, 'Name', 'subject', termtype=RML_IRI,
                             base_iri='http://base/')
    t = pa.table({'Name': pa.array(['with space', 'fine'], pa.large_string())})
    out = materialize_term(t, plan).to_pylist()
    assert out == [None, '<http://base/fine>']


def test_stringify_matches_python_str():
    assert stringify_column(pa.chunked_array([pa.array([3.0, 3.5])])).to_pylist() == ['3.0', '3.5']
    assert stringify_column(pa.chunked_array([pa.array([True, False])])).to_pylist() == ['True', 'False']
    assert stringify_column(pa.chunked_array([pa.array([10], pa.int64())])).to_pylist() == ['10']
    ts = pa.chunked_array([pa.array(np.array(['2024-01-01T00:09:58.778549', '2024-01-01T00:00:00'],
                                             dtype='datetime64[us]'))])
    assert stringify_column(ts).to_pylist() == ['2024-01-01 00:09:58.778549', '2024-01-01 00:00:00']


def test_source_prologue_drops_na_and_dedups():
    t = pa.table({'a': pa.array(['1', '', '1', '2']), 'b': pa.array(['x', 'y', 'x', None])})
    out = source_prologue(t, ['a', 'b'], na_values=['', 'nan'])
    rows = set(zip(out['a'].to_pylist(), out['b'].to_pylist()))
    assert rows == {('1', 'x')}


def test_maximal_partitioner_matches_or_beats_partial():
    """MAXIMAL tries all 24 S/P/O/G refinement orderings and must yield at
    least as many (still-disjoint) groups as PARTIAL-AGGREGATIONS."""
    from morph_kgc_ray import Config
    from morph_kgc_ray.mapping.parser import retrieve_mappings
    base = '/root/reference/test/r2rml/R2RMLTC0009a'
    counts = {}
    for algo in ('PARTIAL-AGGREGATIONS', 'MAXIMAL'):
        cfg = Config({'DS': {'mappings': f'{base}/mapping.ttl',
                             'db_url': f'sqlite:///{base}/resource.db'},
                      'mapping_partitioning': algo})
        df, _ = retrieve_mappings(cfg)
        counts[algo] = df['mapping_partition'].nunique()
        assert df['mapping_partition'].notna().all()
    assert counts['MAXIMAL'] >= counts['PARTIAL-AGGREGATIONS'] >= 1


def test_xsd_canonical_double():
    from morph_kgc_ray.engine.kernels import xsd_canonical_double
    assert xsd_canonical_double('80.25') == '8.025E1'
    assert xsd_canonical_double('30') == '3.0E1'
    assert xsd_canonical_double('1.65') == '1.65E0'
    assert xsd_canonical_double('0') == '0.0E0'
    assert xsd_canonical_double('-0.001') == '-1.0E-3'
