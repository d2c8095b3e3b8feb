"""XPath 1.0 evaluator tests (sources/xpath.py) plus the XML source
fallback path for expressions ElementTree's grammar rejects."""

import xml.etree.ElementTree as ET

import pytest

from morph_kgc_ray.sources.xpath import XPath, select

DOC = '''
<library>
  <shelf id="s1">
    <book id="b1" year="1999"><title>Alpha</title><author>Ann</author></book>
    <book id="b2" year="2005"><title>Beta tools</title><author>Bob</author></book>
    <book id="b3" year="2011"><title>Gamma</title><author>Ann</author></book>
  </shelf>
  <shelf id="s2">
    <book id="b4" year="2011"><title>Delta</title></book>
  </shelf>
</library>
'''


@pytest.fixture()
def root():
    return ET.fromstring(DOC)


def _texts(res):
    return [x.findtext('title') if not isinstance(x, str) else x for x in res]


def test_child_and_descendant_paths(root):
    assert _texts(select(root, './/book')) == ['Alpha', 'Beta tools', 'Gamma', 'Delta']
    assert _texts(select(root, './shelf/book[1]')) == ['Alpha', 'Delta']
    assert select(root, 'count(.//book)') == [4.0]


def test_position_and_last_arithmetic(root):
    assert _texts(select(root, ".//book[position()=2]")) == ['Beta tools']
    # '//x[last()]' counts per parent (W3C 2.5): last book of EACH shelf
    assert _texts(select(root, ".//book[last()]")) == ['Gamma', 'Delta']
    assert _texts(select(root, "./shelf[1]/book[position()>=2]")) == ['Beta tools', 'Gamma']


def test_comparisons_and_boolean_ops(root):
    assert _texts(select(root, ".//book[@year>2000 and @year<2011]")) == ['Beta tools']
    assert _texts(select(root, ".//book[@year=1999 or @id='b4']")) == ['Alpha', 'Delta']
    assert _texts(select(root, ".//book[not(author)]")) == ['Delta']


def test_string_functions(root):
    assert _texts(select(root, ".//book[contains(title, 'tools')]")) == ['Beta tools']
    assert _texts(select(root, ".//book[starts-with(title, 'Ga')]")) == ['Gamma']
    assert select(root, "normalize-space('  a   b ')") == ['a b']
    assert select(root, "concat('x', '-', 'y')") == ['x-y']
    assert select(root, "substring-after('a=b', '=')") == ['b']
    assert select(root, "string-length('abcd')") == [4.0]


def test_axes(root):
    b2 = select(root, ".//book[@id='b2']")[0]
    pm = {c: p for p in root.iter() for c in p}
    assert select(b2, 'parent::shelf/@id', parent_map=pm) == ['s1']
    assert _texts(select(b2, 'following-sibling::book', parent_map=pm)) == ['Gamma']
    assert _texts(select(b2, 'preceding-sibling::book', parent_map=pm)) == ['Alpha']
    assert select(b2, 'ancestor::library/shelf[2]/@id', parent_map=pm) == ['s2']
    assert select(b2, 'self::book/@year', parent_map=pm) == ['2005']


def test_attribute_axis_and_union(root):
    assert select(root, './/book/attribute::id') == ['b1', 'b2', 'b3', 'b4']
    got = select(root, ".//book[@id='b1']/title | .//book[@id='b4']/title")
    assert [e.text for e in got] == ['Alpha', 'Delta']


def test_text_nodes_and_name(root):
    assert select(root, './/book[1]/title/text()') == ['Alpha', 'Delta']
    assert select(root, 'local-name(.)') == ['library']


def test_namespaced_document():
    doc = ('<r xmlns:m="http://m.example/">'
           '<m:item m:id="1">x</m:item><m:item m:id="2">y</m:item></r>')
    root = ET.fromstring(doc)
    ns = {'m': 'http://m.example/'}
    assert select(root, ".//m:item[@m:id='2']/text()", ns=ns) == ['y']


def test_errors():
    with pytest.raises(ValueError):
        XPath('.//book[')
    with pytest.raises(ValueError):
        XPath('unknown-fn(1)').evaluate(ET.fromstring('<a/>'))


def test_xml_source_axis_and_function_refs(ray_session, tmp_path):
    """End-to-end through read_source: an iterator with a function
    predicate and references using contains() / following-sibling:: that
    ElementTree's own grammar rejects."""
    from morph_kgc_ray.config import Config
    from morph_kgc_ray.sources.readers import read_source
    p = tmp_path / 'lib.xml'
    p.write_text(DOC)
    rule = {'source_type': 'XML', 'logical_source_value': str(p),
            'logical_source_type': None,
            'iterator': "//book[starts-with(title, 'B') or starts-with(title, 'G')]"}
    cfg = Config({'DS': {'mappings': '/dev/null'}})
    df = read_source(rule, ['@id', 'title'], cfg).to_pandas() \
        .sort_values('@id').reset_index(drop=True)
    assert list(df['@id']) == ['b2', 'b3']
    assert list(df['title']) == ['Beta tools', 'Gamma']

    rule2 = {'source_type': 'XML', 'logical_source_value': str(p),
             'logical_source_type': None, 'iterator': '//shelf'}
    df2 = read_source(rule2, ["book[contains(title,'e')]@id"], cfg).to_pandas()
    ids = sorted(df2["book[contains(title,'e')]@id"])
    # 'e' appears in 'Beta tools' and 'Delta' only
    assert ids == ['b2', 'b4']
