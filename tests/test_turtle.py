import glob

from morph_kgc_ray.rdf import Graph, IRI, Literal, parse_turtle
from morph_kgc_ray.rdf.turtle import TurtleParser


def test_parses_entire_reference_mapping_corpus():
    files = glob.glob('/root/reference/test/**/mapping*.ttl', recursive=True)
    assert len(files) > 300
    for f in files:
        triples = parse_turtle(open(f, encoding='utf-8').read())
        assert triples, f


def test_base_and_relative_iris():
    ts = parse_turtle('@base <http://b.example/> . <s> <p> <o> .')
    (s, p, o), = ts
    assert s == 'http://b.example/s' and o == 'http://b.example/o'


def test_literals_lang_datatype_numbers():
    doc = '''
    @prefix ex: <http://ex/> .
    ex:s ex:p "hi"@en , "x"^^ex:dt , 42 , 4.5 , true ;
         ex:q """multi
line""" .
    '''
    ts = parse_turtle(doc)
    objs = {repr(o) for _, p, o in ts if str(p) == 'http://ex/p'}
    assert '"hi"@en' in objs
    assert '"x"^^<http://ex/dt>' in objs
    multi = [o for _, p, o in ts if str(p) == 'http://ex/q'][0]
    assert multi.value == 'multi\nline'


def test_collections_become_rdf_lists():
    doc = '@prefix ex: <http://ex/> . ex:s ex:p ( "a" "b" ) .'
    g = Graph(parse_turtle(doc))
    head = g.value(IRI('http://ex/s'), 'http://ex/p')
    items = g.rdf_list_items(head)
    assert [i.value for i in items] == ['a', 'b']


def test_escaped_template_braces_survive():
    ts = parse_turtle(r'@prefix ex: <http://ex/> . ex:s ex:p "a\\{b" .')
    (_, _, o), = ts
    assert o.value == 'a\\{b'


def test_parser_records_document_base():
    tp = TurtleParser('@base <http://doc.example/base/> . <s> <p> <o> .')
    tp.parse()
    assert tp.base == 'http://doc.example/base/'
