from .graph import Graph
from .terms import BNode, IRI, Literal, is_bnode, is_iri, is_literal, new_bnode
from .turtle import TurtleParseError, parse_turtle

__all__ = [
    'Graph', 'BNode', 'IRI', 'Literal', 'new_bnode',
    'is_bnode', 'is_iri', 'is_literal', 'parse_turtle', 'TurtleParseError',
]
