"""Minimal RDF term model (no third-party RDF library in this environment).

IRI and BNode are ``str`` subclasses so they hash/compare as their lexical
value, which makes graph pattern matching against plain-string vocabulary
constants (morph_kgc_ray.constants) trivial.  Literal carries optional
language tag and datatype IRI and compares on all three.
"""

from __future__ import annotations


class IRI(str):
    __slots__ = ()

    def __repr__(self) -> str:  # pragma: no cover - debug only
        return f'<{str.__str__(self)}>'


class BNode(str):
    __slots__ = ()

    def __repr__(self) -> str:  # pragma: no cover - debug only
        return f'_:{str.__str__(self)}'


_bnode_counter = [0]


def new_bnode() -> BNode:
    _bnode_counter[0] += 1
    return BNode(f'gb{_bnode_counter[0]}')


class Literal:
    __slots__ = ('value', 'lang', 'datatype')

    def __init__(self, value: str, lang: str | None = None, datatype: str | None = None):
        self.value = str(value)
        self.lang = lang
        self.datatype = datatype

    def __eq__(self, other) -> bool:
        if isinstance(other, Literal):
            return (self.value, self.lang, self.datatype) == (other.value, other.lang, other.datatype)
        # allow comparing against a plain string constant (value-only literal)
        if isinstance(other, str) and not isinstance(other, (IRI, BNode)):
            return self.lang is None and self.datatype is None and self.value == other
        return NotImplemented

    def __hash__(self) -> int:
        return hash(self.value)

    def __str__(self) -> str:
        return self.value

    def __repr__(self) -> str:  # pragma: no cover - debug only
        if self.lang:
            return f'"{self.value}"@{self.lang}'
        if self.datatype:
            return f'"{self.value}"^^<{self.datatype}>'
        return f'"{self.value}"'


Term = IRI | BNode | Literal


def is_iri(t) -> bool:
    return isinstance(t, IRI)


def is_bnode(t) -> bool:
    return isinstance(t, BNode)


def is_literal(t) -> bool:
    return isinstance(t, Literal)
