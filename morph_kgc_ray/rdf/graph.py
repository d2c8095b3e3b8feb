"""A small in-memory triple store used at plan time for mapping documents.

Only the mapping graph (metadata scale: hundreds of triples) lives here; data
never does.  Provides the pattern-matching / rewrite helpers the mapping
normalization passes need (the reference performs these with rdflib + SPARQL;
see /root/reference/src/morph_kgc/mapping/mapping_parser.py).
"""

from __future__ import annotations

from collections import defaultdict

from ..constants import RDF_FIRST, RDF_NIL, RDF_REST
from .terms import Term


class Graph:
    def __init__(self, triples=()):
        self._triples: set[tuple] = set()
        self._by_p: dict = defaultdict(set)
        self._by_s: dict = defaultdict(set)
        for t in triples:
            self.add(t)

    def __len__(self) -> int:
        return len(self._triples)

    def __iter__(self):
        return iter(self._triples)

    def add(self, triple: tuple) -> None:
        if triple not in self._triples:
            self._triples.add(triple)
            self._by_p[triple[1]].add(triple)
            self._by_s[triple[0]].add(triple)

    def discard(self, triple: tuple) -> None:
        if triple in self._triples:
            self._triples.discard(triple)
            self._by_p[triple[1]].discard(triple)
            self._by_s[triple[0]].discard(triple)

    def triples(self, pattern=(None, None, None)):
        s, p, o = pattern
        if p is not None and s is None:
            candidates = self._by_p.get(p, ())
        elif s is not None:
            candidates = self._by_s.get(s, ())
        else:
            candidates = self._triples
        for t in tuple(candidates):
            if (s is None or t[0] == s) and (p is None or t[1] == p) and (o is None or t[2] == o):
                yield t

    def remove(self, pattern=(None, None, None)) -> None:
        for t in list(self.triples(pattern)):
            self.discard(t)

    def subjects(self, p=None, o=None):
        seen = set()
        for s, _, _ in self.triples((None, p, o)):
            if s not in seen:
                seen.add(s)
                yield s

    def objects(self, s=None, p=None):
        for _, _, o in self.triples((s, p, None)):
            yield o

    def value(self, s=None, p=None):
        for o in self.objects(s, p):
            return o
        return None

    def replace_predicate(self, old_p, new_p) -> None:
        for s, p, o in list(self.triples((None, old_p, None))):
            self.discard((s, p, o))
            self.add((s, new_p, o))

    def replace_object(self, old_o, new_o) -> None:
        for s, p, o in list(self.triples((None, None, old_o))):
            self.discard((s, p, o))
            self.add((s, p, new_o))

    def rdf_list_items(self, head) -> list:
        """Walk an rdf:first/rdf:rest chain from ``head`` and return items."""
        items = []
        seen = set()
        cur = head
        while cur is not None and cur != RDF_NIL and cur not in seen:
            seen.add(cur)
            first = self.value(cur, RDF_FIRST)
            if first is not None:
                items.append(first)
            cur = self.value(cur, RDF_REST)
        return items
