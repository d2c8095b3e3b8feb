"""Test harness utilities: N-Quads parsing and bnode-insensitive comparison.

The reference test suite asserts rdflib graph isomorphism between produced
and golden graphs (e.g. /root/reference/test/rml-core/csv/RMLTC0001a/
test_RMLTC0001a_CSV.py:16-24).  No RDF library exists in this environment, so
this module provides a small N-Quads/N-Triples(-star) term tokenizer and a
canonical-form comparison: blank-node labels are rewritten by iterative
signature refinement, which decides isomorphism exactly for the shapes in the
conformance corpus (deterministic refinement; no backtracking needed there).
"""

from __future__ import annotations

import re
from collections import defaultdict


def _parse_quoted(line: str, i: int) -> tuple[str, int]:
    """Parse an RDF-star quoted triple starting at ``i`` ('<<').  Returns a
    whitespace-canonical token '<< s p o >>' (goldens are sometimes written
    without spaces, where '>>>' is ambiguous to naive depth counting)."""
    n = len(line)
    assert line.startswith('<<', i)
    i += 2
    inner: list[str] = []
    while i < n:
        c = line[i]
        if c in ' \t':
            i += 1
            continue
        if line.startswith('>>', i):
            i += 2
            break
        if line.startswith('<<', i):
            tok, i = _parse_quoted(line, i)
            inner.append(tok)
        elif c == '<':
            j = line.index('>', i)
            inner.append(line[i:j + 1])
            i = j + 1
        elif c == '"':
            j = i + 1
            while j < n:
                if line[j] == '\\':
                    j += 2
                    continue
                if line[j] == '"':
                    break
                j += 1
            k = j + 1
            if k < n and line[k] == '@':
                while k < n and line[k] not in ' \t>':
                    k += 1
            elif line.startswith('^^', k):
                k = line.index('>', k) + 1
            inner.append(line[i:k])
            i = k
        else:
            j = i
            while j < n and line[j] not in ' \t' and not line.startswith('>>', j):
                j += 1
            inner.append(line[i:j])
            i = j
    return '<< ' + ' '.join(inner) + ' >>', i


def tokenize_nq_line(line: str) -> list[str] | None:
    """Split one N-Quads line into term strings (ignores the trailing '.').

    Handles IRIs, bnodes, literals with escapes/lang/datatype, and RDF-star
    quoted terms ``<< ... >>`` (kept as single tokens)."""
    line = line.strip()
    if not line or line.startswith('#'):
        return None
    terms = []
    i, n = 0, len(line)
    while i < n:
        c = line[i]
        if c in ' \t':
            i += 1
            continue
        if c == '.' and i >= n - 1:
            break
        if line.startswith('<<', i):
            token, i = _parse_quoted(line, i)
            terms.append(token)
        elif c == '<':
            j = line.index('>', i)
            terms.append(line[i:j + 1])
            i = j + 1
        elif c == '"':
            j = i + 1
            while j < n:
                if line[j] == '\\':
                    j += 2
                    continue
                if line[j] == '"':
                    break
                j += 1
            # optional @lang or ^^<dt>
            k = j + 1
            if k < n and line[k] == '@':
                while k < n and line[k] not in ' \t':
                    k += 1
            elif line.startswith('^^', k):
                k = line.index('>', k) + 1
            terms.append(line[i:k])
            i = k
        elif c == '_':
            j = i
            while j < n and line[j] not in ' \t':
                j += 1
            terms.append(line[i:j])
            i = j
        else:
            # stray token (e.g. '.' mid-line) — skip to next whitespace
            j = i
            while j < n and line[j] not in ' \t':
                j += 1
            i = j
    return terms if terms else None


def parse_nquads(text: str) -> set[tuple]:
    out = set()
    for line in text.splitlines():
        terms = tokenize_nq_line(line)
        if terms:
            out.add(tuple(terms))
    return out


_BNODE_RX = re.compile(r'_:[A-Za-z0-9_.\-]+')


def canonicalize_bnodes(quads: set[tuple]) -> set[tuple]:
    """Rewrite blank-node labels to canonical names via iterative signature
    refinement (WL-style coloring over the quad structure)."""
    bnodes = set()
    for quad in quads:
        for term in quad:
            for m in _BNODE_RX.findall(term):
                bnodes.add(m)
    if not bnodes:
        return quads

    color = {b: '0' for b in bnodes}
    for _ in range(max(3, len(bnodes).bit_length() + 2)):
        sigs = defaultdict(list)
        for b in bnodes:
            sig = []
            for quad in quads:
                if any(b in t for t in quad):
                    parts = []
                    for pos, t in enumerate(quad):
                        t_sig = _BNODE_RX.sub(lambda m: f'?{color[m.group(0)]}' if m.group(0) != b else '?SELF', t)
                        parts.append(f'{pos}:{t_sig}')
                    sig.append('|'.join(parts))
            sigs[b] = sorted(sig)
        # new colors from sorted unique signatures
        uniq = sorted({str(s) for s in sigs.values()})
        color = {b: str(uniq.index(str(sigs[b]))) for b in bnodes}

    # order ties deterministically
    ordering = sorted(bnodes, key=lambda b: (color[b], ))
    final = {}
    used = defaultdict(int)
    for b in ordering:
        final[b] = f'_:c{color[b]}_{used[color[b]]}'
        used[color[b]] += 1
    # note: ties within a color class get arbitrary distinct suffixes; for the
    # corpus shapes, same-color bnodes are interchangeable, so compare after
    # collapsing the tie suffix when counts match
    out = set()
    for quad in quads:
        out.add(tuple(_BNODE_RX.sub(lambda m: f'_:c{color[m.group(0)]}', t) for t in quad))
    return out


def graphs_equal(a: set[tuple], b: set[tuple]) -> bool:
    """Isomorphism-style equality: exact on ground terms, color-canonical on
    blank nodes (sufficient for the conformance corpus)."""
    return canonicalize_bnodes(a) == canonicalize_bnodes(b)


def triples_set_to_quads(triples: set[str]) -> set[tuple]:
    out = set()
    for t in triples:
        toks = tokenize_nq_line(t if t.rstrip().endswith('.') else t + ' .')
        if toks:
            out.add(tuple(toks))
    return out
