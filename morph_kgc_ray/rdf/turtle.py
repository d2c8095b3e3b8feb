"""A from-scratch W3C Turtle 1.1 parser (subset sufficient for RML mappings).

The execution environment has no RDF library, so mapping documents
(R2RML/RML Turtle) are parsed with this recursive-descent parser.  Supports:
prefixes (@prefix / PREFIX), @base / BASE, IRIs with numeric escapes,
prefixed names with local escapes, blank node labels and property lists,
collections, the 'a' keyword, string literals (all four quote forms) with
escapes, language tags, datatyped literals, numeric and boolean shorthand,
comments, and predicate/object lists.  This covers the grammar used across
the reference conformance corpus (/root/reference/test/**/mapping.ttl).
"""

from __future__ import annotations

import re
from urllib.parse import urljoin

from ..constants import RDF_FIRST, RDF_NIL, RDF_REST, RDF_TYPE, XSD_NAMESPACE
from .terms import BNode, IRI, Literal, new_bnode

_IRIREF = re.compile(r'<([^<>"{}|^`\\\x00-\x20]*)>')
_PNAME = re.compile(r'((?:[^\s:()\[\];,"\'<>#]|\\.)*):((?:[^\s()\[\];,"#]|\\.)*)')
_BLANK = re.compile(r'_:([A-Za-z0-9_][A-Za-z0-9_.-]*)')
_NUMBER = re.compile(r'[+-]?(?:\d+\.\d*(?:[eE][+-]?\d+)?|\.?\d+(?:[eE][+-]?\d+)?)')
_LANGTAG = re.compile(r'@([a-zA-Z]+(?:-[a-zA-Z0-9]+)*)')
_STRING_ESCAPES = {
    't': '\t', 'b': '\b', 'n': '\n', 'r': '\r', 'f': '\f',
    '"': '"', "'": "'", '\\': '\\',
}


class TurtleParseError(ValueError):
    pass


def _unescape_string(s: str) -> str:
    if '\\' not in s:
        return s
    out = []
    i = 0
    n = len(s)
    while i < n:
        c = s[i]
        if c == '\\' and i + 1 < n:
            e = s[i + 1]
            if e in _STRING_ESCAPES:
                out.append(_STRING_ESCAPES[e])
                i += 2
                continue
            if e == 'u':
                out.append(chr(int(s[i + 2:i + 6], 16)))
                i += 6
                continue
            if e == 'U':
                out.append(chr(int(s[i + 2:i + 10], 16)))
                i += 10
                continue
            raise TurtleParseError(f'bad string escape \\{e}')
        out.append(c)
        i += 1
    return ''.join(out)


def _unescape_local(s: str) -> str:
    # PN_LOCAL_ESC: backslash before one of _~.-!$&'()*+,;=/?#@%
    return re.sub(r"\\([_~.\-!$&'()*+,;=/?#@%])", r'\1', s)


class TurtleParser:
    def __init__(self, text: str, base: str = ''):
        self.text = text
        self.pos = 0
        self.n = len(text)
        self.base = base
        self.prefixes: dict[str, str] = {}
        self.triples: list[tuple] = []
        self.bnode_labels: dict[str, BNode] = {}

    # ---- low-level helpers -------------------------------------------------
    def _skip_ws(self) -> None:
        while self.pos < self.n:
            c = self.text[self.pos]
            if c in ' \t\r\n':
                self.pos += 1
            elif c == '#':
                nl = self.text.find('\n', self.pos)
                self.pos = self.n if nl == -1 else nl + 1
            else:
                return

    def _peek(self) -> str:
        return self.text[self.pos] if self.pos < self.n else ''

    def _startswith(self, s: str) -> bool:
        return self.text.startswith(s, self.pos)

    def _expect(self, s: str) -> None:
        if not self._startswith(s):
            ctx = self.text[self.pos:self.pos + 40]
            raise TurtleParseError(f'expected {s!r} at offset {self.pos}: {ctx!r}')
        self.pos += len(s)

    def _match(self, rx: re.Pattern):
        return rx.match(self.text, self.pos)

    # ---- document ----------------------------------------------------------
    def parse(self) -> list[tuple]:
        self._skip_ws()
        while self.pos < self.n:
            if self._startswith('@prefix'):
                self.pos += len('@prefix')
                self._directive_prefix(sparql_style=False)
            elif self._startswith('@base'):
                self.pos += len('@base')
                self._directive_base(sparql_style=False)
            elif self.text[self.pos:self.pos + 6].upper() == 'PREFIX' and not self._match(_PNAME):
                self.pos += 6
                self._directive_prefix(sparql_style=True)
            elif self.text[self.pos:self.pos + 4].upper() == 'BASE' and not self._match(_PNAME):
                self.pos += 4
                self._directive_base(sparql_style=True)
            else:
                self._triples_block()
            self._skip_ws()
        return self.triples

    def _directive_prefix(self, sparql_style: bool) -> None:
        self._skip_ws()
        m = self._match(re.compile(r'([^\s:<>]*):'))
        if not m:
            raise TurtleParseError(f'bad @prefix at offset {self.pos}')
        pfx = m.group(1)
        self.pos = m.end()
        self._skip_ws()
        m = self._match(_IRIREF)
        if not m:
            raise TurtleParseError(f'bad @prefix IRI at offset {self.pos}')
        self.prefixes[pfx] = urljoin(self.base, _unescape_string(m.group(1))) if self.base else _unescape_string(m.group(1))
        self.pos = m.end()
        self._skip_ws()
        if not sparql_style:
            self._expect('.')

    def _directive_base(self, sparql_style: bool) -> None:
        self._skip_ws()
        m = self._match(_IRIREF)
        if not m:
            raise TurtleParseError(f'bad @base IRI at offset {self.pos}')
        self.base = urljoin(self.base, _unescape_string(m.group(1))) if self.base else _unescape_string(m.group(1))
        self.pos = m.end()
        self._skip_ws()
        if not sparql_style:
            self._expect('.')

    # ---- triples -----------------------------------------------------------
    def _triples_block(self) -> None:
        subject = self._subject()
        self._skip_ws()
        # subject may be a bare blank-node property list followed directly by '.'
        if self._peek() == '.':
            self.pos += 1
            return
        self._predicate_object_list(subject)
        self._skip_ws()
        self._expect('.')

    def _predicate_object_list(self, subject) -> None:
        while True:
            self._skip_ws()
            predicate = self._verb()
            self._object_list(subject, predicate)
            self._skip_ws()
            progressed = False
            while self._peek() == ';':
                self.pos += 1
                self._skip_ws()
                progressed = True
            if not progressed:
                return
            # after ';' there may be the end of the statement
            if self._peek() in ('.', ']', ''):
                return

    def _object_list(self, subject, predicate) -> None:
        while True:
            self._skip_ws()
            obj = self._object()
            self.triples.append((subject, predicate, obj))
            self._skip_ws()
            if self._peek() == ',':
                self.pos += 1
                continue
            return

    def _verb(self):
        if self._peek() == 'a':
            nxt = self.text[self.pos + 1:self.pos + 2]
            if nxt == '' or nxt in ' \t\r\n<[#':
                self.pos += 1
                return IRI(RDF_TYPE)
        term = self._iri_term()
        if term is None:
            ctx = self.text[self.pos:self.pos + 40]
            raise TurtleParseError(f'expected predicate at offset {self.pos}: {ctx!r}')
        return term

    def _subject(self):
        self._skip_ws()
        c = self._peek()
        if c == '[':
            return self._bnode_property_list()
        if c == '(':
            return self._collection()
        if self._startswith('_:'):
            return self._bnode_label()
        term = self._iri_term()
        if term is None:
            ctx = self.text[self.pos:self.pos + 40]
            raise TurtleParseError(f'expected subject at offset {self.pos}: {ctx!r}')
        return term

    def _object(self):
        c = self._peek()
        if c == '[':
            return self._bnode_property_list()
        if c == '(':
            return self._collection()
        if self._startswith('_:'):
            return self._bnode_label()
        if c in '"\'':
            return self._literal()
        if c.isdigit() or c in '+-' or (c == '.' and self.text[self.pos + 1:self.pos + 2].isdigit()):
            return self._numeric_literal()
        if self._startswith('true') and not self._is_name_char(self.pos + 4):
            self.pos += 4
            return Literal('true', datatype=f'{XSD_NAMESPACE}boolean')
        if self._startswith('false') and not self._is_name_char(self.pos + 5):
            self.pos += 5
            return Literal('false', datatype=f'{XSD_NAMESPACE}boolean')
        term = self._iri_term()
        if term is None:
            ctx = self.text[self.pos:self.pos + 40]
            raise TurtleParseError(f'expected object at offset {self.pos}: {ctx!r}')
        return term

    def _is_name_char(self, idx: int) -> bool:
        c = self.text[idx:idx + 1]
        return bool(c) and (c.isalnum() or c in '_-')

    # ---- terms -------------------------------------------------------------
    def _iri_term(self):
        m = self._match(_IRIREF)
        if m:
            self.pos = m.end()
            raw = _unescape_string(m.group(1))
            return IRI(urljoin(self.base, raw) if self.base else raw)
        m = self._match(_PNAME)
        if m and (m.group(1) in self.prefixes):
            self.pos = m.end()
            local = _unescape_local(m.group(2))
            # trailing '.' belongs to the statement terminator, not the name
            while local.endswith('.'):
                local = local[:-1]
                self.pos -= 1
            return IRI(self.prefixes[m.group(1)] + local)
        return None

    def _bnode_label(self) -> BNode:
        m = self._match(_BLANK)
        if not m:
            raise TurtleParseError(f'bad blank node at offset {self.pos}')
        label = m.group(1)
        # trailing '.' is the statement terminator
        while label.endswith('.'):
            label = label[:-1]
            m_end = m.start(1) + len(label)
            self.pos = m_end
            break
        else:
            self.pos = m.end()
        if label not in self.bnode_labels:
            self.bnode_labels[label] = BNode(f'b_{label}')
        return self.bnode_labels[label]

    def _bnode_property_list(self) -> BNode:
        self._expect('[')
        node = new_bnode()
        self._skip_ws()
        if self._peek() == ']':
            self.pos += 1
            return node
        self._predicate_object_list(node)
        self._skip_ws()
        self._expect(']')
        return node

    def _collection(self):
        self._expect('(')
        self._skip_ws()
        items = []
        while self._peek() != ')':
            items.append(self._object())
            self._skip_ws()
        self.pos += 1  # ')'
        if not items:
            return IRI(RDF_NIL)
        head = new_bnode()
        cur = head
        for i, item in enumerate(items):
            self.triples.append((cur, IRI(RDF_FIRST), item))
            if i == len(items) - 1:
                self.triples.append((cur, IRI(RDF_REST), IRI(RDF_NIL)))
            else:
                nxt = new_bnode()
                self.triples.append((cur, IRI(RDF_REST), nxt))
                cur = nxt
        return head

    def _literal(self):
        c = self._peek()
        quote3 = self.text[self.pos:self.pos + 3]
        if quote3 in ('"""', "'''"):
            end = self.text.find(quote3, self.pos + 3)
            while end != -1 and self.text[end - 1] == '\\':
                # escaped closing quote inside long string
                bs = 0
                j = end - 1
                while j >= 0 and self.text[j] == '\\':
                    bs += 1
                    j -= 1
                if bs % 2 == 0:
                    break
                end = self.text.find(quote3, end + 1)
            if end == -1:
                raise TurtleParseError('unterminated long string')
            raw = self.text[self.pos + 3:end]
            self.pos = end + 3
        else:
            # short string: scan for unescaped closing quote
            i = self.pos + 1
            while i < self.n:
                ch = self.text[i]
                if ch == '\\':
                    i += 2
                    continue
                if ch == c:
                    break
                if ch == '\n':
                    raise TurtleParseError('newline in short string')
                i += 1
            if i >= self.n:
                raise TurtleParseError('unterminated string')
            raw = self.text[self.pos + 1:i]
            self.pos = i + 1
        value = _unescape_string(raw)
        # suffix: lang tag or datatype
        if self._peek() == '@':
            m = self._match(_LANGTAG)
            if m:
                self.pos = m.end()
                return Literal(value, lang=m.group(1))
        if self._startswith('^^'):
            self.pos += 2
            dt = self._iri_term()
            if dt is None:
                raise TurtleParseError(f'bad datatype IRI at offset {self.pos}')
            return Literal(value, datatype=str(dt))
        return Literal(value)

    def _numeric_literal(self):
        m = self._match(_NUMBER)
        if not m:
            raise TurtleParseError(f'bad number at offset {self.pos}')
        lex = m.group(0)
        self.pos = m.end()
        # a trailing '.' not followed by a digit is the statement terminator
        if lex.endswith('.'):
            lex = lex[:-1]
            self.pos -= 1
        if 'e' in lex or 'E' in lex:
            dt = f'{XSD_NAMESPACE}double'
        elif '.' in lex:
            dt = f'{XSD_NAMESPACE}decimal'
        else:
            dt = f'{XSD_NAMESPACE}integer'
        return Literal(lex, datatype=dt)


def parse_turtle(text: str, base: str = '') -> list[tuple]:
    """Parse a Turtle document into a list of (s, p, o) term triples."""
    return TurtleParser(text, base=base).parse()
