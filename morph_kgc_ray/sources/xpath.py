"""Small XPath 1.0 evaluator over ``xml.etree.ElementTree`` nodes.

The reference evaluates references with elementpath (full XPath 3.0,
data_file.py:188-253); this container has only the stdlib, whose
``ElementTree.findall`` grammar stops at child steps, wildcards and simple
predicates.  This module implements the XPath 1.0 core the stdlib lacks —
axes, boolean/comparison operators, position()/last() and the common
string functions — written from the public W3C XPath 1.0 grammar:

* location paths: absolute/relative, ``//`` abbreviation, union ``|``
* axes: ``child`` ``descendant`` ``descendant-or-self`` ``self``
  ``parent`` ``ancestor`` ``ancestor-or-self`` ``attribute``
  ``following-sibling`` ``preceding-sibling``; ``@`` and ``..``
  abbreviations
* node tests: names (with namespace prefixes resolved against the
  document's prefix map), ``*``, ``text()``, ``node()``
* predicates: numeric position, ``last()``/``position()``, comparisons
  (= != < <= > >=) with XPath number/string coercion, ``and``/``or``
* functions: ``last position count text string number concat contains
  starts-with substring-after substring-before normalize-space
  string-length not true false name local-name``

Nodes are ET elements; a parent map is built per document so reverse axes
work.  Attribute results are returned as strings, text() as strings.
"""

from __future__ import annotations

import re

_TOKEN = re.compile(r"""
    \s*(?:
      (?P<number>\d+(?:\.\d*)?|\.\d+)
    | (?P<literal>"[^"]*"|'[^']*')
    | (?P<dslash>//)
    | (?P<op><=|>=|!=|[=<>|/\[\]\(\),@])
    | (?P<dotdot>\.\.)
    | (?P<dot>\.)
    | (?P<axis>[a-zA-Z][\w-]*::)
    | (?P<star>\*)
    | (?P<name>[a-zA-Z_][\w.-]*(?::[a-zA-Z_][\w.-]*)?)
    )""", re.VERBOSE)


def _tokenize(s: str) -> list:
    out = []
    i = 0
    while i < len(s):
        m = _TOKEN.match(s, i)
        if not m or m.end() == i:
            if s[i:].strip() == '':
                break
            raise ValueError(f'XPath: cannot tokenize at {s[i:]!r}')
        i = m.end()
        kind = m.lastgroup
        text = m.group(kind).strip()
        out.append((kind, text))
    out.append(('eof', ''))
    return out


class _Node:
    """Evaluation wrapper: an element, attribute value or text value."""

    __slots__ = ('elem', 'value', 'kind')

    def __init__(self, elem=None, value=None, kind='element'):
        self.elem = elem
        self.value = value
        self.kind = kind  # element | attribute | text

    def string(self):
        if self.kind == 'element':
            return ''.join(self.elem.itertext())
        return self.value if self.value is not None else ''


class XPath:
    """Compiled XPath expression; ``evaluate`` returns a list of _Node (for
    node-set results) or a python bool/float/str."""

    def __init__(self, expr: str):
        self.expr = expr
        self.toks = _tokenize(expr)
        self.pos = 0
        self.ast = self._parse_or()
        if self._peek()[0] != 'eof':
            raise ValueError(f'XPath: trailing input in {expr!r}')

    # ---- parser (recursive descent over the XPath 1.0 core grammar) ----
    def _peek(self):
        return self.toks[self.pos]

    def _next(self):
        t = self.toks[self.pos]
        self.pos += 1
        return t

    def _accept(self, text):
        if self.toks[self.pos][1] == text and self.toks[self.pos][0] in ('op', 'dslash'):
            self.pos += 1
            return True
        return False

    def _parse_or(self):
        left = self._parse_and()
        while self._peek() == ('name', 'or'):
            self._next()
            left = ('or', left, self._parse_and())
        return left

    def _parse_and(self):
        left = self._parse_cmp()
        while self._peek() == ('name', 'and'):
            self._next()
            left = ('and', left, self._parse_cmp())
        return left

    def _parse_cmp(self):
        left = self._parse_union()
        while self._peek()[0] == 'op' and self._peek()[1] in ('=', '!=', '<', '<=', '>', '>='):
            op = self._next()[1]
            left = ('cmp', op, left, self._parse_union())
        return left

    def _parse_union(self):
        left = self._parse_path()
        while self._accept('|'):
            left = ('union', left, self._parse_path())
        return left

    def _parse_path(self):
        kind, text = self._peek()
        if kind == 'number':
            self._next()
            return ('num', float(text))
        if kind == 'literal':
            self._next()
            return ('str', text[1:-1])
        if kind == 'op' and text == '(':
            self._next()
            inner = self._parse_or()
            if not self._accept(')'):
                raise ValueError('XPath: expected )')
            return self._parse_path_tail(inner)
        if kind == 'name' and self.toks[self.pos + 1] == ('op', '('):
            return self._parse_path_tail(self._parse_call())
        return self._parse_location()

    def _parse_call(self):
        name = self._next()[1]
        self._next()  # (
        args = []
        if self._peek() != ('op', ')'):
            args.append(self._parse_or())
            while self._accept(','):
                args.append(self._parse_or())
        if not self._accept(')'):
            raise ValueError('XPath: expected ) in call')
        return ('call', name, args)

    _DOS_STEP = ('descendant-or-self', ('node',), [])  # the '//' expansion

    def _parse_path_tail(self, base):
        steps = []
        while True:
            if self._accept('/'):
                steps.append(self._parse_step())
            elif self._accept('//'):
                # '//' == /descendant-or-self::node()/ — as its OWN step, so
                # a following predicate counts positions per parent
                # ('//book[1]' is the first book of EACH parent, not the
                # first of all books)
                steps.append(self._DOS_STEP)
                steps.append(self._parse_step())
            else:
                break
        return ('filterpath', base, steps) if steps else base

    def _parse_location(self):
        steps = []
        absolute = 0
        if self._accept('//'):
            absolute = 2
            steps.append(self._DOS_STEP)
            steps.append(self._parse_step())
        elif self._accept('/'):
            absolute = 1
            if self._peek()[0] in ('name', 'star', 'axis', 'dot', 'dotdot') or \
                    self._peek() == ('op', '@'):
                steps.append(self._parse_step())
        else:
            steps.append(self._parse_step())
        while True:
            if self._accept('//'):
                steps.append(self._DOS_STEP)
                steps.append(self._parse_step())
            elif self._accept('/'):
                steps.append(self._parse_step())
            else:
                break
        return ('path', absolute, steps)

    def _parse_step(self):
        kind, text = self._peek()
        axis = 'child'
        if kind == 'dot':
            self._next()
            return self._with_predicates(('self', ('node',)))
        if kind == 'dotdot':
            self._next()
            return self._with_predicates(('parent', ('node',)))
        if kind == 'op' and text == '@':
            self._next()
            axis = 'attribute'
        elif kind == 'axis':
            axis = self._next()[1][:-2]
        nt = self._parse_node_test()
        return self._with_predicates((axis, nt))

    def _parse_node_test(self):
        kind, text = self._peek()
        if kind == 'star':
            self._next()
            return ('*',)
        if kind == 'name':
            if self.toks[self.pos + 1] == ('op', '(') and text in ('text', 'node'):
                self._next()
                self._next()
                if not self._accept(')'):
                    raise ValueError('XPath: expected ) in node test')
                return (text,)
            self._next()
            return ('name', text)
        raise ValueError(f'XPath: expected node test, got {text!r}')

    def _with_predicates(self, step):
        preds = []
        while self._accept('['):
            preds.append(self._parse_or())
            if not self._accept(']'):
                raise ValueError('XPath: expected ]')
        return (step[0], step[1], preds)

    # ---- evaluation ----
    def evaluate(self, root, ns: 'dict | None' = None, parent_map: 'dict | None' = None):
        ctx = _Ctx(root, ns or {}, parent_map)
        return _eval(self.ast, ctx, [_Node(root)], 1, 1)


class _Ctx:
    def __init__(self, root, ns, parent_map):
        self.root = root
        self.ns = ns
        self.parent = parent_map if parent_map is not None else \
            {c: p for p in root.iter() for c in p}


def _qname(elem_tag: str) -> str:
    return elem_tag


def _test_matches(nt, elem, ns) -> bool:
    if nt[0] == '*':
        return True
    if nt[0] == 'node':
        return True
    if nt[0] == 'name':
        name = nt[1]
        if ':' in name:
            pfx, local = name.split(':', 1)
            return elem.tag == f'{{{ns.get(pfx, pfx)}}}{local}'
        if elem.tag == name:
            return True
        # default-namespace documents: match the local part
        return isinstance(elem.tag, str) and elem.tag.endswith('}' + name) and \
            '}' in elem.tag and elem.tag.startswith('{') and ns.get('', '') != '' and \
            elem.tag == f"{{{ns.get('', '')}}}{name}"
    return False


def _axis_nodes(axis, nt, node: _Node, ctx: _Ctx):
    if node.kind != 'element':
        return []
    e = node.elem
    out = []
    if axis == 'child':
        if nt[0] == 'text':
            return [_Node(value=e.text, kind='text')] if e.text is not None else []
        out = [c for c in e if _test_matches(nt, c, ctx.ns)]
    elif axis == 'descendant':
        if nt[0] == 'text':
            return [_Node(value=t, kind='text')
                    for d in e.iter() for t in ([d.text] if d.text is not None else [])]
        out = [d for d in e.iter() if d is not e and _test_matches(nt, d, ctx.ns)]
    elif axis == 'descendant-or-self':
        out = [d for d in e.iter() if _test_matches(nt, d, ctx.ns)]
    elif axis == 'self':
        if nt[0] in ('node', '*') or _test_matches(nt, e, ctx.ns):
            return [node]
        return []
    elif axis == 'parent':
        p = ctx.parent.get(e)
        out = [p] if p is not None and _test_matches(nt, p, ctx.ns) else []
    elif axis in ('ancestor', 'ancestor-or-self'):
        cur = e if axis == 'ancestor-or-self' else ctx.parent.get(e)
        while cur is not None:
            if _test_matches(nt, cur, ctx.ns):
                out.append(cur)
            cur = ctx.parent.get(cur)
    elif axis in ('following-sibling', 'preceding-sibling'):
        p = ctx.parent.get(e)
        if p is None:
            return []
        sibs = list(p)
        i = sibs.index(e)
        pick = sibs[i + 1:] if axis == 'following-sibling' else sibs[:i][::-1]
        out = [s for s in pick if _test_matches(nt, s, ctx.ns)]
    elif axis == 'attribute':
        if nt[0] == '*':
            return [_Node(value=v, kind='attribute') for v in e.attrib.values()]
        if nt[0] == 'name':
            name = nt[1]
            if ':' in name:
                pfx, local = name.split(':', 1)
                name = f'{{{ctx.ns.get(pfx, pfx)}}}{local}'
            if name in e.attrib:
                return [_Node(value=e.attrib[name], kind='attribute')]
        return []
    else:
        raise ValueError(f'XPath: unsupported axis {axis!r}')
    return [_Node(x) for x in out]


def _to_number(v) -> float:
    if isinstance(v, bool):
        return 1.0 if v else 0.0
    if isinstance(v, float):
        return v
    if isinstance(v, str):
        try:
            return float(v.strip())
        except ValueError:
            return float('nan')
    if isinstance(v, list):
        return _to_number(_to_string(v))
    return float('nan')


def _to_string(v) -> str:
    if isinstance(v, bool):
        return 'true' if v else 'false'
    if isinstance(v, float):
        return str(int(v)) if v == int(v) else str(v)
    if isinstance(v, str):
        return v
    if isinstance(v, list):
        return v[0].string() if v else ''
    return ''


def _to_bool(v) -> bool:
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        return v == v and v != 0.0
    if isinstance(v, str):
        return len(v) > 0
    if isinstance(v, list):
        return len(v) > 0
    return False


def _compare(op, a, b) -> bool:
    # node-set comparisons: true if ANY pair satisfies (XPath 1.0 3.4)
    if isinstance(a, list) or isinstance(b, list):
        av = [n.string() for n in a] if isinstance(a, list) else [a]
        bv = [n.string() for n in b] if isinstance(b, list) else [b]
        return any(_compare(op, x, y) for x in av for y in bv)
    if op in ('=', '!='):
        if isinstance(a, bool) or isinstance(b, bool):
            r = _to_bool(a) == _to_bool(b)
        elif isinstance(a, float) or isinstance(b, float):
            r = _to_number(a) == _to_number(b)
        else:
            r = _to_string(a) == _to_string(b)
        return r if op == '=' else not r
    x, y = _to_number(a), _to_number(b)
    return {'<': x < y, '<=': x <= y, '>': x > y, '>=': x >= y}[op]


def _eval(ast, ctx: _Ctx, nodes, pos, size):
    kind = ast[0]
    if kind == 'num':
        return ast[1]
    if kind == 'str':
        return ast[1]
    if kind == 'or':
        return _to_bool(_eval(ast[1], ctx, nodes, pos, size)) or \
            _to_bool(_eval(ast[2], ctx, nodes, pos, size))
    if kind == 'and':
        return _to_bool(_eval(ast[1], ctx, nodes, pos, size)) and \
            _to_bool(_eval(ast[2], ctx, nodes, pos, size))
    if kind == 'cmp':
        return _compare(ast[1], _eval(ast[2], ctx, nodes, pos, size),
                        _eval(ast[3], ctx, nodes, pos, size))
    if kind == 'union':
        a = _eval(ast[1], ctx, nodes, pos, size)
        b = _eval(ast[2], ctx, nodes, pos, size)
        seen = set()
        out = []
        for n in list(a) + list(b):
            key = id(n.elem) if n.kind == 'element' else (n.kind, n.value)
            if key not in seen:
                seen.add(key)
                out.append(n)
        return out
    if kind == 'call':
        return _call(ast[1], ast[2], ctx, nodes, pos, size)
    if kind == 'filterpath':
        base = _eval(ast[1], ctx, nodes, pos, size)
        if not isinstance(base, list):
            raise ValueError('XPath: path applied to a non-node-set')
        return _walk(ast[2], ctx, base)
    if kind == 'path':
        absolute, steps = ast[1], ast[2]
        start = [_Node(ctx.root)] if absolute else list(nodes)
        if absolute == 2:  # '//' from the document root
            pass  # the first step already carries the descendant axis
        return _walk(steps, ctx, start)
    raise ValueError(f'XPath: bad AST node {kind!r}')


def _walk(steps, ctx: _Ctx, start):
    current = start
    for axis, nt, preds in steps:
        nxt = []
        for node in current:
            # predicates filter PER CONTEXT NODE ('shelf/book[1]' is the
            # first book of EACH shelf); position counts in axis order,
            # which _axis_nodes emits in proximity order for reverse axes
            cand = _axis_nodes(axis, nt, node, ctx)
            for p in preds:
                kept = []
                sz = len(cand)
                for i, n in enumerate(cand, start=1):
                    v = _eval(p, ctx, [n], i, sz)
                    ok = (i == int(v)) if isinstance(v, float) else _to_bool(v)
                    if ok:
                        kept.append(n)
                cand = kept
            nxt.extend(cand)
        # dedup elements reached via multiple paths
        seen = set()
        current = []
        for n in nxt:
            key = id(n.elem) if n.kind == 'element' else id(n)
            if key not in seen:
                seen.add(key)
                current.append(n)
    return current


def _call(name, args, ctx: _Ctx, nodes, pos, size):
    def arg(i, default=None):
        if i < len(args):
            return _eval(args[i], ctx, nodes, pos, size)
        return default

    if name == 'last':
        return float(size)
    if name == 'position':
        return float(pos)
    if name == 'count':
        return float(len(arg(0)))
    if name == 'text':
        n = nodes[0]
        if n.kind == 'element' and n.elem.text is not None:
            return [_Node(value=n.elem.text, kind='text')]
        return []
    if name == 'string':
        v = arg(0, nodes)
        return _to_string(v)
    if name == 'number':
        return _to_number(arg(0, _to_string(nodes)))
    if name == 'concat':
        return ''.join(_to_string(arg(i)) for i in range(len(args)))
    if name == 'contains':
        return _to_string(arg(0)) .find(_to_string(arg(1))) >= 0
    if name == 'starts-with':
        return _to_string(arg(0)).startswith(_to_string(arg(1)))
    if name == 'substring-before':
        s, sub = _to_string(arg(0)), _to_string(arg(1))
        return s.split(sub, 1)[0] if sub in s else ''
    if name == 'substring-after':
        s, sub = _to_string(arg(0)), _to_string(arg(1))
        return s.split(sub, 1)[1] if sub in s else ''
    if name == 'normalize-space':
        return ' '.join(_to_string(arg(0, nodes)).split())
    if name == 'string-length':
        return float(len(_to_string(arg(0, nodes))))
    if name == 'not':
        return not _to_bool(arg(0))
    if name == 'true':
        return True
    if name == 'false':
        return False
    if name in ('name', 'local-name'):
        target = arg(0, nodes)
        if not isinstance(target, list) or not target or target[0].kind != 'element':
            return ''
        tag = target[0].elem.tag
        if name == 'local-name' and '}' in tag:
            return tag.split('}', 1)[1]
        return tag
    raise ValueError(f'XPath: unsupported function {name}()')


def select(root, expr: str, ns: 'dict | None' = None,
           parent_map: 'dict | None' = None) -> list:
    """Node-set query: element nodes come back as ET elements, attribute
    and text results as strings."""
    res = XPath(expr).evaluate(root, ns=ns, parent_map=parent_map)
    if not isinstance(res, list):
        return [res]
    return [n.elem if n.kind == 'element' else n.value for n in res]
