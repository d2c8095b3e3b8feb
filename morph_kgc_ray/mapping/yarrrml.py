"""YARRRML -> RML Turtle translation.

The reference ships a 589-LoC YARRRML loader
(/root/reference/src/morph_kgc/mapping/yarrrml.py); this module covers the
published YARRRML surface used in practice: prefixes, a named ``sources:``
section or inline sources (``path~format`` + iterator), ``s``/``subjects``,
``po``/``predicateobjects`` in both the compact-list and mapping forms,
the ``a`` keyword, ``$(ref)`` templates, object modifiers (``~iri``,
``~lang`` / trailing language entry), datatypes, and ``mapping:`` +
``condition: equal`` referencing-object joins.

The translation emits standard RML Turtle, which then flows through the
normal parser — keeping one mapping front-end.
"""

from __future__ import annotations

import yaml

_FORMATS = {'csv': 'rml:CSV', 'jsonpath': 'rml:JSONPath', 'xpath': 'rml:XPath',
            'parquet': 'rml:Parquet', 'tsv': 'rml:TSV'}


def _esc(s: str) -> str:
    return str(s).replace('\\', '\\\\').replace('"', '\\"')


def _tmpl(value: str) -> str:
    """$(ref) -> {ref}"""
    out, i, n = [], 0, len(value)
    while i < n:
        if value.startswith('$(', i):
            j = value.index(')', i)
            out.append('{' + value[i + 2:j] + '}')
            i = j + 1
        else:
            out.append(value[i])
            i += 1
    return ''.join(out)


def _expand_iri(value: str, prefixes: dict) -> str:
    value = value.strip()
    if value == 'a':
        return '<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>'
    if value.startswith(('http://', 'https://', 'urn:')):
        return f'<{value}>'
    if ':' in value:
        pfx, local = value.split(':', 1)
        if pfx in prefixes:
            return f'<{prefixes[pfx]}{_tmpl(local)}>'
    return f'<{value}>'


def _term_map(value: str, prefixes: dict, as_iri: bool = False) -> str:
    """Render an object/predicate term map body from a YARRRML value."""
    value = str(value)
    if '$(' in value:
        tmpl = _tmpl(value)
        if tmpl.startswith('{') and tmpl.endswith('}') and tmpl.count('{') == 1:
            body = f'rml:reference "{_esc(tmpl[1:-1])}"'
            if as_iri:
                body += ' ; rml:termType rml:IRI'
            return body
        # prefixed template like ex:$(x)ID
        if ':' in value.split('$(')[0] and not value.startswith(('http://', 'https://')):
            pfx, local = value.split(':', 1)
            if pfx in prefixes:
                tmpl = prefixes[pfx] + _tmpl(local)
        return f'rml:template "{_esc(tmpl)}"'
    # constant
    if as_iri or value.startswith(('http://', 'https://')) or (':' in value and value.split(':', 1)[0] in prefixes):
        return f'rml:constant {_expand_iri(value, prefixes)}'
    return f'rml:constant "{_esc(value)}"'


def _norm_source(entry, sources_section: dict):
    """Resolve an inline or named source to (path, format, iterator)."""
    if isinstance(entry, str) and entry in sources_section:
        entry = sources_section[entry]
    if isinstance(entry, dict):
        access = entry.get('access', '')
        fmt = entry.get('referenceFormulation', entry.get('reference_formulation'))
        iterator = entry.get('iterator')
        if '~' in access:
            access, fmt = access.split('~', 1)
        return access, fmt, iterator
    if isinstance(entry, list):
        spec = entry[0]
        iterator = entry[1] if len(entry) > 1 else None
        fmt = None
        if '~' in spec:
            spec, fmt = spec.split('~', 1)
        return spec, fmt, iterator
    if isinstance(entry, str):
        fmt = None
        spec = entry
        if '~' in spec:
            spec, fmt = spec.split('~', 1)
        return spec, fmt, None
    return '', None, None


def _objects_of(po_entry, prefixes: dict):
    """Yield object-map bodies (and optional join info) for one po entry."""
    if isinstance(po_entry, dict):
        preds = po_entry.get('p', po_entry.get('predicate', po_entry.get('predicates')))
        objs = po_entry.get('o', po_entry.get('object', po_entry.get('objects')))
        preds = preds if isinstance(preds, list) else [preds]
        objs = objs if isinstance(objs, list) else [objs]
        for p in preds:
            for o in objs:
                if isinstance(o, dict) and 'mapping' in o:
                    jc = []
                    cond = o.get('condition', {})
                    if cond.get('function') in ('equal', 'http://example.com/idlab/function/equal'):
                        p1 = p2 = None
                        for pname, pval in (tuple(x) for x in cond.get('parameters', [])):
                            if pname in ('str1', 'grel:valueParameter'):
                                p1 = pval
                            elif pname in ('str2', 'grel:valueParameter2'):
                                p2 = pval
                        if p1 and p2:
                            jc.append((_tmpl(p1)[1:-1] if '$(' in p1 else p1,
                                       _tmpl(p2)[1:-1] if '$(' in p2 else p2))
                    yield ('join', p, o['mapping'], jc)
                elif isinstance(o, dict):
                    body = _term_map(o.get('value', ''), prefixes)
                    if o.get('language'):
                        body += f' ; rml:languageMap [ rml:reference "{_esc(_tmpl(o["language"])[1:-1])}" ]' \
                            if '$(' in str(o['language']) else f' ; rml:language "{_esc(o["language"])}"'
                    if o.get('datatype'):
                        body += f' ; rml:datatype {_expand_iri(str(o["datatype"]), prefixes)}'
                    yield ('plain', p, body, None)
                else:
                    yield from _object_from_scalar(p, o, prefixes)
        return
    if isinstance(po_entry, list):
        p = po_entry[0]
        rest = po_entry[1:]
        # [p, o] or [p, o, lang-or-datatype]
        o = rest[0]
        suffix = rest[1] if len(rest) > 1 else None
        for kind, pred, body, jc in _object_from_scalar(p, o, prefixes):
            if suffix is not None and kind == 'plain':
                s = str(suffix)
                if s.endswith('~lang'):
                    lang = s[:-5]
                    if '$(' in lang:
                        body += f' ; rml:languageMap [ rml:reference "{_esc(_tmpl(lang)[1:-1])}" ]'
                    else:
                        body += f' ; rml:language "{_esc(lang)}"'
                else:
                    body += f' ; rml:datatype {_expand_iri(s, prefixes)}'
            yield (kind, pred, body, jc)


def _object_from_scalar(p, o, prefixes: dict):
    s = str(o)
    if s.endswith('~iri'):
        core = s[:-4]
        if '$(' in core:
            yield ('plain', p, f'rml:template "{_esc(_tmpl(core))}"', None)
        else:
            yield ('plain', p, f'rml:constant {_expand_iri(core, prefixes)}', None)
    elif s.endswith('~lang'):  # rare: object itself tagged
        yield ('plain', p, _term_map(s[:-5], prefixes), None)
    else:
        as_iri = str(p).strip() == 'a'
        yield ('plain', p, _term_map(s, prefixes, as_iri=as_iri), None)


def yarrrml_to_turtle(text: str) -> str:
    doc = yaml.safe_load(text)
    prefixes = doc.get('prefixes', {}) or {}
    prefixes.setdefault('rdf', 'http://www.w3.org/1999/02/22-rdf-syntax-ns#')
    sources_section = doc.get('sources', {}) or {}
    mappings = doc.get('mappings', doc.get('mapping', {})) or {}

    lines = ['@prefix rml: <http://w3id.org/rml/> .']
    for name, m in mappings.items():
        src = m.get('sources', m.get('source'))
        if isinstance(src, list) and src and isinstance(src[0], str) and '~' in str(src[0]):
            # ['file~format', 'iterator'] shorthand is ONE source spec
            src_list = [src]
        elif isinstance(src, list) and src:
            # a list of named references or inline defs: one TriplesMap per
            # source (the reference YARRRML loader expands every source;
            # taking only the first silently drops triples)
            src_list = list(src)
        else:
            src_list = [src]

        for si, one_src in enumerate(src_list):
            tm_name = f'map_{name}' if si == 0 else f'map_{name}_src{si}'
            tm = f'<http://mapping.example.com/{tm_name}>'
            stmts = [f'{tm} a rml:TriplesMap']

            path, fmt, iterator = _norm_source(one_src, sources_section)
            ls = [f'rml:source "{_esc(path)}"']
            fmt_iri = _FORMATS.get(str(fmt).lower()) if fmt else None
            if fmt_iri:
                ls.append(f'rml:referenceFormulation {fmt_iri}')
            if iterator:
                ls.append(f'rml:iterator "{_esc(iterator)}"')
            stmts.append('  rml:logicalSource [ ' + ' ; '.join(ls) + ' ]')

            subject = m.get('s', m.get('subject', m.get('subjects')))
            if isinstance(subject, list):
                subject = subject[0]
            # subjects are IRI templates in YARRRML's shorthand
            stmts.append(f'  rml:subjectMap [ rml:template "{_esc(_tmpl(str(subject)))}" ]')

            for po in (m.get('po', m.get('predicateobjects', [])) or []):
                for kind, pred, payload, jc in _objects_of(po, prefixes):
                    p = str(pred)
                    if '$(' in p:  # template-valued predicate
                        if ':' in p.split('$(')[0] and not p.startswith(('http://', 'https://')):
                            pfx, local = p.split(':', 1)
                            if pfx in prefixes:
                                p = prefixes[pfx] + local
                        pm = f'rml:predicateMap [ rml:template "{_esc(_tmpl(p))}" ]'
                    else:
                        pm = f'rml:predicateMap [ rml:constant {_expand_iri(p, prefixes)} ]'
                    if kind == 'plain':
                        stmts.append(f'  rml:predicateObjectMap [ {pm} ; rml:objectMap [ {payload} ] ]')
                    else:  # join
                        parent_tm = f'<http://mapping.example.com/map_{payload}>'
                        om = [f'rml:parentTriplesMap {parent_tm}']
                        for child, parent in (jc or []):
                            om.append(f'rml:joinCondition [ rml:child "{_esc(child)}" ; rml:parent "{_esc(parent)}" ]')
                        stmts.append(f'  rml:predicateObjectMap [ {pm} ; rml:objectMap [ ' + ' ; '.join(om) + ' ] ]')
            lines.append(' ;\n'.join(stmts) + ' .')
    return '\n'.join(lines)
