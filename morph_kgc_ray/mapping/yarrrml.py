"""YARRRML -> RML Turtle translation (subset).

The reference ships a 589-LoC YARRRML loader
(/root/reference/src/morph_kgc/mapping/yarrrml.py).  This module translates
the common YARRRML surface (prefixes, mappings/sources/subject/po shortcuts)
into RML Turtle which then flows through the standard parser.  Advanced
YARRRML (functions, conditions) is future work.
"""

from __future__ import annotations

import yaml


def _iri_or_prefixed(value: str, prefixes: dict[str, str]) -> str:
    value = value.strip()
    if value.startswith('http://') or value.startswith('https://'):
        return f'<{value}>'
    if ':' in value:
        pfx, local = value.split(':', 1)
        if pfx in prefixes:
            return f'<{prefixes[pfx]}{local}>'
    return f'<{value}>'


def _template_to_rml(value: str) -> str:
    # YARRRML templates use $(ref); RML uses {ref}
    out = value.replace('$(', '{').replace(')', '}') if '$(' in value else value
    return out


def yarrrml_to_turtle(text: str) -> str:
    doc = yaml.safe_load(text)
    prefixes = doc.get('prefixes', {}) or {}
    lines = ['@prefix rml: <http://w3id.org/rml/> .']
    mappings = doc.get('mappings', doc.get('mapping', {})) or {}

    for name, m in mappings.items():
        tm = f'<http://mapping.example.com/map_{name}>'
        lines.append(f'{tm} a rml:TriplesMap ;')
        sources = m.get('sources', m.get('source'))
        if isinstance(sources, list):
            source = sources[0]
        else:
            source = sources
        if isinstance(source, list):
            path = source[0]
        elif isinstance(source, dict):
            path = source.get('access', '')
        else:
            path = source or ''
        ref_form = None
        iterator = None
        if isinstance(path, str) and '~' in path:
            path, fmt = path.split('~', 1)
            ref_form = {'csv': 'rml:CSV', 'jsonpath': 'rml:JSONPath', 'xpath': 'rml:XPath'}.get(fmt.strip())
        if isinstance(source, dict):
            iterator = source.get('iterator')
        ls = [f'rml:source "{path}"']
        if ref_form:
            ls.append(f'rml:referenceFormulation {ref_form}')
        if iterator:
            ls.append(f'rml:iterator "{iterator}"')
        lines.append('  rml:logicalSource [ ' + ' ; '.join(ls) + ' ] ;')

        subject = m.get('subject', m.get('s', m.get('subjects')))
        if isinstance(subject, list):
            subject = subject[0]
        lines.append(f'  rml:subjectMap [ rml:template "{_template_to_rml(str(subject))}" ] ;')

        poms = m.get('predicateobjects', m.get('po', [])) or []
        pom_lines = []
        for po in poms:
            if isinstance(po, list) and len(po) >= 2:
                pred, obj = po[0], po[1]
                p_iri = _iri_or_prefixed(str(pred), prefixes)
                obj_s = str(obj)
                if '$(' in obj_s:
                    om = f'rml:objectMap [ rml:reference "{obj_s[2:-1]}" ]' if obj_s.startswith('$(') and obj_s.endswith(')') and obj_s.count('$(') == 1 \
                        else f'rml:objectMap [ rml:template "{_template_to_rml(obj_s)}" ]'
                else:
                    om = f'rml:objectMap [ rml:constant "{obj_s}" ]'
                pom_lines.append(f'  rml:predicateObjectMap [ rml:predicateMap [ rml:constant {p_iri} ] ; {om} ]')
        lines.append(' ;\n'.join(pom_lines) + ' .')
    return '\n'.join(lines)
