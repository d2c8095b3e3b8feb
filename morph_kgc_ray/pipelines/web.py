"""Flagship pipeline: RML knowledge-graph construction over Common-Crawl
style web pages at cluster scale (the BASELINE.json north star).

Single-pass design — the page corpus is scanned ONCE:

  read_parquet(pages, columns=[url, warc_ts, html, lang])   [distributed scan]
    -> TripleEmitKernel (actor pool):                       [one actor pool]
         html -> text (regexes compiled once per actor; html column dropped
         inside the stage so MB payloads never leave it),
         vectorized RML term materialization (subject template over url with
         percent-encoding, xsd:dateTime natural mapping, language-tagged
         literals — morph-kgc semantics via the engine's TermPlan kernels),
         gazetteer mention detection + IRI canonicalization (alias dict via
         a ray.put broadcast, read once per actor)
       => rows (partition, subject, predicate, object)
    -> hash repartition keyed on all four columns            [ONE shuffle]
    -> block-local distinct                                  [exact dedup]
    -> partitioned N-Quads shards + manifests                [resumable sink]

``partition`` is the mapping-partition label (constant predicate per rule —
disjoint by the partitioner's theorem), so dedup and output are
partition-parallel.  Hot predicates do not skew the exchange because the
shuffle key includes the subject/object.
"""

from __future__ import annotations

import re

import pyarrow as pa
import ray
import ray.data

from ..constants import RML_IRI, RML_LITERAL, RML_TEMPLATE, XSD_DATETIME
from ..engine.dedup import distinct, ensure_hash_shuffle
from ..engine.kernels import compile_term_plan, ljoin, materialize_term, stringify_column, table_distinct
from .pages import ENTITY_IRI_PREFIX, ENTITY_NAMES, extract_text

SCHEMA_URL = 'http://schema.org/url'
SCHEMA_DATE = 'http://schema.org/dateModified'
SCHEMA_LANG = 'http://schema.org/inLanguage'
SCHEMA_TEXT = 'http://schema.org/text'
SCHEMA_MENTIONS = 'http://schema.org/mentions'
SCHEMA_SHA256 = 'http://schema.org/sha256'
SCHEMA_DETECTED_LANG = 'http://kg.example.org/ontology/detectedLanguage'
SCHEMA_QUALITY = 'http://kg.example.org/ontology/qualityScore'
PAGE_TEMPLATE = 'http://crawl.example.org/page/{url}'


def default_gazetteer() -> dict[str, str]:
    """alias surface form -> canonical entity IRI (alias canonicalization)."""
    from .pages import ENTITY_ALIASES
    return {alias: f'{ENTITY_IRI_PREFIX}{canonical.lower()}'
            for alias, canonical in ENTITY_ALIASES.items()}


class TripleEmitKernel:
    """One-pass page->triples kernel (stateful actor).

    __init__ (once per actor): compile extraction regexes, term plans and
    the gazetteer alternation regex; fetch the broadcast alias->IRI dict.
    __call__ (per batch): extract text, materialize all constant-predicate
    rules plus mention triples, emit (partition, subject, predicate, object).
    """

    def __init__(self, gazetteer_ref=None, emit_text_literal: bool = False):
        # accepts the gazetteer as a plain dict (actor pools: restart-safe —
        # an ObjectRef constructor arg breaks actor restart if the ref is
        # lost, ray#53727), an ObjectRef (task form: broadcast via ray.put,
        # fetched once per worker process), or None (default table)
        if gazetteer_ref is None:
            gaz = default_gazetteer()
        elif isinstance(gazetteer_ref, dict):
            gaz = gazetteer_ref
        else:
            gaz = ray.get(gazetteer_ref)
        # Mention scan plan (generic over any alias->IRI gazetteer):
        # 1. ASCII single-token aliases ([A-Za-z0-9_]+ surface forms) detect
        #    via ONE \W+ tokenization pass + a hash join of tokens against
        #    the alias table — token == alias is exactly \b alias \b (a
        #    token is a maximal \w+ run).  ASCII-only on purpose: Arrow/RE2's
        #    \W+ splits on non-ASCII letters ('Müller' -> 'M','ller'), so a
        #    Unicode alias would never equal a token — those stay on path 3;
        # 2. multi-word aliases whose text match IMPLIES a single-token
        #    alias of the same entity ('Acme001 Inc' contains token
        #    'Acme001') are subsumed — no extra work;
        # 3. non-subsumed multi-word AND non-ASCII aliases keep a per-entity
        #    re2 alternation pass (none in the default gazetteer).
        by_iri: dict[str, list[str]] = {}
        for alias, iri in gaz.items():
            by_iri.setdefault(iri, []).append(alias)
        token_alias, token_iri = [], []
        self.iri_patterns = []
        for iri, aliases in sorted(by_iri.items()):
            singles = [a for a in aliases if re.fullmatch(r'[A-Za-z0-9_]+', a)]
            for a in singles:
                token_alias.append(a)
                token_iri.append(iri)
            rest = [a for a in aliases
                    if a not in singles
                    and not any(re.search(rf'\b{re.escape(s)}\b', a, re.ASCII) for s in singles)]
            if rest:
                self.iri_patterns.append(
                    (iri, r'\b(?:' + '|'.join(re.escape(a) for a in sorted(rest, key=len, reverse=True)) + r')\b'))
        self.alias_values = pa.array(token_alias, pa.string())
        uniq_iris = sorted(set(token_iri))
        self._iri_index = {x: i for i, x in enumerate(uniq_iris)}
        import numpy as _np
        self.alias_iri_idx = _np.array([self._iri_index[x] for x in token_iri], dtype=_np.int64)
        self.iri_terms = pa.array([f'<{x}>' for x in uniq_iris], pa.large_string())
        self.canon = gaz
        # full page text as a literal is optional: at crawl scale the KG
        # stores a content DIGEST per page instead — shuffling multi-KB page
        # bodies through the dedup exchange is the wrong physical design
        self.emit_text_literal = emit_text_literal
        self.subject_plan = compile_term_plan(RML_TEMPLATE, PAGE_TEMPLATE, 'subject', termtype=RML_IRI)
        self.url_obj = compile_term_plan(RML_TEMPLATE, '{url}', 'object', termtype=RML_IRI)
        self.date_obj = compile_term_plan(RML_TEMPLATE, '{warc_ts}', 'object', termtype=RML_LITERAL,
                                          datatype=XSD_DATETIME)
        self.lang_obj = compile_term_plan(RML_TEMPLATE, '{lang}', 'object', termtype=RML_LITERAL)
        self.text_obj = compile_term_plan(RML_TEMPLATE, '{text}', 'object', termtype=RML_LITERAL)
        from ..ops.text import LangIdKernel
        # prefix-sampled detection (256 codepoints): the flagship oracle's
        # langid CTE slices identically (_web_kg_oracle_sql)
        self._langid_kernel = LangIdKernel(sample_chars=256)

    def langid(self, t: pa.Table):
        out = self._langid_kernel(t.select(['text']))
        return out['lang_pred'].combine_chunks()

    def __call__(self, t: pa.Table) -> pa.Table:
        # --- extraction (html dropped immediately; ONE pass over the text:
        # extraction, sha256 digest and mention scan share the same loop so
        # the payload is materialized to Python exactly once per batch) ---
        if 'html' in t.column_names:
            texts = [extract_text(h or b'') for h in t['html'].to_pylist()]
            t = t.drop_columns(['html'])
            text_arr = pa.array(texts, pa.string())
            if 'text' in t.column_names:
                t = t.set_column(t.column_names.index('text'), 'text', text_arr)
            else:
                t = t.append_column('text', text_arr)
        else:
            texts = t['text'].to_pylist()
        t = t.set_column(t.column_names.index('warc_ts'), 'warc_ts', stringify_column(t['warc_ts']))

        n = t.num_rows
        subj = materialize_term(t, self.subject_plan)
        if isinstance(subj, pa.ChunkedArray):
            subj = subj.combine_chunks()

        parts, subjects, predicates, objects = [], [], [], []

        def emit(partition: str, pred_iri: str, obj_arr, subj_arr=subj, count=n):
            parts.append(pa.array([partition] * count, pa.string()))
            subjects.append(subj_arr if not isinstance(subj_arr, pa.ChunkedArray) else subj_arr.combine_chunks())
            predicates.append(pa.array([f'<{pred_iri}>'] * count, pa.large_string()))
            objects.append(obj_arr if not isinstance(obj_arr, pa.ChunkedArray) else obj_arr.combine_chunks())

        # --- sha256 digests (single cheap Python pass over the text) ---
        import hashlib
        digests = []
        if not self.emit_text_literal:
            digests = [hashlib.sha256((text or '').encode('utf-8')).hexdigest()
                       for text in texts]

        # --- gazetteer mentions: ONE \W+ tokenization pass + hash join of
        # tokens against the single-token alias table (replaces 200 per-
        # entity regex passes over the corpus); leftover multi-word aliases
        # (none in the default gazetteer) still get per-entity re2 passes ---
        import numpy as _np
        import pyarrow.compute as pc
        text_col = t['text'].combine_chunks() if isinstance(t['text'], pa.ChunkedArray) else t['text']
        mention_subjects, mention_objects = [], []
        if len(self.alias_values):
            toks = pc.split_pattern_regex(pc.fill_null(text_col, ''), r'\W+')
            flat = pc.list_flatten(toks)
            counts = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(_np.int64)
            hit = pc.index_in(flat, value_set=self.alias_values)
            hit_np = hit.to_numpy(zero_copy_only=False)
            valid = hit_np == hit_np  # NaN-safe non-null mask
            if valid.any():
                row_of = _np.repeat(_np.arange(n, dtype=_np.int64), counts)
                rows = row_of[valid]
                iri_idx = self.alias_iri_idx[hit_np[valid].astype(_np.int64)]
                pairs = _np.unique(rows * len(self._iri_index) + iri_idx)
                rows_u = pairs // len(self._iri_index)
                iri_u = pairs % len(self._iri_index)
                mention_subjects.append(subj.take(pa.array(rows_u)))
                mention_objects.append(self.iri_terms.take(pa.array(iri_u)))
        for iri, pattern in self.iri_patterns:
            mask = pc.match_substring_regex(text_col, pattern)
            idx = pc.indices_nonzero(mask)
            if len(idx) == 0:
                continue
            mention_subjects.append(subj.take(idx))
            mention_objects.append(pa.array([f'<{iri}>'] * len(idx), pa.large_string()))

        emit('p_url', SCHEMA_URL, materialize_term(t, self.url_obj))
        date_lit = ljoin(materialize_term(t, self.date_obj), f'^^<{XSD_DATETIME}>')
        emit('p_date', SCHEMA_DATE, date_lit)
        emit('p_lang', SCHEMA_LANG, materialize_term(t, self.lang_obj))
        if self.emit_text_literal:
            text_lit = ljoin(materialize_term(t, self.text_obj), '@',
                             t['lang'].combine_chunks().cast(pa.large_string()))
            emit('p_text', SCHEMA_TEXT, text_lit)
        else:
            emit('p_digest', SCHEMA_SHA256,
                 pa.array([f'"{d}"' for d in digests], pa.large_string()))

        # --- text analysis: detected language + quality score triples ---
        # (the KG records observed language and a web-quality heuristic per
        # page; the per-actor marker tables come from ops.text.LangIdKernel)
        lang_pred = self.langid(t)
        emit('p_langdet', SCHEMA_DETECTED_LANG,
             ljoin('"', lang_pred.cast(pa.large_string()), '"'))
        # one byte-LUT pass over the utf8 buffer replaces three re2 scans
        # (exact per ops.text._class_luts; float order matches the oracle)
        from ..ops.text import char_class_counts, quality_score_np
        score = quality_score_np(char_class_counts(t['text']))
        score_lit = [f'"{v:.4f}"' for v in score]
        emit('p_quality', SCHEMA_QUALITY, pa.array(score_lit, pa.large_string()))

        # --- mention triples (vectorized matches above) ---
        if mention_subjects:
            m_subj_arr = pa.concat_arrays([a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
                                           for a in mention_subjects])
            m_obj_arr = pa.concat_arrays(mention_objects)
            parts.append(pa.array(['p_mentions'] * len(m_subj_arr), pa.string()))
            subjects.append(m_subj_arr)
            predicates.append(pa.array([f'<{SCHEMA_MENTIONS}>'] * len(m_subj_arr), pa.large_string()))
            objects.append(m_obj_arr)

        out = pa.table({'partition': pa.concat_arrays(parts),
                        'subject': pa.concat_arrays(subjects),
                        'predicate': pa.concat_arrays(predicates),
                        'object': pa.concat_arrays(objects)})
        # block-local distinct before the exchange cuts shuffle volume
        return table_distinct(out)


_KERNEL_CACHE: dict = {}


def _emit_fn(gaz_ref, emit_text_literal: bool):
    """Task-form wrapper around TripleEmitKernel with a per-worker-process
    kernel cache: same amortization as an actor pool (regexes compiled once
    per process, gazetteer fetched once), but the stage stays a TASK so Ray
    fuses read->extract->emit->local-dedup into one task chain — the html
    payload never round-trips through the object store between stages."""
    key = (gaz_ref.hex() if gaz_ref is not None else None, emit_text_literal)

    def fn(t: pa.Table) -> pa.Table:
        kernel = _KERNEL_CACHE.get(key)
        if kernel is None:
            kernel = TripleEmitKernel(gaz_ref, emit_text_literal)
            _KERNEL_CACHE[key] = kernel
        return kernel(t)
    return fn


def web_kg_triples(pages: ray.data.Dataset, gazetteer: dict[str, str] | None = None,
                   concurrency: 'int | tuple | None' = None, batch_size: int = 256,
                   dedup_partitions: 'int | None' = None,
                   emit_text_literal: bool = False,
                   dedup_strategy: str = 'in_place') -> ray.data.Dataset:
    """Deduped triples Dataset (partition, subject, predicate, object).

    ``dedup_strategy='in_place'`` (default) exchanges only 16-byte row
    hashes, PUSHED to reducer actors while the emit pass itself runs — the
    triple payload never crosses the wire and the hash exchange adds no
    barrier of its own; above the duplicate-volume cap it auto-reroutes to
    the payload exchange (engine/dedup.py).  ``'exchange'`` shuffles the
    full rows keyed on a row-hash bucket.  Measured at 600k pages (7.6M
    triples), 32 CPUs: overlapped in_place 8.9-9.4s vs 12.7s for the
    round-4 pull-based in_place vs 30.5s for the full-row exchange; 8->32
    scaling tracks the emit kernel's own ratio within ~3% (BASELINE.md
    round-5 scaling table)."""
    gaz = gazetteer or default_gazetteer()
    if concurrency is None:
        # task form (default): fuses with the read, no intermediate payload
        # materialization; per-process kernel cache amortizes setup.  The
        # gazetteer broadcasts once via ray.put (fine for tasks).
        gaz_ref = ray.put(gaz)
        emitted = pages.map_batches(_emit_fn(gaz_ref, emit_text_literal),
                                    batch_format='pyarrow', batch_size=batch_size)
    else:
        # actor pool: bake the (small) gazetteer into the class itself so the
        # actor has NO constructor args — Ray Data ray.put()s any
        # fn_constructor_args, and an object-store ctor arg breaks actor
        # restart if the ref is lost (ray#53727 core_worker warning); a
        # closure class travels inside the actor spec instead (restart-safe)
        _flag = emit_text_literal

        class _BoundEmitKernel(TripleEmitKernel):
            def __init__(self):
                super().__init__(gaz, _flag)

        emitted = pages.map_batches(
            _BoundEmitKernel,
            batch_format='pyarrow', concurrency=concurrency, batch_size=batch_size)
    cols = ['partition', 'subject', 'predicate', 'object']
    if dedup_strategy == 'in_place':
        from ..engine.dedup import distinct_in_place
        return distinct_in_place(emitted, cols, local_first=False)
    # the emit kernel's batches are already block-locally distinct and the
    # read is sized to ~2 blocks/CPU: go straight to the bucket exchange
    return distinct(emitted, cols, num_partitions=dedup_partitions,
                    local_first=False, coalesce=False)


def write_web_kg(pages: ray.data.Dataset, out_dir: str, resume: bool = True,
                 filesystem=None, **kwargs) -> dict:
    """Materialize to the resumable partitioned layout: rows carry their
    mapping-partition label and each TASK writes its own block's shards into
    ``part=<p>/shard_<uuid>.nt`` (no triple payload ever reaches the driver);
    the manifest commit is an atomic rename on local disk and a marker-object
    PUT on object stores, so a failed run resumes idempotently.  ``out_dir``
    may be a local path or a filesystem URI (``file://``, ``s3://``); pass
    ``filesystem`` to supply an explicit ``pyarrow.fs.FileSystem``."""
    from ..sinks.writers import (
        _exists,
        _read_json,
        resolve_filesystem,
        write_partition_column_ntriples,
    )

    import posixpath

    f, root = resolve_filesystem(out_dir, filesystem)
    if resume and _exists(f, posixpath.join(root, '_MANIFEST.json')):
        return _read_json(f, posixpath.join(root, '_MANIFEST.json'))
    triples = web_kg_triples(pages, **kwargs)
    return write_partition_column_ntriples(triples, root, resume=resume,
                                           filesystem=f)
