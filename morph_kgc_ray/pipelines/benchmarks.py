"""Benchmark / correctness-gate query registry over the driver test tables
(/root/testdata/sf*/: region nation customer supplier part orders lineitem
events documents embeddings).

Every entry pairs a Ray Data pipeline (the engine's own operators) with an
equivalent ANSI-SQL oracle runnable by DuckDB on the same parquet files.
Column names match between the two on purpose — the harness compares
row-count + schema + order-insensitive value hash.

Every query has an oracle — including ``embedding_neardup_clusters_lsh``,
which pins the sign-LSH scale path in the high-threshold regime where banded
LSH is deterministic (planted exact-clone duplicates derived from the table
itself, so the SQL oracle replicates the corpus with a UNION ALL); the
mid-threshold grey zone where sign-LSH recall is intrinsically probabilistic
is documented on the exact-path twin ``embedding_neardup_clusters``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..config import Config
from ..engine.materializer import materialize_dataset
from ..sources.readers import read_parquet_clean
from ..ops import dedup as dedup_ops
from ..ops import similarity as sim_ops
from ..ops import text as text_ops
from .web import (SCHEMA_DATE, SCHEMA_DETECTED_LANG, SCHEMA_LANG, SCHEMA_MENTIONS,
                  SCHEMA_QUALITY, SCHEMA_SHA256, SCHEMA_URL)

EX = 'http://example.com'
RDF_TYPE_IRI = 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type'
XSD_INT = 'http://www.w3.org/2001/XMLSchema#integer'


def _p(sf_dir: str, table: str) -> str:
    return f'{sf_dir}/{table}.parquet'


def _small(sf_dir: str, table: str, cap_bytes: int = 64 << 20) -> bool:
    """Plan-time small-input hint from the file size (mirrors the engine's
    small-source fast-path decision): below the cap, keyed exchanges are
    pure spin-up overhead and ops switch to single-block plans.
    ``GRAFT_FORCE_DISTRIBUTED=1`` disables every small fast path so the
    whole oracle sweep exercises the distributed plans."""
    import os
    if os.environ.get('GRAFT_FORCE_DISTRIBUTED'):
        return False
    try:
        return os.path.getsize(_p(sf_dir, table)) <= cap_bytes
    except OSError:
        return False


# --------------------------------------------------------------------------
# RML engine pipelines (exercise the real mapping front-end + materializer)
# --------------------------------------------------------------------------

def _engine_columns(sf_dir: str, mapping: str, output_format: str = 'N-TRIPLES'):
    cfg = Config({'DS1': {}, 'output_format': output_format, 'source_base_dir': sf_dir})
    cfg.set_mappings_document('DS1', mapping)
    return materialize_dataset(cfg, as_columns=True).drop_columns(['mapping_partition'])


def rml_customer_triples(sf_dir: str):
    """Template subject + class POM + reference object (RMLTC0001-class
    semantics) over the customer table."""
    mapping = f'''
    @prefix rml: <http://w3id.org/rml/> .
    <#TM_Customer> a rml:TriplesMap ;
      rml:logicalSource [ rml:source "{_p(sf_dir, 'customer')}" ] ;
      rml:subjectMap [ rml:template "{EX}/customer/{{c_custkey}}" ;
                       rml:class <{EX}/ontology/Customer> ] ;
      rml:predicateObjectMap [
        rml:predicate <http://xmlns.com/foaf/0.1/name> ;
        rml:objectMap [ rml:reference "c_name" ] ] .
    '''
    return _engine_columns(sf_dir, mapping)


def rml_join_order_customer(sf_dir: str):
    """Referencing object map: orders -> customer on o_custkey=c_custkey."""
    mapping = f'''
    @prefix rml: <http://w3id.org/rml/> .
    <#TM_Order> a rml:TriplesMap ;
      rml:logicalSource [ rml:source "{_p(sf_dir, 'orders')}" ] ;
      rml:subjectMap [ rml:template "{EX}/order/{{o_orderkey}}" ] ;
      rml:predicateObjectMap [
        rml:predicate <{EX}/ontology/placedBy> ;
        rml:objectMap [ rml:parentTriplesMap <#TM_Cust> ;
                        rml:joinCondition [ rml:child "o_custkey" ; rml:parent "c_custkey" ] ] ] .
    <#TM_Cust> rml:logicalSource [ rml:source "{_p(sf_dir, 'customer')}" ] ;
      rml:subjectMap [ rml:template "{EX}/customer/{{c_custkey}}" ] .
    '''
    return _engine_columns(sf_dir, mapping)


def rml_lineitem_datatype(sf_dir: str):
    """Datatyped literal with xsd:integer natural mapping (double -> int)."""
    mapping = f'''
    @prefix rml: <http://w3id.org/rml/> .
    @prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
    <#TM_Line> a rml:TriplesMap ;
      rml:logicalSource [ rml:source "{_p(sf_dir, 'lineitem')}" ] ;
      rml:subjectMap [ rml:template "{EX}/order/{{l_orderkey}}/line/{{l_linenumber}}" ] ;
      rml:predicateObjectMap [
        rml:predicate <{EX}/ontology/quantity> ;
        rml:objectMap [ rml:reference "l_quantity" ; rml:datatype xsd:integer ] ] .
    '''
    return _engine_columns(sf_dir, mapping)


def rml_events_nquads(sf_dir: str):
    """Graph maps (N-Quads) + xsd:dateTime natural mapping on the object."""
    mapping = f'''
    @prefix rml: <http://w3id.org/rml/> .
    @prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
    <#TM_Event> a rml:TriplesMap ;
      rml:logicalSource [ rml:source "{_p(sf_dir, 'events')}" ] ;
      rml:subjectMap [ rml:template "{EX}/event/{{event_id}}" ] ;
      rml:predicateObjectMap [
        rml:predicate <{EX}/ontology/ts> ;
        rml:objectMap [ rml:reference "ts" ; rml:datatype xsd:dateTime ] ;
        rml:graphMap [ rml:template "{EX}/graph/{{event_type}}" ] ] .
    '''
    return _engine_columns(sf_dir, mapping, output_format='N-QUADS')


def rml_documents_lang(sf_dir: str):
    """Language map: text literal tagged with the row's lang column."""
    mapping = f'''
    @prefix rml: <http://w3id.org/rml/> .
    <#TM_Doc> a rml:TriplesMap ;
      rml:logicalSource [ rml:source "{_p(sf_dir, 'documents')}" ] ;
      rml:subjectMap [ rml:template "{EX}/doc/{{doc_id}}" ] ;
      rml:predicateObjectMap [
        rml:predicate <http://schema.org/text> ;
        rml:objectMap [ rml:reference "text" ; rml:languageMap [ rml:reference "lang" ] ] ] .
    '''
    return _engine_columns(sf_dir, mapping)


# --------------------------------------------------------------------------
# data ops over the test tables
# --------------------------------------------------------------------------

def dedup_exact_documents(sf_dir: str):
    ds = read_parquet_clean(_p(sf_dir, 'documents'), columns=['doc_id', 'text'])
    return dedup_ops.exact_dedup(ds, ['text'], 'doc_id',
                                 small=_small_table(sf_dir, 'documents'))


def token_count_documents(sf_dir: str):
    ds = read_parquet_clean(_p(sf_dir, 'documents'), columns=['doc_id', 'text'])
    return text_ops.token_count(ds).select_columns(['doc_id', 'n_tokens'])


def token_count_bpe_documents(sf_dir: str):
    """BPE-ish pre-tokenizer counts (letter runs / digit runs / punctuation)
    — both sides RE2, so the DuckDB oracle counts the identical matches."""
    ds = read_parquet_clean(_p(sf_dir, 'documents'), columns=['doc_id', 'text'])
    return text_ops.token_count(ds, mode='bpeish', out_col='n_bpe_tokens') \
        .select_columns(['doc_id', 'n_bpe_tokens'])


def quality_stats_documents(sf_dir: str):
    ds = read_parquet_clean(_p(sf_dir, 'documents'), columns=['doc_id', 'text'])
    out = text_ops.quality_stats(ds)
    return out.select_columns(['doc_id', 'n_chars_computed', 'n_upper', 'n_digit'])


def repetition_stats_documents(sf_dir: str):
    """Gopher-style per-doc repetition quality signals (duplicate lines,
    top word-2-gram concentration) — dictionary-encoded exact counts."""
    ds = read_parquet_clean(_p(sf_dir, 'documents'), columns=['doc_id', 'text'])
    return text_ops.repetition_stats(ds).select_columns(
        ['doc_id', 'n_lines', 'n_dup_lines', 'n_2grams', 'top_2gram_count'])


def decontaminate_documents(sf_dir: str):
    """Benchmark decontamination (GPT-3-style word-8-gram overlap).  The
    'benchmark' is a deterministic in-corpus eval set — tokens 6..20 of
    every doc with doc_id % 97 == 0 — so contamination genuinely exists
    (each source doc hits its own snippet; exact-duplicate docs hit too)."""
    import re

    from ..ops.decontam import ngram_decontaminate
    ds = read_parquet_clean(_p(sf_dir, 'documents'), columns=['doc_id', 'text'])

    def pick(t: pa.Table) -> pa.Table:
        did = t['doc_id'].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(did % 97 == 0))

    bench = []
    for r in ds.map_batches(pick, batch_format='pyarrow').take_all():
        toks = [x for x in re.split(r'[^0-9A-Za-z_]+', r['text'] or '') if x]
        bench.append(' '.join(toks[5:20]))
    return ngram_decontaminate(ds, bench, k=8) \
        .select_columns(['doc_id', 'n_contaminated'])


def chunk_documents_windows(sf_dir: str):
    """Training-sequence packing prepass: 32-token windows, stride 24
    (8-token overlap) — flat-map-shaped (rows out >> rows in)."""
    from ..ops.chunk import chunk_documents
    ds = read_parquet_clean(_p(sf_dir, 'documents'), columns=['doc_id', 'text'])
    return chunk_documents(ds, window=32, stride=24)


def pack_sequences_documents(sf_dir: str):
    """GPT-style sequence packing per source: docs concatenate in doc_id
    order with an <eos> separator and cut into 64-token bins — one row per
    (source, bin) with token/doc counts and the packed text."""
    from ..ops.chunk import pack_sequences
    ds = read_parquet_clean(_p(sf_dir, 'documents'),
                            columns=['source', 'doc_id', 'text'])
    return pack_sequences(ds, key='source', capacity=64,
                          small=_small_table(sf_dir, 'documents'))


def unigram_lm_documents(sf_dir: str):
    """CCNet-style unigram LM quality scoring — the repo's trainable
    operator: pass 1 fits corpus token counts (partial value_counts per
    batch, one vocab-keyed groupby-sum), pass 2 broadcasts the fitted
    model and scores every doc.  Scores are exact fixed-point micronats
    (floor(-ln(cnt/total)*1e6) per token, int64 sums) so the oracle hash
    is float-order-free; DuckDB replicates token-for-token."""
    from ..ops.lm import unigram_lm_score
    ds = read_parquet_clean(_p(sf_dir, 'documents'), columns=['doc_id', 'text'])
    return unigram_lm_score(ds, small=_small_table(sf_dir, 'documents')) \
        .select_columns(['doc_id', 'n_tokens', 'nll_micronats'])


def bloom_blocklist_documents(sf_dir: str):
    """Exact blocklist anti-join via a broadcast Bloom sketch: remove every
    document whose text appears in the blocklist (the decontam-style
    in-corpus eval set, docs with doc_id % 97 == 0 — genuinely matching).
    The filter is DELIBERATELY undersized (64 bits, 1 hash) so real false
    positives flow through the distributed left_anti verification join and
    the exactness-under-FP path is what the oracle certifies."""
    from ..ops.bloom import bloom_anti_join
    ds = read_parquet_clean(_p(sf_dir, 'documents'), columns=['doc_id', 'text'])

    def pick(t: pa.Table) -> pa.Table:
        did = t['doc_id'].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(did % 97 == 0))

    keys = ds.map_batches(pick, batch_format='pyarrow').select_columns(['text'])
    # stays on the DISTRIBUTED left_anti plan (small=False) on purpose —
    # this query is the correctness certificate for the scale path; 8
    # partitions keep the aggregator spin-up proportionate to the input
    return bloom_anti_join(ds, keys, 'text', num_partitions=8,
                           num_bits=64, num_hashes=1) \
        .select_columns(['doc_id'])


def cap_per_source_documents(sf_dir: str):
    """Per-domain cap (max 3 docs per source, shortest-first, ties by
    doc_id) — local top-k prefilter then a keyed exchange of survivors
    only; the oracle is a ROW_NUMBER() window."""
    from ..ops.sample import cap_per_key
    ds = read_parquet_clean(_p(sf_dir, 'documents'),
                            columns=['doc_id', 'source', 'n_chars'])
    return cap_per_key(ds, 'source', 3, ['n_chars', 'doc_id'],
                       small=_small_table(sf_dir, 'documents')) \
        .select_columns(['doc_id', 'source', 'rn'])


def quality_filter_documents(sf_dir: str):
    """Training-data quality filtering: keep docs in a language allowlist
    whose heuristic quality score clears a threshold and that have enough
    tokens — the canonical pre-training corpus filter, fully oracle-checked
    (the score formula is replicated in SQL)."""
    ds = read_parquet_clean(_p(sf_dir, 'documents'),
                            columns=['doc_id', 'text', 'lang'])
    out = text_ops.quality_filter(ds, min_score=0.8, min_tokens=5,
                                  langs=('en', 'de', 'fr'))
    return out.select_columns(['doc_id', 'lang'])


def _small_table(sf_dir: str, name: str, cap: int = 64 * 1024 * 1024) -> bool:
    """Plan-time combine-plan choice for grouped_agg (file size, no read).
    ``GRAFT_FORCE_DISTRIBUTED=1`` disables the fast path (see _small)."""
    import os
    if os.environ.get('GRAFT_FORCE_DISTRIBUTED'):
        return False
    try:
        return os.path.getsize(_p(sf_dir, name)) < cap
    except OSError:
        return False


def lang_count_documents(sf_dir: str):
    from ..ops.agg import grouped_agg
    ds = read_parquet_clean(_p(sf_dir, 'documents'), columns=['lang', 'n_chars'])
    return grouped_agg(ds, ['lang'],
                       [(None, 'count', 'n_docs'), ('n_chars', 'sum', 'sum_chars')],
                       small=_small_table(sf_dir, 'documents'))


def events_hourly_user_agg(sf_dir: str):
    from ..ops.agg import grouped_agg
    ds = read_parquet_clean(_p(sf_dir, 'events'), columns=['user_id', 'ts', 'value'])

    def bucketize(t: pa.Table) -> pa.Table:
        us = pc.cast(t['ts'], pa.int64())
        hour = pc.divide(us, pa.scalar(3_600_000_000, pa.int64()))
        cents = pc.cast(pc.floor(pc.multiply(t['value'], pa.scalar(100.0))), pa.int64())
        return pa.table({'user_id': t['user_id'], 'hour_bucket': hour, 'value_cents': cents})

    ds = ds.map_batches(bucketize, batch_format='pyarrow')
    return grouped_agg(ds, ['user_id', 'hour_bucket'],
                       [(None, 'count', 'n_events'),
                        ('value_cents', 'sum', 'sum_value_cents')],
                       small=_small_table(sf_dir, 'events'))


def sessionize_events(sf_dir: str):
    """Windowed aggregate (gaps-and-islands): per-user sessions with an
    8-hour inactivity gap over the events stream."""
    from ..ops.window import sessionize
    ds = read_parquet_clean(_p(sf_dir, 'events'),
                            columns=['user_id', 'ts', 'event_id', 'value'])
    return sessionize(ds, key='user_id', ts_col='ts', id_col='event_id',
                      gap_us=8 * 3600 * 1_000_000, value_col='value',
                      small=_small_table(sf_dir, 'events'))


def asof_view_attribution_events(sf_dir: str):
    """As-of join: each click attributed to the user's most recent
    at-or-prior view (left-outer; (ts, event_id) tie order)."""
    from ..ops.window import asof_join_prior
    ds = read_parquet_clean(_p(sf_dir, 'events'),
                            columns=['user_id', 'ts', 'event_id', 'event_type'])
    out = asof_join_prior(ds, key='user_id', ts_col='ts', id_col='event_id',
                          type_col='event_type', left_type='click',
                          right_type='view',
                          small=_small_table(sf_dir, 'events'))

    def no_nulls(t: pa.Table) -> pa.Table:
        # the operator is left-outer (true nulls); the ORACLE COMPARE is
        # hash-based and NaN != NaN, so the benchmark surface pins
        # unmatched clicks to -1 on both sides
        for c in ('view_event_id', 'view_ts_us'):
            t = t.set_column(t.column_names.index(c), c,
                             pc.fill_null(t[c], pa.scalar(-1, pa.int64())))
        return t
    return out.map_batches(no_nulls, batch_format='pyarrow')


def quantize_embeddings_int8(sf_dir: str):
    """Symmetric per-vector int8 quantization, flattened to (vec_id,
    dim_idx, q) rows so the oracle hash covers every component."""
    import numpy as np

    from ..ops.similarity import quantize_embeddings
    ds = read_parquet_clean(_p(sf_dir, 'embeddings'), columns=['vec_id', 'embedding'])
    out = quantize_embeddings(ds)

    def flatten(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return pa.table({'vec_id': pa.array([], pa.int64()),
                             'dim_idx': pa.array([], pa.int64()),
                             'q': pa.array([], pa.int64())})
        q = t['q'].combine_chunks()
        lens = pc.list_value_length(q).to_numpy(zero_copy_only=False).astype(np.int64)
        vid = t['vec_id'].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table({
            'vec_id': pa.array(np.repeat(vid, lens)),
            'dim_idx': pa.array(np.concatenate([np.arange(1, k + 1) for k in lens])
                                if n else np.array([], np.int64)),
            'q': pc.cast(pc.list_flatten(q), pa.int64())})

    return out.map_batches(flatten, batch_format='pyarrow')


def stratified_sample_documents(sf_dir: str):
    """Deterministic 5-per-language sample of the documents table (seeded
    multiplicative hash — reproducible on any cluster layout)."""
    from ..ops.sample import stratified_sample
    ds = read_parquet_clean(_p(sf_dir, 'documents'), columns=['doc_id', 'lang'])
    return stratified_sample(ds, group_col='lang', id_col='doc_id', k=5,
                             seed=7, small=_small_table(sf_dir, 'documents'))


def mixture_sample_documents(sf_dir: str):
    """Training-mix construction: per-source keep rates (0, .25, .5, .75, 1
    cycling by source index), applied as a deterministic hash threshold —
    a pure map stage with zero shuffle at any scale."""
    from ..ops.sample import mixture_sample
    ds = read_parquet_clean(_p(sf_dir, 'documents'), columns=['doc_id', 'source'])
    rates = {f'src{i}': (i % 5) / 4 for i in range(20)}
    return mixture_sample(ds, group_col='source', id_col='doc_id',
                          rates=rates, seed=11)


def pii_redact_documents(sf_dir: str):
    """PII scrubbing over documents with deterministic synthetic PII
    (email/phone/IP derived from doc_id, mirrored in the SQL oracle so the
    redaction semantics are actually exercised)."""
    import numpy as np

    from ..ops.text import redact_pii
    ds = read_parquet_clean(_p(sf_dir, 'documents'), columns=['doc_id', 'text'])

    def inject(t: pa.Table) -> pa.Table:
        did = t['doc_id'].to_numpy(zero_copy_only=False)
        suffix = [f' contact user{d}@mail.example.com or call +1 555-01'
                  f'{d % 100:02d} node 10.0.{d % 256}.{d % 100}' for d in did]
        text2 = pc.binary_join_element_wise(
            pc.fill_null(t['text'], ''), pa.array(suffix, pa.string()), '')
        return pa.table({'doc_id': t['doc_id'], 'text': text2})

    out = redact_pii(ds.map_batches(inject, batch_format='pyarrow'))
    return out.map_batches(lambda t: t.drop_columns(['text']),
                           batch_format='pyarrow')


def boilerplate_paragraphs_pages(sf_dir: str):
    """CCNet-style boilerplate detection over the synthetic page corpus:
    explode paragraphs, count occurrences corpus-wide, keep repeats.  Two
    boilerplate footers are injected by url-length parity (mirrored in
    SQL), so the two result rows' counts encode the whole corpus."""
    import numpy as np

    from .pages import pages_parquet_dir
    from ..ops.text import paragraph_counts
    sf = sf_dir.rstrip('/').rsplit('sf', 1)[-1]
    rows = {'0.001': 1000, '0.01': 5000, '0.1': 20000}.get(sf, 2000)
    pages = read_parquet_clean(pages_parquet_dir(rows), columns=['url', 'text'])

    def inject(t: pa.Table) -> pa.Table:
        lens = pc.utf8_length(t['url']).to_numpy(zero_copy_only=False)
        suffix = np.where(lens % 2 == 0, '\n' + _BOILER_A, '\n' + _BOILER_B)
        text2 = pc.binary_join_element_wise(
            pc.fill_null(t['text'], ''), pa.array(suffix, pa.string()), '')
        return pa.table({'text': text2})

    # plan-time combine choice: up to ~100k paragraphs finish in a single
    # task; larger corpora take the distributed groupby combine
    return paragraph_counts(pages.map_batches(inject, batch_format='pyarrow'),
                            min_count=2, small=rows <= 20000)


_BOILER_A = 'Subscribe to our newsletter'
_BOILER_B = 'Cookie policy: accept to continue'


def remove_boilerplate_pages(sf_dir: str):
    """CCNet-style boilerplate REMOVAL over the injected page corpus: every
    corpus-repeated paragraph (the two injected footers plus natural
    repeats) is dropped and each page's text rewritten from its kept
    paragraphs — (url, clean_text, n_removed) per page, hash-exact vs the
    SQL anti-join + ordered string_agg twin."""
    import numpy as np

    from .pages import pages_parquet_dir
    from ..ops.text import remove_boilerplate
    sf = sf_dir.rstrip('/').rsplit('sf', 1)[-1]
    rows = {'0.001': 1000, '0.01': 5000, '0.1': 20000}.get(sf, 2000)
    pages = read_parquet_clean(pages_parquet_dir(rows), columns=['url', 'text'])

    def inject(t: pa.Table) -> pa.Table:
        lens = pc.utf8_length(t['url']).to_numpy(zero_copy_only=False)
        suffix = np.where(lens % 2 == 0, '\n' + _BOILER_A, '\n' + _BOILER_B)
        text2 = pc.binary_join_element_wise(
            pc.fill_null(t['text'], ''), pa.array(suffix, pa.string()), '')
        return pa.table({'url': t['url'], 'text': text2})

    out = remove_boilerplate(pages.map_batches(inject, batch_format='pyarrow'),
                             min_count=2, small=rows <= 100_000)
    return out.select_columns(['url', 'clean_text', 'n_removed'])


def url_domain_stats_pages(sf_dir: str):
    """Crawl-frontier URL canonicalization + eTLD+1 rollup: the corpus URLs
    are deterministically messed by url-length parity (uppercase authority
    + fragment / default port + utm params / mixed real+tracking params /
    multi-label-suffix host rewrite — each variant exercising one
    normalization rule, mirrored in SQL), then normalized, grouped by
    registrable domain.  ``total_len`` makes the hash sensitive to every
    byte of every normalized URL."""
    from .pages import pages_parquet_dir
    from ..ops.url import _PREFIX_RX, domain_stats
    sf = sf_dir.rstrip('/').rsplit('sf', 1)[-1]
    rows = {'0.001': 1000, '0.01': 5000, '0.1': 20000}.get(sf, 2000)
    pages = read_parquet_clean(pages_parquet_dir(rows), columns=['url'])

    def mess(t: pa.Table) -> pa.Table:
        u = t['url']
        m = pc.bit_wise_and(pc.cast(pc.utf8_length(u), pa.int64()), 3)
        parts = pc.extract_regex(u, _PREFIX_RX)
        v0 = pc.binary_join_element_wise(
            pc.utf8_upper(pc.struct_field(parts, 'pre')),
            pc.struct_field(parts, 'rest'), '#frag', '')
        v1 = pc.binary_join_element_wise(
            pc.replace_substring_regex(u, r'^(https://[^/?#]*)', r'\1:443',
                                       max_replacements=1),
            '?utm_source=x&utm_medium=y', '')
        v2 = pc.binary_join_element_wise(u, '?a=1&utm_campaign=z&b=2', '')
        v3 = pc.replace_substring(u, 'example.org', 'shop.co.uk')
        messed = pc.if_else(pc.equal(m, 0), v0,
                            pc.if_else(pc.equal(m, 1), v1,
                                       pc.if_else(pc.equal(m, 2), v2, v3)))
        return pa.table({'url': messed})

    # plan-time small fast path: bench corpora (<=20k urls) collapse in
    # single tasks; the hash-shuffle plan remains for real crawls
    return domain_stats(pages.map_batches(mess, batch_format='pyarrow'),
                        small=rows <= 100_000)


def top_ngrams_documents(sf_dir: str):
    """Corpus-wide top-20 word bigrams (per-block combiner -> global sum ->
    per-block top-k -> single-task merge), tie-broken (count DESC, ngram
    ASC) so the selected set is deterministic on both sides."""
    ds = read_parquet_clean(_p(sf_dir, 'documents'), columns=['text'])
    return text_ops.top_ngrams(ds, n=2, k=20, small=_small(sf_dir, 'documents'))


def dup_spans_documents(sf_dir: str):
    """Exact duplicated-span detection (Lee et al. substring-dedup shape):
    docs sharing a word 8-gram with any other doc, with their distinct
    shared-span counts."""
    ds = read_parquet_clean(_p(sf_dir, 'documents'), columns=['doc_id', 'text'])
    return dedup_ops.dup_spans(ds, k=8, small=_small(sf_dir, 'documents'))


def curate_corpus_documents(sf_dir: str):
    """END-TO-END training-corpus curation composed from the individual
    operators — quality/language filter -> exact dedup (min-id
    representative) -> benchmark decontamination -> 32/24 sequence
    chunking — with ONE spliced SQL oracle over the whole chain.  In this
    order the pipeline is a single streaming map chain around the one
    dedup exchange: the filter is stateless, the decontamination set
    broadcasts once, and chunking is flat-map-shaped — no joins
    anywhere."""
    import re

    from ..ops.chunk import chunk_documents
    from ..ops.decontam import ngram_decontaminate
    ds = read_parquet_clean(_p(sf_dir, 'documents'),
                            columns=['doc_id', 'text', 'lang'])
    small = _small_table(sf_dir, 'documents')
    filtered = text_ops.quality_filter(ds, min_score=0.8, min_tokens=5,
                                       langs=('en', 'de', 'fr'))
    reps = dedup_ops.exact_dedup(filtered.select_columns(['doc_id', 'text']),
                                 ['text'], 'doc_id', small=small)

    def pick(t: pa.Table) -> pa.Table:
        did = t['doc_id'].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(did % 97 == 0))

    bench = []
    for r in ds.map_batches(pick, batch_format='pyarrow').take_all():
        toks = [x for x in re.split(r'[^0-9A-Za-z_]+', r['text'] or '') if x]
        bench.append(' '.join(toks[5:20]))

    dec = ngram_decontaminate(reps, bench, k=8)

    def keep_clean(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t['n_contaminated'],
                                 pa.scalar(0, pa.int64())))

    clean = dec.map_batches(keep_clean, batch_format='pyarrow')
    return chunk_documents(clean, window=32, stride=24)


def remove_dup_spans_documents(sf_dir: str):
    """Exact substring-dedup REWRITE (Lee et al.): drop every token covered
    by a corpus-shared word 8-gram, re-join survivors with single spaces —
    (doc_id, clean_text, n_removed), hash-exact vs the SQL coverage twin."""
    ds = read_parquet_clean(_p(sf_dir, 'documents'), columns=['doc_id', 'text'])
    return dedup_ops.remove_dup_spans(ds, k=8)


def wet_roundtrip_pages(sf_dir: str):
    """WARC/WET source gate: the pages corpus rendered as gzipped WET
    shards (cached), read back through the stdlib WARC parser, rolled up
    per language.  ``checksum`` sums a 32-bit sha256 prefix of
    (url, text) per record and the split epoch sums pin the WARC-Date
    round trip to the microsecond — any parsing drift (bodies, headers,
    gzip framing, fractional dates) breaks the hash against the SQL twin
    over the source parquet."""
    import hashlib

    from ray.data.aggregate import Count, Sum

    from ..sources.warc import read_wet, wet_shards_dir
    sf = sf_dir.rstrip('/').rsplit('sf', 1)[-1]
    rows = {'0.001': 1000, '0.01': 5000, '0.1': 20000}.get(sf, 2000)
    ds = read_wet(wet_shards_dir(rows))

    def per_record(t: pa.Table) -> pa.Table:
        urls = t['url'].to_pylist()
        texts = t['text'].to_pylist()
        cs = [int.from_bytes(
            hashlib.sha256(f'{u}\n{x}'.encode()).digest()[:4], 'big')
            for u, x in zip(urls, texts)]
        ts_us = pc.cast(t['warc_date'], pa.int64())
        return pa.table({
            'lang': t['lang'],
            'n_chars': pc.cast(pc.utf8_length(t['text']), pa.int64()),
            'ts_sec': pc.divide(ts_us, 1_000_000),
            'ts_frac': pc.subtract(ts_us, pc.multiply(
                pc.divide(ts_us, 1_000_000), 1_000_000)),
            'checksum': pa.array(cs, pa.int64()),
        })

    return (ds.map_batches(per_record, batch_format='pyarrow')
            .groupby('lang')
            .aggregate(Count(alias_name='n_records'),
                       Sum('n_chars', alias_name='total_chars'),
                       Sum('ts_sec', alias_name='ts_sec_sum'),
                       Sum('ts_frac', alias_name='ts_frac_sum'),
                       Sum('checksum', alias_name='checksum')))


def rolling_agg_events(sf_dir: str):
    """Per-user trailing-3-event rolling sum/min (feature-engineering
    windowed aggregate; exact integer cents)."""
    from ..ops.window import rolling_agg
    ds = read_parquet_clean(_p(sf_dir, 'events'),
                            columns=['user_id', 'ts', 'event_id', 'value'])
    return rolling_agg(ds, key='user_id', ts_col='ts', id_col='event_id',
                       value_col='value', window=3,
                       small=_small_table(sf_dir, 'events'))


def range_join_events(sf_dir: str):
    """Interval (range) join: every event lands in each 1-day attribution
    window opened by a purchase event of the same user (half-open
    ``[purchase_ts, purchase_ts + 1d)``), rolled up per window with exact
    integer cents.  Exercises ``ops.window.range_join`` — broadcast plan
    when the events file is plan-time small, banded hash join otherwise
    (band = window width, so each interval replicates at most twice)."""
    from ..ops.agg import grouped_agg
    from ..ops.window import range_join
    day_us = 24 * 3600 * 1_000_000
    ds = read_parquet_clean(_p(sf_dir, 'events'),
                            columns=['user_id', 'ts', 'event_id',
                                     'event_type', 'value'])

    def windows(t: pa.Table) -> pa.Table:
        w = t.filter(pc.equal(t['event_type'], 'purchase'))
        lo = pc.cast(w['ts'], pa.int64())
        return pa.table({'user_id': w['user_id'], 'wid': w['event_id'],
                         'lo_us': lo,
                         'hi_us': pc.add(lo, pa.scalar(day_us, pa.int64()))})

    small = _small_table(sf_dir, 'events')
    joined = range_join(
        ds.select_columns(['user_id', 'ts', 'event_id', 'value']),
        ds.map_batches(windows, batch_format='pyarrow'),
        key='user_id', ts_col='ts', band_us=day_us, broadcast=small)

    def partial(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.floor(pc.multiply(t['value'], pa.scalar(100.0))),
                        pa.int64())
        return pa.table({'wid': t['wid'], 'event_id': t['event_id'],
                         'value_cents': cents})

    return grouped_agg(
        joined.map_batches(partial, batch_format='pyarrow'), ['wid'],
        [(None, 'count', 'n_events'),
         ('value_cents', 'sum', 'sum_value_cents'),
         ('event_id', 'max', 'max_event_id')], small=small)


def pagerank_documents(sf_dir: str):
    """Fixed-point PageRank (3 iterations, d=0.85, 1e12 mass units) over a
    deterministic citation graph on the documents table: doc ``i`` links to
    ``(i*31 + 977*j) % N`` for ``j = 1..(i % 4)`` (so ~25% of nodes dangle).
    Integer arithmetic end-to-end — the SQL twin is hash-exact."""
    from ..ops.graph import pagerank
    ds = read_parquet_clean(_p(sf_dir, 'documents'), columns=['doc_id'])
    n = ds.count()

    def edges_fn(t: pa.Table) -> pa.Table:
        ids = pc.cast(t['doc_id'], pa.int64()).to_numpy(zero_copy_only=False)
        k = ids % 4
        src = np.repeat(ids, k)
        starts = np.concatenate(([0], np.cumsum(k)))[:-1]
        j = np.arange(int(k.sum()), dtype=np.int64) - np.repeat(starts, k) + 1
        dst = (src * 31 + 977 * j) % n
        return pa.table({'src': pa.array(src), 'dst': pa.array(dst)})

    edges = ds.map_batches(edges_fn, batch_format='pyarrow')

    def rename(t: pa.Table) -> pa.Table:
        return t.rename_columns(['doc_id', 'rank_fp'])

    return pagerank(edges, n).map_batches(rename, batch_format='pyarrow')


def tfidf_top_terms_documents(sf_dir: str):
    """Per-document top-3 TF-IDF terms with integer-quantized idf
    (``tf * (floor_log2(N // df) + 1)``) — exact int64 scoring, ties by
    (score DESC, token ASC), hash-checked against the SQL window-function
    twin."""
    from ..ops.text import tfidf_top_terms
    ds = read_parquet_clean(_p(sf_dir, 'documents'), columns=['doc_id', 'text'])
    return tfidf_top_terms(ds, k_top=3, small=_small(sf_dir, 'documents'))


def token_freq_spectrum_documents(sf_dir: str):
    """Zipf frequency spectrum (count-of-counts): how many distinct tokens
    occur exactly f times corpus-wide — nested aggregation, both levels on
    block-local partials."""
    from ..ops.agg import grouped_agg
    from ..ops.text import regex_tokens
    ds = read_parquet_clean(_p(sf_dir, 'documents'), columns=['text'])
    small = _small(sf_dir, 'documents')

    def tok_partial(t: pa.Table) -> pa.Table:
        flat, _ = regex_tokens(t['text'])
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        vc = flat.value_counts() if len(flat) else None
        if vc is None or len(vc) == 0:
            return pa.table({'token': pa.array([], pa.string()),
                             '__n': pa.array([], pa.int64())})
        return pa.table({'token': pc.cast(vc.field('values'), pa.string()),
                         '__n': pc.cast(vc.field('counts'), pa.int64())})

    counts = grouped_agg(ds.map_batches(tok_partial, batch_format='pyarrow'),
                         ['token'], [('__n', 'sum', 'freq')], small=small)

    def spec_partial(t: pa.Table) -> pa.Table:
        return pa.table({'freq': t['freq'],
                         '__one': pa.array(np.ones(t.num_rows, np.int64))})

    return grouped_agg(counts.map_batches(spec_partial, batch_format='pyarrow'),
                       ['freq'], [('__one', 'sum', 'n_tokens')], small=small)


def kmv_distinct_texts_documents(sf_dir: str):
    """KMV (bottom-64) distinct-count sketch over the documents' text
    values — deterministic given the sha256 hash, so the sketch itself
    (kept count, k-th minimum, estimate) is hash-checked against SQL."""
    from ..ops.sketch import kmv_distinct
    ds = read_parquet_clean(_p(sf_dir, 'documents'), columns=['text'])
    return kmv_distinct(ds, col='text', k=64)


def inverted_index_documents(sf_dir: str):
    """Distributed inverted index over the documents corpus: per token,
    document frequency, min/max doc id and the full ascending posting list
    (comma-joined — byte-equal to DuckDB's ordered string_agg)."""
    ds = read_parquet_clean(_p(sf_dir, 'documents'), columns=['doc_id', 'text'])
    return text_ops.inverted_index(ds, min_df=25,
                                   small=_small(sf_dir, 'documents'))


def connected_components_documents(sf_dir: str):
    """Connected components over a deterministic sparse chain graph on
    doc_ids (edge ``i -> i+3`` when ``i % 9 < 6``: three-node chains per
    residue class, some pairs at corpus edges).  Labels = min reachable id,
    involved nodes only — matching the recursive-closure SQL twin."""
    from ..ops.graph import connected_components
    ds = read_parquet_clean(_p(sf_dir, 'documents'), columns=['doc_id'])
    n = ds.count()

    def edges_fn(t: pa.Table) -> pa.Table:
        ids = pc.cast(t['doc_id'], pa.int64()).to_numpy(zero_copy_only=False)
        keep = (ids % 9 < 6) & (ids + 3 < n)
        s = ids[keep]
        return pa.table({'src': pa.array(s), 'dst': pa.array(s + 3)})

    edges = ds.map_batches(edges_fn, batch_format='pyarrow')
    return connected_components(edges, id_col='doc_id')


def normalize_text_documents(sf_dir: str):
    """Unicode NFC + control-strip + whitespace-collapse + trim over the
    documents corpus, with deterministic per-row mess injected by
    ``doc_id % 4`` so every normalization rule is exercised (combining
    acute -> composed é, Angstrom sign -> Å, control/tab characters,
    edge whitespace).  DuckDB's utf8proc NFC and CPython's unicodedata
    produce identical bytes (hash-checked)."""
    from ..ops.text import normalize_text
    ds = read_parquet_clean(_p(sf_dir, 'documents'),
                            columns=['doc_id', 'text'])

    def mess(t: pa.Table) -> pa.Table:
        m = pc.bit_wise_and(pc.cast(t['doc_id'], pa.int64()), 3)
        txt = t['text']
        v0 = pc.binary_join_element_wise(txt, ' Cafe\u0301', '')
        v1 = pc.binary_join_element_wise(txt, ' \u212Bngstrom', '')
        v2 = pc.binary_join_element_wise(txt, '\x07bell\ttab', '')
        v3 = pc.binary_join_element_wise('  ', txt, '  ', '')
        messed = pc.if_else(pc.equal(m, 0), v0,
                            pc.if_else(pc.equal(m, 1), v1,
                                       pc.if_else(pc.equal(m, 2), v2, v3)))
        return pa.table({'doc_id': t['doc_id'], 'text': messed})

    out = normalize_text(ds.map_batches(mess, batch_format='pyarrow'))
    return out.select_columns(['doc_id', 'norm_text', 'n_chars_norm'])


def split_documents(sf_dir: str):
    """Deterministic 90/5/5 train/val/test assignment by seeded Knuth hash
    (bucket = h % 100; reproducible on any layout) — per-split doc counts
    and char sums so the hash covers every assignment."""
    from ..ops.agg import grouped_agg
    from ..ops.sample import split_by_hash
    ds = read_parquet_clean(_p(sf_dir, 'documents'),
                            columns=['doc_id', 'n_chars'])
    out = split_by_hash(ds, seed=7)

    def partial(t: pa.Table) -> pa.Table:
        return pa.table({'split': t['split'],
                         'n_docs': pa.array(np.ones(t.num_rows, np.int64)),
                         'sum_chars': pc.cast(t['n_chars'], pa.int64()),
                         'max_doc': pc.cast(t['doc_id'], pa.int64())})

    return grouped_agg(out.map_batches(partial, batch_format='pyarrow'),
                       ['split'],
                       [('n_docs', 'sum', 'n_docs'),
                        ('sum_chars', 'sum', 'sum_chars'),
                        ('max_doc', 'max', 'max_doc')],
                       small=_small_table(sf_dir, 'documents'))


def grouped_quantiles_events(sf_dir: str):
    """Exact per-user value quantiles (p50/p90 of integer cents, index
    semantics ``(p*(n-1))//100`` — ROW_NUMBER-replicable)."""
    from ..ops.agg import grouped_quantiles
    ds = read_parquet_clean(_p(sf_dir, 'events'), columns=['user_id', 'value'])

    def cents(t: pa.Table) -> pa.Table:
        return pa.table({
            'user_id': t['user_id'],
            'v_cents': pc.cast(pc.floor(pc.multiply(
                t['value'], pa.scalar(100.0))), pa.int64())})

    return grouped_quantiles(ds.map_batches(cents, batch_format='pyarrow'),
                             'user_id', 'v_cents', percents=(50, 90),
                             small=_small_table(sf_dir, 'events'))


def top_customers(sf_dir: str):
    from ..ops.agg import grouped_agg
    ds = read_parquet_clean(_p(sf_dir, 'orders'), columns=['o_custkey'])
    agg = grouped_agg(ds, ['o_custkey'], [(None, 'count', 'n_orders')],
                      small=_small_table(sf_dir, 'orders'))
    return agg.sort(['n_orders', 'o_custkey'], descending=[True, False]).limit(10)


def fingerprint_documents(sf_dir: str):
    ds = read_parquet_clean(_p(sf_dir, 'documents'), columns=['doc_id', 'text'])
    return text_ops.fingerprint(ds).select_columns(['doc_id', 'fingerprint'])


def ann_topk_embeddings(sf_dir: str):
    """Exact cosine top-10 of the first 5 vectors over all embeddings."""
    ds = read_parquet_clean(_p(sf_dir, 'embeddings'), columns=['vec_id', 'embedding'])
    import pyarrow.parquet as pq
    head = pq.read_table(_p(sf_dir, 'embeddings'), columns=['vec_id', 'embedding']) \
        .sort_by('vec_id').slice(0, 5)
    qids = np.asarray(head['vec_id'].to_pylist(), dtype=np.int64)
    Q = np.asarray(head['embedding'].to_pylist(), dtype=np.float32)
    out = sim_ops.brute_force_topk(ds, Q, qids, k=10)
    return out.select(['query_id', 'neighbor_id'])


def embedding_neardup_pairs(sf_dir: str):
    """Exact cosine near-dup pairs over the embeddings table — each batch
    matmuls against the broadcast corpus matrix; SQL-oracle-checked."""
    ds = read_parquet_clean(_p(sf_dir, 'embeddings'), columns=['vec_id', 'embedding'])
    out = dedup_ops.embedding_neardup_pairs(ds, threshold=0.5)
    return out.select_columns(['id_a', 'id_b'])


def jaccard_verified_pairs_documents(sf_dir: str):
    """MinHash-LSH candidates filtered by exact 5-word-shingle Jaccard via
    the bucketed text join.  Oracle-checked: the shingle-set Jaccard is
    replicated with DuckDB list kernels; equality with the all-pairs SQL is
    the banded-LSH recall-1.0 claim on this corpus (near-dup pairs sit at
    j~0.99 where the 16x4 band miss probability is ~1e-22; the corpus has no
    pairs near the 0.5 threshold — verified at sf 0.001/0.01/0.1)."""
    ds = read_parquet_clean(_p(sf_dir, 'documents'), columns=['doc_id', 'text'])
    pairs = dedup_ops.minhash_lsh_candidates(ds, small=_small(sf_dir, 'documents'))
    out = dedup_ops.verify_pairs_jaccard(pairs, ds, threshold=0.5)
    return out.select_columns(['id_a', 'id_b'])


def ngram_jaccard_pairs_documents(sf_dir: str):
    """Character-3-gram Jaccard over the word5-verified near-dup pairs:
    LSH candidates -> exact word-shingle verification (>= 0.5) -> per-pair
    char-3-gram set overlap emitted as INTEGER (inter, uni) counts.  The
    oracle recomputes both the pair set and the gram counts with DuckDB
    list kernels — integer outputs hash stably."""
    ds = read_parquet_clean(_p(sf_dir, 'documents'), columns=['doc_id', 'text'])
    pairs = dedup_ops.minhash_lsh_candidates(ds, small=_small(sf_dir, 'documents'))
    verified = dedup_ops.verify_pairs_jaccard(pairs, ds, threshold=0.5)
    out = dedup_ops.verify_pairs_jaccard(
        verified.select_columns(['id_a', 'id_b']), ds, metric='char3', emit='counts')
    return out.select_columns(['id_a', 'id_b', 'inter', 'uni'])


def embedding_neardup_clusters(sf_dir: str):
    """Near-dup clusters over embeddings: EXACT cosine pairs (streamed
    broadcast matmul — right at this corpus' dimension scale) + join-based
    min-label propagation to convergence.  Oracle: recursive-CTE connected
    components over the exact cosine pair SQL.  This mid-threshold regime
    (0.5, inside the corpus' random cosine tail) is exactly where banded
    sign-LSH recall is intrinsically probabilistic — the angular gap between
    a 0.5-cosine pair (p=0.67/bit) and background (p=0.5/bit) is too weak to
    amplify — so the EXACT path is the right tool here and the sign-LSH twin
    ``embedding_neardup_clusters_lsh`` is pinned (and oracle-checked) in the
    high-threshold regime instead."""
    ds = read_parquet_clean(_p(sf_dir, 'embeddings'), columns=['vec_id', 'embedding'])
    pairs = dedup_ops.embedding_neardup_pairs(ds, threshold=0.5)
    return dedup_ops.min_label_clusters(pairs, id_col='vec_id')


def minhash_dedup_documents(sf_dir: str):
    """Full MinHash-LSH near-dup clustering (candidates -> shingle-Jaccard
    verification -> min-label propagation to convergence).  Oracle:
    recursive-CTE connected components over the exact shingle-Jaccard pair
    SQL (see ``jaccard_verified_pairs_documents`` for the recall claim)."""
    ds = read_parquet_clean(_p(sf_dir, 'documents'), columns=['doc_id', 'text'])
    return dedup_ops.minhash_dedup_clusters(ds, small=_small(sf_dir, 'documents'))


def lang_id_documents(sf_dir: str):
    """Marker-based language ID.  Oracle-checked: the marker substring
    counts and first-argmax tie-break are replicated exactly in SQL."""
    ds = read_parquet_clean(_p(sf_dir, 'documents'), columns=['doc_id', 'text'])
    return text_ops.lang_id(ds).select_columns(['doc_id', 'lang_pred'])


def embedding_neardup_clusters_lsh(sf_dir: str):
    """Sign-LSH bucketed near-dup clustering — the 100-TB scale path (one
    banded shuffle + bucketed verification joins + convergent min-label
    propagation) — exercised in the regime banded sign-LSH is designed for:
    a high threshold (0.95) with a clean margin over the corpus' random
    cosine tail (<=0.61).  Deterministic near-dups are planted by cloning
    every ``vec_id % 50 == 0`` vector as ``vec_id + 1_000_000`` — derived
    from the table itself, so the SQL oracle replicates the corpus with a
    UNION ALL.  Identical vectors share every band bucket (equal signatures),
    and 32 hyperplanes per band make random collisions ~2^-32, so candidate
    generation is deterministic and the output hash-matches the exact
    recursive-CTE connected components."""
    ds = read_parquet_clean(_p(sf_dir, 'embeddings'), columns=['vec_id', 'embedding'])

    def add_clones(t: pa.Table) -> pa.Table:
        ids = t['vec_id'].to_numpy(zero_copy_only=False)
        m = (ids % 50) == 0
        if not m.any():
            return t
        ct = t.filter(pa.array(m))
        cid = pa.array(ct['vec_id'].to_numpy(zero_copy_only=False) + 1_000_000)
        ct = ct.set_column(ct.column_names.index('vec_id'), 'vec_id', cid)
        return pa.concat_tables([t, ct])

    corpus = ds.map_batches(add_clones, batch_format='pyarrow')
    return dedup_ops.embedding_neardup_clusters(
        corpus, threshold=0.95, num_hyperplanes=256, bands=8)


def simhash_neardup_pairs_documents(sf_dir: str):
    """SimHash near-dup pairs (hamming <= 3) via Hamming-ball banding —
    the third near-dup family end-to-end; hash-checked against the exact
    all-pairs popcount SQL over the recomputed signatures."""
    ds = read_parquet_clean(_p(sf_dir, 'documents'), columns=['doc_id', 'text'])
    return dedup_ops.simhash_neardup_pairs(
        ds, max_hamming=3, small=_small_table(sf_dir, 'documents'))


def simhash_documents(sf_dir: str):
    """SimHash signatures (oracle-checked: the sha256 word hash is
    recomputed bit-exactly in DuckDB SQL)."""
    ds = read_parquet_clean(_p(sf_dir, 'documents'), columns=['doc_id', 'text'])
    return dedup_ops.simhash(ds).select_columns(['doc_id', 'simhash'])


def ivf_ann_embeddings(sf_dir: str):
    """IVF ANN with k-means centroids (seeded hash-sample init + Lloyd
    rounds).  nprobe=3 of 8 buckets achieves recall@10 = 1.0 on this corpus,
    so the result is oracle-checked against the exact-top-k SQL."""
    ds = read_parquet_clean(_p(sf_dir, 'embeddings'), columns=['vec_id', 'embedding'])
    import pyarrow.parquet as pq
    head = pq.read_table(_p(sf_dir, 'embeddings'), columns=['vec_id', 'embedding']).sort_by('vec_id').slice(0, 5)
    qids = np.asarray(head['vec_id'].to_pylist(), dtype=np.int64)
    Q = np.asarray(head['embedding'].to_pylist(), dtype=np.float32)
    out = sim_ops.ivf_topk(ds, Q, qids, k=10, num_centroids=8, nprobe=3)
    return out.select(['query_id', 'neighbor_id'])


def ivf_recall_embeddings(sf_dir: str):
    """Build the partitioned IVF index layout (Parquet bucketed by
    centroid_id), probe it with read-pruning, and report recall@10 against
    the exact scan — exercises the full build/probe path end-to-end."""
    import tempfile

    ds = read_parquet_clean(_p(sf_dir, 'embeddings'), columns=['vec_id', 'embedding'])
    import pyarrow.parquet as pq
    head = pq.read_table(_p(sf_dir, 'embeddings'), columns=['vec_id', 'embedding']).sort_by('vec_id').slice(0, 5)
    qids = np.asarray(head['vec_id'].to_pylist(), dtype=np.int64)
    Q = np.asarray(head['embedding'].to_pylist(), dtype=np.float32)
    exact = sim_ops.brute_force_topk(ds, Q, qids, k=10)
    with tempfile.TemporaryDirectory(prefix='ivf_idx_') as idx:
        sim_ops.ivf_build(ds, idx, num_centroids=8)
        approx = sim_ops.ivf_probe(idx, Q, qids, k=10, nprobe=3)
    want: dict = {}
    for q, n in zip(exact['query_id'].to_pylist(), exact['neighbor_id'].to_pylist()):
        want.setdefault(q, set()).add(n)
    got: dict = {}
    for q, n in zip(approx['query_id'].to_pylist(), approx['neighbor_id'].to_pylist()):
        got.setdefault(q, set()).add(n)
    recalls = [len(want[q] & got.get(q, set())) / len(want[q]) for q in want]
    return pa.table({'n_queries': pa.array([len(want)], pa.int64()),
                     'recall_at_10': pa.array([float(np.mean(recalls))], pa.float64())})


def multimodal_image_features(sf_dir: str):
    """Binary-column plumbing: treat doc text bytes as opaque payloads and
    run the (stubbed) decode actor pool over them."""
    from ..ops.multimodal import decode_images
    ds = read_parquet_clean(_p(sf_dir, 'documents'), columns=['doc_id', 'text'])

    def to_binary(t: pa.Table) -> pa.Table:
        blobs = [x.encode('utf-8') for x in t['text'].to_pylist()]
        return pa.table({'doc_id': t['doc_id'], 'image': pa.array(blobs, pa.large_binary())})

    ds = ds.map_batches(to_binary, batch_format='pyarrow')
    return decode_images(ds, concurrency=2).select_columns(['doc_id', 'width', 'height'])


def multimodal_real_decode(sf_dir: str):
    """REAL in-container image decode (BMP, pure numpy — no codec libs):
    each doc gets a solid-color BMP whose dims/color derive from doc_id; the
    decode actor pool recovers ACTUAL pixels (width, height, per-channel
    mean) and the oracle recomputes them arithmetically.  Unlike
    ``multimodal_image_features`` (which oracle-checks the sha256 fake used
    for codec-gated formats), this checks true pixel decoding end-to-end."""
    import struct

    from ..ops.multimodal import decode_images
    ds = read_parquet_clean(_p(sf_dir, 'documents'), columns=['doc_id'])

    def solid_bmp(w: int, h: int, rgb: tuple) -> bytes:
        row = w * 3
        pad = (4 - row % 4) % 4
        line = bytes(rgb[::-1]) * w + b'\0' * pad
        body = line * h
        hdr = struct.pack('<2sIHHI', b'BM', 54 + len(body), 0, 0, 54)
        dib = struct.pack('<IiiHHIIiiII', 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
        return hdr + dib + body

    def to_bmp(t: pa.Table) -> pa.Table:
        ids = t['doc_id'].to_numpy(zero_copy_only=False)
        blobs = [solid_bmp(4 + int(i) % 5, 3 + int(i) % 7,
                           (int(i) % 256, (int(i) * 7) % 256, (int(i) * 13) % 256))
                 for i in ids]
        return pa.table({'doc_id': t['doc_id'], 'image': pa.array(blobs, pa.large_binary())})

    out = decode_images(ds.map_batches(to_bmp, batch_format='pyarrow'), concurrency=2)

    def finalize(t: pa.Table) -> pa.Table:
        # features[0] is the real red-channel mean in [0,1]; scale back to the
        # exact 0-255 color byte for an integer-stable oracle compare
        red = pc.list_element(t['features'], 0)
        red255 = pc.round(pc.multiply(pc.cast(red, pa.float64()), 255.0))
        return pa.table({'doc_id': t['doc_id'], 'width': t['width'],
                         'height': t['height'],
                         'red_mean_255': pc.cast(red255, pa.int64())})

    return out.map_batches(finalize, batch_format='pyarrow')


def multimodal_jpeg_decode(sf_dir: str):
    """REAL baseline-JPEG decode end-to-end (pure-numpy T.81 huffman+IDCT,
    ops/jpeg.py): each doc gets a constant-gray JPEG whose size/value
    derive from doc_id (non-multiple-of-8 sizes exercise MCU padding and
    multi-block scans); blockwise-constant images round-trip EXACTLY with
    the unit quantization table, so the oracle recomputes width/height/mean
    arithmetically and the compare is hash-exact."""
    import numpy as np

    from ..ops.jpeg import encode_gray_jpeg
    from ..ops.multimodal import decode_images
    ds = read_parquet_clean(_p(sf_dir, 'documents'), columns=['doc_id'])

    def to_jpeg(t: pa.Table) -> pa.Table:
        ids = t['doc_id'].to_numpy(zero_copy_only=False)
        blobs = [encode_gray_jpeg(np.full((8 + int(i) % 5, 8 + int(i) % 9),
                                          int(i) % 256, np.uint8))
                 for i in ids]
        return pa.table({'doc_id': t['doc_id'],
                         'image': pa.array(blobs, pa.large_binary())})

    out = decode_images(ds.map_batches(to_jpeg, batch_format='pyarrow'), concurrency=2)

    def finalize(t: pa.Table) -> pa.Table:
        gray = pc.list_element(t['features'], 0)
        gray255 = pc.round(pc.multiply(pc.cast(gray, pa.float64()), 255.0))
        return pa.table({'doc_id': t['doc_id'], 'width': t['width'],
                         'height': t['height'],
                         'gray_mean_255': pc.cast(gray255, pa.int64())})

    return out.map_batches(finalize, batch_format='pyarrow')


def web_kg_construction(sf_dir: str):
    """Flagship pipeline over a deterministic synthetic page corpus sized by
    the sf of the input dir (rows-only check; the bnode-free triple set is
    also covered by unit tests against the per-row extraction invariant)."""
    from .pages import pages_parquet_dir
    from .web import web_kg_triples
    sf = sf_dir.rstrip('/').rsplit('sf', 1)[-1]
    rows = {'0.001': 1000, '0.01': 5000, '0.1': 20000}.get(sf, 2000)
    from ..engine.dedup import _ray_cpus
    pages = read_parquet_clean(pages_parquet_dir(rows), columns=['url', 'warc_ts', 'html', 'lang'],
                               override_num_blocks=2 * _ray_cpus())
    return web_kg_triples(pages)


QUERIES = {
    'rml_customer_triples': rml_customer_triples,
    'rml_join_order_customer': rml_join_order_customer,
    'rml_lineitem_datatype': rml_lineitem_datatype,
    'rml_events_nquads': rml_events_nquads,
    'rml_documents_lang': rml_documents_lang,
    'dedup_exact_documents': dedup_exact_documents,
    'token_count_documents': token_count_documents,
    'token_count_bpe_documents': token_count_bpe_documents,
    'quality_stats_documents': quality_stats_documents,
    'repetition_stats_documents': repetition_stats_documents,
    'decontaminate_documents': decontaminate_documents,
    'chunk_documents_windows': chunk_documents_windows,
    'quality_filter_documents': quality_filter_documents,
    'unigram_lm_documents': unigram_lm_documents,
    'bloom_blocklist_documents': bloom_blocklist_documents,
    'cap_per_source_documents': cap_per_source_documents,
    'lang_count_documents': lang_count_documents,
    'events_hourly_user_agg': events_hourly_user_agg,
    'sessionize_events': sessionize_events,
    'asof_view_attribution_events': asof_view_attribution_events,
    'rolling_agg_events': rolling_agg_events,
    'range_join_events': range_join_events,
    'pagerank_documents': pagerank_documents,
    'normalize_text_documents': normalize_text_documents,
    'connected_components_documents': connected_components_documents,
    'inverted_index_documents': inverted_index_documents,
    'kmv_distinct_texts_documents': kmv_distinct_texts_documents,
    'remove_boilerplate_pages': remove_boilerplate_pages,
    'tfidf_top_terms_documents': tfidf_top_terms_documents,
    'token_freq_spectrum_documents': token_freq_spectrum_documents,
    'remove_dup_spans_documents': remove_dup_spans_documents,
    'curate_corpus_documents': curate_corpus_documents,
    'grouped_quantiles_events': grouped_quantiles_events,
    'split_documents': split_documents,
    'pack_sequences_documents': pack_sequences_documents,
    'pii_redact_documents': pii_redact_documents,
    'boilerplate_paragraphs_pages': boilerplate_paragraphs_pages,
    'url_domain_stats_pages': url_domain_stats_pages,
    'wet_roundtrip_pages': wet_roundtrip_pages,
    'top_ngrams_documents': top_ngrams_documents,
    'dup_spans_documents': dup_spans_documents,
    'stratified_sample_documents': stratified_sample_documents,
    'mixture_sample_documents': mixture_sample_documents,
    'quantize_embeddings_int8': quantize_embeddings_int8,
    'top_customers': top_customers,
    'fingerprint_documents': fingerprint_documents,
    'ann_topk_embeddings': ann_topk_embeddings,
    'embedding_neardup_pairs': embedding_neardup_pairs,
    'ngram_jaccard_pairs_documents': ngram_jaccard_pairs_documents,
    'embedding_neardup_clusters': embedding_neardup_clusters,
    'embedding_neardup_clusters_lsh': embedding_neardup_clusters_lsh,
    'jaccard_verified_pairs_documents': jaccard_verified_pairs_documents,
    'minhash_dedup_documents': minhash_dedup_documents,
    'simhash_documents': simhash_documents,
    'simhash_neardup_pairs_documents': simhash_neardup_pairs_documents,
    'lang_id_documents': lang_id_documents,
    'ivf_ann_embeddings': ivf_ann_embeddings,
    'ivf_recall_embeddings': ivf_recall_embeddings,
    'multimodal_image_features': multimodal_image_features,
    'multimodal_real_decode': multimodal_real_decode,
    'multimodal_jpeg_decode': multimodal_jpeg_decode,
    'web_kg_construction': web_kg_construction,
}

# DuckDB lambda body for an 8-token gram starting at 1-based index i:
# ts[i] || chr(1) || ts[i+1] || ... || ts[i+7]
_GRAM8 = " || chr(1) || ".join(
    f"ts[i + {j}]" if j else "ts[i]" for j in range(8))

ORACLE_SQL = {
    'rml_customer_triples': f'''
        SELECT '<{EX}/customer/' || CAST(c_custkey AS VARCHAR) || '>' AS subject,
               '<{RDF_TYPE_IRI}>' AS predicate,
               '<{EX}/ontology/Customer>' AS object
        FROM customer
        UNION
        SELECT '<{EX}/customer/' || CAST(c_custkey AS VARCHAR) || '>',
               '<http://xmlns.com/foaf/0.1/name>',
               '"' || c_name || '"'
        FROM customer
    ''',
    'rml_join_order_customer': f'''
        SELECT DISTINCT '<{EX}/order/' || CAST(o_orderkey AS VARCHAR) || '>' AS subject,
               '<{EX}/ontology/placedBy>' AS predicate,
               '<{EX}/customer/' || CAST(c_custkey AS VARCHAR) || '>' AS object
        FROM orders JOIN customer ON o_custkey = c_custkey
    ''',
    'rml_lineitem_datatype': f'''
        SELECT DISTINCT '<{EX}/order/' || CAST(l_orderkey AS VARCHAR) || '/line/'
                 || CAST(l_linenumber AS VARCHAR) || '>' AS subject,
               '<{EX}/ontology/quantity>' AS predicate,
               '"' || CAST(CAST(TRUNC(l_quantity) AS BIGINT) AS VARCHAR)
                 || '"^^<{XSD_INT}>' AS object
        FROM lineitem
    ''',
    'rml_events_nquads': f'''
        SELECT DISTINCT '<{EX}/event/' || CAST(event_id AS VARCHAR) || '>' AS subject,
               '<{EX}/ontology/ts>' AS predicate,
               '"' || REPLACE(CAST(ts AS VARCHAR), ' ', 'T')
                 || '"^^<http://www.w3.org/2001/XMLSchema#dateTime>' AS object,
               '<{EX}/graph/' || event_type || '>' AS graph
        FROM events
    ''',
    'rml_documents_lang': f'''
        SELECT DISTINCT '<{EX}/doc/' || CAST(doc_id AS VARCHAR) || '>' AS subject,
               '<http://schema.org/text>' AS predicate,
               '"' || text || '"@' || lang AS object
        FROM documents
    ''',
    'dedup_exact_documents': '''
        SELECT text, MIN(doc_id) AS doc_id FROM documents GROUP BY text
    ''',
    'token_count_documents': r'''
        SELECT doc_id,
               CASE WHEN trim(text) = '' THEN 0
                    ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens
        FROM documents
    ''',
    'token_count_bpe_documents': r'''
        SELECT doc_id,
               len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))
                 AS n_bpe_tokens
        FROM documents
    ''',
    'quality_stats_documents': r'''
        SELECT doc_id,
               length(text) AS n_chars_computed,
               length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')) AS n_upper,
               length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digit
        FROM documents
    ''',
    'chunk_documents_windows': r'''
        WITH toks AS (
          SELECT doc_id,
                 regexp_extract_all(coalesce(text, ''), '[0-9A-Za-z_]+') AS ts
          FROM documents),
        starts AS (
          SELECT doc_id, ts, unnest(range(0, len(ts), 24)) AS s
          FROM toks WHERE len(ts) > 0)
        SELECT doc_id,
               CAST(s // 24 AS BIGINT) AS chunk_id,
               CAST(least(len(ts) - s, 32) AS BIGINT) AS n_chunk_tokens,
               array_to_string(list_slice(ts, s + 1, least(s + 32, len(ts))),
                               ' ') AS chunk_text
        FROM starts
    ''',
    'top_ngrams_documents': '''
        WITH toks AS (
          SELECT regexp_extract_all(coalesce(text, ''), '[0-9A-Za-z_]+') AS ts
          FROM documents),
        grams AS (
          SELECT unnest(list_transform(range(1, len(ts)),
                                       i -> ts[i] || ' ' || ts[i + 1])) AS ngram
          FROM toks)
        SELECT ngram, CAST(COUNT(*) AS BIGINT) AS n
        FROM grams GROUP BY ngram
        ORDER BY n DESC, ngram ASC LIMIT 20
    ''',
    'dup_spans_documents': '''
        WITH toks AS (
          SELECT doc_id,
                 regexp_extract_all(coalesce(text, ''), '[0-9A-Za-z_]+') AS ts
          FROM documents),
        g AS (
          SELECT DISTINCT doc_id, gram FROM (
            SELECT doc_id,
                   unnest(list_transform(range(1, len(ts) - 6),
                                         i -> ''' + _GRAM8 + ''')) AS gram
            FROM toks)),
        dup AS (SELECT gram FROM g GROUP BY gram HAVING COUNT(*) >= 2)
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_dup_spans
        FROM g JOIN dup USING (gram) GROUP BY doc_id
    ''',
    # end-to-end curation: quality/lang filter -> exact dedup ->
    # decontaminate -> 32/24 chunking, spliced from the component oracles
    'curate_corpus_documents': r'''
        WITH q AS (
          SELECT doc_id, text FROM (
            SELECT doc_id, text,
                   1.0 - LEAST(1.0,
                     ( (length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g')))
                     + (length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))
                     + 0.5 * (length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')))
                     ) / GREATEST(length(text), 1)) AS score,
                   CASE WHEN trim(text) = '' THEN 0
                        ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tok
            FROM documents WHERE lang IN ('en', 'de', 'fr'))
          WHERE score >= 0.8 AND n_tok >= 5),
        reps AS (SELECT text, MIN(doc_id) AS doc_id FROM q GROUP BY text),
        toks_all AS (
          SELECT doc_id,
                 regexp_extract_all(coalesce(text, ''), '[0-9A-Za-z_]+') AS ts
          FROM documents),
        bench AS (
          SELECT DISTINCT gram FROM (
            SELECT unnest(list_transform(range(1, len(sl) - 6),
                                         i -> ''' + _GRAM8.replace('ts[', 'sl[') + r''')) AS gram
            FROM (SELECT list_slice(ts, 6, 20) AS sl
                  FROM toks_all WHERE doc_id % 97 = 0))),
        tq AS (
          SELECT doc_id,
                 regexp_extract_all(coalesce(text, ''), '[0-9A-Za-z_]+') AS ts
          FROM reps),
        contaminated AS (
          SELECT DISTINCT doc_id FROM (
            SELECT doc_id,
                   unnest(list_transform(range(1, len(ts) - 6),
                                         i -> ''' + _GRAM8 + r''')) AS gram
            FROM tq) g JOIN bench USING (gram)),
        clean AS (SELECT tq.* FROM tq ANTI JOIN contaminated USING (doc_id)),
        starts AS (
          SELECT doc_id, ts, unnest(range(0, len(ts), 24)) AS s
          FROM clean WHERE len(ts) > 0)
        SELECT doc_id, CAST(s // 24 AS BIGINT) AS chunk_id,
               CAST(least(len(ts) - s, 32) AS BIGINT) AS n_chunk_tokens,
               array_to_string(list_slice(ts, s + 1, least(s + 32, len(ts))),
                               ' ') AS chunk_text
        FROM starts
    ''',
    # substring-dedup rewrite: tokens covered by any corpus-shared 8-gram
    # drop; parallel UNNESTs zip (i, gram) so spans carry their positions
    'remove_dup_spans_documents': '''
        WITH toks AS (
          SELECT doc_id,
                 regexp_extract_all(coalesce(text, ''), '[0-9A-Za-z_]+') AS ts
          FROM documents),
        g AS (
          SELECT doc_id,
                 UNNEST(range(1, len(ts) - 6)) AS i,
                 UNNEST(list_transform(range(1, len(ts) - 6),
                                       i -> ''' + _GRAM8 + ''')) AS gram
          FROM toks),
        dup AS (
          SELECT gram FROM (SELECT DISTINCT doc_id, gram FROM g)
          GROUP BY gram HAVING COUNT(*) >= 2),
        cov AS (
          SELECT DISTINCT g.doc_id, UNNEST(range(g.i, g.i + 8)) AS pos
          FROM g JOIN dup USING (gram)),
        p AS (
          SELECT doc_id, UNNEST(ts) AS tok,
                 UNNEST(range(1, len(ts) + 1)) AS pos
          FROM toks),
        kept AS (SELECT p.* FROM p ANTI JOIN cov USING (doc_id, pos)),
        agg AS (
          SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS clean_text,
                 CAST(COUNT(*) AS BIGINT) AS n_kept
          FROM kept GROUP BY doc_id)
        SELECT toks.doc_id, COALESCE(agg.clean_text, '') AS clean_text,
               CAST(len(toks.ts) AS BIGINT) - COALESCE(agg.n_kept, 0)
                   AS n_removed
        FROM toks LEFT JOIN agg USING (doc_id)
    ''',
    'decontaminate_documents': '''
        WITH toks AS (
          SELECT doc_id,
                 regexp_extract_all(coalesce(text, ''), '[0-9A-Za-z_]+') AS ts
          FROM documents),
        bench AS (
          SELECT DISTINCT gram FROM (
            SELECT unnest(list_transform(range(1, len(sl) - 6),
                                         i -> ''' + _GRAM8.replace('ts[', 'sl[') + ''')) AS gram
            FROM (SELECT list_slice(ts, 6, 20) AS sl
                  FROM toks WHERE doc_id % 97 = 0))),
        grams AS (
          SELECT doc_id,
                 unnest(list_transform(range(1, len(ts) - 6),
                                       i -> ''' + _GRAM8 + ''')) AS gram
          FROM toks)
        SELECT d.doc_id, coalesce(c.n, 0) AS n_contaminated
        FROM documents d
        LEFT JOIN (SELECT doc_id, count(*) AS n
                   FROM grams JOIN bench USING (gram)
                   GROUP BY doc_id) c USING (doc_id)
    ''',
    'repetition_stats_documents': r'''
        WITH lines AS (
          SELECT doc_id,
                 unnest(string_split(coalesce(text, ''), chr(10))) AS line
          FROM documents),
        lstats AS (
          SELECT doc_id, count(*) AS n_lines,
                 count(*) - count(DISTINCT line) AS n_dup_lines
          FROM lines GROUP BY doc_id),
        toks AS (
          SELECT doc_id,
                 regexp_extract_all(coalesce(text, ''), '[0-9A-Za-z_]+') AS ts
          FROM documents),
        grams AS (
          SELECT doc_id,
                 unnest(list_transform(range(1, len(ts)),
                                       i -> ts[i] || chr(1) || ts[i + 1])) AS gram
          FROM toks),
        gstats AS (
          SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_2grams,
                 max(c) AS top_2gram_count
          FROM (SELECT doc_id, gram, count(*) AS c
                FROM grams GROUP BY doc_id, gram)
          GROUP BY doc_id)
        SELECT d.doc_id, l.n_lines, l.n_dup_lines,
               coalesce(g.n_2grams, 0) AS n_2grams,
               coalesce(g.top_2gram_count, 0) AS top_2gram_count
        FROM documents d
        JOIN lstats l USING (doc_id)
        LEFT JOIN gstats g USING (doc_id)
    ''',
    'quality_filter_documents': r'''
        SELECT doc_id, lang FROM (
          SELECT doc_id, lang,
                 1.0 - LEAST(1.0,
                   ( (length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g')))
                   + (length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))
                   + 0.5 * (length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')))
                   ) / GREATEST(length(text), 1)) AS score,
                 CASE WHEN trim(text) = '' THEN 0
                      ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tok
          FROM documents WHERE lang IN ('en', 'de', 'fr'))
        WHERE score >= 0.8 AND n_tok >= 5
    ''',
    'lang_count_documents': '''
        SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        FROM documents GROUP BY lang
    ''',
    'events_hourly_user_agg': '''
        SELECT user_id,
               CAST(FLOOR(epoch(ts) / 3600) AS BIGINT) AS hour_bucket,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_cents
        FROM events GROUP BY 1, 2
    ''',
    # gaps-and-islands sessionization (8h inactivity gap), exact integer
    # semantics: epoch_us timestamps + cent-quantized value sums
    'sessionize_events': '''
        WITH e AS (
            SELECT user_id, event_id, epoch_us(ts) AS ts_us,
                   CAST(FLOOR(value * 100) AS BIGINT) AS value_cents
            FROM events),
        f AS (
            SELECT *, CASE WHEN ts_us - LAG(ts_us) OVER w > 28800000000
                             OR LAG(ts_us) OVER w IS NULL
                           THEN 1 ELSE 0 END AS new_s
            FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
        s AS (
            SELECT *, CAST(SUM(new_s) OVER (PARTITION BY user_id
                           ORDER BY ts_us, event_id
                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
            FROM f)
        SELECT user_id, session_id, COUNT(*) AS n_events,
               MIN(ts_us) AS start_us, MAX(ts_us) AS end_us,
               MAX(ts_us) - MIN(ts_us) AS duration_us,
               CAST(SUM(value_cents) AS BIGINT) AS sum_value_cents
        FROM s GROUP BY user_id, session_id
    ''',
    # trailing-window rolling aggregate (3 events incl. current, (ts_us,
    # event_id) order, cent-quantized values)
    'rolling_agg_events': '''
        WITH e AS (
            SELECT event_id, user_id, epoch_us(ts) AS ts_us,
                   CAST(FLOOR(value * 100) AS BIGINT) AS value_cents
            FROM events)
        SELECT event_id, user_id, ts_us,
               CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
               CAST(SUM(value_cents) OVER (w ROWS BETWEEN 2 PRECEDING
                    AND CURRENT ROW) AS BIGINT) AS roll_sum_cents,
               CAST(MIN(value_cents) OVER (w ROWS BETWEEN 2 PRECEDING
                    AND CURRENT ROW) AS BIGINT) AS roll_min_cents
        FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
    ''',
    # GPT-style packing: per-source doc_id-ordered token stream (one <eos>
    # after each doc) cut into 64-token bins; n_docs counts docs STARTING
    # in the bin (their stream offset's bin)
    'pack_sequences_documents': '''
        WITH d AS (
            SELECT source, doc_id,
                   regexp_extract_all(coalesce(text, ''), '[0-9A-Za-z_]+')
                       || ['<eos>'] AS ts
            FROM documents),
        o AS (
            SELECT source, doc_id, ts,
                   SUM(len(ts)) OVER (PARTITION BY source ORDER BY doc_id
                                      ROWS UNBOUNDED PRECEDING) - len(ts)
                       AS off
            FROM d),
        tok AS (
            SELECT source,
                   off + UNNEST(range(0, len(ts))) AS pos,
                   UNNEST(ts) AS tok
            FROM o),
        agg AS (
            SELECT source, pos // 64 AS bin_id,
                   CAST(COUNT(*) AS BIGINT) AS n_tokens,
                   string_agg(tok, ' ' ORDER BY pos) AS packed_text
            FROM tok GROUP BY 1, 2),
        starts AS (
            SELECT source, off // 64 AS bin_id,
                   CAST(COUNT(*) AS BIGINT) AS n_docs
            FROM o GROUP BY 1, 2)
        SELECT agg.source, CAST(agg.bin_id AS BIGINT) AS bin_id,
               agg.n_tokens, COALESCE(starts.n_docs, 0) AS n_docs,
               agg.packed_text
        FROM agg LEFT JOIN starts USING (source, bin_id)
    ''',
    # deterministic 90/5/5 split by seeded Knuth hash (bucket = h % 100)
    'split_documents': '''
        WITH b AS (
            SELECT doc_id, n_chars,
                   ((doc_id * 2654435761 + 7) % 4294967296) % 100 AS bucket
            FROM documents)
        SELECT CASE WHEN bucket < 90 THEN 'train'
                    WHEN bucket < 95 THEN 'val' ELSE 'test' END AS split,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
               MAX(doc_id) AS max_doc
        FROM b GROUP BY 1
    ''',
    # exact per-key quantiles, integer index semantics (p*(n-1))//100
    'grouped_quantiles_events': '''
        WITH e AS (
            SELECT user_id, CAST(FLOOR(value * 100) AS BIGINT) AS v
            FROM events),
        r AS (
            SELECT user_id, v,
                   ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY v) - 1
                       AS rk,
                   COUNT(*) OVER (PARTITION BY user_id) AS n
            FROM e)
        SELECT user_id, CAST(MAX(n) AS BIGINT) AS n,
               MAX(CASE WHEN rk = (50 * (n - 1)) // 100 THEN v END) AS p50,
               MAX(CASE WHEN rk = (90 * (n - 1)) // 100 THEN v END) AS p90
        FROM r GROUP BY user_id
    ''',
    # interval (range) join: events into same-user 1-day purchase windows
    # (half-open bounds, exact integer cents)
    'range_join_events': '''
        WITH w AS (
            SELECT event_id AS wid, user_id, epoch_us(ts) AS lo_us,
                   epoch_us(ts) + 86400000000 AS hi_us
            FROM events WHERE event_type = 'purchase')
        SELECT w.wid, CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CAST(FLOOR(e.value * 100) AS BIGINT)) AS BIGINT)
                   AS sum_value_cents,
               MAX(e.event_id) AS max_event_id
        FROM events e JOIN w ON e.user_id = w.user_id
             AND epoch_us(e.ts) >= w.lo_us AND epoch_us(e.ts) < w.hi_us
        GROUP BY w.wid
    ''',
    # fixed-point PageRank (3 unrolled iterations, d=0.85, 1e12 mass units)
    # over the deterministic doc_id citation graph; integer // and % only,
    # so the hash is exact (dangling mass leaks by definition on both sides)
    'pagerank_documents': '''
        WITH n AS (SELECT CAST(COUNT(*) AS BIGINT) AS c FROM documents),
        e AS (
            SELECT d.doc_id AS src,
                   (d.doc_id * 31 + 977 * j.j) % n.c AS dst
            FROM documents d, n, (VALUES (1), (2), (3)) AS j(j)
            WHERE j.j <= d.doc_id % 4),
        deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS outdeg
                FROM e GROUP BY src),
        r0 AS (SELECT doc_id AS node, 1000000000000 // n.c AS r
               FROM documents, n),
        i1 AS (SELECT e.dst AS node, SUM(r0.r // deg.outdeg) AS s
               FROM e JOIN deg USING (src) JOIN r0 ON r0.node = e.src
               GROUP BY e.dst),
        r1 AS (SELECT r0.node,
                      (15 * (1000000000000 // n.c)) // 100
                      + (85 * COALESCE(i1.s, 0)) // 100 AS r
               FROM r0 LEFT JOIN i1 USING (node), n),
        i2 AS (SELECT e.dst AS node, SUM(r1.r // deg.outdeg) AS s
               FROM e JOIN deg USING (src) JOIN r1 ON r1.node = e.src
               GROUP BY e.dst),
        r2 AS (SELECT r1.node,
                      (15 * (1000000000000 // n.c)) // 100
                      + (85 * COALESCE(i2.s, 0)) // 100 AS r
               FROM r1 LEFT JOIN i2 USING (node), n),
        i3 AS (SELECT e.dst AS node, SUM(r2.r // deg.outdeg) AS s
               FROM e JOIN deg USING (src) JOIN r2 ON r2.node = e.src
               GROUP BY e.dst),
        r3 AS (SELECT r2.node,
                      (15 * (1000000000000 // n.c)) // 100
                      + (85 * COALESCE(i3.s, 0)) // 100 AS r
               FROM r2 LEFT JOIN i3 USING (node), n)
        SELECT node AS doc_id, CAST(r AS BIGINT) AS rank_fp FROM r3
    ''',
    # Zipf frequency spectrum: distinct-token count per corpus frequency
    'token_freq_spectrum_documents': '''
        WITH tok AS (
            SELECT UNNEST(regexp_extract_all(text, '[0-9A-Za-z_]+')) AS token
            FROM documents),
        f AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS freq
              FROM tok GROUP BY token)
        SELECT freq, CAST(COUNT(*) AS BIGINT) AS n_tokens
        FROM f GROUP BY freq
    ''',
    # quantized TF-IDF: score = tf * (floor_log2(N // df) + 1); floor-log2
    # via length(bin(x)) - 1, integer-exact both sides; top-3 per doc with
    # (score DESC, token ASC) ties
    'tfidf_top_terms_documents': '''
        WITH tok AS (
            SELECT doc_id, UNNEST(regexp_extract_all(text, '[0-9A-Za-z_]+'))
                       AS token
            FROM documents),
        tf AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
               FROM tok GROUP BY doc_id, token),
        df AS (SELECT token, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
               FROM tok GROUP BY token),
        n AS (SELECT CAST(COUNT(*) AS BIGINT) AS c FROM documents),
        s AS (SELECT tf.doc_id, tf.token, tf.tf,
                     tf.tf * CAST(length(bin(n.c // df.df)) AS BIGINT)
                         AS score
              FROM tf JOIN df USING (token), n),
        r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, token ASC) AS rn
              FROM s)
        SELECT doc_id, token, tf, score FROM r WHERE rn <= 3
    ''',
    # inverted index: per-doc distinct tokens ([0-9A-Za-z_]+ runs, RE2 both
    # sides), df >= 25, postings = ascending comma-joined doc ids
    'inverted_index_documents': '''
        WITH toks AS (
            SELECT doc_id, UNNEST(list_distinct(
                regexp_extract_all(text, '[0-9A-Za-z_]+'))) AS token
            FROM documents)
        SELECT token, CAST(COUNT(*) AS BIGINT) AS df,
               MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc,
               string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)
                   AS postings
        FROM toks GROUP BY token HAVING COUNT(*) >= 25
    ''',
    # Unicode NFC + control-strip + whitespace-collapse + trim; the mess
    # (decomposed accents / Angstrom sign / control chars / edge spaces)
    # is injected by doc_id so every rule fires; utf8proc NFC == CPython
    # unicodedata NFC byte-for-byte on these sequences
    'normalize_text_documents': '''
        WITH m AS (
            SELECT doc_id,
                   CASE CAST(doc_id % 4 AS INTEGER)
                       WHEN 0 THEN text || ' Cafe' || chr(769)
                       WHEN 1 THEN text || ' ' || chr(8491) || 'ngstrom'
                       WHEN 2 THEN text || chr(7) || 'bell' || chr(9) || 'tab'
                       ELSE '  ' || text || '  ' END AS t
            FROM documents),
        norm AS (
            SELECT doc_id,
                   regexp_replace(regexp_replace(regexp_replace(
                       nfc_normalize(t),
                       '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]', ' ', 'g'),
                       '[ \\t\\n\\r\\f]+', ' ', 'g'),
                       '^ +| +$', '', 'g') AS norm_text
            FROM m)
        SELECT doc_id, norm_text,
               CAST(length(norm_text) AS BIGINT) AS n_chars_norm
        FROM norm
    ''',
    # as-of join: each click's most recent at-or-prior view per user
    # ((ts_us, event_id) tie order); left-outer (nulls when no prior view)
    'asof_view_attribution_events': '''
        WITH e AS (
            SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type
            FROM events),
        f AS (
            SELECT *,
                   LAST_VALUE(CASE WHEN event_type = 'view' THEN event_id END
                              IGNORE NULLS) OVER w AS view_event_id,
                   LAST_VALUE(CASE WHEN event_type = 'view' THEN ts_us END
                              IGNORE NULLS) OVER w AS view_ts_us
            FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        SELECT event_id AS click_id, user_id, ts_us AS click_ts_us,
               COALESCE(view_event_id, -1) AS view_event_id,
               COALESCE(view_ts_us, -1) AS view_ts_us
        FROM f WHERE event_type = 'click'
    ''',
    'top_customers': '''
        SELECT o_custkey, COUNT(*) AS n_orders FROM orders
        GROUP BY o_custkey ORDER BY n_orders DESC, o_custkey LIMIT 10
    ''',
    'fingerprint_documents': '''
        SELECT doc_id, sha256(text) AS fingerprint FROM documents
    ''',
    'embedding_neardup_pairs': '''
        SELECT a.vec_id AS id_a, b.vec_id AS id_b
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                     CAST(b.embedding AS DOUBLE[])) >= 0.5
    ''',
    # the IVF pipeline reaches recall 1.0 at nprobe=3/8 on this corpus, so its
    # result set is identical to the exact top-k and shares the exact oracle
    'ivf_ann_embeddings': '''
        WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
                   ORDER BY vec_id LIMIT 5),
             scored AS (
               SELECT q.query_id, e.vec_id AS neighbor_id,
                      ROW_NUMBER() OVER (
                        PARTITION BY q.query_id
                        ORDER BY list_cosine_similarity(
                            CAST(q.qv AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])) DESC,
                          e.vec_id ASC) AS rn
               FROM q CROSS JOIN embeddings e)
        SELECT query_id, neighbor_id FROM scored WHERE rn <= 10
    ''',
    'ann_topk_embeddings': '''
        WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
                   ORDER BY vec_id LIMIT 5),
             scored AS (
               SELECT q.query_id, e.vec_id AS neighbor_id,
                      ROW_NUMBER() OVER (
                        PARTITION BY q.query_id
                        ORDER BY list_cosine_similarity(
                            CAST(q.qv AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])) DESC,
                          e.vec_id ASC) AS rn
               FROM q CROSS JOIN embeddings e)
        SELECT query_id, neighbor_id FROM scored WHERE rn <= 10
    ''',
    # the IVF build/probe pipeline reaches recall@10 = 1.0 at nprobe=3/8 on
    # this corpus (ivf_ann_embeddings is hash-exact against the exact-top-k
    # oracle above); this oracle asserts exactly that claim — a recall
    # regression in the build/probe path breaks the hash match.
    'ivf_recall_embeddings': '''
        SELECT CAST(5 AS BIGINT) AS n_queries, CAST(1.0 AS DOUBLE) AS recall_at_10
    ''',
}


# --------------------------------------------------------------------------
# generated oracles: shingle-Jaccard pairs, connected components, language
# ID and the flagship web-KG construction (all plain DuckDB SQL, built by
# string templating so the marker tables / thresholds stay single-sourced)
# --------------------------------------------------------------------------

def _shingle_pairs_sql(table: str = 'documents', id_col: str = 'doc_id') -> str:
    """Exact 5-word-shingle Jaccard >= 0.5 pairs (id_a < id_b) — the
    quantity MinHash-LSH + verification computes.  Integer arithmetic
    (2*|inter| >= |union|) avoids float threshold edges; the both-empty
    shingle-set case scores Jaccard 1.0 like ``shingle_jaccard``."""
    return f'''
      w AS MATERIALIZED (SELECT {id_col} AS id,
                   list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS ws
            FROM {table}),
      s AS MATERIALIZED (SELECT id,
                   CASE WHEN len(ws) = 0 THEN CAST([] AS VARCHAR[])
                        WHEN len(ws) < 5 THEN [array_to_string(ws, ' ')]
                        ELSE list_distinct([array_to_string(ws[i:i+4], ' ')
                                            FOR i IN range(1, len(ws) - 3)]) END AS gs
            FROM w),
      pairs AS MATERIALIZED (
        SELECT a.id AS id_a, b.id AS id_b
        FROM s a JOIN s b ON a.id < b.id
        WHERE (len(a.gs) = 0 AND len(b.gs) = 0)
           OR 2 * len(list_intersect(a.gs, b.gs)) >= len(list_distinct(a.gs || b.gs)))
    '''


def _components_sql(pairs_cte: str, id_out: str) -> str:
    """Connected components (label = min reachable id) over a ``pairs`` CTE
    with columns (id_a, id_b) — the converged result of min-label
    propagation, as a recursive closure."""
    return f'''
        WITH RECURSIVE {pairs_cte},
        edges AS (SELECT id_a AS a, id_b AS b FROM pairs
                  UNION SELECT id_b, id_a FROM pairs),
        reach(a, b) AS (SELECT a, b FROM edges
                        UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a)
        SELECT a AS {id_out}, LEAST(a, MIN(b)) AS cluster_id FROM reach GROUP BY a
    '''


def _langid_score_columns(text_expr: str) -> str:
    """SELECT-list fragment computing one marker-count score column per
    language (``s_<lang>``), replicating ``ops.text.LangIdKernel``:
    non-overlapping marker substring counts over ' '||lower(text)||' '."""
    from ..ops.text import _LANG_MARKERS
    padded = f"(' ' || lower({text_expr}) || ' ')"
    cols = []
    for lang, markers in _LANG_MARKERS.items():
        terms = ' + '.join(
            f"((length({padded}) - length(replace({padded}, '{m}', ''))) // {len(m)})"
            for m in markers)
        cols.append(f'({terms}) AS s_{lang}')
    return ', '.join(cols)


def _langid_case_sql() -> str:
    """CASE over the ``s_<lang>`` score columns: argmax with
    first-in-table-order tie-break, 'und' when all zero (the kernel's
    ``np.argmax`` + zero-max fallback)."""
    from ..ops.text import _LANG_MARKERS
    langs = list(_LANG_MARKERS)
    all_scores = ', '.join(f's_{lang}' for lang in langs)
    branches = [f"WHEN GREATEST({all_scores}) = 0 THEN 'und'"]
    for i, lang in enumerate(langs[:-1]):
        later = ' AND '.join(f's_{lang} >= s_{l2}' for l2 in langs[i + 1:])
        branches.append(f"WHEN {later} THEN '{lang}'")
    branches.append(f"ELSE '{langs[-1]}'")
    return '(CASE ' + ' '.join(branches) + ' END)'


def _cosine_pairs_cte(threshold: float = 0.5) -> str:
    return f'''pairs AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                     CAST(b.embedding AS DOUBLE[])) >= {threshold})'''


def _web_kg_oracle_sql(pages_glob: str) -> str:
    """The flagship pipeline as one DuckDB query over the pages parquet.

    Every emitted predicate is a deterministic function of the page row
    (per-row invariant: extracted text == text column byte-identically), so
    url/date/lang/digest/detected-language/quality/mentions triples are all
    expressible: RML percent-encoding over this URL charset is two
    replaces, the dateTime literal matches CAST's trailing-zero trimming,
    sha256/printf mirror hashlib/%.4f, the language CASE replicates the
    marker kernel, and gazetteer mentions reduce to one RE2 extract (every
    alias is 'name + optional suffix', so the name regex finds exactly the
    pages whose text matches some alias of that entity)."""
    enc = "replace(replace(url, ':', '%3A'), '/', '%2F')"
    subj = f"('<http://crawl.example.org/page/' || {enc} || '>')"
    langdet = _langid_case_sql()
    quality = ("printf('%.4f', 1.0 - LEAST(1.0, "
               "((length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))"
               " + (length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))"
               " + 0.5 * (length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')))"
               ") / GREATEST(length(text), 1)))")
    return f'''
        WITH pages AS (SELECT * FROM read_parquet('{pages_glob}'))
        SELECT 'p_url' AS "partition", {subj} AS subject,
               '<{SCHEMA_URL}>' AS predicate,
               ('<' || {enc} || '>') AS object FROM pages
        UNION
        SELECT 'p_date', {subj}, '<{SCHEMA_DATE}>',
               ('"' || REPLACE(CAST(warc_ts AS VARCHAR), ' ', 'T')
                || '"^^<http://www.w3.org/2001/XMLSchema#dateTime>') FROM pages
        UNION
        SELECT 'p_lang', {subj}, '<{SCHEMA_LANG}>', ('"' || lang || '"') FROM pages
        UNION
        SELECT 'p_digest', {subj}, '<{SCHEMA_SHA256}>',
               ('"' || sha256(text) || '"') FROM pages
        UNION
        SELECT 'p_langdet', {subj}, '<{SCHEMA_DETECTED_LANG}>',
               ('"' || {langdet} || '"')
        FROM (SELECT url, {_langid_score_columns('substr(text, 1, 256)')} FROM pages)
        UNION
        SELECT 'p_quality', {subj}, '<{SCHEMA_QUALITY}>',
               ('"' || {quality} || '"') FROM pages
        UNION
        SELECT DISTINCT 'p_mentions', {subj}, '<{SCHEMA_MENTIONS}>',
               ('<http://kg.example.org/entity/' || lower(m) || '>')
        FROM (SELECT url, UNNEST(regexp_extract_all(
                  text, '\\b(?:Acme|Globex)[0-9]{{3}}\\b')) AS m FROM pages)
    '''


def _pii_oracle_sql() -> str:
    """Sequential redaction replicated with nested regexp_replace; the
    regexes come from ops.text.PII_PATTERNS so the two sides cannot
    drift.  Counts are taken on the text as it stood before each
    pattern's replacement (the kernel's sequential semantics)."""
    from ..ops.text import PII_PATTERNS
    inj = ("text || ' contact user' || CAST(doc_id AS VARCHAR) || "
           "'@mail.example.com or call +1 555-01' || "
           "lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') || "
           "' node 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.' || "
           "CAST(doc_id % 100 AS VARCHAR)")
    sql = f'WITH s0 AS (SELECT doc_id, {inj} AS t0 FROM documents)'
    col = 't0'
    for i, (name, rx, repl) in enumerate(PII_PATTERNS, 1):
        sql += (f", s{i} AS (SELECT *, "
                f"CAST(len(regexp_extract_all({col}, '{rx}')) AS BIGINT) AS n_{name}, "
                f"regexp_replace({col}, '{rx}', '{repl}', 'g') AS t{i} FROM s{i - 1})")
        col = f't{i}'
    names = ', '.join(f'n_{n}' for n, _, _ in PII_PATTERNS)
    return sql + (f' SELECT doc_id, {names}, {col} AS text_redacted '
                  f'FROM s{len(PII_PATTERNS)}')


ORACLE_SQL['pii_redact_documents'] = _pii_oracle_sql()

# unigram LM scoring: identical tokenization to token_count_documents (both
# sides RE2 \s+ over trim()); the per-token score is fixed-point —
# floor(-ln(cnt/total)*1e6) — where cnt/total is one exact IEEE division
# and ln is libm on both sides (Python math.log == DuckDB ln), so the
# int64 per-doc sums match bit-for-bit regardless of addition order
ORACLE_SQL['unigram_lm_documents'] = r'''
    WITH toks AS (
        SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
        FROM documents WHERE trim(text) <> ''
    ), counts AS (
        SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY tok
    ), total AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM toks
    ), scored AS (
        SELECT t.doc_id,
               CAST(floor(-ln(CAST(c.cnt AS DOUBLE) / (SELECT n FROM total))
                          * 1000000) AS BIGINT) AS fp
        FROM toks t JOIN counts c USING (tok)
    ), agg AS (
        SELECT doc_id, COUNT(*) AS n_tokens, SUM(fp) AS nll
        FROM scored GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(coalesce(a.n_tokens, 0) AS BIGINT) AS n_tokens,
           CAST(coalesce(a.nll, 0) AS BIGINT) AS nll_micronats
    FROM documents d LEFT JOIN agg a USING (doc_id)
'''

ORACLE_SQL['bloom_blocklist_documents'] = '''
    SELECT d.doc_id FROM documents d
    WHERE d.text NOT IN (SELECT text FROM documents WHERE doc_id % 97 = 0)
'''

ORACLE_SQL['cap_per_source_documents'] = '''
    SELECT doc_id, source, rn FROM (
        SELECT doc_id, source,
               row_number() OVER (PARTITION BY source
                                  ORDER BY n_chars, doc_id) AS rn
        FROM documents)
    WHERE rn <= 3
'''

# symmetric int8 quantization: same floor(x*127.0/mx + 0.5) float64 formula
# as ops.similarity.quantize_embeddings (float32->float64 cast is exact on
# both sides); parallel UNNESTs zip the dim index with the component
ORACLE_SQL['quantize_embeddings_int8'] = '''
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    m AS (SELECT vec_id, v,
                 list_max(list_transform(v, x -> abs(x))) AS mx FROM e)
    SELECT vec_id,
           UNNEST(range(1, len(v) + 1)) AS dim_idx,
           UNNEST(list_transform(v, x -> CASE WHEN mx = 0 THEN 0
                  ELSE CAST(floor(x * 127.0 / mx + 0.5) AS BIGINT) END)) AS q
    FROM m
'''

# deterministic per-group sample: same Knuth multiplicative hash, same
# (hash, id) tie order as ops.sample.stratified_sample
ORACLE_SQL['stratified_sample_documents'] = '''
    SELECT doc_id, lang, rn FROM (
        SELECT doc_id, lang,
               CAST(ROW_NUMBER() OVER (PARTITION BY lang
                    ORDER BY (doc_id * 2654435761 + 7) % 4294967296, doc_id)
                    AS BIGINT) AS rn
        FROM documents)
    WHERE rn <= 5
'''

ORACLE_SQL['mixture_sample_documents'] = '''
    SELECT doc_id, source FROM documents
    WHERE (doc_id * 2654435761 + 11) % 4294967296 <
          CAST(floor(((CAST(substr(source, 4) AS BIGINT) % 5) / 4.0)
                     * 4294967296) AS BIGINT)
'''

ORACLE_SQL['jaccard_verified_pairs_documents'] = \
    'WITH ' + _shingle_pairs_sql() + ' SELECT id_a, id_b FROM pairs'
ORACLE_SQL['minhash_dedup_documents'] = _components_sql(_shingle_pairs_sql(), 'doc_id')
ORACLE_SQL['ngram_jaccard_pairs_documents'] = 'WITH ' + _shingle_pairs_sql() + ''',
      g AS (SELECT doc_id AS id,
              list_distinct([substr(text, i, 3)
                             FOR i IN range(1, greatest(length(text) - 2, 1) + 1)]) AS cg
            FROM documents)
      SELECT p.id_a, p.id_b,
             CAST(len(list_intersect(a.cg, b.cg)) AS BIGINT) AS inter,
             CAST(len(list_distinct(a.cg || b.cg)) AS BIGINT) AS uni
      FROM pairs p JOIN g a ON p.id_a = a.id JOIN g b ON p.id_b = b.id'''
ORACLE_SQL['embedding_neardup_clusters'] = _components_sql(_cosine_pairs_cte(0.5), 'vec_id')
# the sign-LSH twin: same recursive-CTE components, over the clone-augmented
# corpus (UNION ALL replicates the query's deterministic planted duplicates)
ORACLE_SQL['embedding_neardup_clusters_lsh'] = _components_sql('''corpus AS (
        SELECT vec_id, embedding FROM embeddings
        UNION ALL
        SELECT vec_id + 1000000, embedding FROM embeddings WHERE vec_id % 50 = 0),
    pairs AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b
        FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
        WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                     CAST(b.embedding AS DOUBLE[])) >= 0.95)''', 'vec_id')
ORACLE_SQL['multimodal_real_decode'] = '''
    SELECT doc_id,
           CAST(4 + doc_id % 5 AS INTEGER) AS width,
           CAST(3 + doc_id % 7 AS INTEGER) AS height,
           CAST(doc_id % 256 AS BIGINT) AS red_mean_255
    FROM documents'''
ORACLE_SQL['multimodal_jpeg_decode'] = '''
    SELECT doc_id,
           CAST(8 + doc_id % 9 AS INTEGER) AS width,
           CAST(8 + doc_id % 5 AS INTEGER) AS height,
           CAST(doc_id % 256 AS BIGINT) AS gray_mean_255
    FROM documents'''
ORACLE_SQL['lang_id_documents'] = (
    f'SELECT doc_id, {_langid_case_sql()} AS lang_pred '
    f"FROM (SELECT doc_id, {_langid_score_columns('text')} FROM documents)")


def _kmv_oracle_sql(k: int) -> str:
    """KMV bottom-``k`` sketch over distinct text values: 63-bit big-endian
    sha256 prefix (>> 1), k smallest distinct hashes, Bar-Yossef estimate —
    all in HUGEINT so the arithmetic matches the Python ints exactly."""
    h_expr = ' + '.join(
        f'{_hexbyte_sql("hx", j)}::HUGEINT * {1 << (8 * (7 - j))}::HUGEINT'
        for j in range(8))
    half = 1 << 63
    return f'''
        WITH vals AS (SELECT DISTINCT text AS v FROM documents
                      WHERE text IS NOT NULL),
        h AS (SELECT DISTINCT (({h_expr}) // 2::HUGEINT) AS hv
              FROM (SELECT sha256(v) AS hx FROM vals)),
        kmin AS (SELECT hv FROM h ORDER BY hv LIMIT {k}),
        agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_kept, MAX(hv) AS kth
                FROM kmin)
        SELECT n_kept,
               CAST(CASE WHEN n_kept < {k} THEN -1 ELSE kth END AS BIGINT)
                   AS kth_min_hash,
               CAST(CASE WHEN n_kept < {k} THEN n_kept::HUGEINT
                    ELSE LEAST({k - 1}::HUGEINT * {half}::HUGEINT // kth,
                               {half - 1}::HUGEINT) END AS BIGINT)
                   AS est_distinct
        FROM agg
    '''


def _hexbyte_sql(hexcol: str, j: int) -> str:
    """SQL expression for byte ``j`` of a lowercase hex digest string."""
    hi = f"(strpos('0123456789abcdef', substr({hexcol}, {2 * j + 1}, 1)) - 1)"
    lo = f"(strpos('0123456789abcdef', substr({hexcol}, {2 * j + 2}, 1)) - 1)"
    return f'({hi} * 16 + {lo})'


def _simhash_oracle_sql() -> str:
    """Exact SQL recomputation of SimHashKernel: per unique word, sha256 ->
    first 8 digest bytes as a little-endian uint64 -> +-1 per bit weighted by
    the word count; the signature sets bit i where the accumulator > 0."""
    h_expr = ' + '.join(f'{_hexbyte_sql("hx", j)}::HUGEINT * {1 << (8 * j)}::HUGEINT'
                        for j in range(8))
    return f'''
    WITH toks AS (
        SELECT doc_id, tok, count(*)::HUGEINT AS c
        FROM (SELECT doc_id, unnest(regexp_split_to_array(coalesce(text, ''), '\\s+')) AS tok
              FROM documents)
        WHERE tok <> ''
        GROUP BY doc_id, tok
    ), words AS (
        SELECT doc_id, c, {h_expr} AS h
        FROM (SELECT doc_id, c, sha256(tok) AS hx FROM toks)
    ), bits AS (
        SELECT doc_id, b.i AS bit,
               sum(c * (CASE WHEN ((h >> b.i) & 1::HUGEINT) = 1::HUGEINT
                             THEN 1 ELSE -1 END)) AS acc
        FROM words, generate_series(0, 63) b(i)
        GROUP BY doc_id, b.i
    ), sig AS (
        SELECT doc_id,
               sum(CASE WHEN acc > 0 THEN (1::HUGEINT << bit) ELSE 0::HUGEINT END) AS s
        FROM bits GROUP BY doc_id
    )
    SELECT d.doc_id, coalesce(s.s, 0)::UBIGINT AS simhash
    FROM documents d LEFT JOIN sig s USING (doc_id)
    '''


ORACLE_SQL['simhash_documents'] = _simhash_oracle_sql()

# near-dup pairs: exact all-pairs popcount over the same recomputed
# signatures (the banding plan must find every pair within the ball)
ORACLE_SQL['simhash_neardup_pairs_documents'] = f'''
    WITH sig AS ({_simhash_oracle_sql()})
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
    FROM sig a JOIN sig b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
'''

# the deterministic fake decode: sha256 of the payload bytes, width/height
# from the first two digest bytes (ops/multimodal.py ImageDecodeKernel)
ORACLE_SQL['multimodal_image_features'] = f'''
    SELECT doc_id,
           64 + {_hexbyte_sql("sha256(coalesce(text, ''))", 0)} AS width,
           64 + {_hexbyte_sql("sha256(coalesce(text, ''))", 1)} AS height
    FROM documents
'''


def get_oracle_sql() -> dict[str, str]:
    """The full oracle dict.  Built lazily because the flagship oracle reads
    the deterministic pages parquet — materialized here (cached) so the SQL
    is runnable regardless of whether the Ray query ran first.  The driver
    compares at sf=0.01, where ``web_kg_construction`` uses 5000 pages."""
    from .pages import pages_parquet_dir
    out = dict(ORACLE_SQL)
    pages_dir = pages_parquet_dir(5000)
    out['web_kg_construction'] = _web_kg_oracle_sql(f'{pages_dir}/*.parquet')
    out['boilerplate_paragraphs_pages'] = f'''
        SELECT paragraph, COUNT(*) AS n_occurrences FROM (
            SELECT UNNEST(string_split(
                text || CASE WHEN length(url) % 2 = 0
                             THEN chr(10) || '{_BOILER_A}'
                             ELSE chr(10) || '{_BOILER_B}' END,
                chr(10))) AS paragraph
            FROM read_parquet('{pages_dir}/*.parquet'))
        GROUP BY paragraph HAVING COUNT(*) >= 2
    '''
    out['url_domain_stats_pages'] = _url_domain_stats_oracle_sql(pages_dir)
    out['kmv_distinct_texts_documents'] = _kmv_oracle_sql(k=64)
    out['remove_boilerplate_pages'] = f'''
        WITH m AS (
            SELECT url, text || CASE WHEN length(url) % 2 = 0
                                     THEN chr(10) || '{_BOILER_A}'
                                     ELSE chr(10) || '{_BOILER_B}' END AS t
            FROM read_parquet('{pages_dir}/*.parquet')),
        p AS (
            SELECT url, UNNEST(string_split(t, chr(10))) AS para,
                   UNNEST(range(1, len(string_split(t, chr(10))) + 1)) AS i
            FROM m),
        c AS (SELECT para FROM p GROUP BY para HAVING COUNT(*) >= 2),
        kept AS (SELECT p.* FROM p ANTI JOIN c USING (para)),
        agg AS (SELECT url, string_agg(para, chr(10) ORDER BY i)
                           AS clean_text,
                       CAST(COUNT(*) AS BIGINT) AS n_kept
                FROM kept GROUP BY url),
        tot AS (SELECT url, CAST(COUNT(*) AS BIGINT) AS n_paras
                FROM p GROUP BY url)
        SELECT m.url, COALESCE(a.clean_text, '') AS clean_text,
               tot.n_paras - COALESCE(a.n_kept, 0) AS n_removed
        FROM m LEFT JOIN agg a USING (url) LEFT JOIN tot USING (url)
    '''
    out['connected_components_documents'] = _components_sql(
        '''pairs AS (
            SELECT doc_id AS id_a, doc_id + 3 AS id_b FROM documents
            WHERE doc_id % 9 < 6
              AND doc_id + 3 < (SELECT COUNT(*) FROM documents))''',
        'doc_id')
    hx = "sha256(url || chr(10) || text)"
    checksum = ' + '.join(
        f'{_hexbyte_sql(hx, j)} * {1 << (8 * (3 - j))}' for j in range(4))
    out['wet_roundtrip_pages'] = f'''
        SELECT lang,
               COUNT(*) AS n_records,
               CAST(SUM(length(text)) AS BIGINT) AS total_chars,
               CAST(SUM(epoch_us(warc_ts) // 1000000) AS BIGINT) AS ts_sec_sum,
               CAST(SUM(epoch_us(warc_ts) % 1000000) AS BIGINT) AS ts_frac_sum,
               CAST(SUM({checksum}) AS BIGINT) AS checksum
        FROM read_parquet('{pages_dir}/*.parquet')
        GROUP BY lang
    '''
    return out


def _url_domain_stats_oracle_sql(pages_dir: str) -> str:
    """SQL twin of ops/url.py normalize_urls + registrable_domains +
    domain_stats over the parity-messed corpus (RE2 regexes on both sides,
    same backreference syntax)."""
    from ..ops.url import MULTI_SUFFIXES
    suffixes = ', '.join(f"'{s}'" for s in MULTI_SUFFIXES)
    pre_rx = '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*'
    return f'''
    WITH messed AS (
        SELECT CASE CAST(length(url) % 4 AS INTEGER)
            WHEN 0 THEN upper(regexp_extract(url, '{pre_rx}'))
                        || regexp_replace(url, '{pre_rx}', '') || '#frag'
            WHEN 1 THEN regexp_replace(url, '^(https://[^/?#]*)', '\\1:443')
                        || '?utm_source=x&utm_medium=y'
            WHEN 2 THEN url || '?a=1&utm_campaign=z&b=2'
            ELSE replace(url, 'example.org', 'shop.co.uk') END AS u
        FROM read_parquet('{pages_dir}/*.parquet')
    ), nofrag AS (
        SELECT regexp_replace(u, '#.*$', '') AS u FROM messed
    ), lowered AS (
        SELECT CASE WHEN regexp_matches(u, '{pre_rx}')
                    THEN lower(regexp_extract(u, '{pre_rx}'))
                         || regexp_replace(u, '{pre_rx}', '')
                    ELSE u END AS u
        FROM nofrag
    ), deport AS (
        SELECT regexp_replace(regexp_replace(u,
                   '^(https://[^:/?#]*):443([/?#].*)?$', '\\1\\2'),
                   '^(http://[^:/?#]*):80([/?#].*)?$', '\\1\\2') AS u
        FROM lowered
    ), notrack AS (
        SELECT regexp_replace(regexp_replace(regexp_replace(u,
                   '[?&](utm_[a-z]+|fbclid|gclid)=[^&#]*', '', 'g'),
                   '^([^?]*)&', '\\1?'),
                   '[?&]$', '') AS u
        FROM deport
    ), hosted AS (
        SELECT u,
               regexp_replace(regexp_replace(regexp_replace(u,
                   '^[a-z][a-z0-9+.-]*://', ''),
                   '^[^@]*@', ''), '(/.*)?$', '') AS authority
        FROM notrack
    ), domained AS (
        SELECT u,
               CASE WHEN last2 IN ({suffixes}) AND last3 <> '' THEN last3
                    WHEN last2 <> '' THEN last2
                    ELSE host END AS domain
        FROM (SELECT u,
                     regexp_replace(authority, ':[0-9]*$', '') AS host,
                     regexp_extract(regexp_replace(authority, ':[0-9]*$', ''),
                                    '([^.]+\\.[^.]+)$', 1) AS last2,
                     regexp_extract(regexp_replace(authority, ':[0-9]*$', ''),
                                    '([^.]+\\.[^.]+\\.[^.]+)$', 1) AS last3
              FROM hosted)
    )
    SELECT domain,
           COUNT(*) AS n_pages,
           COUNT(DISTINCT u) AS n_urls,
           CAST(SUM(length(u)) AS BIGINT) AS total_len
    FROM domained GROUP BY domain
    '''
