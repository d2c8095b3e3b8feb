"""URL operators for web-crawl (webtext) pipelines.

Everything here is a vectorized Arrow kernel usable directly on
``pa.Array``/``ChunkedArray`` columns or lifted onto a ``ray.data.Dataset``
via ``map_batches`` — no per-row Python anywhere, so the stages stream at
object-store bandwidth on a cluster.

Semantics are deliberately replicable in ANSI SQL (RE2 regexes with the
same backreference syntax DuckDB uses) so every operator can be gated by
the driver's DuckDB oracle:

- :func:`normalize_urls` — crawl-frontier canonicalization: lowercase
  scheme+host, strip the default port (``:80`` for http, ``:443`` for
  https), drop the ``#fragment``, remove tracking query parameters
  (``utm_*``, ``fbclid``, ``gclid``) and tidy the separators left behind.
- :func:`registrable_domains` — eTLD+1 extraction with an embedded
  multi-label-suffix table (heuristic stand-in for the full Public Suffix
  List, which is a data file, not an algorithm; swap ``MULTI_SUFFIXES``
  for the PSL set in production).
- :func:`domain_stats` — per-registrable-domain corpus statistics
  (page/url counts), the fan-in step of per-domain caps and crawl
  politeness budgeting.

At 100 TB the only wide step is the final ``groupby(domain)`` in
``domain_stats``; normalization and domain extraction are embarrassingly
parallel map stages.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

# ``scheme://host[:port]`` prefix (no path/query/fragment chars) + the rest.
_PREFIX_RX = r'^(?P<pre>[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)(?P<rest>.*)$'

# tracking parameters removed by normalization (each match consumes its
# leading '?' or '&'; the tidy passes below repair the separators)
TRACKING_PARAM_RX = r'[?&](?:utm_[a-z]+|fbclid|gclid)=[^&#]*'

# second-level suffixes under which the registrable domain takes THREE
# labels (public-suffix heuristic; see module docstring)
MULTI_SUFFIXES = (
    'co.uk', 'org.uk', 'gov.uk', 'ac.uk', 'co.jp', 'ne.jp', 'or.jp',
    'com.au', 'net.au', 'org.au', 'com.br', 'com.cn', 'net.cn', 'org.cn',
    'co.in', 'co.kr', 'com.mx', 'com.tr', 'co.za', 'com.sg',
)

_LAST2_RX = r'(?P<d>[^.]+\.[^.]+)$'
_LAST3_RX = r'(?P<d>[^.]+\.[^.]+\.[^.]+)$'


def _utf8(arr) -> pa.ChunkedArray | pa.Array:
    return pc.cast(arr, pa.string()) if arr.type != pa.string() else arr


def normalize_urls(urls) -> pa.Array | pa.ChunkedArray:
    """Vectorized URL canonicalization (see module docstring for the rule
    list).  Accepts and returns an Arrow string array; null stays null.
    URLs without a ``scheme://host`` prefix pass through with only the
    fragment/tracking-parameter rules applied."""
    urls = _utf8(urls)
    # 1. drop the fragment ('.' never matches a newline in RE2, but URLs
    #    contain none; anchor-free so it works on schemeless inputs too)
    u = pc.replace_substring_regex(urls, r'#.*$', '')
    # 2. lowercase scheme + host (the authority prefix only — path/query
    #    stay case-sensitive per RFC 3986)
    parts = pc.extract_regex(u, _PREFIX_RX)
    pre = pc.utf8_lower(pc.struct_field(parts, 'pre'))
    rest = pc.struct_field(parts, 'rest')
    # 3. strip default ports off the lowered authority
    pre = pc.replace_substring_regex(pre, r'^(https://[^:/?#]*):443$', r'\1')
    pre = pc.replace_substring_regex(pre, r'^(http://[^:/?#]*):80$', r'\1')
    joined = pc.binary_join_element_wise(pre, rest, '')
    # schemeless inputs fail the prefix extract (null struct) — keep as-is
    u = pc.if_else(pc.is_valid(joined), joined, u)
    # 4. remove tracking params, then tidy: a surviving real param after a
    #    removed leading one sits as 'path&k=v' -> 'path?k=v'; a dangling
    #    trailing '?'/'&' is dropped
    u = pc.replace_substring_regex(u, TRACKING_PARAM_RX, '')
    u = pc.replace_substring_regex(u, r'^([^?]*)&', r'\1?', max_replacements=1)
    u = pc.replace_substring_regex(u, r'[?&]$', '')
    return u


def url_hosts(urls) -> pa.Array | pa.ChunkedArray:
    """Lowercased host (authority minus port/userinfo) of each URL; null
    for strings without a ``scheme://host`` prefix."""
    urls = _utf8(urls)
    parts = pc.extract_regex(urls, _PREFIX_RX)
    pre = pc.utf8_lower(pc.struct_field(parts, 'pre'))
    host = pc.replace_substring_regex(pre, r'^[a-z][a-z0-9+.-]*://', '',
                                      max_replacements=1)
    host = pc.replace_substring_regex(host, r'^[^@]*@', '', max_replacements=1)
    return pc.replace_substring_regex(host, r':[0-9]*$', '', max_replacements=1)


def registrable_domains(hosts) -> pa.Array | pa.ChunkedArray:
    """eTLD+1 per host: the last two labels, or the last three when the
    last two form a known multi-label suffix (``MULTI_SUFFIXES``).  Hosts
    with a single label (``localhost``) return themselves."""
    hosts = _utf8(hosts)
    last2 = pc.struct_field(pc.extract_regex(hosts, _LAST2_RX), 'd')
    last3 = pc.struct_field(pc.extract_regex(hosts, _LAST3_RX), 'd')
    multi = pc.is_in(last2, value_set=pa.array(MULTI_SUFFIXES, pa.string()))
    dom = pc.if_else(pc.and_kleene(multi, pc.is_valid(last3)), last3, last2)
    return pc.if_else(pc.is_valid(dom), dom, hosts)


def add_url_columns(ds: ray.data.Dataset, url_col: str = 'url',
                    norm_col: str = 'norm_url',
                    domain_col: str = 'domain') -> ray.data.Dataset:
    """Appends normalized-URL and registrable-domain columns — one
    streaming map stage, zero-copy Arrow in and out."""

    def fn(t: pa.Table) -> pa.Table:
        norm = normalize_urls(t[url_col])
        dom = registrable_domains(url_hosts(norm))
        return t.append_column(norm_col, norm).append_column(domain_col, dom)

    return ds.map_batches(fn, batch_format='pyarrow')


def domain_stats(ds: ray.data.Dataset, url_col: str = 'url',
                 small: bool = False) -> ray.data.Dataset:
    """Per-registrable-domain stats over a page corpus: page count,
    distinct normalized URLs, and total normalized-URL length (a cheap
    per-byte checksum for the oracle).

    Two-level grouped-agg chain — the first pass collapses to one row per
    (domain, norm_url) pair inside each batch before any exchange, so on a
    crawl with heavy per-URL duplication the shuffle moves pairs, not
    pages; the second groupby is over domain cardinality only (tiny).
    Distinct-URL counting falls out of the pair collapse for free — no
    ``count_distinct`` over raw rows anywhere.  ``small=True`` (plan-time
    knowledge) finishes both levels in single tasks instead of paying two
    hash-shuffle operator spin-ups."""
    from .agg import grouped_agg

    def pair_partial(t: pa.Table) -> pa.Table:
        norm = normalize_urls(t[url_col])
        dom = registrable_domains(url_hosts(norm))
        g = (pa.table({'domain': dom, 'norm_url': norm})
             .group_by(['domain', 'norm_url'])
             .aggregate([('norm_url', 'count')]))
        return pa.table({
            'domain': g['domain'], 'norm_url': g['norm_url'],
            'n_pages_pair': pc.cast(g['norm_url_count'], pa.int64()),
            'len_sum': pc.multiply(
                pc.cast(g['norm_url_count'], pa.int64()),
                pc.cast(pc.utf8_length(g['norm_url']), pa.int64())),
        })

    pairs = grouped_agg(
        ds.map_batches(pair_partial, batch_format='pyarrow'),
        ['domain', 'norm_url'],
        [('n_pages_pair', 'sum', 'n_pages_pair'),
         ('len_sum', 'sum', 'len_sum')], small=small)

    def domain_partial(t: pa.Table) -> pa.Table:
        # rows are globally unique (domain, norm_url) pairs here, so a
        # plain count is the distinct-URL count
        return pa.table({'domain': t['domain'],
                         'n_pages': t['n_pages_pair'],
                         'n_urls': pa.array([1] * t.num_rows, pa.int64()),
                         'total_len': t['len_sum']})

    return grouped_agg(
        pairs.map_batches(domain_partial, batch_format='pyarrow'),
        ['domain'],
        [('n_pages', 'sum', 'n_pages'), ('n_urls', 'sum', 'n_urls'),
         ('total_len', 'sum', 'total_len')], small=small)
