"""Unit tests for the URL operators (ops/url.py)."""

import pyarrow as pa


def test_normalize_urls_rules():
    from morph_kgc_ray.ops.url import normalize_urls
    urls = pa.array([
        'HTTPS://Ex.COM:443/Path?utm_source=x&a=1#frag',   # case+port+utm+frag
        'http://H.example.CO.UK:80/q?utm_campaign=z',      # http default port
        'https://host.org:8443/p?a=1&utm_medium=m&b=2',    # non-default port kept
        'https://hot.example.com/page/42/3',               # already canonical
        'http://h/p?fbclid=abc&gclid=d',                   # all params tracking
        'no-scheme-string#frag',                           # schemeless passthrough
        None,
    ])
    assert normalize_urls(urls).to_pylist() == [
        'https://ex.com/Path?a=1',
        'http://h.example.co.uk/q',
        'https://host.org:8443/p?a=1&b=2',
        'https://hot.example.com/page/42/3',
        'http://h/p',
        'no-scheme-string',
        None,
    ]


def test_normalize_urls_path_case_preserved():
    from morph_kgc_ray.ops.url import normalize_urls
    out = normalize_urls(pa.array(['HTTP://A.B/CaseSensitive/Path?Q=V']))
    assert out.to_pylist() == ['http://a.b/CaseSensitive/Path?Q=V']


def test_url_hosts_strips_userinfo_and_port():
    from morph_kgc_ray.ops.url import url_hosts
    out = url_hosts(pa.array([
        'https://user:pw@Host.ORG:8443/p', 'http://plain.example/x',
        'not a url',
    ]))
    assert out.to_pylist() == ['host.org', 'plain.example', None]


def test_registrable_domains_multi_suffix():
    from morph_kgc_ray.ops.url import registrable_domains
    out = registrable_domains(pa.array([
        'a.b.example.co.uk',   # multi-label suffix -> 3 labels
        'deep.sub.example.org',
        'example.org',
        'co.uk',               # bare suffix: only 2 labels exist
        'localhost',           # single label -> itself
        None,
    ]))
    assert out.to_pylist() == [
        'example.co.uk', 'example.org', 'example.org', 'co.uk', 'localhost', None]


def test_domain_stats_counts(ray_session):
    import ray.data as rd
    from morph_kgc_ray.ops.url import domain_stats
    ds = rd.from_items([
        {'url': 'https://A.example.org/p1'},
        {'url': 'https://a.example.org/p1#frag'},      # same after normalize
        {'url': 'https://a.example.org/p2'},
        {'url': 'https://b.shop.co.uk/x?utm_source=s'},
    ])
    got = {r['domain']: r for r in domain_stats(ds).take_all()}
    assert got['example.org']['n_pages'] == 3
    assert got['example.org']['n_urls'] == 2   # p1 dup collapses
    assert got['example.org']['total_len'] == 3 * len('https://a.example.org/p1')
    assert got['shop.co.uk'] == {
        'domain': 'shop.co.uk', 'n_pages': 1, 'n_urls': 1,
        'total_len': len('https://b.shop.co.uk/x')}


def test_add_url_columns(ray_session):
    import ray.data as rd
    from morph_kgc_ray.ops.url import add_url_columns
    ds = rd.from_items([{'url': 'HTTPS://X.example.COM:443/p#f', 'n': 1}])
    row = add_url_columns(ds).take_all()[0]
    assert row['norm_url'] == 'https://x.example.com/p'
    assert row['domain'] == 'example.com'
    assert row['n'] == 1
