"""Unit tests for the training-data operators and the web pipeline."""

import numpy as np
import pyarrow as pa
import pytest


@pytest.fixture()
def docs_ds(ray_session):
    import ray.data as rd
    rows = [
        {'doc_id': 1, 'text': 'the quick brown fox jumps over the lazy dog again and again today'},
        {'doc_id': 2, 'text': 'the quick brown fox jumps over the lazy dog again and again today'},
        {'doc_id': 3, 'text': 'the quick brown fox jumps over the lazy cat again and again today'},
        {'doc_id': 4, 'text': 'completely different content about Ray Data pipelines and arrow batches here'},
        {'doc_id': 5, 'text': ''},
    ]
    return rd.from_items(rows)


def test_token_count(docs_ds):
    from morph_kgc_ray.ops.text import token_count
    out = token_count(docs_ds).to_pandas().set_index('doc_id')['n_tokens'].to_dict()
    assert out[1] == 13 and out[5] == 0


def test_repetition_stats_randomized_vs_python(ray_session):
    """repetition_stats (vectorized dictionary-encode + segment scans) must
    equal the plain-Python per-doc reference on randomized multi-line texts
    with planted duplicate lines, repeated 2-grams, empties and nulls."""
    import re
    from collections import Counter

    import ray.data as rd

    from morph_kgc_ray.ops.text import repetition_stats

    rng = np.random.RandomState(11)
    words = ['alpha', 'beta', 'gamma', 'x1', 'über', 'c_3', '', '--']
    texts = []
    for _ in range(80):
        lines = [' '.join(rng.choice(words, size=rng.randint(0, 6)))
                 for _ in range(rng.randint(0, 8))]
        if lines and rng.rand() < 0.5:
            lines += [lines[0]] * rng.randint(1, 3)  # planted dup lines
        texts.append('\n'.join(lines))
    texts += ['', None, 'solo', 'buy now buy now buy now']
    ds = rd.from_items([{'doc_id': i, 'text': t} for i, t in enumerate(texts)])
    got = repetition_stats(ds).to_pandas().set_index('doc_id')

    for i, t in enumerate(texts):
        t = t or ''
        lines = t.split('\n')
        toks = [x for x in re.split(r'[^0-9A-Za-z_]+', t) if x]
        grams = Counter(zip(toks, toks[1:]))
        assert got.loc[i, 'n_lines'] == len(lines)
        assert got.loc[i, 'n_dup_lines'] == len(lines) - len(set(lines))
        assert got.loc[i, 'n_2grams'] == max(len(toks) - 1, 0)
        assert got.loc[i, 'top_2gram_count'] == (max(grams.values())
                                                 if grams else 0)


def test_ngram_decontaminate_randomized_vs_python(ray_session):
    """ngram_decontaminate (broadcast benchmark-gram set + rolling window
    hashes) must count exactly the k-gram positions whose token k-gram
    occurs in the benchmark — checked against a per-doc Python reference
    with planted snippets, partial overlaps, short docs and nulls."""
    import re
    import ray.data as rd

    from morph_kgc_ray.ops.decontam import ngram_decontaminate

    rng = np.random.RandomState(5)
    vocab = [f'w{i}' for i in range(30)]
    bench = [' '.join(rng.choice(vocab, size=rng.randint(3, 12)))
             for _ in range(6)]
    k = 4
    texts = []
    for _ in range(60):
        words = list(rng.choice(vocab, size=rng.randint(0, 25)))
        if words and rng.rand() < 0.5:  # plant a benchmark snippet mid-doc
            snip = bench[rng.randint(len(bench))].split()
            pos = rng.randint(len(words) + 1)
            words = words[:pos] + snip + words[pos:]
        texts.append(' '.join(words))
    texts += ['', None, bench[0], 'w0 w1 w2']  # short / exact / sub-k
    ds = rd.from_items([{'doc_id': i, 'text': t} for i, t in enumerate(texts)])
    got = ngram_decontaminate(ds, bench, k=k).to_pandas() \
        .set_index('doc_id')['n_contaminated'].to_dict()

    bench_grams = set()
    for b in bench:
        toks = b.split()
        bench_grams |= {tuple(toks[i:i + k]) for i in range(len(toks) - k + 1)}
    planted = 0
    for i, t in enumerate(texts):
        toks = [x for x in re.split(r'[^0-9A-Za-z_]+', t or '') if x]
        want = sum(tuple(toks[i2:i2 + k]) in bench_grams
                   for i2 in range(len(toks) - k + 1))
        planted += want
        assert got[i] == want, (i, got[i], want)
    assert planted > 0  # the plantings must actually exercise the hit path


def test_chunk_documents_randomized_vs_python(ray_session):
    """chunk_documents (vectorized window gather + binary_join) must equal
    the per-doc Python sliding-window reference: boundary lengths (exact
    multiples, sub-window docs, empties, nulls), stride overlap, and
    chunk-text reassembly."""
    import re
    import ray.data as rd

    from morph_kgc_ray.ops.chunk import chunk_documents

    rng = np.random.RandomState(3)
    texts = [' '.join(f'w{rng.randint(50)}' for _ in range(m))
             for m in [0, 1, 4, 5, 9, 10, 11, 23, 24, 25, 100]]
    texts += ['', None, 'a\nb  c,d!e']
    W, S = 5, 4
    ds = rd.from_items([{'doc_id': i, 'text': t} for i, t in enumerate(texts)])
    got = chunk_documents(ds, window=W, stride=S).to_pandas() \
        .sort_values(['doc_id', 'chunk_id']).reset_index(drop=True)

    rows = []
    for i, t in enumerate(texts):
        toks = [x for x in re.split(r'[^0-9A-Za-z_]+', t or '') if x]
        for c, s in enumerate(range(0, len(toks), S)):
            w = toks[s:s + W]
            rows.append((i, c, len(w), ' '.join(w)))
    assert len(got) == len(rows)
    for (i, c, nt, txt), (_, r) in zip(rows, got.iterrows()):
        assert (r['doc_id'], r['chunk_id'], r['n_chunk_tokens'],
                r['chunk_text']) == (i, c, nt, txt)


def test_exact_dedup_keeps_min_id(docs_ds):
    from morph_kgc_ray.ops.dedup import exact_dedup
    out = exact_dedup(docs_ds, ['text'], 'doc_id').to_pandas()
    ids = set(out['doc_id'])
    assert 1 in ids and 2 not in ids and 3 in ids and 4 in ids


def test_minhash_clusters_group_near_duplicates(docs_ds):
    from morph_kgc_ray.ops.dedup import minhash_dedup_clusters
    out = minhash_dedup_clusters(docs_ds, rounds=2).to_pandas()
    clusters = dict(zip(out['doc_id'], out['cluster_id']))
    # exact duplicates must cluster together under the min id
    assert clusters.get(2) == 1
    # doc 4 (unrelated) must not join cluster 1
    assert clusters.get(4, 4) != 1


def test_min_label_clusters_converges_on_long_chain(ray_session):
    """A 6-node duplicate chain 1~2~3~4~5~6 must collapse into ONE cluster
    with the default (convergence) config — fixed-round propagation would
    split any chain longer than the round count."""
    import ray.data as rd
    from morph_kgc_ray.ops.dedup import min_label_clusters
    pairs = rd.from_items([{'id_a': a, 'id_b': a + 1} for a in range(1, 6)])
    out = min_label_clusters(pairs).to_pandas()
    assert set(out['doc_id']) == {1, 2, 3, 4, 5, 6}
    assert set(out['cluster_id']) == {1}


def test_distinct_in_place_filters_cross_block_losers(ray_session):
    """Blocks with DISTINCT content sharing some rows: the push exchange
    must identify the shared rows and exactly one copy must survive."""
    import ray.data as rd
    from morph_kgc_ray.engine.dedup import distinct_in_place
    block_a = [{'s': 'a', 'p': 'p', 'o': '1'}, {'s': 'shared', 'p': 'p', 'o': 'x'}]
    block_b = [{'s': 'b', 'p': 'p', 'o': '2'}, {'s': 'shared', 'p': 'p', 'o': 'x'}]
    ds = rd.from_items(block_a).union(rd.from_items(block_b))
    out = distinct_in_place(ds, ['s', 'p', 'o']).to_pandas()
    assert len(out) == 3
    assert (out['s'] == 'shared').sum() == 1


def test_distinct_in_place_fallback_above_dup_cap(ray_session):
    """Above driver_dup_cap the broadcast-map path must reroute to the keyed
    exchange and still produce an exact distinct."""
    import ray.data as rd
    from morph_kgc_ray.engine.dedup import distinct_in_place
    rows = [{'s': f's{i % 40}', 'p': 'p', 'o': f'o{i % 40}'} for i in range(400)]
    ds = rd.from_items(rows).repartition(8)
    for cap in (0, 10**6):  # forced fallback and normal path agree
        out = distinct_in_place(ds, ['s', 'p', 'o'], driver_dup_cap=cap).to_pandas()
        assert len(out) == 40
        assert len(out.drop_duplicates()) == 40


def test_hash_bucket_state_occurrences_and_idempotent_retry():
    """Plain-class check of the overlapped-exchange reducer: every
    occurrence of a cross-block duplicate hash is reported with its block
    id, within-block rows don't count as dups, and a retried producer
    REPLACES its prior submission."""
    from morph_kgc_ray.engine.dedup import _HashBucketState
    s = _HashBucketState()
    s.add('r1', 7, np.array([1, 2], dtype=np.uint64), np.array([10, 20], dtype=np.uint64))
    s.add('r1', 3, np.array([2, 5], dtype=np.uint64), np.array([20, 50], dtype=np.uint64))
    # same h1 but different h2 — NOT a duplicate pair
    s.add('r1', 9, np.array([1], dtype=np.uint64), np.array([99], dtype=np.uint64))
    # a different run's identical rows are INVISIBLE to r1 (pool sharing)
    s.add('r2', 99, np.array([1], dtype=np.uint64), np.array([10], dtype=np.uint64))
    h1, h2, bid = s.dup_occurrences('r1')
    assert list(h1) == [2, 2] and list(h2) == [20, 20] and sorted(bid) == [3, 7]
    assert s.total_received('r1') == 5
    # retry of block 9 replaces, never double-counts
    s.add('r1', 9, np.array([1], dtype=np.uint64), np.array([99], dtype=np.uint64))
    assert s.total_received('r1') == 5
    s.clear('r1')
    assert s.total_received('r1') == 0
    assert s.total_received('r2') == 1


def test_hash_bucket_state_bitmap_vs_bruteforce():
    """The slot-bitmap prefilter (dup detection folded into add) must
    report EXACTLY the brute-force (h1,h2) multi-occurrence set, under
    heavy slot collisions (tiny SLOT_BITS), planted cross-part and
    within-part duplicates, and a retried (replaced) part."""
    from collections import Counter

    from morph_kgc_ray.engine.dedup import _HashBucketState

    class _TinySlots(_HashBucketState):
        SLOT_BITS = 6  # 64 slots for ~600 rows -> constant collisions

    rng = np.random.RandomState(42)
    s = _TinySlots()
    parts = {}
    pool = rng.randint(0, 2**63, size=120, dtype=np.int64).astype(np.uint64)
    for b in range(12):
        h1 = pool[rng.randint(0, len(pool), size=50)]  # repeats everywhere
        if b == 4:
            h1 = np.concatenate([h1, h1[:3]])  # within-part repeats
        h2 = h1 ^ np.uint64(0xABCD)
        parts[b] = (h1, h2)
        s.add('r', b, h1, h2)
    s.add('r', 7, *parts[7])  # retry replaces (adds only false candidates)

    got_h1, got_h2, got_bid = s.dup_occurrences('r')
    got = Counter(zip(got_h1.tolist(), got_h2.tolist(), got_bid.tolist()))
    occ = Counter()
    for b, (h1, h2) in parts.items():
        for a, c in zip(h1.tolist(), h2.tolist()):
            occ[(a, c, b)] += 1
    totals = Counter()
    for (a, c, _b), n in occ.items():
        totals[(a, c)] += n
    want = Counter({k: n for k, n in occ.items() if totals[(k[0], k[1])] > 1})
    assert got == want


def test_content_bid_properties():
    """Block ids derive from block content: retry-stable (same content ->
    same id), order-sensitive (a permuted block is a different block)."""
    from morph_kgc_ray.engine.dedup import _content_bid
    a = np.array([5, 9, 1], dtype=np.uint64)
    assert _content_bid(a) == _content_bid(a.copy())
    assert _content_bid(a) != _content_bid(a[::-1].copy())
    assert _content_bid(np.array([], dtype=np.uint64)) != _content_bid(a)


def test_min_label_clusters_distributed_converges(ray_session):
    """Same 6-node chain, but forced through the DISTRIBUTED convergence
    loop (driver_edge_cap=0 disables the union-find fast path)."""
    import ray.data as rd
    from morph_kgc_ray.ops.dedup import min_label_clusters
    pairs = rd.from_items([{'id_a': a, 'id_b': a + 1} for a in range(1, 6)])
    out = min_label_clusters(pairs, driver_edge_cap=0).to_pandas()
    assert set(out['doc_id']) == {1, 2, 3, 4, 5, 6}
    assert set(out['cluster_id']) == {1}


def test_min_label_clusters_fixed_rounds_still_supported(ray_session):
    import ray.data as rd
    from morph_kgc_ray.ops.dedup import min_label_clusters
    pairs = rd.from_items([{'id_a': a, 'id_b': a + 1} for a in range(1, 6)])
    out = min_label_clusters(pairs, rounds=2).to_pandas()
    # 2 rounds cannot traverse the whole chain: >1 cluster label survives
    assert set(out['doc_id']) == {1, 2, 3, 4, 5, 6}
    assert len(set(out['cluster_id'])) > 1


def test_simhash_identical_docs_equal(docs_ds):
    from morph_kgc_ray.ops.dedup import simhash
    out = simhash(docs_ds).to_pandas()
    h = dict(zip(out['doc_id'], out['simhash']))
    assert h[1] == h[2]
    assert h[1] != h[4]


def test_ngram_jaccard():
    from morph_kgc_ray.ops.dedup import ngram_jaccard
    assert ngram_jaccard('abcdef', 'abcdef') == 1.0
    assert ngram_jaccard('abcdef', 'uvwxyz') == 0.0


def test_brute_force_topk_matches_numpy(ray_session):
    import ray.data as rd
    from morph_kgc_ray.ops.similarity import brute_force_topk
    rng = np.random.default_rng(0)
    V = rng.normal(size=(200, 16)).astype(np.float32)
    ds = rd.from_items([{'vec_id': i, 'embedding': V[i].tolist()} for i in range(200)])
    out = brute_force_topk(ds, V[:3], np.arange(3), k=5)
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    sims = Vn[:3] @ Vn.T
    for qi in range(3):
        expected = set(np.argsort(-sims[qi])[:5].tolist())
        got = {n for q, n in zip(out['query_id'].to_pylist(), out['neighbor_id'].to_pylist()) if q == qi}
        assert got == expected


def test_ivf_build_probe_recall(ray_session, tmp_path):
    import ray.data as rd
    from morph_kgc_ray.ops.similarity import brute_force_topk, ivf_build, ivf_probe
    rng = np.random.default_rng(3)
    # clustered data so k-means has real structure to find
    centers = rng.normal(size=(6, 16)).astype(np.float32) * 4
    V = np.concatenate([centers[i % 6] + rng.normal(size=16).astype(np.float32)
                        for i in range(300)]).reshape(300, 16)
    ds = rd.from_items([{'vec_id': i, 'embedding': V[i].tolist()} for i in range(300)])
    exact = brute_force_topk(ds, V[:4], np.arange(4), k=10)
    idx = str(tmp_path / 'ivf')
    ivf_build(ds, idx, num_centroids=6)
    approx = ivf_probe(idx, V[:4], np.arange(4), k=10, nprobe=2)
    want, got = {}, {}
    for q, n in zip(exact['query_id'].to_pylist(), exact['neighbor_id'].to_pylist()):
        want.setdefault(q, set()).add(n)
    for q, n in zip(approx['query_id'].to_pylist(), approx['neighbor_id'].to_pylist()):
        got.setdefault(q, set()).add(n)
    recall = np.mean([len(want[q] & got.get(q, set())) / len(want[q]) for q in want])
    assert recall >= 0.9


def test_lang_id(ray_session):
    import ray.data as rd
    from morph_kgc_ray.ops.text import lang_id
    ds = rd.from_items([
        {'doc_id': 1, 'text': 'the cat and the dog of the house is in that garden'},
        {'doc_id': 2, 'text': 'der Hund und die Katze ist das nicht ein Haus'},
    ])
    out = lang_id(ds, concurrency=1).to_pandas().set_index('doc_id')['lang_pred'].to_dict()
    assert out[1] == 'en' and out[2] == 'de'


def test_multimodal_plumbing(ray_session):
    import ray.data as rd
    from morph_kgc_ray.ops.multimodal import decode_images, sample_frames
    ds = rd.from_items([{'doc_id': i, 'image': bytes([i]) * 100} for i in range(4)])
    out = decode_images(ds, concurrency=1, batch_size=2).to_pandas()
    assert set(out.columns) >= {'width', 'height', 'features'}
    assert len(out) == 4
    vds = rd.from_items([{'doc_id': 1, 'video': b'0123456789abcdef'}])
    frames = sample_frames(vds, n_frames=4, concurrency=1).to_pandas()
    assert len(frames) == 4 and list(frames['frame_index']) == [0, 1, 2, 3]


def test_web_pipeline_invariant_and_resume(ray_session, tmp_path):
    import ray.data as rd
    from morph_kgc_ray.pipelines.pages import extract_text, pages_parquet_dir
    from morph_kgc_ray.pipelines.web import web_kg_triples, write_web_kg

    d = pages_parquet_dir(300, seed=11, num_files=2)
    # per-row invariant: pipeline-extracted text == reference extractor output
    raw = rd.read_parquet(d, columns=['url', 'html', 'text']).to_pandas()
    for h, t in zip(raw['html'], raw['text']):
        assert extract_text(h) == t

    pages = rd.read_parquet(d, columns=['url', 'warc_ts', 'html', 'lang'])
    tri = web_kg_triples(pages, concurrency=1).to_pandas()
    assert set(tri['partition']) == {'p_url', 'p_date', 'p_lang', 'p_digest',
                                     'p_langdet', 'p_quality', 'p_mentions'}
    # every page contributes exactly one url triple
    assert (tri['partition'] == 'p_url').sum() == 300
    # dedup: no duplicate triples
    assert not tri.duplicated(['subject', 'predicate', 'object']).any()

    out_dir = str(tmp_path / 'kg')
    pages2 = rd.read_parquet(d, columns=['url', 'warc_ts', 'html', 'lang'])
    rep = write_web_kg(pages2, out_dir, resume=False, concurrency=1)
    assert rep['total'] == len(tri)
    rep2 = write_web_kg(pages2, out_dir, resume=True, concurrency=1)
    assert rep2['total'] == rep['total']  # resumed from manifest, no rewrite


def test_web_actor_pool_survives_actor_kill(ray_session):
    """Kill one emit actor mid-run (SIGKILL on its worker process): Ray Data
    must restart/retry and the triple set must equal the task-form result
    exactly.  Possible because the kernel's actor form carries NO
    user-supplied ObjectRef constructor args (gazetteer baked into a closure
    class) — the residual ray#53727 core_worker warning comes from Ray
    Data's own MapWorker internals (reproducible with a no-arg identity
    kernel) and does not affect restartability."""
    import os
    import signal
    import threading
    import time
    import ray
    import ray.data as rd
    from morph_kgc_ray.pipelines.pages import pages_parquet_dir
    from morph_kgc_ray.pipelines.web import web_kg_triples

    d = pages_parquet_dir(600, seed=13, num_files=4)

    def triple_set(concurrency):
        pages = rd.read_parquet(d, columns=['url', 'warc_ts', 'html', 'lang'])
        t = web_kg_triples(pages, concurrency=concurrency, batch_size=64).to_pandas()
        return set(map(tuple, t[['partition', 'subject', 'predicate', 'object']].values))

    expected = triple_set(None)  # task form reference

    killed = {'pid': None}

    def assassin():
        # GCS actor table works with the dashboard disabled (the
        # ray.util.state API does not)
        deadline = time.time() + 30
        while time.time() < deadline:
            try:
                table = ray._private.state.state.actor_table(None)
            except Exception:
                time.sleep(0.1)
                continue
            for info in table.values():
                if 'EmitKernel' in (info.get('ActorClassName') or '') \
                        and info.get('State') != 'DEAD' and info.get('Pid'):
                    try:
                        os.kill(info['Pid'], signal.SIGKILL)
                        killed['pid'] = info['Pid']
                        return
                    except ProcessLookupError:
                        pass
            time.sleep(0.05)

    th = threading.Thread(target=assassin, daemon=True)
    th.start()
    got = triple_set(2)
    th.join(timeout=35)
    assert got == expected
    # the kill must actually have happened for this test to mean anything
    assert killed['pid'] is not None, 'assassin never found an emit actor'


def test_engine_resumable_writer(ray_session, tmp_path):
    from morph_kgc_ray import Config, materialize_to_dir
    cfg = Config({'DS': {'mappings': '/root/reference/test/rml-core/csv/RMLTC0001a/mapping.ttl'},
                  'source_base_dir': '/root/reference', 'output_format': 'N-TRIPLES'})
    out = str(tmp_path / 'out')
    rep = materialize_to_dir(cfg, out, resume=False)
    assert sum(v['rows'] for v in rep.values()) == 1
    rep2 = materialize_to_dir(cfg, out, resume=True)
    assert all(v['skipped'] for v in rep2.values())


def test_embedding_neardup(ray_session):
    import ray.data as rd
    from morph_kgc_ray.ops.dedup import embedding_neardup_clusters, embedding_neardup_pairs
    rng = np.random.default_rng(5)
    base = rng.normal(size=(3, 32)).astype(np.float32) * 3
    rows = []
    # vectors 0/1 near-dup of base0, 2/3 near-dup of base1, 4 unrelated
    for i, b in [(0, 0), (1, 0), (2, 1), (3, 1)]:
        rows.append({'vec_id': i, 'embedding': (base[b] + rng.normal(size=32, scale=0.05)).tolist()})
    rows.append({'vec_id': 4, 'embedding': base[2].tolist()})
    ds = rd.from_items(rows)
    pairs = embedding_neardup_pairs(ds, threshold=0.95).to_pandas()
    got = {tuple(r) for r in pairs[['id_a', 'id_b']].itertuples(index=False)}
    assert got == {(0, 1), (2, 3)}
    clusters = embedding_neardup_clusters(ds, threshold=0.95, rounds=2).to_pandas()
    cl = dict(zip(clusters['vec_id'], clusters['cluster_id']))
    assert cl.get(1) == 0 and cl.get(3) == 2 and 4 not in cl


def test_engine_sink_partial_resume_reexecutes_missing_partition(ray_session, tmp_path):
    """Deleting one committed partition dir must re-execute ONLY that
    partition on resume (the others skip via their manifests)."""
    import os
    import shutil
    from morph_kgc_ray import Config, materialize_to_dir
    cfg = Config({'DS': {'mappings': '/root/reference/test/rml-core/csv/RMLTC0009a/mapping.ttl'},
                  'source_base_dir': '/root/reference', 'output_format': 'N-TRIPLES'})
    out = str(tmp_path / 'out')
    rep = materialize_to_dir(cfg, out, resume=False)
    assert len(rep) >= 2 and not any(v['skipped'] for v in rep.values())
    victim = sorted(os.listdir(out))[0]
    shutil.rmtree(os.path.join(out, victim))
    rep2 = materialize_to_dir(cfg, out, resume=True)
    redone = {pid for pid, v in rep2.items() if not v['skipped']}
    assert len(redone) == 1  # only the deleted partition re-ran
    assert os.path.exists(os.path.join(out, victim, '_MANIFEST.json'))


def test_sink_file_uri_and_subtree_filesystem(ray_session, tmp_path):
    """The sinks must work through pyarrow.fs: a ``file://`` URI takes the
    local rename-commit path; a SubTreeFileSystem (stand-in for an object
    store: no directory rename) takes the manifest-marker commit path.  Both
    must produce identical content and resume idempotently."""
    import os
    from pyarrow import fs as pafs
    import ray.data as rd
    from morph_kgc_ray.sinks import writers

    def mk_triples():
        return rd.from_items([
            {'partition': 'p1', 'subject': '<s1>', 'predicate': '<p>', 'object': '<o1>'},
            {'partition': 'p2', 'subject': '<s2>', 'predicate': '<p>', 'object': '<o2>'}])

    # file:// URI → rename-commit
    uri = f'file://{tmp_path}/kg_uri'
    rep = writers.write_partition_column_ntriples(mk_triples(), uri, resume=False)
    assert rep['total'] == 2 and set(rep['partitions']) == {'p1', 'p2'}
    assert os.path.exists(f'{tmp_path}/kg_uri/_MANIFEST.json')
    assert not os.path.exists(f'{tmp_path}/kg_uri.tmp')
    rep2 = writers.write_partition_column_ntriples(mk_triples(), uri, resume=True)
    assert rep2 == rep  # manifest resume, no rewrite

    # SubTreeFileSystem → marker-object commit (no .tmp staging dir ever)
    os.makedirs(f'{tmp_path}/bucket')
    sub = pafs.SubTreeFileSystem(f'{tmp_path}/bucket', pafs.LocalFileSystem())
    rep3 = writers.write_partition_column_ntriples(mk_triples(), 'kg', resume=False,
                                                   filesystem=sub)
    assert rep3['total'] == 2
    assert os.path.exists(f'{tmp_path}/bucket/kg/_MANIFEST.json')
    assert not os.path.exists(f'{tmp_path}/bucket/kg.tmp')
    rep4 = writers.write_partition_column_ntriples(mk_triples(), 'kg', resume=True,
                                                   filesystem=sub)
    assert rep4 == rep3

    # identical payload through both protocols
    def read_all(base):
        lines = []
        for root, _, files in os.walk(base):
            for fn in files:
                if fn.endswith('.nt'):
                    lines += open(os.path.join(root, fn)).read().splitlines()
        return sorted(l for l in lines if l.strip())
    assert read_all(f'{tmp_path}/kg_uri') == read_all(f'{tmp_path}/bucket/kg')


def test_engine_sink_subtree_filesystem_resume(ray_session, tmp_path):
    """materialize_to_dir over a non-rename filesystem: manifest-marker
    commit per partition, resume skips, deleting one partition's manifest
    re-executes only that partition."""
    import os
    from pyarrow import fs as pafs
    from morph_kgc_ray import Config, materialize_to_dir
    cfg = Config({'DS': {'mappings': '/root/reference/test/rml-core/csv/RMLTC0009a/mapping.ttl'},
                  'source_base_dir': '/root/reference', 'output_format': 'N-TRIPLES'})
    os.makedirs(f'{tmp_path}/bucket')
    sub = pafs.SubTreeFileSystem(f'{tmp_path}/bucket', pafs.LocalFileSystem())
    rep = materialize_to_dir(cfg, 'out', resume=False, filesystem=sub)
    assert sum(v['rows'] for v in rep.values()) == 4
    assert not any(d.endswith('.tmp') for d in os.listdir(f'{tmp_path}/bucket/out'))
    rep2 = materialize_to_dir(cfg, 'out', resume=True, filesystem=sub)
    assert all(v['skipped'] for v in rep2.values())
    victim = sorted(os.listdir(f'{tmp_path}/bucket/out'))[0]
    os.unlink(f'{tmp_path}/bucket/out/{victim}/_MANIFEST.json')
    rep3 = materialize_to_dir(cfg, 'out', resume=True, filesystem=sub)
    assert sum(0 if v['skipped'] else 1 for v in rep3.values()) == 1


def test_shingle_jaccard_matches_set_semantics():
    from morph_kgc_ray.ops.dedup import shingle_jaccard
    a = 'w1 w2 w3 w4 w5 w6'
    assert shingle_jaccard(a, a) == 1.0
    assert shingle_jaccard('', '') == 1.0
    assert shingle_jaccard(a, '') == 0.0
    # 2 shingles each, 1 shared -> 1/3
    assert abs(shingle_jaccard('a b c d e f', 'a b c d e g') - 1 / 3) < 1e-12
    # short docs (< 5 words) compare their single whole-text shingle
    assert shingle_jaccard('x y', 'x y') == 1.0
    assert shingle_jaccard('x y', 'x z') == 0.0


def test_verify_pairs_word_metric_separates_background(docs_ds, ray_session):
    """Word-shingle verification keeps true near-dups and drops pairs that
    merely share character 3-grams (vocabulary overlap)."""
    import ray.data as rd
    from morph_kgc_ray.ops.dedup import verify_pairs_jaccard
    pairs = rd.from_items([{'id_a': 1, 'id_b': 2},   # exact dup: j=1.0
                           {'id_a': 1, 'id_b': 4}])  # unrelated text
    out = verify_pairs_jaccard(pairs, docs_ds, threshold=0.5).to_pandas()
    got = set(zip(out['id_a'], out['id_b']))
    assert (1, 2) in got and (1, 4) not in got


def test_rolling_hash_fingerprint_vectorized_matches_scalar(ray_session):
    """The mod-2^64 inverse-prefix vectorization must equal the byte-loop
    recurrence on every length class (empty, sub-window, window boundary,
    long)."""
    import random
    import ray.data as rd
    from morph_kgc_ray.ops.text import rolling_hash_fingerprint

    B, MASK, W = 1000003, (1 << 64) - 1, 64
    Bw = pow(B, W - 1, 1 << 64)

    def scalar(text):
        data = text.encode('utf-8')
        h = 0
        if len(data) < W:
            for b in data:
                h = (h * B + b) & MASK
            return h
        for b in data[:W]:
            h = (h * B + b) & MASK
        best = h
        for i in range(1, len(data) - W + 1):
            h = ((h - data[i - 1] * Bw) * B + data[i + W - 1]) & MASK
            best = min(best, h)
        return best

    random.seed(7)
    texts = ['', 'a', 'short text', 'x' * 63, 'y' * 64, 'z' * 65,
             ''.join(random.choice('abc def\n') for _ in range(3000))]
    ds = rd.from_items([{'doc_id': i, 'text': t} for i, t in enumerate(texts)])
    out = rolling_hash_fingerprint(ds).to_pandas().set_index('doc_id')['winnow_fp'].to_dict()
    for i, t in enumerate(texts):
        assert int(out[i]) == scalar(t), f'mismatch on text #{i}'


def test_embedding_neardup_pairs_corpus_cap(ray_session):
    import ray.data as rd
    from morph_kgc_ray.ops.dedup import embedding_neardup_pairs
    ds = rd.from_items([{'vec_id': i, 'embedding': [1.0, 0.0]} for i in range(10)])
    with pytest.raises(ValueError, match='corpus_cap'):
        embedding_neardup_pairs(ds, corpus_cap=5).take_all()


def test_sink_prunes_orphan_shards(ray_session, tmp_path):
    """A shard file written by a failed/retried task attempt (present in the
    tmp dir but absent from the committed count rows) must NOT survive the
    manifest commit."""
    import json
    import os
    import ray.data as rd
    from morph_kgc_ray.sinks import writers

    triples = rd.from_items([
        {'partition': 'p1', 'subject': '<s>', 'predicate': '<p>', 'object': '<o>'}])

    # plant the orphan via a hook on the writer: subclass writes an extra
    # un-reported shard file the way a failed attempt would leave one behind
    orig_call = writers._PartitionedShardWriter.__call__

    def call_with_orphan(self, t):
        out = orig_call(self, t)
        pdir = os.path.join(self.tmp_dir, 'part=p1')
        os.makedirs(pdir, exist_ok=True)
        with open(os.path.join(pdir, 'shard_deadbeef0000.nt'), 'wb') as f:
            f.write(b'<dup> <dup> <dup> .\n')
        return out

    writers._PartitionedShardWriter.__call__ = call_with_orphan
    try:
        out_dir = str(tmp_path / 'kg')
        report = writers.write_partition_column_ntriples(triples, out_dir, resume=False)
    finally:
        writers._PartitionedShardWriter.__call__ = orig_call

    files = sorted(os.listdir(os.path.join(out_dir, 'part=p1')))
    assert 'shard_deadbeef0000.nt' not in files
    with open(os.path.join(out_dir, '_MANIFEST.json')) as f:
        manifest = json.load(f)
    assert sorted(manifest['shards']['p1']) == [f for f in files if f.endswith('.nt')]
    assert manifest['partitions']['p1'] == 1


def test_strict_refs_aggregate_across_files(ray_session, tmp_path):
    """strict_undefined_references must validate at SOURCE level: a reference
    present only in SOME files of a glob is fine; one present nowhere errors."""
    import json as _json
    from morph_kgc_ray.sources.readers import JsonIteratorKernel, _read_json

    (tmp_path / 'a.json').write_text(_json.dumps([{'id': 1, 'name': 'x'}]))
    (tmp_path / 'b.json').write_text(_json.dumps([{'id': 2, 'extra': 'y'}]))
    rule = {'logical_source_value': str(tmp_path / '*.json'), 'iterator': '$.[*]'}

    # 'extra' only exists in b.json -> valid at source level
    ds = _read_json(rule, ['id', 'extra'], na_values=[], strict=True)
    assert ds.count() >= 1

    # 'nope' exists in no file -> source-level error
    with pytest.raises(ValueError, match='invalid reference'):
        _read_json(rule, ['id', 'nope'], na_values=[], strict=True)


def test_sql_dialect_quoting():
    from morph_kgc_ray.sources.readers import _build_sql_query
    rule = {'logical_source_type': 'http://w3id.org/rml/tableName',
            'logical_source_value': 'Student'}
    ansi = _build_sql_query(rule, ['Name'], 'postgresql://u@h/db')
    assert ansi == 'SELECT "Name" FROM "Student" WHERE "Name" IS NOT NULL'
    my = _build_sql_query(rule, ['Name'], 'mysql+pymysql://u@h/db')
    assert my == 'SELECT `Name` FROM `Student` WHERE `Name` IS NOT NULL'
    sqlite = _build_sql_query(rule, ['Name'], 'sqlite:///x.db')
    assert '"Name"' in sqlite


def test_xml_xpath_predicates_and_text_steps(ray_session, tmp_path):
    """The ElementTree-backed XPath subset must handle predicates,
    positional indexes, wildcards and text() steps in iterators and
    references, with '@' splitting only outside predicate brackets."""
    from morph_kgc_ray.sources.readers import XmlIteratorKernel, _read_xml
    import pandas as pd

    xml = '''<root>
      <item type="x" id="1"><name>Alpha</name><tag>t1</tag><tag>t2</tag></item>
      <item type="y" id="2"><name>Beta</name><tag>t3</tag></item>
      <item type="x" id="3"><name>Gamma</name></item>
    </root>'''
    p = tmp_path / 'd.xml'
    p.write_text(xml)

    def run(iterator, refs):
        k = XmlIteratorKernel(iterator, refs)
        out = k(pd.DataFrame({'bytes': [xml.encode()]}))
        return out.to_pydict()

    # predicate in the ITERATOR
    got = run("/root/item[@type='x']", ['name'])
    assert got['name'] == ['Alpha', 'Gamma']
    # predicate in a REFERENCE + attribute after the bracket
    got = run('/root', ["item[@type='x']@id"])
    assert sorted(got["item[@type='x']@id"]) == ['1', '3']
    # positional index and text() step
    got = run('/root/item[1]', ['tag[2]/text()'])
    assert got['tag[2]/text()'] == ['t2']
    # wildcard step
    got = run('/root/*[@id="2"]', ['name/text()'])
    assert got['name/text()'] == ['Beta']

    # end-to-end through read_source-level reader (multi-file glob ok)
    rule = {'logical_source_value': str(p), 'iterator': "/root/item[@type='x']"}
    ds = _read_xml(rule, ['name', '@id'], na_values=[])
    df = ds.to_pandas().sort_values('@id').reset_index(drop=True)
    assert list(df['name']) == ['Alpha', 'Gamma']
    assert list(df['@id']) == ['1', '3']


def test_distinct_in_place_lost_push_reroutes_exactly(ray_session, monkeypatch, caplog):
    """Fire-and-forget safety rail: a reducer that silently LOSES pushed
    hash rows (worker death after task commit, twin-content id collision)
    must fail the driver's delivery-count verification and reroute through
    the keyed payload exchange — same exact result, never a wrong answer."""
    import logging

    import ray
    import ray.data as rd
    from morph_kgc_ray.engine import dedup as dd

    class _LossyState(dd._HashBucketState):
        def add(self, run, bid, h1, h2):  # drop the last row of every push
            return super().add(run, bid, h1[:-1], h2[:-1])

    monkeypatch.setattr(dd, '_HashBucketReducer',
                        ray.remote(num_cpus=0)(_LossyState))
    rows = [{'s': f's{i % 30}', 'p': 'p', 'o': f'o{i % 30}'} for i in range(300)]
    ds = rd.from_items(rows).repartition(6)
    with caplog.at_level(logging.WARNING, logger='morph_kgc_ray.engine.dedup'):
        out = dd.distinct_in_place(ds, ['s', 'p', 'o'], num_buckets=3).to_pandas()
    assert len(out) == 30
    assert len(out.drop_duplicates()) == 30
    assert any('rerouting' in r.message for r in caplog.records)


def test_quantize_embeddings_roundtrip_bound(ray_session):
    """q * scale must reconstruct each component within half a quantization
    step; zero vectors quantize to zeros with scale 0."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from morph_kgc_ray.ops.similarity import quantize_embeddings
    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(50, 16)).astype(np.float32)
    vecs[3] = 0.0
    ds = rd.from_arrow(pa.table({
        'vec_id': pa.array(np.arange(50, dtype=np.int64)),
        'embedding': pa.array(vecs.tolist(), pa.list_(pa.float32()))}))
    out = quantize_embeddings(ds).to_pandas().sort_values('vec_id')
    q = np.stack(out['q'].to_numpy())
    scale = out['scale'].to_numpy()
    recon = q * scale[:, None]
    err = np.abs(recon - vecs.astype(np.float64))
    assert (err <= scale[:, None] / 2 + 1e-12).all()
    assert (q[3] == 0).all() and scale[3] == 0.0
    assert q.min() >= -127 and q.max() <= 127


def test_unigram_lm_score_exact_and_vocab_cap(ray_session):
    import math

    import ray.data as rd

    from morph_kgc_ray.ops.lm import train_unigram, unigram_lm_score

    texts = ['a a b', 'b c', '   ', '', 'a d e f']
    ds = rd.from_items([{'doc_id': i, 'text': t} for i, t in enumerate(texts)])

    # uncapped: scores must equal the hand-computed fixed-point sums
    total = 9  # a:3 b:2 c:1 d:1 e:1 f:1
    cnts = {'a': 3, 'b': 2, 'c': 1, 'd': 1, 'e': 1, 'f': 1}
    fp = {t: math.floor(-math.log(c / total) * 1e6) for t, c in cnts.items()}
    out = unigram_lm_score(ds).to_pandas().set_index('doc_id').sort_index()
    assert out['n_tokens'].tolist() == [3, 2, 0, 0, 4]
    expect = [fp['a'] * 2 + fp['b'], fp['b'] + fp['c'], 0, 0,
              fp['a'] + fp['d'] + fp['e'] + fp['f']]
    assert out['nll_micronats'].tolist() == expect

    # capped vocab: only the top-2 tokens (a, b) stay in-vocab; everything
    # else scores the OOV floor count=1 — same value as uncapped here since
    # all dropped tokens have count 1
    model = train_unigram(ds, vocab_cap=2)
    assert sorted(model['tokens'].to_pylist()) == ['a', 'b']
    assert model['total'] == total  # total is fitted BEFORE the cap
    capped = unigram_lm_score(ds, model=model).to_pandas() \
        .set_index('doc_id').sort_index()
    assert capped['nll_micronats'].tolist() == expect


def test_bloom_anti_join_exact_under_false_positives(ray_session):
    import numpy as np
    import ray.data as rd

    from morph_kgc_ray.ops.bloom import bloom_anti_join, build_bloom, _bloom_mask

    rng = np.random.RandomState(3)
    vals = [f'k{rng.randint(0, 400)}' for _ in range(1000)]
    block = sorted({f'k{i}' for i in range(0, 400, 7)})
    left = rd.from_items([{'rid': i, 'key': v} for i, v in enumerate(vals)],
                         override_num_blocks=8)
    keys = rd.from_items([{'key': b} for b in block], override_num_blocks=4)

    # tiny filter => real false positives must exist, and the verify join
    # must still produce the exact NOT IN result
    bloom = build_bloom(keys, 'key', num_bits=64, num_hashes=1)
    probe = pa.table({'key': pa.array(sorted(set(vals)))})
    hits = _bloom_mask(bloom, probe, 'key')
    truth = np.array([k in set(block) for k in probe['key'].to_pylist()])
    assert (hits & ~truth).any()          # false positives present
    assert not (~hits & truth).any()      # never a false negative

    out = bloom_anti_join(left, keys, 'key', num_bits=64, num_hashes=1) \
        .to_pandas().sort_values('rid')
    expect = [(i, v) for i, v in enumerate(vals) if v not in set(block)]
    assert list(zip(out['rid'], out['key'])) == expect

    # the small (broadcast-exact-verify) plan must agree with the join plan
    small = bloom_anti_join(left, keys, 'key', num_bits=64, num_hashes=1,
                            small=True).to_pandas().sort_values('rid')
    assert list(zip(small['rid'], small['key'])) == expect


def test_cap_per_key_matches_pandas_window(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from morph_kgc_ray.ops.sample import cap_per_key

    rng = np.random.RandomState(11)
    df = pd.DataFrame({'rid': np.arange(500),
                       'grp': rng.randint(0, 12, 500),
                       'val': rng.randint(0, 40, 500)})
    ds = rd.from_pandas(df).repartition(7)
    out = cap_per_key(ds, 'grp', 4, ['val', 'rid']).to_pandas()
    exp = df.sort_values(['grp', 'val', 'rid'])
    exp['rn'] = exp.groupby('grp').cumcount() + 1
    exp = exp[exp['rn'] <= 4]
    got = out.sort_values(['grp', 'val', 'rid']).reset_index(drop=True)
    assert got[['rid', 'grp', 'val', 'rn']].values.tolist() == \
        exp[['rid', 'grp', 'val', 'rn']].reset_index(drop=True).values.tolist()


def test_top_ngrams_ties_and_counts(ray_session):
    import ray.data as rd
    from morph_kgc_ray.ops.text import top_ngrams
    ds = rd.from_items([
        {'text': 'a b c a b'},   # bigrams: a b, b c, c a, a b
        {'text': 'a b x'},       # a b, b x
        {'text': None},
        {'text': 'solo'},        # no bigram
    ])
    got = top_ngrams(ds, n=2, k=3, small=True).take_all()
    assert got == [{'ngram': 'a b', 'n': 3},
                   {'ngram': 'b c', 'n': 1},   # count-1 ties broken ngram ASC
                   {'ngram': 'b x', 'n': 1}]
    # distributed combine plan agrees with the single-task plan
    got_dist = top_ngrams(ds.repartition(3), n=2, k=3, small=False).take_all()
    assert got_dist == got


def test_top_ngrams_trigrams_respect_doc_boundaries(ray_session):
    import ray.data as rd
    from morph_kgc_ray.ops.text import top_ngrams
    ds = rd.from_items([{'text': 'x y'}, {'text': 'z w'}])
    # no trigram spans two docs even when tokens are adjacent in the flat array
    assert top_ngrams(ds, n=3, k=5, small=True).take_all() == []


def test_dup_spans_detects_shared_8grams(ray_session):
    import ray.data as rd
    from morph_kgc_ray.ops.dedup import dup_spans
    shared = 'one two three four five six seven eight'   # exactly 8 tokens
    rows = [
        {'doc_id': 1, 'text': f'intro {shared} outro alpha beta'},
        {'doc_id': 2, 'text': f'prefix words here {shared}'},
        {'doc_id': 3, 'text': 'totally unrelated text with eight distinct words'},
        {'doc_id': 4, 'text': 'short'},
    ]
    got = {r['doc_id']: r['n_dup_spans']
           for r in dup_spans(rd.from_items(rows).repartition(2), k=8).take_all()}
    # docs 1 and 2 share exactly the one 8-gram window 'one..eight'
    assert got == {1: 1, 2: 1}


def test_dup_spans_counts_distinct_spans_once_per_doc(ray_session):
    import ray.data as rd
    from morph_kgc_ray.ops.dedup import dup_spans
    text = 'a b c d e f g h i'   # 9 tokens -> two 8-gram windows
    rows = [{'doc_id': 1, 'text': text}, {'doc_id': 2, 'text': text},
            {'doc_id': 3, 'text': text + ' ' + text}]  # repeats internally
    got = {r['doc_id']: r['n_dup_spans'] for r in dup_spans(rd.from_items(rows)).take_all()}
    # doc 3 has more windows but shares the same 2 distinct grams + its
    # own bridging grams shared with nobody -> distinct shared grams only
    assert got[1] == 2 and got[2] == 2
    assert got[3] >= 2


def test_mixture_sample_rates_and_determinism(ray_session):
    import ray.data as rd
    from morph_kgc_ray.ops.sample import mixture_sample
    rows = [{'id': i, 'src': f's{i % 4}'} for i in range(4000)]
    ds = rd.from_items(rows)
    rates = {'s0': 1.0, 's1': 0.5, 's2': 0.0}   # s3 missing -> default_rate
    out = mixture_sample(ds, 'src', 'id', rates, seed=3).take_all()
    from collections import Counter
    c = Counter(r['src'] for r in out)
    assert c['s0'] == 1000 and c['s2'] == 0 and c.get('s3', 0) == 0
    assert 400 < c['s1'] < 600
    # deterministic across runs and partitionings
    out2 = mixture_sample(ds.repartition(7), 'src', 'id', rates, seed=3).take_all()
    assert sorted(r['id'] for r in out2) == sorted(r['id'] for r in out)
    # default_rate keeps unlisted groups
    out3 = mixture_sample(ds, 'src', 'id', rates, seed=3, default_rate=1.0).take_all()
    assert Counter(r['src'] for r in out3)['s3'] == 1000


def test_nfc_normalize_array_matches_unicodedata():
    import unicodedata

    from morph_kgc_ray.ops.text import nfc_normalize_array

    cases = ['plain ascii', 'Café', 'Ångstrom', 'König',
             'already é', '', None, 'ﬁne stays ligature in NFC',
             'à̖mixed marks']
    out = nfc_normalize_array(pa.array(cases, pa.string())).to_pylist()
    want = [None if s is None else unicodedata.normalize('NFC', s)
            for s in cases]
    assert out == want


def test_nfc_normalize_hypothesis_vs_duckdb(ray_session):
    """Arbitrary Unicode through the Arrow kernel must match DuckDB's
    utf8proc nfc_normalize byte-for-byte (the oracle's other side)."""
    import duckdb
    from hypothesis import given, settings, strategies as st

    from morph_kgc_ray.ops.text import nfc_normalize_array

    con = duckdb.connect()

    # no surrogates (invalid UTF-8) and no NUL: duckdb's parameter binding
    # truncates at an embedded NUL (a bind artifact, not an NFC divergence)
    @settings(max_examples=60, deadline=None)
    @given(st.lists(st.text(
        alphabet=st.characters(blacklist_categories=('Cs',),
                               blacklist_characters='\x00'),
        max_size=40), min_size=1, max_size=8))
    def check(strings):
        got = nfc_normalize_array(pa.array(strings, pa.string())).to_pylist()
        want = [con.execute('select nfc_normalize(?)', [s]).fetchone()[0]
                for s in strings]
        assert got == want

    check()


def test_normalize_text_pipeline(ray_session):
    import ray.data as rd

    from morph_kgc_ray.ops.text import normalize_text

    ds = rd.from_arrow(pa.table({
        'text': pa.array(['  a\x07b\t\tc  ', 'Café\n\nx', 'ok'],
                         pa.string())}))
    out = normalize_text(ds).to_pandas()
    assert list(out['norm_text']) == ['a b c', 'Café x', 'ok']
    assert list(out['n_chars_norm']) == [5, 6, 2]


def test_inverted_index_plans_agree(ray_session):
    import ray.data as rd

    from morph_kgc_ray.ops.text import inverted_index

    ds = rd.from_arrow(pa.table({
        'doc_id': pa.array([3, 1, 2, 4], pa.int64()),
        'text': pa.array(['b a a b', 'a c', 'a b', ''], pa.string()),
    })).repartition(3)
    want = [
        {'token': 'a', 'df': 3, 'min_doc': 1, 'max_doc': 3,
         'postings': '1,2,3'},
        {'token': 'b', 'df': 2, 'min_doc': 2, 'max_doc': 3,
         'postings': '2,3'},
    ]
    for small in (True, False):
        out = inverted_index(ds, min_df=2, small=small).to_pandas() \
            .sort_values('token').to_dict('records')
        assert out == want, (small, out)


def test_kmv_distinct_sketch(ray_session):
    import ray.data as rd

    from morph_kgc_ray.ops.sketch import kmv_distinct

    # exact regime: fewer distinct values than k
    small = rd.from_arrow(pa.table({
        'text': pa.array(['a', 'b', 'a', 'c'], pa.string())}))
    row = kmv_distinct(small, k=64).take_all()[0]
    assert (row['n_kept'], row['kth_min_hash'], row['est_distinct']) == (3, -1, 3)

    # estimating regime: 5000 distinct values, k=128 -> within ~20%
    big = rd.from_arrow(pa.table({
        'text': pa.array([f'v{i}' for i in range(5000)], pa.string())})) \
        .repartition(8)
    row = kmv_distinct(big, k=128).take_all()[0]
    assert row['n_kept'] == 128 and row['kth_min_hash'] > 0
    assert 4000 <= row['est_distinct'] <= 6000

    # token mode sketches the vocabulary, not the rows
    toks = rd.from_arrow(pa.table({
        'text': pa.array(['x y', 'y z', 'z x'], pa.string())}))
    row = kmv_distinct(toks, k=64, token_rx='[^0-9A-Za-z_]+').take_all()[0]
    assert row['est_distinct'] == 3


def test_remove_boilerplate(ray_session):
    import ray.data as rd

    from morph_kgc_ray.ops.text import remove_boilerplate

    ds = rd.from_arrow(pa.table({
        'doc_id': pa.array([1, 2, 3, 4], pa.int64()),
        'text': pa.array(['keep me\nFOOTER\nand me', 'FOOTER\nFOOTER',
                          'unique only', ''], pa.string())}))
    out = remove_boilerplate(ds, min_count=2, small=True).to_pandas() \
        .set_index('doc_id')
    # FOOTER repeats 3x corpus-wide -> dropped everywhere; doc 2 empties;
    # '' appears twice (docs 2-after-removal isn't counted — counting runs
    # on the ORIGINAL texts; doc 4's single '' paragraph is unique... no:
    # doc 4 text '' splits to [''] and no other doc has an empty paragraph,
    # so it stays)
    assert out.loc[1, 'clean_text'] == 'keep me\nand me'
    assert out.loc[1, 'n_removed'] == 1
    assert out.loc[2, 'clean_text'] == '' and out.loc[2, 'n_removed'] == 2
    assert out.loc[3, 'clean_text'] == 'unique only'
    assert out.loc[4, 'clean_text'] == '' and out.loc[4, 'n_removed'] == 0

    with pytest.raises(ValueError, match='max_boiler'):
        remove_boilerplate(ds, min_count=1, max_boiler=2, small=True)


def test_tfidf_top_terms(ray_session):
    import ray.data as rd

    from morph_kgc_ray.ops.text import tfidf_top_terms

    # 4 docs: 'common' in all (df=4, N//df=1, idf=1);
    # 'rare' only in doc 1 (df=1, N//df=4, idf=3)
    ds = rd.from_arrow(pa.table({
        'doc_id': pa.array([1, 2, 3, 4], pa.int64()),
        'text': pa.array(['common rare rare', 'common common common',
                          'common', 'common'], pa.string())}))
    out = tfidf_top_terms(ds, k_top=1, small=True).to_pandas() \
        .set_index('doc_id')
    # doc 1: rare tf=2 idf=3 -> 6 beats common tf=1 idf=1 -> 1
    assert (out.loc[1, 'token'], out.loc[1, 'score']) == ('rare', 6)
    # doc 2: common tf=3 -> 3
    assert (out.loc[2, 'token'], out.loc[2, 'score']) == ('common', 3)
    # distributed df combine agrees with the single-task one
    out2 = tfidf_top_terms(ds.repartition(3), k_top=1,
                           small=False).to_pandas().set_index('doc_id')
    assert out2.loc[1, 'score'] == 6 and out2.loc[2, 'score'] == 3


def test_gazetteer_unicode_alias_fallback(ray_session):
    """Non-ASCII aliases cannot ride the \\W+ token join (RE2 \\w is
    ASCII-only: 'Müller' tokenizes as 'M','ller'), so they must route
    through the per-entity regex fallback — the round-4 advisor's finding.
    ASCII aliases keep the token-join fast path in the same kernel."""
    from morph_kgc_ray.pipelines.web import SCHEMA_MENTIONS, TripleEmitKernel

    gaz = {'Müller': 'http://ex.org/entity/muller',
           'Acme001': 'http://ex.org/entity/acme'}
    kernel = TripleEmitKernel(gaz)
    assert len(kernel.iri_patterns) == 1      # the unicode alias, fallback
    assert len(kernel.alias_values) == 1      # the ascii alias, token join
    t = pa.table({
        'url': pa.array(['https://a.example/1', 'https://a.example/2',
                         'https://a.example/3'], pa.string()),
        'warc_ts': pa.array([0, 0, 0], pa.timestamp('us')),
        'text': pa.array(['Herr Müller visited Acme001 today.',
                          'nothing to see', 'Müller again'], pa.string()),
        'lang': pa.array(['de', 'en', 'de'], pa.string()),
    })
    out = kernel(t).to_pandas()
    mentions = out[out['predicate'] == f'<{SCHEMA_MENTIONS}>']
    got = sorted((s_.rsplit('%2F', 1)[-1].rstrip('>'), o_)
                 for s_, o_ in zip(mentions['subject'], mentions['object']))
    assert got == [('1', '<http://ex.org/entity/acme>'),
                   ('1', '<http://ex.org/entity/muller>'),
                   ('3', '<http://ex.org/entity/muller>')]


def test_remove_dup_spans_randomized_vs_python(ray_session):
    """remove_dup_spans (gram exchange + broadcast + difference-array
    coverage) must equal a per-doc Python reference on randomized texts
    with planted shared spans, overlaps, short docs, empties and nulls."""
    import re
    import ray.data as rd

    from morph_kgc_ray.ops.dedup import remove_dup_spans

    rng = np.random.RandomState(17)
    vocab = [f'w{i}' for i in range(40)]
    K = 4
    shared_snips = [' '.join(rng.choice(vocab, size=rng.randint(K, K + 4)))
                    for _ in range(4)]
    texts = []
    for i in range(50):
        words = list(rng.choice(vocab, size=rng.randint(0, 20)))
        if rng.rand() < 0.6:  # plant a snippet (appears in many docs)
            snip = shared_snips[rng.randint(len(shared_snips))].split()
            pos = rng.randint(len(words) + 1)
            words = words[:pos] + snip + words[pos:]
        texts.append(' '.join(words))
    texts += ['', None, shared_snips[0], 'w0 w1']
    ds = rd.from_items([{'doc_id': i, 'text': t}
                        for i, t in enumerate(texts)]).repartition(4)
    got = remove_dup_spans(ds, k=K).to_pandas().set_index('doc_id')

    # python reference: gram -> set of docs; covered positions per doc
    toks = [tuple(x for x in re.split(r'[^0-9A-Za-z_]+', t or '') if x)
            for t in texts]
    gram_docs = {}
    for d, ts in enumerate(toks):
        for i in range(len(ts) - K + 1):
            gram_docs.setdefault(ts[i:i + K], set()).add(d)
    shared = {g for g, ds_ in gram_docs.items() if len(ds_) >= 2}
    removed_total = 0
    for d, ts in enumerate(toks):
        cov = set()
        for i in range(len(ts) - K + 1):
            if ts[i:i + K] in shared:
                cov |= set(range(i, i + K))
        kept = [t for j, t in enumerate(ts) if j not in cov]
        assert got.loc[d, 'clean_text'] == ' '.join(kept), d
        assert got.loc[d, 'n_removed'] == len(cov), d
        removed_total += len(cov)
    assert removed_total > 0  # plantings must exercise the removal path


def test_split_by_hash_deterministic(ray_session):
    import ray.data as rd

    from morph_kgc_ray.ops.sample import split_by_hash

    ds = rd.range(1000).map_batches(
        lambda t: pa.table({'doc_id': t['id']}), batch_format='pyarrow')
    a = split_by_hash(ds, seed=7).to_pandas().set_index('doc_id')['split']
    b = split_by_hash(ds.repartition(7), seed=7).to_pandas() \
        .set_index('doc_id')['split']
    assert a.sort_index().equals(b.sort_index())  # layout-independent
    frac = a.value_counts(normalize=True)
    assert 0.8 < frac['train'] < 0.97 and set(frac.index) == {
        'train', 'val', 'test'}
    with pytest.raises(ValueError, match='boundaries'):
        split_by_hash(ds, boundaries=(('a', 50), ('b', 40)))


def test_pack_sequences(ray_session):
    """GPT-style packing: per-key doc_id-ordered stream with <eos>
    separators cut into fixed bins; n_docs counts docs starting in the
    bin.  Both plans, multi-key blocks, empty docs."""
    import ray.data as rd

    from morph_kgc_ray.ops.chunk import pack_sequences

    ds = rd.from_arrow(pa.table({
        'source': pa.array(['a', 'a', 'b', 'a'], pa.string()),
        'doc_id': pa.array([1, 2, 10, 3], pa.int64()),
        'text': pa.array(['x y', 'z', 'w', 'p q r s'], pa.string())}))
    want = [
        ('a', 0, 3, 1, 'x y <eos>'),
        ('a', 1, 3, 2, 'z <eos> p'),
        ('a', 2, 3, 0, 'q r s'),
        ('a', 3, 1, 0, '<eos>'),
        ('b', 0, 2, 1, 'w <eos>'),
    ]
    for small in (True, False):
        out = pack_sequences(ds.repartition(2), capacity=3,
                             small=small).to_pandas() \
            .sort_values(['source', 'bin_id'])
        got = list(map(tuple, out[['source', 'bin_id', 'n_tokens',
                                   'n_docs', 'packed_text']].values))
        assert got == want, (small, got)
    # empty doc still occupies one <eos> slot and counts as starting
    ds2 = rd.from_arrow(pa.table({
        'source': pa.array(['c', 'c'], pa.string()),
        'doc_id': pa.array([1, 2], pa.int64()),
        'text': pa.array(['', 'k'], pa.string())}))
    out = pack_sequences(ds2, capacity=10, small=True).to_pandas()
    assert list(out['packed_text']) == ['<eos> k <eos>']
    assert list(out['n_docs']) == [2]


def test_simhash_neardup_pairs(ray_session):
    """Hamming-ball banding must find exactly the pairs within the ball:
    exact duplicates (hamming 0) and a near-dup (small perturbation),
    never the unrelated doc; both plans agree."""
    import ray.data as rd

    from morph_kgc_ray.ops.dedup import simhash_neardup_pairs

    base = ('alpha beta gamma delta epsilon zeta eta theta iota kappa '
            'lambda mu nu xi omicron pi rho sigma tau upsilon') * 3
    near = base + ' phi'
    ds = rd.from_arrow(pa.table({
        'doc_id': pa.array([1, 2, 3, 4], pa.int64()),
        'text': pa.array([base, base, near,
                          'completely different content about arrow batches '
                          'and ray datasets with nothing shared at all'],
                         pa.string())})).repartition(2)
    for small in (True, False):
        out = simhash_neardup_pairs(ds, max_hamming=3,
                                    small=small).to_pandas()
        got = sorted(zip(out['id_a'], out['id_b'], out['hamming']))
        assert (1, 2, 0) in got, (small, got)
        assert all(4 not in (a, b) for a, b, _ in got), (small, got)
        # the near-dup pair appears iff its true distance is <= 3, and
        # identically in both plans
        assert got == sorted(got)
    a = simhash_neardup_pairs(ds, max_hamming=3, small=True).to_pandas()
    b = simhash_neardup_pairs(ds, max_hamming=3, small=False).to_pandas()
    key = lambda df: sorted(map(tuple, df[sorted(df.columns)].values))
    assert key(a) == key(b)
