"""Kafka sink contract test, without kafka-python: a picklable fake
producer (the test_pgdb driver-factory pattern) records every message to
disk from inside the map_batches workers, so the test verifies the real
distributed path — per-worker producer construction, one message per
batch, the ``' .\\n'`` join and trailing ``' .'`` terminator the reference
uses (morph-kgc __init__.py:86-114 / utils.py:300-330)."""

import glob
import os


def _make_fake_producer():
    """KafkaProducer-shaped sink factory: send() writes <topic>\\n<payload>
    to a spool file so the driver-side test can read back what workers sent.
    Defined inside a function so cloudpickle ships the class BY VALUE to Ray
    workers (the tests directory is not importable from worker processes)."""

    class FakeProducer:
        def __init__(self, spool_dir: str, bootstrap_servers: str = ''):
            import uuid
            self.spool_dir = spool_dir
            self.instance = uuid.uuid4().hex[:8]
            self.n_sent = 0
            os.makedirs(spool_dir, exist_ok=True)

        def send(self, topic: str, payload: bytes):
            name = f'{self.instance}_{self.n_sent:04d}.msg'
            with open(os.path.join(self.spool_dir, name), 'wb') as f:
                f.write(topic.encode() + b'\n' + payload)
            self.n_sent += 1

        def flush(self):
            pass

    return FakeProducer


def test_materialize_kafka_with_injected_producer(ray_session, tmp_path):
    from morph_kgc_ray import Config, materialize_kafka, materialize_set
    FakeProducer = _make_fake_producer()
    spool = str(tmp_path / 'spool')
    cfg = {'DS': {'mappings': '/root/reference/test/rml-core/csv/RMLTC0009a/mapping.ttl'},
           'source_base_dir': '/root/reference', 'output_format': 'N-TRIPLES'}
    n = materialize_kafka(Config(cfg), producer_factory=FakeProducer,
                          topic='kg-out', spool_dir=spool)
    expected = materialize_set(Config(cfg))
    assert n == len(expected) == 4

    sent_triples = set()
    for path in glob.glob(os.path.join(spool, '*.msg')):
        with open(path, 'rb') as f:
            topic, _, payload = f.read().partition(b'\n')
        assert topic == b'kg-out'
        text = payload.decode('utf-8')
        # each message is a complete N-Triples document: every line
        # ' .'-terminated, including the last (reference terminator contract)
        assert text.endswith(' .') and not text.endswith('.\n')
        for line in text.split(' .\n'):
            sent_triples.add(line.removesuffix(' .'))
    assert sent_triples == set(expected)


def test_materialize_kafka_still_gated_without_factory(ray_session):
    import pytest
    from morph_kgc_ray import Config, materialize_kafka
    cfg = {'DS': {'mappings': '/root/reference/test/rml-core/csv/RMLTC0009a/mapping.ttl'},
           'source_base_dir': '/root/reference'}
    with pytest.raises(NotImplementedError, match='kafka-python'):
        materialize_kafka(Config(cfg))


def test_oxigraph_sink_with_fake_store(ray_session, monkeypatch):
    """materialize_oxigraph end-to-end with a pyoxigraph stand-in: the
    store must receive every materialized triple as one parseable
    N-Quads document (reference __init__.py:75-83)."""
    import sys
    import types

    loads = []

    class FakeStore:
        def bulk_load(self, fh, mime):
            loads.append((fh.read(), mime))

    fake = types.ModuleType('pyoxigraph')
    fake.Store = FakeStore
    monkeypatch.setitem(sys.modules, 'pyoxigraph', fake)

    from morph_kgc_ray import Config, materialize_oxigraph
    cfg = Config({'DS': {'mappings': '/root/reference/test/rml-core/csv/RMLTC0009a/mapping.ttl'},
                  'source_base_dir': '/root/reference', 'output_format': 'N-TRIPLES'})
    store = materialize_oxigraph(cfg)
    assert isinstance(store, FakeStore)
    payload, mime = loads[0]
    assert mime == 'application/n-quads'
    lines = [ln for ln in payload.split('.\n') if ln.strip()]
    assert len(lines) == 4  # the RMLTC0009a golden triple count
    assert any('practises' in ln for ln in lines)  # the join triple arrived


def test_rdflib_materialize_with_fake_graph(ray_session, monkeypatch):
    """materialize() end-to-end with an rdflib stand-in: the graph must be
    handed one nquads-parseable document of the full triple set (reference
    __init__.py:63-71)."""
    import sys
    import types

    parses = []

    class FakeGraph:
        def parse(self, data=None, format=None):
            parses.append((data, format))

    fake = types.ModuleType('rdflib')
    fake.Graph = FakeGraph
    monkeypatch.setitem(sys.modules, 'rdflib', fake)

    from morph_kgc_ray import Config, materialize
    cfg = Config({'DS': {'mappings': '/root/reference/test/rml-core/csv/RMLTC0009a/mapping.ttl'},
                  'source_base_dir': '/root/reference', 'output_format': 'N-TRIPLES'})
    graph = materialize(cfg)
    assert isinstance(graph, FakeGraph)
    data, fmt = parses[0]
    assert fmt == 'nquads'
    assert data.count('.\n') == 3 and data.endswith('.')  # 4 joined triples
    assert 'Venus Williams' in data
