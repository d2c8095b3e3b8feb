"""morph_kgc_ray: a Ray-Data-native RML/R2RML knowledge-graph construction
engine, built from scratch with the query/data-processing capabilities of the
reference morph-kgc engine but an idiomatic Ray Data execution model:
mapping partitions -> independent streaming Dataset pipelines of Arrow
batches, vectorized term materialization, shuffle-based dedup, partitioned
resumable sinks.

IMPORTANT: library functions never call ray.init()/ray.shutdown(); the host
process owns the Ray session (Ray Data auto-inits when standalone).
"""

import os as _os

# A Ray task accounts for ONE CPU slot; libraries with their own thread
# pools (polars hash_rows, OpenMP BLAS) would silently use every host core
# from inside each task — oversubscribing the node and corrupting any
# scaling measurement (a num_cpus=8 session would really run on 32 cores).
# Parallelism belongs to the Ray task/actor axis; cap intra-task pools to 1
# unless the user explicitly set them.  Must happen before polars/numpy
# import anywhere in the process (workers import this module fresh).
_os.environ.setdefault('POLARS_MAX_THREADS', '1')
_os.environ.setdefault('OMP_NUM_THREADS', '1')
_os.environ.setdefault('OPENBLAS_NUM_THREADS', '1')
_os.environ.setdefault('MKL_NUM_THREADS', '1')

from .engine.dedup import ensure_hash_shuffle

# The engine's distributed distinct/joins rely on key-based repartitioning,
# which Ray Data gates behind the hash-shuffle strategy.  DataContext is a
# process-global captured by datasets at creation time, so flip it at import
# (before any Dataset exists).
ensure_hash_shuffle()


def _silence_schema_hash_noise() -> None:
    """Parquet written by pandas carries a schema-metadata dict that makes
    ``pyarrow.Schema`` unhashable; Ray's block-concat schema dedup then logs
    "Failed to hash the schemas" once per block.  The condition is benign
    (Ray falls through to full unification) and fires inside WORKER
    processes before our metadata-stripping map fn runs — but workers import
    this package when deserializing our map fns, so a filter installed at
    import time covers them too."""
    import logging as _logging

    class _Noise(_logging.Filter):
        def filter(self, record: _logging.LogRecord) -> bool:
            return 'Failed to hash the schemas' not in record.getMessage()

    _logging.getLogger('ray.data._internal.arrow_ops.transform_pyarrow').addFilter(_Noise())


_silence_schema_hash_noise()

from .config import Config
from .engine.materializer import materialize_dataset, materialize_set, materialize_to_dir


class _KafkaBatchSink:
    """Publishing sink: one producer per worker process (constructed once,
    reused across batches), one message per batch.  The driver only
    aggregates the tiny count rows — triples never funnel through it."""

    def __init__(self, topic: str, kafka_kwargs: dict, producer_factory=None):
        if producer_factory is None:  # optional dependency, like the reference
            from kafka import KafkaProducer
            producer_factory = KafkaProducer
        self.producer = producer_factory(**kafka_kwargs)
        self.topic = topic

    def __call__(self, batch):
        import pyarrow as pa
        if batch.num_rows:
            # every triple gets its own ' .' terminator so each message is a
            # complete N-Triples/N-Quads document (reference materialize_kafka)
            payload = ' .\n'.join(batch['triple'].to_pylist()) + ' .'
            self.producer.send(self.topic, payload.encode('utf-8'))
            self.producer.flush()
        return pa.table({'rows': pa.array([batch.num_rows], pa.int64())})


_KAFKA_SINK_CACHE: dict = {}


def _kafka_sink_fn(topic: str, kafka_kwargs: dict, producer_factory):
    """Task-form wrapper with a per-worker-process sink cache: the producer
    amortizes like an actor pool's, but the stage stays a TASK so it fuses
    with the materialization pipeline and can never starve upstream stages
    of CPU slots (an actor pool sized near the session CPU count deadlocks
    small sessions — the documented Ray Data actor-pool gotcha)."""
    key = (topic, repr(sorted(kafka_kwargs.items())),
           getattr(producer_factory, '__qualname__', repr(producer_factory)))

    def fn(batch):
        sink = _KAFKA_SINK_CACHE.get(key)
        if sink is None:
            sink = _KafkaBatchSink(topic, kafka_kwargs, producer_factory)
            _KAFKA_SINK_CACHE[key] = sink
        return sink(batch)
    return fn


def materialize_kafka(config, python_source=None, producer_factory=None,
                      **kafka_kwargs):
    """Stream the materialized triples to Kafka (reference API parity:
    __init__.py:86-114) with per-worker producers inside ``map_batches`` —
    each task publishes its own blocks, so the sink is as parallel as the
    pipeline.  ``producer_factory`` (a picklable callable returning a
    KafkaProducer-shaped object with ``send(topic, bytes)`` / ``flush()``)
    overrides the kafka-python default — the dependency-injection seam the
    tests use, mirroring the PGDB driver-factory pattern."""
    if producer_factory is None:
        try:
            import kafka  # noqa: F401  (optional dependency, like the reference)
        except ImportError as e:  # pragma: no cover - kafka not in this container
            raise NotImplementedError('materialize_kafka requires kafka-python') from e
    topic = kafka_kwargs.pop('topic', 'triples')
    counts = materialize_dataset(config, python_source).map_batches(
        _kafka_sink_fn(topic, kafka_kwargs, producer_factory),
        batch_format='pyarrow', batch_size=65536).take_all()
    return sum(r['rows'] for r in counts)


def materialize(config, python_source=None):
    """Load the materialized triples into an rdflib Graph (reference API
    parity: __init__.py:63-71 — the triple set is joined into one document
    and parsed with format='nquads', which accepts plain triples too).
    rdflib is optional; without it use ``materialize_set`` (same triples
    as Python strings) or ``materialize_to_dir``."""
    try:
        from rdflib import Graph  # optional dependency
    except ImportError as e:  # pragma: no cover - rdflib not in this container
        raise NotImplementedError(
            'materialize requires rdflib; materialize_set returns the same '
            'triples as a set of strings') from e
    graph = Graph()
    triples = materialize_set(config, python_source)
    if triples:
        graph.parse(data='.\n'.join(triples) + '.', format='nquads')
    return graph


def materialize_oxigraph(config, python_source=None):
    """Load the materialized triples into an Oxigraph store (reference API
    parity: __init__.py:75-83)."""
    try:
        from pyoxigraph import Store  # optional dependency
    except ImportError as e:  # pragma: no cover - oxigraph not in this container
        raise NotImplementedError('materialize_oxigraph requires pyoxigraph') from e
    import io
    store = Store()
    triples = materialize_set(config, python_source)
    store.bulk_load(io.StringIO('.\n'.join(triples) + ('.' if triples else '')), 'application/n-quads')
    return store


__all__ = ['Config', 'materialize', 'materialize_dataset', 'materialize_set',
           'materialize_to_dir', 'materialize_kafka', 'materialize_oxigraph']

__version__ = '0.1.0'
