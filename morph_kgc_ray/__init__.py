"""morph_kgc_ray: a Ray-Data-native RML/R2RML knowledge-graph construction
engine, built from scratch with the query/data-processing capabilities of the
reference morph-kgc engine but an idiomatic Ray Data execution model:
mapping partitions -> independent streaming Dataset pipelines of Arrow
batches, vectorized term materialization, shuffle-based dedup, partitioned
resumable sinks.

IMPORTANT: library functions never call ray.init()/ray.shutdown(); the host
process owns the Ray session (Ray Data auto-inits when standalone).
"""

from .engine.dedup import ensure_hash_shuffle

# The engine's distributed distinct/joins rely on key-based repartitioning,
# which Ray Data gates behind the hash-shuffle strategy.  DataContext is a
# process-global captured by datasets at creation time, so flip it at import
# (before any Dataset exists).
ensure_hash_shuffle()

from .config import Config
from .engine.materializer import materialize_dataset, materialize_set, materialize_to_dir

__all__ = ['Config', 'materialize_dataset', 'materialize_set', 'materialize_to_dir']

__version__ = '0.1.0'
