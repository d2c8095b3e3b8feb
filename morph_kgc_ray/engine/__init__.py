from .dedup import distinct
from .kernels import (
    compile_term_plan,
    get_references_in_template,
    materialize_term,
    percent_encode_array,
    source_prologue,
)
from .materializer import materialize_dataset, materialize_rule, materialize_set, materialize_to_dir

__all__ = [
    'distinct', 'compile_term_plan', 'materialize_term', 'percent_encode_array',
    'get_references_in_template', 'source_prologue',
    'materialize_dataset', 'materialize_rule', 'materialize_set', 'materialize_to_dir',
]
