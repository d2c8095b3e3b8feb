from .parser import (
    FNML_DATAFRAME_COLUMNS,
    RML_DATAFRAME_COLUMNS,
    get_rml_rule,
    parse_join_conditions,
    load_mapping_graph,
    retrieve_mappings,
)
from .partitioner import get_invariant_of_template, partition_mappings

__all__ = [
    'retrieve_mappings', 'load_mapping_graph', 'get_rml_rule', 'parse_join_conditions',
    'RML_DATAFRAME_COLUMNS', 'FNML_DATAFRAME_COLUMNS',
    'partition_mappings', 'get_invariant_of_template',
]
