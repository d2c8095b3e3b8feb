"""Engine configuration.

Accepts the same INI layout as the reference engine
(/root/reference/src/morph_kgc/config.py: a ``[CONFIGURATION]`` section plus
one section per data source) given as a path, an INI string, or a dict.
Only the options that affect materialization semantics are honored; Ray
execution knobs are new here.
"""

from __future__ import annotations

import configparser
import os

from .constants import NQUADS, NTRIPLES

CONFIGURATION_SECTION = 'CONFIGURATION'

_DEFAULTS = {
    'na_values': ',#N/A,N/A,#N/A N/A,n/a,NA,<NA>,#NA,NULL,null,NaN,nan,None',
    'output_file': 'knowledge-graph.nt',
    'output_dir': '',
    'output_format': NQUADS,
    'only_printable_chars': 'no',
    'safe_percent_encoding': '',
    'mapping_partitioning': 'PARTIAL-AGGREGATIONS',
    'infer_sql_datatypes': 'no',
    'strict_undefined_references': 'no',
    'udfs': '',
    # Ray-specific execution knobs (defaults sized for a 32-cpu node; scale-out
    # happens through Ray's scheduler, these are per-stage hints).
    'batch_size': '65536',
    'dedup_partitions': '0',          # 0 = let Ray decide
    'broadcast_join_max_rows': '5000000',
}

# the reference default na_values is ',nan' (config.py:81) for its simple
# mode; it exposes the pandas-style default above via apply_default_values.
_REFERENCE_SIMPLE_NA_VALUES = ',nan'


class Config:
    def __init__(self, ini: 'str | dict | None' = None, **overrides):
        self._options = dict(_DEFAULTS)
        self._options['na_values'] = _REFERENCE_SIMPLE_NA_VALUES
        self._sources: dict[str, dict] = {}

        if isinstance(ini, dict):
            for k, v in ini.items():
                if isinstance(v, dict):
                    self._sources[k] = {str(a): str(b) for a, b in v.items()}
                else:
                    self._options[str(k).lower()] = str(v)
        elif isinstance(ini, str):
            parser = configparser.ConfigParser(interpolation=None)
            parser.optionxform = str  # keep case of keys like file paths
            if os.path.exists(ini):
                parser.read(ini, encoding='utf-8')
            else:
                parser.read_string(ini)
            for section in parser.sections():
                items = {k.lower(): v for k, v in parser.items(section)}
                if section.upper() == CONFIGURATION_SECTION:
                    self._options.update(items)
                else:
                    self._sources[section] = items
        elif ini is not None:
            raise TypeError(f'unsupported config type {type(ini)}')

        for k, v in overrides.items():
            self._options[k.lower()] = str(v)

    # ---- data sources ------------------------------------------------------
    def get_data_sources_sections(self) -> list[str]:
        return list(self._sources)

    def get_mappings_files(self, section: str) -> list[str]:
        raw = self._sources[section].get('mappings', '')
        return [p.strip() for p in raw.split(',') if p.strip()]

    def set_mappings_document(self, section: str, text: str) -> None:
        """Register an inline mapping document (no file on disk)."""
        self._sources.setdefault(section, {})['mappings_inline'] = text

    def get_inline_mappings(self, section: str) -> str | None:
        return self._sources.get(section, {}).get('mappings_inline')

    def has_file_path(self, section: str) -> bool:
        return bool(self._sources.get(section, {}).get('file_path'))

    def get_file_path(self, section: str) -> str:
        return self._sources[section]['file_path']

    def has_db_url(self, section: str) -> bool:
        return bool(self._sources.get(section, {}).get('db_url'))

    def get_db_url(self, section: str) -> str:
        return self._sources[section]['db_url']

    # ---- options -----------------------------------------------------------
    def _get(self, key: str) -> str:
        return self._options.get(key, _DEFAULTS.get(key, ''))

    def get_na_values(self) -> list[str]:
        return list(set(self._get('na_values').split(',')))

    def get_output_format(self) -> str:
        fmt = self._get('output_format').upper().replace('_', '-')
        return NQUADS if 'QUAD' in fmt else NTRIPLES

    def only_write_printable_characters(self) -> bool:
        return self._get('only_printable_chars').lower() in ('yes', 'true', '1', 'on')

    def get_safe_percent_encoding(self) -> str:
        return self._get('safe_percent_encoding')

    def infer_sql_datatypes(self) -> bool:
        return self._get('infer_sql_datatypes').lower() in ('yes', 'true', '1', 'on')

    def strict_undefined_references(self) -> bool:
        """W3C-strict: a reference matching nothing in a hierarchical source
        aborts materialization (RMLTC0002c); default is the reference
        engine's effective file behavior (data_file.py:163-165 fills missing
        references with nulls, so the rule generates nothing)."""
        return self._get('strict_undefined_references').lower() in ('yes', 'true', '1', 'on')

    def get_mapping_partitioning(self) -> str:
        v = self._get('mapping_partitioning').upper().replace('_', '-')
        return v or 'PARTIAL-AGGREGATIONS'

    def get_output_dir(self) -> str:
        return self._get('output_dir')

    def get_output_file(self) -> str:
        return self._get('output_file')

    def get_udfs_path(self) -> str:
        return self._get('udfs')

    def get_batch_size(self) -> int:
        return int(self._get('batch_size'))

    def get_dedup_partitions(self) -> int:
        return int(self._get('dedup_partitions'))

    def get_broadcast_join_max_rows(self) -> int:
        return int(self._get('broadcast_join_max_rows'))
