"""PySpark-native schema + constraint validation engine.

A from-scratch reimplementation of the semantics of
inab/python-extended-json-schema-validator (reference at
/root/reference, v0.15.3) as compiled DataFrame plans:

- row-level structural checks (required/type/enum/const/pattern/range)
  compile to Catalyst predicate columns (reference:
  extensible_validator.py:1163-1194 delegates to jsonschema);
- ``unique`` / ``primary_key`` compile to hash-partitioned dedup windows
  (reference: unique_check.py:133-148, pk_check.py:302-394);
- ``foreign_keys`` / ``join_keys`` compile to broadcast or sort-merge
  LEFT ANTI joins against key-dimension DataFrames (reference:
  fk_check.py:285-482, join_check.py:20-51);
- key canonicalization follows index_check.py:247-293 (atomic fast
  path; compact-JSON composite keys; missing-member exclusion).

Nothing here is a port: the reference is a single-threaded Python
interpreter over dicts; this engine expresses every constraint as a
declarative Spark plan so Catalyst/AQE choose physical strategies.
"""

from .spec import (
    ColumnCheck,
    CombinatorCheck,
    ForeignKeySpec,
    KeySpec,
    SpecError,
    TableSpec,
)
from .engine import EngineConfig, ValidationEngine, ValidationResult

__version__ = "0.5.0"

__all__ = [
    "ColumnCheck",
    "CombinatorCheck",
    "ForeignKeySpec",
    "KeySpec",
    "SpecError",
    "TableSpec",
    "ValidationEngine",
    "ValidationResult",
    "EngineConfig",
]
