"""Violation reasons and the violations-DataFrame schema.

Reason vocabulary mirrors the reference's error ``reason`` strings
(SURVEY.md §2.2 P7): dup_unique (unique_check.py:40), dup_pk
(pk_check.py:60), stale_fk / dangling_fk (fk_check.py:494-495),
stale_jk / dangling_jk (join_check.py:22-23), plus per-keyword row
check reasons matching jsonschema validator names (required, type,
enum, const, pattern, minimum, maximum, minLength, maxLength,
minItems, maxItems, format).
"""

from pyspark.sql import types as T

DUP_UNIQUE = "dup_unique"
DUP_PK = "dup_pk"
STALE_FK = "stale_fk"
DANGLING_FK = "dangling_fk"
STALE_JK = "stale_jk"  # declared in the reference (join_check.py:22) but
# never emitted for misses — fk_check.py:378,440 hardcode stale_fk
# ([verified] differentially); kept for the constant's documentary value
DANGLING_JK = "dangling_jk"
SCHEMA_ERROR = "schema_error"
FK_NO_SCHEMA = "fk_no_schema"

#: Output schema of every violations DataFrame produced by the engine.
#: (constraint_id, reason, row_id, observed_value, path) — FIXTURES.md.
VIOLATION_SCHEMA = T.StructType(
    [
        T.StructField("constraint_id", T.StringType(), False),
        T.StructField("reason", T.StringType(), False),
        T.StructField("row_id", T.StringType(), True),
        T.StructField("observed_value", T.StringType(), True),
        T.StructField("path", T.StringType(), True),
    ]
)

VIOLATION_COLS = [f.name for f in VIOLATION_SCHEMA.fields]
