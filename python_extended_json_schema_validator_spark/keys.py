"""Key canonicalization — the exact semantics of the reference's
GetKeyValues / GenKeyStrings (index_check.py:247-293), compiled to
Catalyst expressions.

Semantics matched (SURVEY.md §1.3, all [verified] against the
reference):

1. *Atomic fast path*: a single-member key uses the raw value itself
   (index_check.py:350-359).  Type distinctness is preserved — int 2
   and str "2" are different keys — by canonicalizing every key value
   to its JSON scalar literal (``2`` vs ``"2"``), which is a bijection
   from (type, value) pairs for atomic JSON types.
2. *Composite keys*: the cartesian combination is serialized as a
   compact JSON array ``["a","b"]`` (json.dumps sort_keys compact,
   index_check.py:262-293).  For columns (single-valued paths) the
   cartesian product degenerates to one tuple.
3. *Missing-member exclusion*: if ANY member is NULL the row
   contributes NO key — no uniqueness violation, no FK check
   (index_check.py:268-272; SQL UNIQUE-style NULL semantics).
4. *limit_scope*: the scope column (⇔ source file name,
   index_check.py:346-349) is prepended to the grouping key.

All of this is pure Column algebra — no UDFs, stays inside
WholeStageCodegen, and the canonical string is identical across tables
so FK worlds from different tables can be unioned into one dimension.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def member_col(member: str) -> Column:
    """Resolve a dotted member path (``a.b.c`` steps into structs —
    the column-world analogue of MaterializeJPath's dotted paths,
    index_check.py:194-244).  Array steps ``a[]``/``a[i]`` are handled
    by the caller via explode/getItem before the engine runs."""
    return F.col(member)


def json_scalar(c: Column) -> Column:
    """JSON scalar literal of an atomic value: ``2`` for int 2,
    ``"2"`` for str "2", ``true``/``false``, ``1.5``.  Implemented as
    ``to_json(array(x))`` minus the brackets so Spark handles escaping
    and type tags; NULL in → NULL out."""
    arr = F.to_json(F.array(c))
    inner = arr.substr(F.lit(2), F.length(arr) - F.lit(2))
    return F.when(c.isNull(), F.lit(None).cast("string")).otherwise(inner)


def canonical_key(members: Sequence[Column]) -> Column:
    """The canonical key string for a tuple of member columns, NULL if
    any member is NULL (missing-member exclusion)."""
    scalars = [json_scalar(m) for m in members]
    if len(members) == 1:
        key = scalars[0]
    else:
        key = F.concat(F.lit("["), F.concat_ws(",", *scalars), F.lit("]"))
    any_null = None
    for m in members:
        any_null = m.isNull() if any_null is None else (any_null | m.isNull())
    return F.when(any_null, F.lit(None).cast("string")).otherwise(key)


def observed_value(members: Sequence[Column]) -> Column:
    """The human-facing observed value for violation rows: the raw
    value for atomic keys (the reference reports ``Unmatching FK (2)``
    without JSON quoting, fk_check.py:436-449), the compact JSON array
    for composite keys (verified: compound PK reports
    ``["tres","treinta"]``)."""
    if len(members) == 1:
        return members[0].cast("string")
    return canonical_key(members)


def key_columns(
    members: Sequence[str],
    limit_scope: bool = False,
    scope_col: Optional[str] = None,
) -> tuple[Column, Column]:
    """Returns ``(grouping_key, observed)`` for a key declaration.

    ``grouping_key`` includes the scope prefix when ``limit_scope``
    (reference prefixes the file name, index_check.py:346-349);
    ``observed`` never does (reports show the key values only).
    """
    cols = [member_col(m) for m in members]
    key = canonical_key(cols)
    if limit_scope:
        if scope_col is None:
            raise ValueError("limit_scope requires a scope column")
        key = F.when(
            key.isNull(), F.lit(None).cast("string")
        ).otherwise(F.concat(json_scalar(F.col(scope_col)), F.lit("|"), key))
    return key, observed_value(cols)


def with_key(
    df: DataFrame,
    members: Sequence[str],
    key_name: str = "__key",
    observed_name: str = "__observed",
    limit_scope: bool = False,
    scope_col: Optional[str] = None,
) -> DataFrame:
    key, obs = key_columns(members, limit_scope, scope_col)
    return df.withColumn(key_name, key).withColumn(observed_name, obs)
