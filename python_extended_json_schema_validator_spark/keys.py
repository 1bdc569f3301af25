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
from pyspark.sql import types as T


def member_col(member: str) -> Column:
    """Resolve a dotted member path (``a.b.c`` steps into structs —
    the column-world analogue of MaterializeJPath's dotted paths,
    index_check.py:194-244).  Array steps ``a[]``/``a[i]`` are handled
    by the caller via explode/getItem before the engine runs."""
    return F.col(member)


# characters whose presence forces the exact (interpreted) JSON
# escaping path for strings: quote, backslash, C0 controls
_NEEDS_ESCAPE = '[\\x00-\\x1f"\\\\]'

_PLAIN_CAST_TYPES = (
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.BooleanType,
)


def json_scalar(c: Column, dtype: Optional[T.DataType] = None) -> Column:
    """JSON scalar literal of an atomic value: ``2`` for int 2,
    ``"2"`` for str "2", ``true``/``false``, ``1.5``.  NULL → NULL.

    This is the engine's hot key-canonicalization primitive, so it is
    type-specialized to stay inside WholeStageCodegen:
    - integral/boolean: JSON literal == plain string cast (codegen);
    - string: quote-concat fast path, falling back to the exact
      ``to_json`` escape path only when escape-worthy characters are
      present (codegen branch + rare interpreted branch);
    - anything else (double, struct, array, binary): the generic
      ``to_json(array(x))`` minus brackets, which Spark escapes and
      type-tags correctly (e.g. 1e20 → JSON exponent form).
    """
    if dtype is not None and isinstance(dtype, _PLAIN_CAST_TYPES):
        return c.cast("string")
    generic = None
    arr = F.to_json(F.array(c))
    generic = arr.substr(F.lit(2), F.length(arr) - F.lit(2))
    if dtype is not None and isinstance(dtype, T.StringType):
        fast = F.concat(F.lit('"'), c, F.lit('"'))
        return F.when(c.isNull(), F.lit(None).cast("string")).otherwise(
            F.when(c.rlike(_NEEDS_ESCAPE), generic).otherwise(fast)
        )
    return F.when(c.isNull(), F.lit(None).cast("string")).otherwise(generic)


def canonical_key(
    members: Sequence[Column], dtypes: Optional[Sequence[Optional[T.DataType]]] = None
) -> Column:
    """The canonical key string for a tuple of member columns, NULL if
    any member is NULL (missing-member exclusion)."""
    if dtypes is None:
        dtypes = [None] * len(members)
    scalars = [json_scalar(m, t) for m, t in zip(members, dtypes)]
    if len(members) == 1:
        key = scalars[0]
    else:
        key = F.concat(F.lit("["), F.concat_ws(",", *scalars), F.lit("]"))
    any_null = None
    for m in members:
        any_null = m.isNull() if any_null is None else (any_null | m.isNull())
    return F.when(any_null, F.lit(None).cast("string")).otherwise(key)


def observed_value(
    members: Sequence[Column], dtypes: Optional[Sequence[Optional[T.DataType]]] = None
) -> Column:
    """The human-facing observed value for violation rows: the raw
    value for atomic keys (the reference reports ``Unmatching FK (2)``
    without JSON quoting, fk_check.py:436-449), the compact JSON array
    for composite keys (verified: compound PK reports
    ``["tres","treinta"]``)."""
    if len(members) == 1:
        return members[0].cast("string")
    return canonical_key(members, dtypes)


def _resolve_dtype(df: Optional[DataFrame], member: str) -> Optional[T.DataType]:
    if df is None:
        return None
    try:
        return df.select(member_col(member)).schema.fields[0].dataType
    except Exception:
        return None


def key_columns(
    members: Sequence[str],
    limit_scope: bool = False,
    scope_col: Optional[str] = None,
    df: Optional[DataFrame] = None,
) -> tuple[Column, Column]:
    """Returns ``(grouping_key, observed)`` for a key declaration.

    ``grouping_key`` includes the scope prefix when ``limit_scope``
    (reference prefixes the file name, index_check.py:346-349);
    ``observed`` never does (reports show the key values only).
    ``df`` (optional) lets the key expressions type-specialize to stay
    in codegen.
    """
    cols = [member_col(m) for m in members]
    dtypes = [_resolve_dtype(df, m) for m in members]
    key = canonical_key(cols, dtypes)
    obs = observed_value(cols, dtypes)
    if limit_scope:
        if scope_col is None:
            raise ValueError("limit_scope requires a scope column")
        key = F.when(
            key.isNull(), F.lit(None).cast("string")
        ).otherwise(
            F.concat(
                json_scalar(F.col(scope_col), _resolve_dtype(df, scope_col)),
                F.lit("|"),
                key,
            )
        )
    return key, obs


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
