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


import re

# ⇔ JStepPat (index_check.py:191) MINUS its single-digit quirk: the
# reference regex (0|[1-9][0-9]+)? rejects indices 1-9, silently
# turning "a[3]" into a missing plain property — docshred reproduces
# that quirk for reference-compat document shredding, while the
# engine's own typed-table member grammar deliberately accepts all
# indices ([0-9]* below).
_STEP_PAT = re.compile(r"^([^\[]+)\[(0|[1-9][0-9]*)?\]$")


def flat_col(name: str) -> Column:
    """Column reference by EXACT name (backtick-quoted so dots and
    brackets in shredded column names are not parsed as struct/array
    steps)."""
    return F.col("`" + name.replace("`", "``") + "`")


def member_col(member: str, df: Optional[DataFrame] = None) -> Column:
    """Resolve a member path.  An exact column-name match wins (flat
    shredded columns may contain dots/brackets); otherwise dotted
    struct steps (``a.b.c`` — the column-world analogue of
    MaterializeJPath's dotted paths, index_check.py:194-244).  Array
    steps (``a[]``/``a[i]``) are the multi-valued path — see
    member_values."""
    if df is not None and member in df.columns:
        return flat_col(member)
    return F.col(member)


def member_has_fanout(
    member: str, df: Optional[DataFrame], canonical: bool = False
) -> bool:
    """True when the member can yield MULTIPLE values per row: an
    explicit ``[]`` step, or the resolved column is array-typed.
    Shredded tables (canonical) store key members as ``<path>#v``
    value-list arrays — always fan-out (size-1 lists take the atomic
    fast path at runtime)."""
    if canonical and df is not None and member + "#v" in df.columns:
        return True
    if df is not None and member in df.columns:
        return isinstance(
            df.schema[member].dataType, T.ArrayType
        )
    if "[" in member:
        # any bracketed step — including single-index members like
        # "a[0]" — routes through key_strings/member_values, whose
        # step-walker compiles the access; the scalar path's
        # F.col("a[0]") would be unresolvable (a[i] yields ≤1 value,
        # so the fan-out path's atomic fast path still applies)
        return True
    if df is None:
        return False
    try:
        return isinstance(
            df.select(member_col(member, df)).schema.fields[0].dataType, T.ArrayType
        )
    except Exception:
        return False


def member_values(member: str, df: Optional[DataFrame], canonical: bool = False) -> Column:
    """The member's VALUE LIST as an ``array<string>`` of canonical
    JSON literals — MaterializeJPath compiled to column algebra
    (index_check.py:194-244): dotted steps walk structs, ``name[]``
    flattens every element, ``name[i]`` takes one index, and each
    array step multiplies the objectives.  A missing step yields the
    empty array (⇒ no key at all downstream).

    ``canonical``: the column already holds canonical JSON literals
    (shredded document tables) — float literals normalize through
    ``canon_literal_norm`` so they join typed-column keys; everything
    else passes through unchanged.
    """
    if canonical and df is not None and member + "#v" in df.columns:
        vcol = flat_col(member + "#v")
        if isinstance(
            df.schema[member + "#v"].dataType.elementType, T.ArrayType
        ):
            vcol = F.transform(
                vcol, lambda inner: F.transform(inner, canon_literal_norm)
            )
        else:
            vcol = F.transform(vcol, canon_literal_norm)
        return F.coalesce(vcol, F.array())
    # exact shredded column: scalar literal or array of literals
    if df is not None and member in df.columns:
        c = flat_col(member)
        if isinstance(df.schema[member].dataType, T.ArrayType):
            arr = F.coalesce(c, F.array())
            if not canonical:
                et = df.schema[member].dataType.elementType
                arr = F.transform(arr, lambda x: _element_literal(x, et))
            else:
                arr = F.transform(arr, canon_literal_norm)
            return arr
        lit = (
            canon_literal_norm(c)
            if canonical
            else json_scalar(c, df.schema[member].dataType)
        )
        return F.when(c.isNull(), F.array()).otherwise(F.array(lit))

    steps = member.split(".")
    expr: Optional[Column] = None  # scalar navigation (before first [])
    multi: Optional[Column] = None  # array navigation (after first [])

    def _field(name: str) -> Column:
        return F.col(name) if expr is None else expr[name]

    for step in steps:
        m = _STEP_PAT.match(step)
        if m:
            name, idx = m.group(1), m.group(2)
            if multi is None:
                base = _field(name)  # array-typed field
                if idx is not None:
                    expr = base.getItem(int(idx))  # a[i]: still scalar
                else:
                    multi, expr = F.coalesce(base, F.array()), None
            else:
                if idx is not None:
                    i = int(idx)
                    multi = F.transform(multi, lambda x: x[name].getItem(i))
                else:
                    multi = F.flatten(
                        F.transform(
                            multi, lambda x: F.coalesce(x[name], F.array())
                        )
                    )
        else:
            if multi is None:
                expr = _field(step)
            else:
                multi = F.transform(multi, lambda x: x[step])
    if multi is not None:
        # drop objectives lost to missing struct fields mid-path
        vals = F.filter(multi, lambda x: x.isNotNull())
        et = None
        if df is not None:
            try:
                t = df.select(vals.alias("__v")).schema[0].dataType
                if isinstance(t, T.ArrayType):
                    et = t.elementType
            except Exception:
                et = None
        return F.transform(vals, lambda x: _element_literal(x, et))
    dtype = _resolve_dtype(df, member) if df is not None else None
    lit = json_scalar(expr, dtype)
    return F.when(expr.isNull(), F.array()).otherwise(F.array(lit))


def _element_literal(x: Column, etype: Optional[T.DataType] = None) -> Column:
    """Canonical JSON literal of an array element.  When the caller
    statically knows the element dtype, doubles route through
    ``py_double_repr`` so array-member keys join with Python-rendered
    keys (same contract as json_scalar); otherwise the generic to_json
    path (struct/map elements, or unresolvable dotted walks — the
    documented residue: doubles NESTED inside such elements keep Java
    rendering).

    NULL elements render as the JSON literal ``'null'`` on EVERY
    branch — the typed fast paths must match the to_json path and the
    reference's ``json.dumps`` (``[1, None]`` → elements ``1``,
    ``null``); a SQL NULL element would silently drop out of ledger
    semi-joins (NULL never equi-joins)."""
    if etype is not None and isinstance(etype, (T.DoubleType, T.FloatType)):
        return F.when(x.isNull(), F.lit("null")).otherwise(
            py_double_repr(x.cast("double"))
        )
    if etype is not None and isinstance(etype, _PLAIN_CAST_TYPES):
        return F.when(x.isNull(), F.lit("null")).otherwise(x.cast("string"))
    arr = F.to_json(F.array(x))
    return arr.substr(F.lit(2), F.length(arr) - F.lit(2))


def py_double_repr(c: Column) -> Column:
    """THE canonical rendering of a double key member: Java's
    ``Double.toString`` digits reformatted into Python's ``repr`` /
    ``json.dumps`` STYLE, computed in pure JVM Column algebra (string
    surgery on the cast — codegen builtins, HOF-safe, no Python
    stage, no per-row formatting calls).

    Why: canonical keys from PYTHON-side serialization (shredded
    document tables via docshred._canon, provider keys via
    key_strings_py — both ``json.dumps``, matching the reference's
    GenKeyStrings, index_check.py:240-242) must byte-join with keys
    rendered from TYPED columns.  Java and Python disagree on form
    ('1.0E20' vs '1e+20'; plain/sci switch at 1e7 vs 1e16; exponent
    zero-padding), so raw to_json/cast output silently miss-joins.

    Join correctness comes from normalizing EVERY key source through
    this one expression (typed columns here; Python-rendered float
    literals re-parse through ``canon_literal_norm`` at key-build
    time), so the output is identical across sources BY CONSTRUCTION
    — a pure function of the double value.

    Rendering parity with json.dumps is exact in FORM (plain decimal
    for repr exponent n in [-4, 15], ``1e+20`` / ``1.5e-05`` sci
    outside, sign, two-digit-min negative exponents) and exact in
    DIGITS except where this JVM's legacy ``Double.toString`` emits a
    non-shortest digit (JDK-4511638, fixed in JDK 19; measured
    582/203k uniform-bit doubles on JDK 17).  Those renderings still
    round-trip to the exact value and are value-deterministic — they
    just carry one more digit than CPython would print.  Operational
    caveat: a persisted KeyLedger written under one JDK major line
    and read under another (legacy → Ryū, JDK ≤18 → ≥19) can
    miss-join that ~0.3% residue of float keys — rebuild/compact
    float-keyed ledgers on JVM major upgrades.  Property-tested
    (validity, form, cross-source joins) in tests/test_double_keys.py.
    """
    s = c.cast("string")
    neg = s.startswith("-")
    sign = F.when(neg, F.lit("-")).otherwise(F.lit(""))
    body_in = F.when(neg, s.substr(F.lit(2), F.length(s))).otherwise(s)

    mant = F.substring_index(body_in, "E", 1)
    n = F.substring_index(body_in, "E", -1).cast("int")
    # digit string without point or trailing zeros ("1.0" -> "1");
    # nonzero doubles never yield all-zero digits here (x == 0.0 has
    # no exponent and stays on the plain pass-through)
    digits = F.regexp_replace(
        F.replace(mant, F.lit("."), F.lit("")), "0+$", ""
    )
    digits = F.when(F.length(digits) == 0, F.lit("0")).otherwise(digits)
    ln = F.length(digits)

    def zeros(m: Column) -> Column:
        return F.lit("0" * 24).substr(F.lit(1), F.greatest(m, F.lit(0)))

    plain = (
        F.when(n < 0, F.concat(F.lit("0."), zeros(-n - F.lit(1)), digits))
        .when(
            n >= ln - 1,
            F.concat(digits, zeros(n - ln + F.lit(1)), F.lit(".0")),
        )
        .otherwise(
            F.concat(
                digits.substr(F.lit(1), n + F.lit(1)),
                F.lit("."),
                digits.substr(n + F.lit(2), ln),
            )
        )
    )
    sci_mant = F.when(ln == 1, digits).otherwise(
        F.concat(
            digits.substr(F.lit(1), F.lit(1)),
            F.lit("."),
            digits.substr(F.lit(2), ln),
        )
    )
    # exponent: two-digit minimum like Python ('1e-05'), but NEVER
    # truncate larger ones (lpad truncates, so pad by branch)
    neg_exp = F.when(
        n > -10, F.concat(F.lit("0"), (-n).cast("string"))
    ).otherwise((-n).cast("string"))
    sci = F.when(
        n >= 0, F.concat(sci_mant, F.lit("e+"), n.cast("string"))
    ).otherwise(F.concat(sci_mant, F.lit("e-"), neg_exp))
    converted = F.when((n >= 16) | (n <= -5), sci).otherwise(plain)
    return (
        # NaN / ±Infinity: Java names == Python json.dumps names
        # (plain pass-through); no 'E' means Java plain form, which
        # byte-matches Python's in its [1e-3, 1e7) window
        F.when(~body_in.contains("E"), s).otherwise(
            F.concat(sign, converted)
        )
    )


# a JSON number literal that is a FLOAT (has a fraction and/or
# exponent — json.dumps emits one of them for every Python float);
# integer literals are exact digit runs on every source and must NOT
# be re-rendered (type-distinct keys: '1.0' never collides with '1')
_FLOAT_LIT = r"^-?[0-9]+(\.[0-9]+([eE][+-]?[0-9]+)?|[eE][+-]?[0-9]+)$"


def canon_literal_norm(c: Column) -> Column:
    """Normalize a PYTHON-rendered canonical JSON literal for key
    joins: float literals re-parse and re-render through
    ``py_double_repr`` so shredded-table and provider keys
    byte-match typed-column keys regardless of which side rendered
    first ('1e+20' vs '1.0E20' vs a legacy-digit variant all
    normalize to the same string — the join contract is the
    EXPRESSION, not any language's formatter).  Non-float literals
    (strings, ints, bools, null, objects/arrays) pass through
    untouched; the integer fast path is a single rlike.  Residue:
    floats nested INSIDE object/array-valued literals are not
    re-rendered (their Python form is then itself the canonical one —
    consistent as long as such exotic members only come from
    shredded/Python sources, which is the only place they can occur:
    json_scalar's struct leg documents the same boundary)."""
    return F.when(
        c.rlike(_FLOAT_LIT), py_double_repr(c.cast("double"))
    ).otherwise(c)


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
    - double/float: ``py_double_repr`` — Python's shortest-round-trip
      rendering in Column algebra, so typed-column keys byte-join with
      Python-serialized keys (shredded tables, providers, the
      reference's own GenKeyStrings; round-6 fix — to_json's Java form
      '1.0E20' could silently miss-join against Python '1e+20');
    - anything else (struct, array, binary): the generic
      ``to_json(array(x))`` minus brackets, which Spark escapes and
      type-tags correctly.  Doubles nested INSIDE such composites keep
      Java rendering — the documented residue.
    """
    if dtype is not None and isinstance(dtype, _PLAIN_CAST_TYPES):
        return c.cast("string")
    if dtype is not None and isinstance(dtype, (T.DoubleType, T.FloatType)):
        rendered = py_double_repr(c.cast("double"))
        return F.when(c.isNull(), F.lit(None).cast("string")).otherwise(
            rendered
        )
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
        return df.select(member_col(member, df)).schema.fields[0].dataType
    except Exception:
        return None


def key_strings(
    members: Sequence[str],
    df: Optional[DataFrame] = None,
    canonical: bool = False,
    limit_scope: bool = False,
    scope_col: Optional[str] = None,
) -> tuple[Column, Column]:
    """FAN-OUT key generation — GenKeyStrings compiled to column
    algebra (index_check.py:262-293): returns ``(keys, observed)``,
    both ``array<string>``, one element per cartesian combination of
    the members' value lists.

    Exact reference semantics:
    - any member with ZERO values → empty array (no key at all,
      index_check.py:268-272);
    - a SINGLE member with exactly ONE atomic value → the raw JSON
      scalar literal (atomic fast path, :350-359);
    - otherwise every combination serializes as the compact JSON array
      ``[v1,v2]`` — including a single member with >1 values (each
      wraps alone, json.dumps of a 1-list);
    - observed mirrors the reference's report values: the unquoted raw
      value for atomic keys, the key string otherwise.

    Callers explode the array (explode drops empty → missing-member
    exclusion is free).  limit_scope prefixes every key with the scope
    literal (same ``scope|key`` canonical form as key_columns).
    """
    nested = [
        canonical
        and df is not None
        and m + "#v" in df.columns
        and isinstance(df.schema[m + "#v"].dataType.elementType, T.ArrayType)
        for m in members
    ]
    if any(nested):
        if not all(nested):
            raise ValueError(
                "mixed element-grouped and plain key members are not "
                "expressible (a trigger's members share one location)"
            )
        return _grouped_key_strings(members, df, limit_scope, scope_col)
    vals = [member_values(m, df, canonical) for m in members]
    if len(members) == 1:
        v = vals[0]
        keys = F.when(
            F.size(v) == 1, v
        ).otherwise(F.transform(v, lambda x: F.concat(F.lit("["), x, F.lit("]"))))
        observed = F.when(
            F.size(v) == 1,
            F.transform(v, lambda x: F.regexp_replace(x, '^"|"$', "")),
        ).otherwise(keys)
    else:
        acc = vals[0]
        for nxt in vals[1:]:
            acc = F.flatten(
                F.transform(
                    acc,
                    lambda a: F.transform(nxt, lambda b: F.concat(a, F.lit(","), b)),
                )
            )
        keys = F.transform(
            acc, lambda s: F.concat(F.lit("["), s, F.lit("]"))
        )
        observed = keys
    if limit_scope:
        if scope_col is None:
            raise ValueError("limit_scope requires a scope column")
        scope = json_scalar(
            member_col(scope_col, df), _resolve_dtype(df, scope_col)
        )
        keys = F.transform(keys, lambda k: F.concat(scope, F.lit("|"), k))
    return keys, observed


def _grouped_key_strings(
    members: Sequence[str],
    df: DataFrame,
    limit_scope: bool,
    scope_col: Optional[str],
) -> tuple[Column, Column]:
    """key_strings for ELEMENT-GROUPED members (``loc#e#rel`` columns,
    array<array<string>>): the reference's trigger fires once per
    array-element instance, so GenKeyStrings — including the
    atomic-fast-path decision — runs per element and the results
    union across elements."""
    outers = [
        F.coalesce(
            F.transform(
                flat_col(m + "#v"),
                lambda inner: F.transform(inner, canon_literal_norm),
            ),
            F.array(),
        )
        for m in members
    ]
    _wrap = lambda x: F.concat(F.lit("["), x, F.lit("]"))  # noqa: E731
    if len(members) == 1:
        o = outers[0]
        keys = F.flatten(
            F.transform(
                o,
                lambda inner: F.when(F.size(inner) == 1, inner).otherwise(
                    F.transform(inner, _wrap)
                ),
            )
        )
        observed = F.flatten(
            F.transform(
                o,
                lambda inner: F.when(
                    F.size(inner) == 1,
                    F.transform(inner, lambda x: F.regexp_replace(x, '^"|"$', "")),
                ).otherwise(F.transform(inner, _wrap)),
            )
        )
    else:
        n = F.size(outers[0])

        def per_element(i: Column) -> Column:
            acc = outers[0][i]
            for nxt in outers[1:]:
                inner = nxt[i]
                acc = F.flatten(
                    F.transform(
                        acc,
                        lambda a: F.transform(
                            inner, lambda b: F.concat(a, F.lit(","), b)
                        ),
                    )
                )
            return F.transform(acc, _wrap)

        keys = F.when(n == 0, F.array()).otherwise(
            F.flatten(F.transform(F.sequence(F.lit(0), n - 1), per_element))
        )
        observed = keys
    if limit_scope:
        if scope_col is None:
            raise ValueError("limit_scope requires a scope column")
        scope = json_scalar(member_col(scope_col, df), _resolve_dtype(df, scope_col))
        keys = F.transform(keys, lambda k: F.concat(scope, F.lit("|"), k))
    return keys, observed


def members_fan_out(
    members: Sequence[str], df: Optional[DataFrame], canonical: bool = False
) -> bool:
    """True when any member can yield multiple values (→ use
    key_strings + explode instead of the scalar key_columns path)."""
    return any(member_has_fanout(m, df, canonical) for m in members)


def key_columns(
    members: Sequence[str],
    limit_scope: bool = False,
    scope_col: Optional[str] = None,
    df: Optional[DataFrame] = None,
    canonical: bool = False,
) -> tuple[Column, Column]:
    """Returns ``(grouping_key, observed)`` for a key declaration
    (scalar single-valued members — the fan-out path is key_strings).

    ``grouping_key`` includes the scope prefix when ``limit_scope``
    (reference prefixes the file name, index_check.py:346-349);
    ``observed`` never does (reports show the key values only).
    ``df`` (optional) lets the key expressions type-specialize to stay
    in codegen.  ``canonical``: columns already hold canonical JSON
    literals (shredded document tables) — used as-is, and observed
    unquotes string literals like the reference's raw-value reports.
    """
    cols = [member_col(m, df) for m in members]
    if canonical:
        scalars = [canon_literal_norm(c) for c in cols]
        if len(cols) == 1:
            key = scalars[0]
            obs = F.regexp_replace(scalars[0], '^"|"$', "")
        else:
            key = F.concat(F.lit("["), F.concat_ws(",", *scalars), F.lit("]"))
            obs = key
        any_null = None
        for m in cols:
            any_null = m.isNull() if any_null is None else (any_null | m.isNull())
        key = F.when(any_null, F.lit(None).cast("string")).otherwise(key)
        obs = F.when(any_null, F.lit(None).cast("string")).otherwise(obs)
    else:
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
                json_scalar(member_col(scope_col, df), _resolve_dtype(df, scope_col)),
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


def key_strings_py(doc, members, limit_scope: bool = False, scope=None):
    """Driver-side twin of ``key_strings`` over one PARSED document —
    the exact GenKeyStrings semantics (index_check.py:262-293) the
    Spark columns implement, for the places that must probe key worlds
    sequentially on the driver (guess-mode claim simulation,
    suite._guess_dispatch).  Returns the list of canonical key strings
    WITH registration multiplicity (fan-out order preserved):

    - any member with zero values → no keys;
    - single member, single atomic value → the raw scalar literal;
    - otherwise compact JSON arrays per cartesian combination;
    - element-grouped members (``loc#e#rel``) run the atomic decision
      PER ELEMENT, matching _grouped_key_strings;
    - ``limit_scope`` prefixes ``<scope literal>|`` like key_strings.
    """
    import itertools
    import json as _json

    from .docshred import ATOMIC, materialize_jpath, _canon

    def vlist(node, member):
        return [
            _canon(v) if isinstance(v, ATOMIC)
            else _json.dumps(v, sort_keys=True, ensure_ascii=False)
            for v in materialize_jpath(node, member)
        ]

    grouped = [m for m in members if "#e#" in m]
    keys: list = []
    if grouped:
        if len(grouped) != len(members):
            raise ValueError(
                "mixed element-grouped and plain key members are not "
                "expressible (a trigger's members share one location)"
            )
        locs = {m.split("#e#", 1)[0] for m in members}
        if len(locs) != 1:
            raise ValueError("element-grouped members must share one location")
        loc = locs.pop()
        rels = [m.split("#e#", 1)[1] for m in members]
        for el in materialize_jpath(doc, loc):
            per = [vlist(el, r) for r in rels]
            if any(not p for p in per):
                continue
            if len(per) == 1:
                inner = per[0]
                if len(inner) == 1:
                    keys.extend(inner)
                else:
                    keys.extend("[" + v + "]" for v in inner)
            else:
                keys.extend(
                    "[" + ",".join(c) + "]"
                    for c in itertools.product(*per)
                )
    else:
        per = [vlist(doc, m) for m in members]
        if any(not p for p in per):
            per = None
        if per is None:
            keys = []
        elif len(per) == 1:
            inner = per[0]
            keys = inner if len(inner) == 1 else ["[" + v + "]" for v in inner]
        else:
            keys = ["[" + ",".join(c) + "]" for c in itertools.product(*per)]
    if limit_scope and keys:
        sc = (
            _canon(scope)
            if isinstance(scope, ATOMIC)
            else _json.dumps(scope, sort_keys=True, ensure_ascii=False)
        )
        keys = [f"{sc}|{k}" for k in keys]
    return keys
