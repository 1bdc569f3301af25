"""Pass-1 row-level checks (SURVEY.md §2.2 P4/P5) compiled to a single
fused projection of Catalyst predicates.

The reference delegates per-document structural validation to the
jsonschema library (extensible_validator.py:1163-1194) and walks every
document in Python.  Here every JSON-Schema keyword becomes ONE
boolean Column, all checks for a table are fused into ONE ``select``
(array-of-structs + filter + explode), and the whole battery runs
inside WholeStageCodegen — zero Python in the hot path.

Violation rows carry reason = the jsonschema validator name
(``required``, ``type``, ``enum``, ``pattern``, ...) matching the
reference's error reasons (extensible_validator.py:1177-1194).
"""

from __future__ import annotations

from typing import List, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..spec import ColumnCheck, SpecError

# P5 format checkers: the reference registers format-nongpl checkers
# (extensible_validator.py:132-138).  Regex-expressible ones compile to
# rlike; payload formats (image decode etc.) live in payload/.
FORMATS = {
    "date": r"^\d{4}-\d{2}-\d{2}$",
    "time": r"^\d{2}:\d{2}:\d{2}(\.\d+)?(Z|[+-]\d{2}:\d{2})?$",
    "date-time": r"^\d{4}-\d{2}-\d{2}[Tt ]\d{2}:\d{2}:\d{2}(\.\d+)?(Z|[+-]\d{2}:\d{2})?$",
    "email": r"^[^@\s]+@[^@\s]+\.[^@\s]+$",
    "uuid": r"^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$",
    "ipv4": r"^((25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)\.){3}(25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)$",
    "uri": r"^[a-zA-Z][a-zA-Z0-9+.-]*://\S+$",
    "hostname": r"^[a-zA-Z0-9]([a-zA-Z0-9-]{0,61}[a-zA-Z0-9])?(\.[a-zA-Z0-9]([a-zA-Z0-9-]{0,61}[a-zA-Z0-9])?)*$",
}


def _lit(v) -> Column:
    return F.lit(v)


# JSON-literal type tests (json_mode): a shredded column holds the
# compact JSON literal of the value, so the JSON type is decidable from
# the first character / shape — stays in codegen.
_NUM_RE = r"^-?[0-9]+(\.[0-9]+)?([eE][+-]?[0-9]+)?$"


def _json_type_pred(c: Column, t: str) -> Column:
    if t == "string":
        return c.startswith('"')
    if t == "integer":
        # draft-6/7: any number with a ZERO fractional part is an
        # integer (2.0 and 1e22 validate) — jsonschema-confirmed
        return c.rlike(_NUM_RE) & (c.try_cast("double") % 1.0 == 0)
    if t == "number":
        return c.rlike(_NUM_RE)
    if t == "boolean":
        return c.isin("true", "false")
    if t == "object":
        return c.startswith("{")
    if t == "array":
        return c.startswith("[")
    if t == "null":
        return c == F.lit("null")
    raise SpecError(f"unknown JSON type {t!r}")


def _canon_dumps(v) -> str:
    import json

    return json.dumps(v, sort_keys=True, separators=(",", ":"))


def compile_check(
    check: ColumnCheck, json_mode: bool = False
) -> List[Tuple[str, str, Column, Column]]:
    """Compile one ColumnCheck into ``(constraint_id, reason,
    ok_predicate, observed)`` tuples, one per active keyword.

    JSON-Schema keyword semantics: every keyword except ``required``
    vacuously passes on NULL (a missing property only fails
    ``required`` — jsonschema semantics the reference inherits).

    ``json_mode``: the column holds the canonical JSON literal of the
    value (shredded document tables, spec.TableSpec.canonical_json) —
    keywords follow full jsonschema semantics: type from the literal
    shape, string keywords vacuous on non-strings, numeric keywords
    vacuous on non-numbers, enum/const compare canonical
    serializations, and a JSON ``null`` SATISFIES required (presence,
    not non-nullness).
    """
    from ..keys import flat_col

    c = flat_col(check.column) if json_mode else F.col(check.column)
    out: List[Tuple[str, str, Column, Column]] = []
    cid = f"check:{check.column}"

    def add(reason: str, ok: Column, observed: Column = None):
        # NULL passes everything except `required` (vacuous truth).
        # The outer coalesce pins a three-valued-logic edge: a predicate
        # that evaluates to NULL (e.g. a sql_predicate touching other
        # NULL columns) must count as FAILED in BOTH places that consume
        # it — pass1_ok (revocation) and row_violations (emission) —
        # otherwise the row would be silently revoked from key/FK worlds
        # with no recorded violation (~NULL is NULL, so the struct
        # filter would drop it).
        pred = F.coalesce(
            F.when(c.isNull() & F.lit(reason != "required"), F.lit(True)).otherwise(ok),
            F.lit(False),
        )
        out.append(
            (
                f"{cid}:{reason}",
                reason,
                pred,
                (observed if observed is not None else c.cast("string")),
            )
        )

    if json_mode:
        # decoded string value (NULL for non-string literals); string
        # keywords guard on is_str so non-strings pass vacuously.
        # Spark 4 from_json needs a container schema → wrap the scalar
        # literal in a 1-element JSON array and take element 0.
        is_str = c.startswith('"')
        decoded = F.from_json(
            F.concat(F.lit("["), c, F.lit("]")), "array<string>"
        ).getItem(0)
        is_num = c.rlike(_NUM_RE)
        num = c.try_cast("double")

        def _strk(ok: Column) -> Column:
            return F.when(~is_str, F.lit(True)).otherwise(ok)

        def _numk(ok: Column) -> Column:
            return F.when(~is_num, F.lit(True)).otherwise(ok)

    if check.required:
        base = c.isNotNull()
        if check.required_scope is not None:
            parent = (
                flat_col(check.required_scope)
                if json_mode
                else F.col(check.required_scope)
            )
            if json_mode:
                # jsonschema: required applies only to OBJECT
                # instances — absent OR non-object parent → vacuous
                base = parent.isNull() | ~parent.startswith("{") | base
            else:
                base = parent.isNull() | base
        add("required", base)
    if check.dtype is not None:
        if json_mode:
            types = (
                check.dtype if isinstance(check.dtype, tuple) else (check.dtype,)
            )
            pred = _json_type_pred(c, types[0])
            for t in types[1:]:
                pred = pred | _json_type_pred(c, t)
            add("type", pred)
        else:
            # "type" ⇔ value losslessly castable to the declared Spark
            # type (try_cast: ANSI cast throws on malformed input)
            add("type", c.isNull() | c.try_cast(check.dtype).isNotNull())
    if check.enum is not None:
        if json_mode:
            add("enum", c.isin(*[F.lit(_canon_dumps(v)) for v in check.enum]))
        else:
            add("enum", c.isin(*[F.lit(v) for v in check.enum]))
    if check.const is not None:
        if json_mode:
            add("const", c == F.lit(_canon_dumps(check.const)))
        else:
            add("const", c == _lit(check.const))
    if check.pattern is not None:
        if json_mode:
            add("pattern", _strk(decoded.rlike(check.pattern)))
        else:
            add("pattern", c.rlike(check.pattern))
    if check.minimum is not None:
        add("minimum", _numk(num >= _lit(check.minimum)) if json_mode
            else c >= _lit(check.minimum))
    if check.maximum is not None:
        add("maximum", _numk(num <= _lit(check.maximum)) if json_mode
            else c <= _lit(check.maximum))
    if check.exclusive_minimum is not None:
        add("exclusiveMinimum", _numk(num > _lit(check.exclusive_minimum))
            if json_mode else c > _lit(check.exclusive_minimum))
    if check.exclusive_maximum is not None:
        add("exclusiveMaximum", _numk(num < _lit(check.exclusive_maximum))
            if json_mode else c < _lit(check.exclusive_maximum))
    if check.min_length is not None:
        add("minLength", _strk(F.length(decoded) >= _lit(check.min_length))
            if json_mode else F.length(c) >= _lit(check.min_length))
    if check.max_length is not None:
        add("maxLength", _strk(F.length(decoded) <= _lit(check.max_length))
            if json_mode else F.length(c) <= _lit(check.max_length))
    if check.min_items is not None:
        add("minItems", F.size(c) >= _lit(check.min_items),
            F.to_json(c) if json_mode else None)
    if check.max_items is not None:
        add("maxItems", F.size(c) <= _lit(check.max_items),
            F.to_json(c) if json_mode else None)
    if check.format is not None:
        if check.format not in FORMATS:
            raise SpecError(f"unknown format {check.format!r}")
        if json_mode:
            add("format", _strk(decoded.rlike(FORMATS[check.format])))
        else:
            add("format", c.rlike(FORMATS[check.format]))
    if check.allowed_keys is not None:
        # c is the object's property-name array (`<path>#keys`);
        # NULL (absent / non-object) passes vacuously via the outer
        # guard, matching jsonschema (additionalProperties only
        # applies to objects)
        allowed = [F.lit(k) for k in check.allowed_keys]
        add(
            "additionalProperties",
            F.forall(c, lambda kk: kk.isin(*allowed)),
            F.to_json(c),
        )
    if check.sql_predicate is not None:
        add("sql", F.expr(check.sql_predicate))
    return out


def compile_battery(
    checks: List[ColumnCheck], json_mode: bool = False
) -> List[Tuple[str, str, Column, Column]]:
    out: List[Tuple[str, str, Column, Column]] = []
    for ch in checks:
        out.extend(compile_check(ch, json_mode=json_mode))
    return out


def pass1_ok(compiled: List[Tuple[str, str, Column, Column]]) -> Column:
    """Single boolean: the row passed every row-level check.  This is
    the revocation predicate (SURVEY.md §2.3 A6): rows failing pass 1
    are filtered out BEFORE key aggregation, so their PK/index keys
    are never registered and their FK values never checked —
    reproducing the reference's forget() (index_check.py:372-391,
    verified via fk_simple_example/bad_validation_2)."""
    ok = F.lit(True)
    for _, _, pred, _ in compiled:
        ok = ok & pred
    return ok


def row_violations(
    df: DataFrame,
    row_id: Column,
    compiled: List[Tuple[str, str, Column, Column]],
) -> DataFrame:
    """One fused projection: array of violation structs, compact, then
    explode → (constraint_id, reason, row_id, observed_value, path)."""
    structs = [
        F.when(
            ~pred,
            F.struct(
                F.lit(cid).alias("constraint_id"),
                F.lit(reason).alias("reason"),
                row_id.cast("string").alias("row_id"),
                obs.alias("observed_value"),
                F.lit("/" + cid.split(":", 2)[1]).alias("path"),
            ),
        )
        for cid, reason, pred, obs in compiled
    ]
    if not structs:
        # empty battery → empty violations frame with the right schema
        return (
            df.sparkSession.createDataFrame(
                [],
                "constraint_id string, reason string, row_id string, "
                "observed_value string, path string",
            )
        )
    arr = F.filter(F.array(*structs), lambda x: x.isNotNull())
    return (
        df.select(F.explode(arr).alias("v"))
        .select("v.constraint_id", "v.reason", "v.row_id", "v.observed_value", "v.path")
    )
