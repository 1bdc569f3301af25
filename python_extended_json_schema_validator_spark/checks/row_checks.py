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

from ..spec import ColumnCheck, CombinatorCheck, SpecError

# P5 format checkers: the reference registers a plain
# jsonschema.FormatChecker (extensible_validator.py:132-138) whose
# ACTIVE checkers depend on installed extras.  Every format below that
# is active in THIS jsonschema install (date, time, date-time, email,
# idn-email, uuid, ipv4, ipv6, json-pointer, relative-json-pointer,
# regex, idn-hostname) is differential-exact against the library's
# checker function, probed + tested (tests/test_formats_differential
# .py): `time` is the strptime('%H:%M:%S') legacy checker (1-2 digit
# fields, no fraction/offset, no leap second); `date-time` is
# rfc3339-validator strictness (T/t separator only, offset REQUIRED,
# calendar-exact, seconds ≤59); ipv6 mirrors ipaddress acceptance
# (compression, embedded v4, no zone-id, no leading-zero v4 octets).
# hostname/uri are ENGINE EXTRAS: they approximate the format-nongpl
# checkers (fqdn/rfc3987) this bare install leaves unchecked —
# remove them via FORMATS.pop() for bit parity with a bare install.
#
# FORMATS is a REGISTRY (⇔ the reference's customFormats parameter,
# extensible_validator.py:77-84,117-138: objects exposing FormatName +
# IsCorrectFormat).  Values are either a Java-regex string (compiled to
# rlike, JVM-side) or a callable Column→Column predicate (for formats a
# regex can't express — kept vectorized by the caller).  Register via
# register_format(); schemas.load_schemas(custom_formats=...) accepts
# the reference's class protocol and funnels it here.
def _date_format_pred(value: "Column") -> "Column":
    """Full-CALENDAR date check (month 1-12, real day-of-month, leap
    years) — jsonschema's date checker delegates to
    datetime.date.fromisoformat, so '2024-02-31' must FAIL; a shape
    regex can't express that, java.time via try_to_timestamp can.
    The rlike guard pins the strict ISO shape (4-2-2 digits) since
    the formatter alone is laxer about it.  Verified differential in
    tests/test_random_differential.py."""
    return value.rlike(r"^\d{4}-\d{2}-\d{2}$") & F.try_to_timestamp(
        value, F.lit("yyyy-MM-dd")
    ).isNotNull()


def _datetime_format_pred(value: "Column") -> "Column":
    """rfc3339-validator-exact date-time: strict shape + hour/minute/
    second ranges by regex, calendar-exact date via the same
    try_to_timestamp trick as `date`."""
    shape = value.rlike(
        r"^\d{4}-\d{2}-\d{2}[Tt]([01][0-9]|2[0-3]):[0-5][0-9]:[0-5][0-9]"
        r"(\.\d+)?([Zz]|[+-]([01][0-9]|2[0-3]):[0-5][0-9])$"
    )
    return shape & F.try_to_timestamp(
        F.substring(value, 1, 10), F.lit("yyyy-MM-dd")
    ).isNotNull()


def _python_pred(fn):
    """Arrow-batched Python fallback for formats only a Python library
    can decide (regex compilability, IDNA encodability).  fn: str →
    bool; NULLs pass through.  Slow path by design — these formats are
    rare and per-value."""

    def pred(value: "Column") -> "Column":
        import pandas as pd

        def _ok_fn(s):
            return s.map(lambda x: None if x is None else fn(x))

        # real class objects, not strings — this module's
        # `from __future__ import annotations` would otherwise leave
        # pandas_udf unresolvable 'pd.Series' hints
        _ok_fn.__annotations__ = {"s": pd.Series, "return": pd.Series}
        return F.pandas_udf(_ok_fn, "boolean")(value)

    return pred


def _re_compiles(x: str) -> bool:
    import re as _re

    try:
        _re.compile(x)
        return True
    except _re.error:
        return False


def _idna_encodes(x: str) -> bool:
    try:
        import idna
    except ImportError:  # jsonschema skips the checker without idna
        return True
    try:
        idna.encode(x)
        return True
    except (idna.IDNAError, UnicodeError):
        return False


# pure-JVM Column callables may run inside higher-order-function
# lambdas; Python-UDF-backed ones may NOT (Spark rejects Python UDFs
# in HOFs) — the schema compiler consults this marker before admitting
# a format into the scalar subset
_date_format_pred.hof_safe = True
_datetime_format_pred.hof_safe = True

_V4 = r"(25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)(\.(25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)){3}"
_G = r"[0-9A-Fa-f]{1,4}"
# ipaddress.IPv6Address acceptance: full 8 groups, :: compression
# anywhere, embedded IPv4 (with or without compression), no zone-id,
# no leading-zero v4 octets — differential-tested on a 60-case battery
_IPV6 = (
    r"^("
    rf"({_G}:){{7}}{_G}"
    rf"|({_G}:){{1,7}}:"
    rf"|({_G}:){{1,6}}:{_G}"
    rf"|({_G}:){{1,5}}(:{_G}){{2}}"
    rf"|({_G}:){{1,4}}(:{_G}){{3}}"
    rf"|({_G}:){{1,3}}(:{_G}){{4}}"
    rf"|({_G}:){{1,2}}(:{_G}){{5}}"
    rf"|{_G}:(:{_G}){{6}}"
    rf"|:((:{_G}){{1,7}}|:)"
    rf"|({_G}:){{6}}{_V4}"
    rf"|({_G}:){{1,5}}:{_V4}"
    rf"|({_G}:){{1,4}}:({_G}:){{1}}{_V4}"
    rf"|::({_G}:){{0,5}}{_V4}"
    r")$"
)

FORMATS = {
    "date": _date_format_pred,
    # the plain FormatChecker's `time` is the legacy strptime checker:
    # EVERY field 1-2 digits (strptime), in-range, nothing after
    "time": r"^([0-9]|0[0-9]|1[0-9]|2[0-3]):([0-9]|[0-5][0-9]):([0-9]|[0-5][0-9])$",
    "date-time": _datetime_format_pred,
    # jsonschema's built-in email checker is literally `"@" in instance`
    # (same with or without format-nongpl) — rlike is a find, so an
    # unanchored "@" IS containment.  Verified differential.
    "email": r"@",
    "idn-email": r"@",  # same library function as email
    "uuid": r"^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$",
    "ipv4": r"^((25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)\.){3}(25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)$",
    "ipv6": _IPV6,
    # RFC 6901 / 'relative' draft, matching the jsonpointer library's
    # acceptance exactly (empty ok, ~ must precede 0/1)
    "json-pointer": r"^(/([^/~]|~[01])*)*$",
    "relative-json-pointer": r"^(0|[1-9][0-9]*)(#|(/([^/~]|~[01])*)*)$",
    "regex": _python_pred(_re_compiles),
    "idn-hostname": _python_pred(_idna_encodes),
    "uri": r"^[a-zA-Z][a-zA-Z0-9+.-]*://\S+$",
    "hostname": r"^[a-zA-Z0-9]([a-zA-Z0-9-]{0,61}[a-zA-Z0-9])?(\.[a-zA-Z0-9]([a-zA-Z0-9-]{0,61}[a-zA-Z0-9])?)*$",
}


def register_format(name: str, checker) -> None:
    """Register a custom format (⇔ customFormats,
    extensible_validator.py:77-84: the reference passes a list of
    classes with ``FormatName`` / ``IsCorrectFormat``).  ``checker`` is
    a regex string (JVM rlike) or a Column→Column predicate callable
    (must pass vacuously on values it doesn't apply to)."""
    if not name or not isinstance(name, str):
        raise SpecError(f"format name must be a non-empty string, got {name!r}")
    if not (isinstance(checker, str) or callable(checker)):
        raise SpecError(f"format {name!r}: checker must be a regex or callable")
    FORMATS[name] = checker


def _fmt_checker(fmt: str, formats=None):
    """Resolve a format checker: the per-compilation overlay (scoped
    customFormats, ⇔ the reference's per-ExtensibleValidator-instance
    scoping) shadows the process-global FORMATS registry."""
    if formats and fmt in formats:
        return formats[fmt]
    return FORMATS.get(fmt)


def _format_pred(fmt: str, value: Column, formats=None) -> Column:
    """ok-Column for a registered format applied to a STRING value."""
    checker = _fmt_checker(fmt, formats)
    if isinstance(checker, str):
        return value.rlike(checker)
    return checker(value)


# reasons whose predicate must NOT vacuously pass on a NULL column
# (`required` checks presence itself; dependency checks fire exactly
# when the column is absent but the trigger is present)
_NON_VACUOUS = frozenset({"required", "dependencies", "dependentRequired"})


def _lit(v) -> Column:
    """F.lit, safe for integers beyond the 64-bit long range (schema
    authors CAN write {"minimum": 2**70} — F.lit would throw, crashing
    the whole compilation): such values ride as doubles (±inf past the
    double range), matching the double comparison legs they feed; the
    decimal legs own exactness for big-int enum/multipleOf."""
    if isinstance(v, int) and not isinstance(v, bool) and abs(v) > _LONG_MAX:
        try:
            return F.lit(float(v))
        except OverflowError:
            import math

            return F.lit(math.inf if v > 0 else -math.inf)
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
    if t == "integer4":
        # drafts 03/04: integer ⇔ the instance IS an int (1.0 fails —
        # jsonschema Draft3/4 type checker, caught by the draft-04
        # randomized differential).  Canonical int literals are pure
        # digit runs (json.dumps writes floats with '.'/'e').
        return c.rlike("^-?[0-9]+$")
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


def _decode_literal(c: Column) -> Column:
    """Decoded string value of a canonical JSON literal (NULL for
    non-string literals).  Spark 4 from_json needs a container schema →
    wrap the scalar literal in a 1-element JSON array, take element 0."""
    return F.from_json(
        F.concat(F.lit("["), c, F.lit("]")), "array<string>"
    ).getItem(0)


def _num_tag(el: Column) -> Column:
    """Literal → equality key with jsonschema number semantics: JSON
    numbers compare numerically (1 == 1.0) but never equal booleans or
    strings, so numeric literals are normalized through double and
    type-tagged; everything else keeps its canonical literal."""
    return F.when(
        el.rlike(_NUM_RE),
        F.concat(F.lit("n:"), el.try_cast("double").cast("string")),
    ).otherwise(el)


def _leaf_reason(kw: str, never_as: str) -> str:
    """Reason name for one scalar-subset keyword: the `false`-schema
    sentinel surfaces as the CONTAINER keyword; the internal draft-03/04
    strict-bound kws report under minimum/maximum (jsonschema's legacy
    validators own the boolean modifier)."""
    if kw == "never":
        return never_as
    if kw == "exclusiveMinimum4":
        return "minimum"
    if kw == "exclusiveMaximum4":
        return "maximum"
    return kw


_LONG_MAX = 2**63 - 1


def _dec_lit(v: int) -> Column:
    """Integer literal as decimal(38,0) — via a STRING cast when it
    exceeds the 64-bit long range (F.lit would throw)."""
    if abs(v) <= _LONG_MAX:
        return F.lit(v).cast("decimal(38,0)")
    return F.lit(str(v)).cast("decimal(38,0)")


_num_lit = _lit  # numeric literal for the DOUBLE comparison legs


def _enum_pred(c: Column, values) -> Column:
    """jsonschema enum/const equality over canonical literals: numbers
    compare NUMERICALLY (2.0 matches enum [1,2,3]; 1 matches 1.0)
    while bools/strings/containers match by canonical literal only
    (true never equals 1 — the literal "true" is not numeric).

    Integer members vs pure-digit instances compare EXACTLY through
    decimal(38,0) — mirroring the multipleOf fix — so 9007199254740992
    no longer falsely matches enum [9007199254740993] past 2^53
    (jsonschema uses arbitrary-precision ==).  Residual documented
    edges: float members vs huge integer instances (and >38-digit
    integer pairs) still decide through double."""
    lits = []
    float_members = []
    int_members = []
    for v in values:
        lits.append(_canon_dumps(v))
        if isinstance(v, bool):
            continue
        if isinstance(v, int):
            int_members.append(v)
        elif isinstance(v, float):
            float_members.append(v)
    pred = c.isin(*[F.lit(x) for x in lits]) if lits else F.lit(False)
    is_num = c.rlike(_NUM_RE)
    if int_members:
        digit = c.rlike("^-?[0-9]+$")
        dec = c.try_cast("decimal(38,0)")
        dec_members = [m for m in int_members if abs(m) < 10**38]
        if dec_members:
            # members ride as STRING literals cast to decimal — F.lit
            # on a Python int beyond the 64-bit long range would throw
            pred = pred | (
                digit & dec.isNotNull()
                & dec.isin(*[_dec_lit(m) for m in dec_members])
            )
        int_doubles = []
        for m in int_members:
            try:
                f = float(m)
            except OverflowError:
                # int beyond float range: exact-literal + decimal legs
                # already cover every representable spelling
                continue
            # a double instance can equal an int member ONLY when the
            # member is exactly double-representable — a non-round-trip
            # member riding the double leg would falsely match the
            # nearest double (float(2^53+1) == 2^53+0.0)
            if int(f) == m:
                int_doubles.append(f)
        if int_doubles:
            # float-form instances (2.0 ∈ [1,2,3]) and >38-digit runs
            # only — digit instances are decided exactly above and must
            # not round through double back onto an integer member
            pred = pred | (
                is_num
                & ~(digit & dec.isNotNull())
                & c.try_cast("double").isin(*[F.lit(n) for n in int_doubles])
            )
    if float_members:
        pred = pred | (
            is_num
            & c.try_cast("double").isin(*[F.lit(n) for n in float_members])
        )
    return pred


def _scalar_kw_pred(
    value: Column, kws: dict, literal_mode: bool, formats=None
) -> Column:
    """ok-Column for the scalar-expressible keyword subset applied to
    one value: ``literal_mode`` treats ``value`` as a canonical JSON
    literal (patternProperties values), else as a plain string instance
    (propertyNames).  Vacuity matches jsonschema: string keywords skip
    non-strings, numeric keywords skip non-numbers."""
    ok = F.lit(True)
    if literal_mode:
        is_str = value.startswith('"')
        s = _decode_literal(value)
        is_num = value.rlike(_NUM_RE)
        num = value.try_cast("double")
    else:
        is_str = F.lit(True)
        s = value
        is_num = F.lit(False)
        num = F.lit(None).cast("double")

    def strk(p: Column) -> Column:
        return F.when(~is_str, F.lit(True)).otherwise(p)

    def numk(p: Column) -> Column:
        return F.when(~is_num, F.lit(True)).otherwise(p)

    for kw, arg in kws.items():
        if kw == "type":
            types = [arg] if isinstance(arg, str) else list(arg)
            if literal_mode:
                p = _json_type_pred(value, types[0])
                for t in types[1:]:
                    p = p | _json_type_pred(value, t)
            else:
                p = F.lit("string" in types)
            ok = ok & p
        elif kw == "enum":
            if literal_mode:
                # empty enum = nothing allowed; numbers match numerically
                ok = ok & (_enum_pred(value, arg) if arg else F.lit(False))
            else:
                ok = ok & (
                    value.isin(*[F.lit(v) for v in arg])
                    if arg
                    else F.lit(False)
                )
        elif kw == "const":
            if literal_mode:
                ok = ok & _enum_pred(value, (arg,))
            else:
                ok = ok & (value == F.lit(arg))
        elif kw == "pattern":
            ok = ok & strk(s.rlike(arg))
        elif kw == "minLength":
            ok = ok & strk(F.length(s) >= F.lit(arg))
        elif kw == "maxLength":
            ok = ok & strk(F.length(s) <= F.lit(arg))
        elif kw == "format":
            checker = _fmt_checker(arg, formats)
            if checker is not None and (
                isinstance(checker, str) or getattr(checker, "hof_safe", False)
            ):
                ok = ok & strk(_format_pred(arg, s, formats))
            # Python-UDF checkers can't run inside HOF lambdas — the
            # compiler drops them with a warning; pass defensively here
        elif kw == "minimum":
            ok = ok & numk(num >= _num_lit(arg))
        elif kw == "maximum":
            ok = ok & numk(num <= _num_lit(arg))
        elif kw in ("exclusiveMinimum", "exclusiveMinimum4"):
            # *4 = the draft-03/04 boolean-modifier form (strict bound
            # REPORTED under `minimum` — see _leaf_reason)
            ok = ok & numk(num > _num_lit(arg))
        elif kw in ("exclusiveMaximum", "exclusiveMaximum4"):
            ok = ok & numk(num < _num_lit(arg))
        elif kw in ("multipleOf", "divisibleBy"):
            p = num % _num_lit(arg) == 0
            if literal_mode and isinstance(arg, int) and not isinstance(arg, bool):
                # jsonschema does EXACT int % int for integer instances
                # — double arithmetic diverges past 2^53 (e.g.
                # 10000000000000001 % 10); decimal(38,0) matches up to
                # 38 digits, the double path remains for the rest
                dec = value.try_cast("decimal(38,0)")
                p = F.when(
                    value.rlike("^-?[0-9]+$") & dec.isNotNull(),
                    dec % _dec_lit(arg) == 0,
                ).otherwise(p)
            ok = ok & numk(p)
        elif kw == "never":
            # the `false` subschema: no value is acceptable
            ok = ok & F.lit(False)
        else:
            raise SpecError(f"scalar keyword subset does not include {kw!r}")
    return ok


def compile_check(
    check: ColumnCheck, json_mode: bool = False, formats=None
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
        # NULL passes everything except `required` and the dependency
        # reasons (vacuous truth).
        # The outer coalesce pins a three-valued-logic edge: a predicate
        # that evaluates to NULL (e.g. a sql_predicate touching other
        # NULL columns) must count as FAILED in BOTH places that consume
        # it — pass1_ok (revocation) and row_violations (emission) —
        # otherwise the row would be silently revoked from key/FK worlds
        # with no recorded violation (~NULL is NULL, so the struct
        # filter would drop it).
        pred = F.coalesce(
            F.when(
                c.isNull() & F.lit(reason not in _NON_VACUOUS), F.lit(True)
            ).otherwise(ok),
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
        decoded = _decode_literal(c)
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
        if not check.enum:
            # empty enum = nothing allowed (isin() with no args throws)
            add("enum", F.lit(False))
        elif json_mode:
            # numbers match numerically (2.0 in [1,2,3]) — jsonschema
            # equality, caught by the draft-04 randomized differential
            add("enum", _enum_pred(c, check.enum))
        else:
            add("enum", c.isin(*[F.lit(v) for v in check.enum]))
    if check.const is not None:
        if json_mode:
            add("const", _enum_pred(c, (check.const,)))
        else:
            add("const", c == _lit(check.const))
    if check.const_null:
        # `const: null` — present instances must be JSON null (the
        # None-valued `const` field can't carry it, see spec.py)
        add("const", c == F.lit("null") if json_mode else F.lit(False))
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
        # drafts 03/04: the boolean exclusiveMinimum modifier is part
        # of the `minimum` validator, so jsonschema reports `minimum`
        add("minimum" if check.legacy_exclusive_bounds else "exclusiveMinimum",
            _numk(num > _lit(check.exclusive_minimum))
            if json_mode else c > _lit(check.exclusive_minimum))
    if check.exclusive_maximum is not None:
        add("maximum" if check.legacy_exclusive_bounds else "exclusiveMaximum",
            _numk(num < _lit(check.exclusive_maximum))
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
        if _fmt_checker(check.format, formats) is None:
            raise SpecError(f"unknown format {check.format!r}")
        if json_mode:
            add("format", _strk(_format_pred(check.format, decoded, formats)))
        else:
            add("format", _format_pred(check.format, c, formats))
    if check.multiple_of is not None:
        m = check.multiple_of
        if json_mode:
            pred = num % _num_lit(m) == 0
            if isinstance(m, int) and not isinstance(m, bool):
                # exact integer semantics (see _scalar_kw_pred)
                dec = c.try_cast("decimal(38,0)")
                pred = F.when(
                    c.rlike("^-?[0-9]+$") & dec.isNotNull(),
                    dec % _dec_lit(m) == 0,
                ).otherwise(pred)
            add(check.multiple_of_reason, _numk(pred))
        else:
            add(check.multiple_of_reason,
                c.try_cast("double") % _lit(m) == 0)
    if check.unique_items:
        # c is the element array (literals in json_mode); numeric
        # literals normalize through _num_tag so 1 and 1.0 collide
        # (jsonschema numeric equality) while `true` stays distinct
        elems = F.transform(c, _num_tag) if json_mode else c
        add(
            "uniqueItems",
            F.size(F.array_distinct(elems)) == F.size(c),
            F.to_json(c),
        )
    if check.min_properties is not None:
        if check.per_element:
            mn = _lit(check.min_properties)
            add(
                "minProperties",
                F.forall(c, lambda inner: inner.isNull() | (F.size(inner) >= mn)),
                F.to_json(c),
            )
        else:
            add("minProperties", F.size(c) >= _lit(check.min_properties),
                F.to_json(c))
    if check.max_properties is not None:
        if check.per_element:
            mx = _lit(check.max_properties)
            add(
                "maxProperties",
                F.forall(c, lambda inner: inner.isNull() | (F.size(inner) <= mx)),
                F.to_json(c),
            )
        else:
            add("maxProperties", F.size(c) <= _lit(check.max_properties),
                F.to_json(c))
    if check.element_checks is not None:
        # c is the element-literal array (`<path>[]`): every element
        # must satisfy each `items` keyword.  NULL (absent or
        # non-array instance) passes vacuously via the outer guard —
        # jsonschema only applies items to arrays.  Leaf reasons
        # (jsonschema descends into the items subschema).
        def _el_pred(kw, arg):
            return lambda el: _scalar_kw_pred(el, {kw: arg}, literal_mode=True, formats=formats)

        for kw, arg in check.element_checks:
            reason = _leaf_reason(kw, "items")
            add(reason, F.forall(c, _el_pred(kw, arg)), F.to_json(c))
    if check.element_sub_checks is not None:
        # scalar keywords at a property path inside array elements
        # ("loc[].rel"): c is the ALIGNED sub-instance literal array —
        # NULL entries (element lacks the property / isn't an object)
        # pass vacuously, exactly jsonschema's reach semantics
        def _make_sub_pred(kw, arg):
            def pred(el: Column) -> Column:
                return el.isNull() | _scalar_kw_pred(
                    el, {kw: arg}, literal_mode=True, formats=formats
                )

            return pred

        for kw, arg in check.element_sub_checks:
            reason = _leaf_reason(kw, "items")
            add(
                reason,
                F.forall(c, _make_sub_pred(kw, arg)),
                F.to_json(c),
            )
    if check.element_required_scope is not None:
        # `required` inside an element subschema: per index, an OBJECT
        # entry of the parent's aligned literal array must have a
        # present member entry; non-object/absent parents are vacuous
        # (jsonschema applies required to objects only).  NULL member
        # entries with an object parent FAIL — which is why this rides
        # its own zip predicate instead of the NULL-vacuous add() path.
        scope_arr = (
            flat_col(check.element_required_scope)
            if json_mode
            else F.col(check.element_required_scope)
        )
        zipped = F.zip_with(
            scope_arr,
            c,
            lambda el, sub: el.isNull()
            | ~el.startswith("{")
            | sub.isNotNull(),
        )
        add(
            "required",
            F.when(
                c.isNull() | scope_arr.isNull(), F.lit(True)
            ).otherwise(F.forall(zipped, lambda x: x)),
            F.to_json(c),
        )
    if check.element_combinators is not None:
        # combinators inside an `items` subschema, applied per element
        # literal.  Closure FACTORIES throughout — PySpark derives HOF
        # arity from the lambda's parameter count, so default-arg
        # closures would break forall.
        def _make_conj(kwpairs):
            def conj(el: Column) -> Column:
                ok = F.lit(True)
                for kw, arg in kwpairs:
                    ok = ok & _scalar_kw_pred(el, {kw: arg}, literal_mode=True, formats=formats)
                return ok

            return conj

        def _make_combo(kind, branches):
            conjs = [_make_conj(b) for b in branches]

            def combo(el: Column) -> Column:
                # NULL entries (sub-level aligned arrays: element lacks
                # the property) are vacuous — jsonschema never reaches
                # the subschema; direct element literals are never NULL
                oks = [cj(el) for cj in conjs]
                if kind == "anyOf":
                    ok = oks[0]
                    for b in oks[1:]:
                        ok = ok | b
                elif kind == "oneOf":
                    cnt = F.lit(0)
                    for b in oks:
                        cnt = cnt + F.when(b, F.lit(1)).otherwise(F.lit(0))
                    ok = cnt == F.lit(1)
                elif kind == "not":
                    ok = ~oks[0]
                return el.isNull() | ok

            return combo

        def _make_ite_leaf(if_kwpairs, kw, arg, on_if_true):
            if_conj = _make_conj(if_kwpairs)

            def leaf(el: Column) -> Column:
                cond = if_conj(el)
                gate = cond if on_if_true else ~cond
                # NULL entries (sub-level aligned arrays) are vacuous
                return el.isNull() | F.when(
                    gate, _scalar_kw_pred(el, {kw: arg}, literal_mode=True, formats=formats)
                ).otherwise(F.lit(True))

            return leaf

        for kind, branches in check.element_combinators:
            if kind == "ifThenElse":
                # jsonschema descends into whichever of then/else
                # applies per ELEMENT → leaf keyword reasons
                # ([verified] probe); the `false`-branch sentinel
                # surfaces as then/else like the battery-level compile
                if_b, then_b, else_b = branches
                for kwpairs, on_true, lbl in (
                    (then_b, True, "then"),
                    (else_b, False, "else"),
                ):
                    for kw, arg in kwpairs:
                        add(
                            _leaf_reason(kw, lbl),
                            F.forall(c, _make_ite_leaf(if_b, kw, arg, on_true)),
                            F.to_json(c),
                        )
            else:
                add(kind, F.forall(c, _make_combo(kind, branches)), F.to_json(c))
    if check.contains_checks is not None:
        # c is the element-literal array; `matched` counts elements
        # satisfying the contains subschema.  Reason split verified
        # differential: zero matches → `contains`; 1 ≤ matched < min →
        # `minContains`; matched > max → `maxContains`; minContains 0
        # silences `contains` entirely (2019-09 semantics).
        kws = dict(check.contains_checks)

        def _contains_pred(el: Column) -> Column:
            return _scalar_kw_pred(el, kws, literal_mode=True, formats=formats)

        matched = F.size(F.filter(c, _contains_pred))
        minc = 1 if check.min_contains is None else check.min_contains
        if minc > 0:
            add("contains", matched > 0, F.to_json(c))
            if minc > 1:
                add(
                    "minContains",
                    (matched == 0) | (matched >= _lit(minc)),
                    F.to_json(c),
                )
        if check.max_contains is not None:
            add("maxContains", matched <= _lit(check.max_contains), F.to_json(c))
    if check.tail_item_checks is not None:
        # 2020-12 items-after-prefixItems: every element past the
        # prefix must satisfy the items subschema — LEAF reasons
        # (jsonschema descends per tail element)
        t_prefix_len, t_kwpairs = check.tail_item_checks
        t_tail = F.slice(
            c,
            t_prefix_len + 1,
            F.greatest(F.size(c) - t_prefix_len, F.lit(0)),
        )

        def _make_tail_pred(kw, arg):
            def pred(el: Column) -> Column:
                return _scalar_kw_pred(
                    el, {kw: arg}, literal_mode=True, formats=formats
                )

            return pred

        for kw, arg in t_kwpairs:
            add(
                _leaf_reason(kw, "items"),
                F.forall(t_tail, _make_tail_pred(kw, arg)),
                F.to_json(t_tail),
            )
    if check.unevaluated_item_checks is not None:
        # schema-form unevaluatedItems: every element past the
        # evaluated prefix must satisfy the subschema; reason is the
        # single name "unevaluatedItems" (jsonschema's UI descent
        # collapses like the UP one)
        ui_prefix_len, ui_kwpairs = check.unevaluated_item_checks
        ui_kws = dict(ui_kwpairs)
        tail = F.slice(
            c,
            ui_prefix_len + 1,
            F.greatest(F.size(c) - ui_prefix_len, F.lit(0)),
        )

        def _ui_pred(el: Column) -> Column:
            return _scalar_kw_pred(el, ui_kws, literal_mode=True, formats=formats)

        add(
            "unevaluatedItems",
            F.forall(tail, _ui_pred),
            F.to_json(tail),
        )
    if check.max_unevaluated_items is not None:
        # static "unevaluatedItems": false — only the first
        # max_unevaluated_items positions are evaluated (by
        # prefixItems / tuple items), so any longer array fails.
        # NULL (absent / non-array) passes vacuously via the outer
        # guard, matching jsonschema (arrays only).
        add(
            check.max_unevaluated_items_reason,
            F.size(c) <= _lit(check.max_unevaluated_items),
            F.to_json(c),
        )
    if check.index_checks is not None:
        # tuple-form items / prefixItems: the i-th element literal
        # (F.get → NULL when out of bounds, never ANSI-throws) against
        # that position's keyword set; absent elements pass vacuously
        for idx, kwpairs in check.index_checks:
            el = F.get(c, idx)
            for kw, arg in kwpairs:
                reason = _leaf_reason(kw, "items")
                add(
                    reason,
                    F.when(el.isNull(), F.lit(True)).otherwise(
                        _scalar_kw_pred(el, {kw: arg}, literal_mode=True, formats=formats)
                    ),
                    el,
                )
    if check.property_names is not None:
        # c is the property-name array (`<path>#keys`): every NAME is
        # a plain string instance validated by the subschema.  ONE
        # violation per failing LEAF keyword (reason = the leaf
        # validator name, e.g. 'pattern' — jsonschema descends into
        # the subschema and reports the leaf, verified differential;
        # known divergence: multiple offending names collapse into one
        # violation where jsonschema emits one per name)
        def _name_pred(kw, arg):
            # factory, not default-arg lambda: PySpark derives HOF
            # arity from the lambda's parameter count
            return lambda n: _scalar_kw_pred(n, {kw: arg}, literal_mode=False, formats=formats)

        def _per_element_names(kw, arg):
            inner_pred = _name_pred(kw, arg)

            def f(inner: Column) -> Column:
                return inner.isNull() | F.forall(inner, inner_pred)

            return f

        for kw, arg in check.property_names:
            reason = _leaf_reason(kw, "propertyNames")
            add(
                reason,
                F.forall(c, _per_element_names(kw, arg))
                if check.per_element
                else F.forall(c, _name_pred(kw, arg)),
                F.to_json(c),
            )
    if check.pattern_properties is not None:
        # c is the `<path>#entries` map<string,string> (name → literal):
        # values of every name matching a regex must satisfy that
        # regex's keyword set.  Leaf reasons, same granularity note as
        # propertyNames above.
        def _match_filter(regex):
            return lambda k, v: k.rlike(regex)

        def _val_pred(kw, arg):
            return lambda v: _scalar_kw_pred(v, {kw: arg}, literal_mode=True, formats=formats)

        def _per_element_pp(regex, kw, arg):
            mf = _match_filter(regex)
            vp = _val_pred(kw, arg)

            def f(inner: Column) -> Column:
                return inner.isNull() | F.forall(
                    F.map_values(F.map_filter(inner, mf)), vp
                )

            return f

        for regex, kwpairs in check.pattern_properties:
            for kw, arg in kwpairs:
                reason = _leaf_reason(kw, "patternProperties")
                if check.per_element:
                    # c is array<map> (`<loc>#entries` per element)
                    add(
                        reason,
                        F.forall(c, _per_element_pp(regex, kw, arg)),
                        F.to_json(c),
                    )
                else:
                    matching = F.map_values(
                        F.map_filter(c, _match_filter(regex))
                    )
                    add(
                        reason,
                        F.forall(matching, _val_pred(kw, arg)),
                        F.to_json(matching),
                    )
    if check.additional_entries is not None or check.unevaluated_entries is not None:

        def _undeclared_filter(allowed, patterns):
            lits = [F.lit(a) for a in allowed]

            def _f(k, v):
                p = k.isin(*lits) if lits else F.lit(False)
                for rp in patterns:
                    p = p | k.rlike(rp)
                return ~p

            return _f

        def _entry_val_pred(kw, arg):
            return lambda v: _scalar_kw_pred(v, {kw: arg}, literal_mode=True, formats=formats)

    if check.additional_entries is not None:
        # schema-form additionalProperties: values of undeclared,
        # unpatterned properties against the scalar subset — LEAF
        # reasons (jsonschema descends; same granularity note as
        # propertyNames: multiple offending values collapse into one
        # violation per keyword)
        allowed, patterns, kwpairs = check.additional_entries
        if check.per_element:
            # c is array<map>: undeclared values of each OBJECT element
            # must satisfy the subset; NULL inner (non-object) vacuous
            def _per_element_ap(kw, arg):
                undecl = _undeclared_filter(allowed, patterns)
                vp = _entry_val_pred(kw, arg)

                def f(inner: Column) -> Column:
                    return inner.isNull() | F.forall(
                        F.map_values(F.map_filter(inner, undecl)), vp
                    )

                return f

            for kw, arg in kwpairs:
                reason = _leaf_reason(kw, "additionalProperties")
                add(reason, F.forall(c, _per_element_ap(kw, arg)), F.to_json(c))
        else:
            extra_vals = F.map_values(
                F.map_filter(c, _undeclared_filter(allowed, patterns))
            )
            for kw, arg in kwpairs:
                reason = _leaf_reason(kw, "additionalProperties")
                add(
                    reason,
                    F.forall(extra_vals, _entry_val_pred(kw, arg)),
                    F.to_json(extra_vals),
                )
    if check.unevaluated_entries is not None:
        # value-dependent unevaluatedProperties: an entry violates iff
        # undeclared AND un-evaluated by AP's value predicate (2020-12
        # walk) AND failing the schema-form UP subschema (UP false =
        # no up_kws = nothing passes)
        allowed, patterns, ap_kws, up_kws = check.unevaluated_entries
        apd = dict(ap_kws) if ap_kws is not None else None
        upd = dict(up_kws) if up_kws is not None else None
        undeclared = _undeclared_filter(allowed, patterns)

        def _unevaluated(k, v):
            bad = undeclared(k, v)
            if apd is not None:
                bad = bad & ~_scalar_kw_pred(v, apd, literal_mode=True, formats=formats)
            if upd is not None:
                bad = bad & ~_scalar_kw_pred(v, upd, literal_mode=True, formats=formats)
            return bad

        add(
            "unevaluatedProperties",
            F.size(F.map_filter(c, _unevaluated)) == 0,
            F.to_json(c),
        )
    if check.dependent_on is not None:
        gate = (
            flat_col(check.dependent_on) if json_mode else F.col(check.dependent_on)
        )
        if check.per_element:
            # items-level required-form dependencies: per index of the
            # ALIGNED arrays, a present trigger entry needs a present
            # member entry; absent arrays / non-object elements (both
            # entries NULL) are vacuous
            zipped = F.zip_with(
                gate, c, lambda t, m: t.isNull() | m.isNotNull()
            )
            add(
                check.dependent_reason,
                F.when(c.isNull() | gate.isNull(), F.lit(True)).otherwise(
                    F.forall(zipped, lambda x: x)
                ),
                F.to_json(gate),
            )
        else:
            # presence-based: trigger present → this column present
            # (reason is non-vacuous, so a NULL column with a present
            # trigger FAILS — see _NON_VACUOUS)
            add(check.dependent_reason, gate.isNull() | c.isNotNull(),
                gate.cast("string"))
    if check.allowed_keys is not None:
        # c is the object's property-name array (`<path>#keys`);
        # NULL (absent / non-object) passes vacuously via the outer
        # guard, matching jsonschema (additionalProperties only
        # applies to objects).  Names matching a patternProperties
        # regex are allowed even when undeclared.
        allowed = [F.lit(k) for k in check.allowed_keys]

        def _name_ok(kk: Column) -> Column:
            p = kk.isin(*allowed) if allowed else F.lit(False)
            for rp in check.allowed_key_patterns or ():
                p = p | kk.rlike(rp)
            return p

        def _element_names_ok(inner: Column) -> Column:
            return inner.isNull() | F.forall(inner, _name_ok)

        add(
            check.keys_reason,
            F.forall(c, _element_names_ok)
            if check.per_element
            else F.forall(c, _name_ok),
            F.to_json(c),
        )
    if check.sql_predicate is not None:
        add("sql", F.expr(check.sql_predicate))
    return out


def _branch_ok(branch, json_mode: bool, formats=None) -> Column:
    """Conjunction of every compiled predicate in one combinator
    branch (an empty branch is the always-true schema ``{}``)."""
    ok = F.lit(True)
    for chk in branch:
        if isinstance(chk, CombinatorCheck):
            ok = ok & compile_combinator(chk, json_mode=json_mode,
                                         formats=formats)[2]
        else:
            for _, _, p, _ in compile_check(chk, json_mode=json_mode,
                                            formats=formats):
                ok = ok & p
    return ok


def compile_combinator(
    cc: CombinatorCheck, json_mode: bool = False, formats=None
) -> Tuple[str, str, Column, Column]:
    """One CombinatorCheck → a single ``(constraint_id, reason, ok,
    observed)`` tuple.  Branch conjunctions reuse compile_check, so
    per-keyword vacuity inside a branch matches jsonschema exactly
    (⇔ the reference's combinator handling inherited from jsonschema,
    extensible_validator.py:1163-1194); the combinator itself passes
    vacuously when the gating instance is absent."""
    from ..keys import flat_col

    gate = flat_col(cc.column) if json_mode else F.col(cc.column)
    branch_oks = [_branch_ok(b, json_mode, formats) for b in cc.branches]
    if cc.kind == "anyOf":
        ok = branch_oks[0]
        for b in branch_oks[1:]:
            ok = ok | b
    elif cc.kind == "oneOf":
        cnt = F.lit(0)
        for b in branch_oks:
            cnt = cnt + F.when(b, F.lit(1)).otherwise(F.lit(0))
        ok = cnt == 1
    elif cc.kind == "not":
        ok = ~branch_oks[0]
    elif cc.kind == "ifThenElse":
        ok = F.when(branch_oks[0], branch_oks[1]).otherwise(branch_oks[2])
    else:  # dependentSchema: branch must hold when the trigger member
        # is present (draft-07 `dependencies` schema form)
        member = flat_col(cc.gate_member) if json_mode else F.col(cc.gate_member)
        ok = member.isNull() | branch_oks[0]
    reason = cc.reason or (
        "dependencies" if cc.kind == "dependentSchema" else cc.kind
    )
    pred = F.coalesce(
        F.when(gate.isNull(), F.lit(True)).otherwise(ok), F.lit(False)
    )
    cid = f"check:{cc.column}:{reason}"
    return (cid, reason, pred, gate.cast("string"))


def compile_dependent_schema(
    cc: CombinatorCheck, json_mode: bool = False, formats=None
) -> List[Tuple[str, str, Column, Column]]:
    """Schema-form dependencies at battery level: jsonschema DESCENDS
    into the subschema (Draft7 `dependencies` / 2019-09
    `dependentSchemas` yield from validator.descend), so failures carry
    the LEAF validator name (`required`, `type`, ...), not
    `dependencies` — verified differential.  Each leaf predicate is
    individually gated on (parent present AND trigger member present).
    """
    from ..keys import flat_col

    gate = flat_col(cc.column) if json_mode else F.col(cc.column)
    member = flat_col(cc.gate_member) if json_mode else F.col(cc.gate_member)
    leaves: List[Tuple[str, str, Column, Column]] = []
    for chk in cc.branches[0]:
        if isinstance(chk, CombinatorCheck):
            leaves.append(compile_combinator(chk, json_mode=json_mode,
                                             formats=formats))
        else:
            leaves.extend(compile_check(chk, json_mode=json_mode,
                                        formats=formats))
    own_reason = cc.reason or "dependencies"
    out: List[Tuple[str, str, Column, Column]] = []
    for cid, reason, pred, obs in leaves:
        gated = F.coalesce(
            F.when(gate.isNull() | member.isNull(), F.lit(True)).otherwise(pred),
            F.lit(False),
        )
        # the `false`-branch sentinel compiles as sql_predicate —
        # surface it under the dependency's own reason, not 'sql'
        out.append((cid, own_reason if reason == "sql" else reason, gated, obs))
    return out


def compile_if_then_else(
    cc: CombinatorCheck, json_mode: bool = False, formats=None
) -> List[Tuple[str, str, Column, Column]]:
    """if/then/else at battery level: jsonschema evaluates `if` as a
    pure condition and DESCENDS into whichever of then/else applies,
    so failures carry the LEAF validator name — verified differential.
    Each then-leaf is gated on if_ok, each else-leaf on NOT if_ok,
    and the whole construct is vacuous when the instance is absent."""
    from ..keys import flat_col

    gate = flat_col(cc.column) if json_mode else F.col(cc.column)
    if_ok = _branch_ok(cc.branches[0], json_mode, formats)
    out: List[Tuple[str, str, Column, Column]] = []
    for branch, guard, lbl in (
        (cc.branches[1], if_ok, "then"),
        (cc.branches[2], ~if_ok, "else"),
    ):
        leaves: List[Tuple[str, str, Column, Column]] = []
        for chk in branch:
            if isinstance(chk, CombinatorCheck):
                leaves.append(compile_combinator(chk, json_mode=json_mode,
                                                 formats=formats))
            else:
                leaves.extend(compile_check(chk, json_mode=json_mode,
                                            formats=formats))
        for cid, reason, pred, obs in leaves:
            gated = F.coalesce(
                F.when(gate.isNull(), F.lit(True)).otherwise(
                    F.when(guard, pred).otherwise(F.lit(True))
                ),
                F.lit(False),
            )
            # `false`-branch sentinel ("sql") surfaces as then/else
            out.append((cid, lbl if reason == "sql" else reason, gated, obs))
    return out


# compiled-battery memo (r08): compiling a battery is a PURE function
# of the check specs — but it costs ~13k py4j round trips (~1.3 s of
# driver wall for the combinator flagship, measured) because every
# Column op is a JVM call.  A long-running validator compiles each
# schema once and validates many batches; this memo gives the engine
# that steady-state shape.  Nothing data-dependent is cached — the
# values are unresolved Column EXPRESSION handles (F.col by name),
# reusable against any DataFrame.  Keyed on the active SparkContext's
# identity too: a restarted JVM must not serve stale Column handles.
# Skipped when a custom-format overlay is present (formats may hold
# arbitrary callables whose identity is not content-keyable).
_BATTERY_MEMO: dict = {}


def compile_battery(
    checks: List[ColumnCheck], json_mode: bool = False, formats=None
) -> List[Tuple[str, str, Column, Column]]:
    """``formats``: per-compilation custom-format overlay (shadowing
    the global FORMATS registry) — pass ``TableSpec.custom_formats``
    so one suite's customFormats never leak into another run, matching
    the reference's per-instance scoping (extensible_validator.py
    :77-84,117-138)."""
    memo_key = None
    if not formats:
        from pyspark import SparkContext

        sc = SparkContext._active_spark_context
        if sc is not None:
            checks_repr = repr(list(checks))
            # address-based reprs (embedded callables/objects) are not
            # content keys — a recycled address must never alias two
            # different specs, so such batteries are never memoized
            if " at 0x" not in checks_repr:
                memo_key = (id(sc), checks_repr, json_mode)
                hit = _BATTERY_MEMO.get(memo_key)
                if hit is not None:
                    return list(hit)
    out: List[Tuple[str, str, Column, Column]] = []
    for ch in checks:
        if isinstance(ch, CombinatorCheck):
            if ch.kind == "dependentSchema":
                out.extend(compile_dependent_schema(ch, json_mode=json_mode,
                                                    formats=formats))
            elif ch.kind == "ifThenElse":
                out.extend(compile_if_then_else(ch, json_mode=json_mode,
                                                formats=formats))
            else:
                out.append(compile_combinator(ch, json_mode=json_mode,
                                              formats=formats))
        else:
            out.extend(compile_check(ch, json_mode=json_mode,
                                     formats=formats))
    if memo_key is not None:
        if len(_BATTERY_MEMO) > 64:  # bound driver memory
            _BATTERY_MEMO.clear()
        _BATTERY_MEMO[memo_key] = list(out)
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
