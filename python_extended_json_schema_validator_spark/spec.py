"""Constraint spec model — the relational form of the reference's
trigger-attribute grammar (SURVEY.md §2.6).

The reference declares constraints inside JSON Schemas::

    "unique": true | ["a","b"] | {"members": [...], "name": ..., "limit_scope": ...}
    "foreign_keys": [{"schema_id": ..., "members": [...], "refers_to": ...}]

(grammar at reference index_check.py:91-131, pk_check.py:96-132,
fk_check.py:104-137). Here a *table* plays the role of a schema and
*columns* (dotted paths into structs allowed) play the role of
JSONPaths; the grammar is otherwise identical, including named keys,
``limit_scope`` and ``refers_to``.

Spec-level validation mirrors the reference's meta-schema fragment
rejection (abstract_check.py:218-227 — malformed declarations fail
schema load, verified exit 1) and the ``fk_no_schema`` bootstrap error
(fk_check.py:157-207): a malformed spec raises ``SpecError`` at
compile time, before any Spark job runs.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Mapping, Optional, Sequence


class SpecError(ValueError):
    """Malformed constraint spec — the analogue of the reference's
    meta-schema rejection (exit code 1) and fk_no_schema errors."""


@dataclass(frozen=True)
class KeySpec:
    """A ``unique`` / ``primary_key`` / ``index`` declaration.

    members: column names (dotted struct paths allowed).
    name: optional key name, targetable by FK ``refers_to``
          (reference index_check.py:153-187 IndexWorldByName).
    limit_scope: scope uniqueness to the table's ``scope_col``
          (reference index_check.py:346-349 prefixes the file name).
    """

    members: tuple
    name: Optional[str] = None
    limit_scope: bool = False

    def __post_init__(self):
        if not self.members:
            raise SpecError("key spec needs at least one member")
        object.__setattr__(self, "members", tuple(self.members))

    @property
    def label(self) -> str:
        return self.name or ",".join(self.members)


@dataclass(frozen=True)
class ForeignKeySpec:
    """A ``foreign_keys`` / ``join_keys`` array entry.

    ref_table: the referenced table (``schema_id`` analogue).
    refers_to: optional name of a specific PK/index on the target;
        unnamed FKs match ANY recorded key world of the target
        (reference fk_check.py:399,429-434).
    """

    members: tuple
    ref_table: str
    refers_to: Optional[str] = None

    def __post_init__(self):
        if not self.members:
            raise SpecError("foreign key spec needs at least one member")
        if not self.ref_table:
            raise SpecError("foreign key spec needs ref_table (schema_id)")
        object.__setattr__(self, "members", tuple(self.members))

    @property
    def label(self) -> str:
        tgt = self.ref_table + (f".{self.refers_to}" if self.refers_to else "")
        return f"{','.join(self.members)}->{tgt}"


@dataclass(frozen=True)
class ColumnCheck:
    """Row-level structural checks for one column — the relational
    compilation of JSON Schema keywords (reference delegates these to
    jsonschema, extensible_validator.py:1163-1194; here each keyword
    becomes one Catalyst predicate, SURVEY.md §2.2 P4)."""

    column: str
    required: bool = False  # ⇔ "required" (NULL disallowed)
    dtype: Optional[str] = None  # ⇔ "type": castable to this Spark type
    enum: Optional[tuple] = None  # ⇔ "enum"
    const: Optional[Any] = None  # ⇔ "const"
    pattern: Optional[str] = None  # ⇔ "pattern" (Java regex, rlike)
    minimum: Optional[float] = None  # ⇔ "minimum" (inclusive)
    maximum: Optional[float] = None  # ⇔ "maximum" (inclusive)
    exclusive_minimum: Optional[float] = None
    exclusive_maximum: Optional[float] = None
    min_length: Optional[int] = None  # ⇔ "minLength"
    max_length: Optional[int] = None  # ⇔ "maxLength"
    min_items: Optional[int] = None  # ⇔ "minItems" (array size)
    max_items: Optional[int] = None  # ⇔ "maxItems"
    format: Optional[str] = None  # ⇔ "format" (P5; see row_checks.FORMATS)
    sql_predicate: Optional[str] = None  # escape hatch: custom SQL bool expr
    # nested "required": vacuous when the PARENT object is absent
    # (jsonschema semantics — required inside a sub-schema only fires
    # when the instance reaches that sub-schema).  Holds the parent
    # path column; NULL parent → check passes.
    required_scope: Optional[str] = None
    # "additionalProperties": false — the column holds the object's
    # actual property-name array (shredded `<path>#keys`); every name
    # must be in this allowed set...
    allowed_keys: Optional[tuple] = None
    # ...or match one of these regexes (the patternProperties carve-out
    # of additionalProperties: names matching any patternProperty regex
    # are allowed even when not declared).
    allowed_key_patterns: Optional[tuple] = None
    # `const: null` — a None `const` value means ABSENT (dataclass
    # default), so the null-const case rides its own flag: present
    # instances must be the JSON literal `null`.
    const_null: bool = False
    # drafts 03/04: boolean exclusiveMinimum/Maximum tighten the paired
    # bound, and jsonschema reports the violation under `minimum`/
    # `maximum` (the legacy validators own the modifier) — this flag
    # switches the emitted reason for parity.
    legacy_exclusive_bounds: bool = False
    # "multipleOf": value/multiple_of has zero remainder (jsonschema
    # computes `instance % multipleOf == 0` — we match that float
    # semantics exactly, including its 0.3 % 0.1 ≠ 0 quirk).
    # `multiple_of_reason` carries the draft-03 alias `divisibleBy`.
    multiple_of: Optional[float] = None
    multiple_of_reason: str = "multipleOf"
    # "uniqueItems": true — column holds the element-literal array
    # (`<path>[]`); numbers are compared numerically (1 == 1.0, but
    # true != 1) like jsonschema.
    unique_items: bool = False
    # "minProperties"/"maxProperties" — column holds `<path>#keys`.
    min_properties: Optional[int] = None
    max_properties: Optional[int] = None
    # "propertyNames": subschema applied to every property NAME (plain
    # string instances) — tuple of (keyword, value) pairs from the
    # scalar-expressible subset (pattern/enum/const/min/maxLength/format).
    # Column holds `<path>#keys`.
    property_names: Optional[tuple] = None
    # "patternProperties": ((regex, ((keyword, value), ...)), ...) —
    # every property whose NAME matches regex must have a VALUE (as a
    # canonical JSON literal) satisfying the keyword set.  Column holds
    # the `<path>#entries` map<string,string> (name → literal).
    pattern_properties: Optional[tuple] = None
    # "dependencies"/"dependentRequired" (property form): this column
    # must be present whenever the `dependent_on` column is present.
    # `dependent_reason` carries the draft-appropriate validator name.
    dependent_on: Optional[str] = None
    dependent_reason: str = "dependencies"
    # per-element `items` keywords (scalar subset): ((keyword, value),
    # ...) applied to EVERY element literal of the array column via
    # forall — leaf reasons, matching jsonschema's descend into items.
    element_checks: Optional[tuple] = None
    # tuple-form `items` / 2020-12 `prefixItems` (scalar subset):
    # ((index, ((keyword, value), ...)), ...) applied to the i-th
    # element literal; absent elements pass vacuously (jsonschema
    # ignores missing positions).
    index_checks: Optional[tuple] = None
    # "contains" (scalar subset, () = any element counts): reason
    # `contains` fires iff ZERO elements match; `minContains` blames
    # partial matches below the bound (2019-09+; minContains 0 lets
    # even zero matches pass); `maxContains` bounds the match count.
    contains_checks: Optional[tuple] = None
    min_contains: Optional[int] = None
    max_contains: Optional[int] = None
    # schema-form "additionalProperties": every property whose name is
    # neither declared in `properties` nor matched by a
    # patternProperties regex must carry a VALUE (canonical JSON
    # literal) satisfying this scalar keyword set — LEAF reasons, like
    # jsonschema's descent into the subschema.  Column holds
    # `<path>#entries`.  (allowed_names, name_patterns, kw_pairs).
    additional_entries: Optional[tuple] = None
    # value-dependent unevaluatedProperties guard over the
    # `<path>#entries` map: (allowed_names, name_patterns,
    # ap_kws | None, up_kws | None).  An entry VIOLATES iff its name
    # is neither declared nor pattern-matched, its value fails the
    # ap_kws evaluator (2020-12 walk: AP-valid values count as
    # evaluated; None = no value evaluator), and fails up_kws (the
    # schema-form unevaluatedProperties subschema; None = UP false —
    # nothing passes).  Reason is always "unevaluatedProperties"
    # (jsonschema's UP descent collapses to that name, probed 4.26).
    unevaluated_entries: Optional[tuple] = None
    # schema-form "unevaluatedItems": elements past the evaluated
    # prefix must satisfy the subschema — (prefix_len, kw_pairs) over
    # the element-literal array; single reason "unevaluatedItems".
    unevaluated_item_checks: Optional[tuple] = None
    # PER-ELEMENT interpretation switch for the object-keyword
    # machinery (allowed_keys / min-maxProperties / property_names /
    # dependent_on): the column holds one entry PER ARRAY ELEMENT
    # (array<array<string>> keys arrays, or aligned member arrays for
    # dependencies) and the predicate foralls over elements with
    # NULL-entry vacuity (non-object elements) — `items: {
    # additionalProperties: false, minProperties: …, propertyNames: …,
    # dependencies: {p: [q]} }` shapes.
    per_element: bool = False
    # scalar keywords at a property path INSIDE array elements
    # (``loc[].rel``): ((keyword, value), ...) applied per element over
    # the ALIGNED sub-instance literal array (entry i = the literal of
    # element i's ``rel`` instance, SQL NULL when that element lacks it
    # — NULL entries pass vacuously, jsonschema only validates
    # instances the subschema reaches).  Leaf reasons.
    element_sub_checks: Optional[tuple] = None
    # ``required`` INSIDE an element subschema: this column is the
    # aligned ``loc[].member`` array, the scope is the parent's aligned
    # literal array (``loc[]`` or ``loc[].sub``) — per index, an OBJECT
    # parent entry requires a present member entry (reason `required`,
    # vacuous for non-object/absent parents like jsonschema).
    element_required_scope: Optional[str] = None
    # 2020-12 `items` AFTER `prefixItems`: (prefix_len, kw_pairs) —
    # the scalar subset applied to every element PAST the prefix
    # positions (F.slice tail), LEAF reasons like jsonschema's items
    # descent.  The prefix positions themselves are covered by
    # index_checks.
    tail_item_checks: Optional[tuple] = None
    # combinators INSIDE an `items` subschema, applied per element of
    # the element-literal array: ((kind, branches), ...) with kind in
    # anyOf|oneOf|not|ifThenElse and each branch a scalar-subset
    # keyword tuple ((keyword, value), ...).  anyOf/oneOf/not report
    # the combinator name (jsonschema's items descent surfaces the
    # combinator validator itself, [verified] probe); ifThenElse
    # branches carry exactly (if, then, else) and report LEAF names.
    element_combinators: Optional[tuple] = None
    # reason override for the allowed-keys machinery: the STATIC
    # subset of 2019-09+ "unevaluatedProperties": false (no in-place
    # applicators at the node) compiles to the identical predicate as
    # "additionalProperties": false but reports its own validator name.
    keys_reason: str = "additionalProperties"
    # "unevaluatedItems": false where only prefixItems/tuple-items
    # evaluate → the array may not extend past the prefix.  Column
    # holds the element-literal array (`<path>[]`).  The reason field
    # also serves `additionalItems: false` (drafts 03–2019-09), which
    # compiles to the identical length cap under its own name.
    max_unevaluated_items: Optional[int] = None
    max_unevaluated_items_reason: str = "unevaluatedItems"

    def __post_init__(self):
        if self.enum is not None:
            object.__setattr__(self, "enum", tuple(self.enum))
        if isinstance(self.dtype, (list, tuple)):
            object.__setattr__(self, "dtype", tuple(self.dtype))


@dataclass(frozen=True)
class CombinatorCheck:
    """A disjunctive JSON-Schema combinator (``anyOf`` / ``oneOf`` /
    ``not``) or a schema-form ``dependencies`` entry, compiled to ONE
    boolean Column over the conjunction of each branch's compiled
    checks.

    The reference inherits full combinator semantics from the
    jsonschema library (extend_validator_helpers.py:50-64, invocation
    extensible_validator.py:1163-1194): a document failing every
    ``anyOf`` branch fails validation with reason ``anyOf`` etc.  Here
    each branch compiles to a conjunctive Column battery (the same
    per-keyword predicates as ColumnCheck, so vacuity semantics match),
    then:

    - ``anyOf``  → OR of branch conjunctions;
    - ``oneOf``  → exactly ONE branch conjunction true;
    - ``not``    → negation of the single branch;
    - ``dependentSchema`` → branch must hold whenever the
      ``gate_member`` property is present (draft-07 ``dependencies``
      schema form / 2019-09 ``dependentSchemas``).

    The whole combinator passes vacuously when the instance at
    ``column`` is absent (jsonschema never evaluates a subschema at a
    location the instance does not reach).

    branches: tuple of branch tuples; each branch is a tuple of
    ColumnCheck / nested CombinatorCheck items (empty tuple = the
    always-true schema ``{}`` / ``true``).
    """

    column: str
    kind: str  # anyOf | oneOf | not | dependentSchema
    branches: tuple = ()
    gate_member: Optional[str] = None  # dependentSchema trigger column
    reason: Optional[str] = None  # override the emitted reason

    def __post_init__(self):
        if self.kind not in (
            "anyOf", "oneOf", "not", "dependentSchema", "ifThenElse"
        ):
            raise SpecError(f"unknown combinator kind {self.kind!r}")
        if self.kind in ("not", "dependentSchema") and len(self.branches) != 1:
            raise SpecError(f"{self.kind} takes exactly one branch")
        if self.kind in ("anyOf", "oneOf") and not self.branches:
            # the JSON Schema meta-schema requires ≥1 branch; an empty
            # disjunction would compile to branch_oks[0] → IndexError
            raise SpecError(f"{self.kind} needs at least one branch")
        if self.kind == "ifThenElse" and len(self.branches) != 3:
            # (if, then, else) — an absent then/else is the empty
            # (always-true) branch
            raise SpecError("ifThenElse takes exactly (if, then, else)")
        if self.kind == "dependentSchema" and not self.gate_member:
            raise SpecError("dependentSchema needs gate_member")
        object.__setattr__(
            self, "branches", tuple(tuple(b) for b in self.branches)
        )


@dataclass
class TableSpec:
    """All constraints attached to one table (⇔ one reference schema).

    row_id: column uniquely identifying a row for blame/reporting
        (⇔ the reference's source *file* name).
    scope_col: the column ``limit_scope`` keys are prefixed with
        (⇔ the reference's file name / partition id).
    """

    name: str
    row_id: str
    checks: list = field(default_factory=list)
    unique: list = field(default_factory=list)
    primary_keys: list = field(default_factory=list)
    indexes: list = field(default_factory=list)
    foreign_keys: list = field(default_factory=list)
    join_keys: list = field(default_factory=list)
    scope_col: Optional[str] = None
    # True for SHREDDED document tables (schemas.py / docshred.py):
    # columns hold canonical JSON literals (or arrays of them), so key
    # canonicalization is the identity and row checks compile in
    # json-literal mode (type tags preserved: int 2 is `2`, str "2" is
    # `"2"`, null is `null`, absent is SQL NULL).
    canonical_json: bool = False
    # per-compilation custom-format overlay {name: regex | Column
    # callable} shadowing the global FORMATS registry — scoped like the
    # reference's per-ExtensibleValidator customFormats
    # (extensible_validator.py:77-84,117-138), so one suite's formats
    # never bleed into another run in the same process.  Populated by
    # schemas.load_schemas(custom_formats=...); consumed by
    # row_checks.compile_battery(formats=...).
    custom_formats: Optional[Mapping] = None

    def __post_init__(self):
        if not self.name:
            raise SpecError("table spec needs a name")
        if not self.row_id:
            raise SpecError("table spec needs a row_id column")
        seen: dict = {}
        for ks in [*self.unique, *self.primary_keys, *self.indexes]:
            if ks.limit_scope and not self.scope_col:
                raise SpecError(
                    f"{self.name}: limit_scope requires scope_col on the table"
                )
            if ks.name is not None:
                # duplicate names warn in the reference
                # (index_check.py:168-176); we reject outright.
                if ks.name in seen:
                    raise SpecError(f"{self.name}: duplicate key name {ks.name!r}")
                seen[ks.name] = ks


# ---------------------------------------------------------------------------
# Dict-grammar parser: accepts the reference's trigger-attribute forms
# (true is not meaningful column-wise, so `true` is rejected; the list
# and object forms map 1:1).
# ---------------------------------------------------------------------------


def _parse_key_decl(decl: Any, what: str) -> KeySpec:
    """``["a","b"]`` or ``{"members": [...], "name":..., "limit_scope":...}``
    — reference grammar at index_check.py:91-131."""
    if isinstance(decl, str):
        return KeySpec(members=(decl,))
    if isinstance(decl, (list, tuple)):
        if not all(isinstance(m, str) for m in decl):
            raise SpecError(f"{what}: members must be strings, got {decl!r}")
        return KeySpec(members=tuple(decl))
    if isinstance(decl, Mapping):
        members = decl.get("members")
        if isinstance(members, str):
            members = [members]
        if not members or not all(isinstance(m, str) for m in members):
            raise SpecError(f"{what}: object form needs 'members' list, got {decl!r}")
        return KeySpec(
            members=tuple(members),
            name=decl.get("name"),
            limit_scope=bool(decl.get("limit_scope", False)),
        )
    # the reference rejects e.g. `unique: 18` at schema-validation time
    # (verified: unique_schema_wrong.json → exit 1)
    raise SpecError(f"{what}: malformed declaration {decl!r}")


def _parse_fk_decl(decl: Any, what: str) -> ForeignKeySpec:
    """``{"schema_id": t, "members": [...], "refers_to": n}`` —
    reference grammar at fk_check.py:104-137.  ``on_delete_hint`` is
    accepted and ignored (declared but never read in the reference)."""
    if not isinstance(decl, Mapping):
        raise SpecError(f"{what}: malformed declaration {decl!r}")
    members = decl.get("members")
    if isinstance(members, str):
        members = [members]
    if not members:
        raise SpecError(f"{what}: needs 'members'")
    ref = decl.get("schema_id") or decl.get("ref_table")
    if not ref:
        raise SpecError(f"{what}: needs 'schema_id' (ref table)")
    return ForeignKeySpec(
        members=tuple(members), ref_table=ref, refers_to=decl.get("refers_to")
    )


def parse_table_spec(name: str, d: Mapping) -> TableSpec:
    """Parse a dict spec (the reference grammar, column-flavored)::

        {"row_id": "id", "scope_col": "part",
         "checks": [{"column": "w", "required": true, "minimum": 1}],
         "unique": [["a","b"], {"members": ["c"], "name": "ck"}],
         "primary_key": ["id"],
         "index": [{"members": ["code"], "name": "codes"}],
         "foreign_keys": [{"schema_id": "dim", "members": ["ref"]}],
         "join_keys": [{"schema_id": "dim", "members": ["ref"],
                        "refers_to": "codes"}]}
    """
    def _key_list(v, what):
        if v is None:
            return []
        # `primary_key: ["a","b"]` is ONE compound key in the reference
        # grammar; a list of lists/objects is a list of keys.
        if isinstance(v, (list, tuple)) and v and all(isinstance(m, str) for m in v):
            return [_parse_key_decl(list(v), what)]
        if isinstance(v, (list, tuple)):
            return [_parse_key_decl(x, what) for x in v]
        return [_parse_key_decl(v, what)]

    checks = []
    for c in d.get("checks", []):
        if not isinstance(c, Mapping) or "column" not in c:
            raise SpecError(f"{name}: malformed check {c!r}")
        checks.append(ColumnCheck(**c))

    return TableSpec(
        name=name,
        row_id=d.get("row_id", "row_id"),
        scope_col=d.get("scope_col"),
        checks=checks,
        unique=_key_list(d.get("unique"), f"{name}.unique"),
        primary_keys=_key_list(d.get("primary_key"), f"{name}.primary_key"),
        indexes=_key_list(d.get("index"), f"{name}.index"),
        foreign_keys=[
            _parse_fk_decl(x, f"{name}.foreign_keys") for x in d.get("foreign_keys", [])
        ],
        join_keys=[
            _parse_fk_decl(x, f"{name}.join_keys") for x in d.get("join_keys", [])
        ],
    )


def validate_spec_set(specs: Sequence[TableSpec]) -> None:
    """Cross-spec consistency — the analogue of FK bootstrap
    (reference fk_check.py:157-207, error ``fk_no_schema``): every
    FK/JK must target a declared table; ``refers_to`` must name an
    existing PK (for FK) or any key (for JK) on the target."""
    by_name = {s.name: s for s in specs}
    for s in specs:
        for kind, fks in (("foreign_keys", s.foreign_keys), ("join_keys", s.join_keys)):
            for fk in fks:
                tgt = by_name.get(fk.ref_table)
                if tgt is None:
                    raise SpecError(
                        f"fk_no_schema: {s.name}.{kind} targets unknown table "
                        f"{fk.ref_table!r}"
                    )
                if fk.refers_to is not None:
                    pool = (
                        tgt.primary_keys
                        if kind == "foreign_keys"
                        else [*tgt.indexes, *tgt.primary_keys, *tgt.unique]
                    )
                    if not any(k.name == fk.refers_to for k in pool):
                        # The reference defers this to pass 2 and emits
                        # per-row stale_fk "key not found" (fk_check.py:349-389).
                        # We keep that behavior (engine emits blanket
                        # violations), so this is NOT a SpecError.
                        pass
