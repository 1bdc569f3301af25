"""Real JSON Schema document ingestion → TableSpec compiler.

The reference's primary input is a directory of JSON Schema files
carrying the extension trigger attributes (``unique`` /
``primary_key`` / ``index`` / ``foreign_keys`` / ``join_keys``) at
arbitrary nesting.  This module gives the Spark engine the same entry
point:

- file loading with JSON → YAML parse fallback
  (⇔ extensible_validator.py:233-268);
- draft detection against the acknowledged ``$schema`` set
  (⇔ PLAIN_VALIDATOR_MAPPER, extend_validator_helpers.py:50-64);
- ``$id`` extraction, duplicate-id rejection
  (⇔ extensible_validator.py:306-365);
- meta-schema-fragment validation of every trigger declaration
  (⇔ the extended META_SCHEMA check, extensible_validator.py:424-478 —
  ``unique: 18`` is a schema error, [verified] exit 1);
- ``$ref`` resolution with transitive closure and cycle guard during
  traversal (⇔ extensible_validator.py:599-723);
- schema traversal recording trigger attributes at nested locations
  with absolute dotted/array paths (⇔ traverseJSONSchema,
  extend_validator_helpers.py:142-294);
- the draft keyword set compiled to ColumnChecks/CombinatorChecks in
  json-literal mode: type/enum/const/pattern/bounds/lengths/format/
  multipleOf/uniqueItems/min-maxProperties + object-scoped required,
  per-element and per-index items (tuple form / 2020-12 prefixItems,
  draft-gated), contains with 2019-09 min/maxContains,
  patternProperties / propertyNames (scalar subsets, leaf reasons),
  dependencies / dependentRequired / dependentSchemas, and the
  disjunctive combinators anyOf / oneOf / not / if-then-else;
  anything uncompiled records a severity="warning" SchemaIssue —
  never a silent drop;
- ``GetNormalizedJSONHash`` parity for report entries
  (extensible_validator.py:832-839).

The output per schema is a CompiledSchema: a TableSpec (with
``canonical_json=True``) over the SHREDDED document table produced by
``docshred.shred`` — one string column of canonical JSON literals per
referenced path, arrays of literals for paths with ``[]`` steps.
"""

from __future__ import annotations

import hashlib
import json
import os
from dataclasses import dataclass
from typing import Any, Dict, List, Mapping, Optional, Tuple
from urllib.parse import urldefrag, urljoin, urlsplit

from .spec import ColumnCheck, CombinatorCheck, ForeignKeySpec, KeySpec, TableSpec

# Acknowledged drafts (⇔ PLAIN_VALIDATOR_MAPPER keys,
# extend_validator_helpers.py:50-64: every validator jsonschema ships
# plus the hyper-schema aliases).
KNOWN_DRAFTS = frozenset(
    {
        "http://json-schema.org/draft-03/schema#",
        "http://json-schema.org/draft-04/schema#",
        "http://json-schema.org/draft-04/hyper-schema#",
        "http://json-schema.org/draft-06/schema#",
        "http://json-schema.org/draft-06/hyper-schema#",
        "http://json-schema.org/draft-07/schema#",
        "http://json-schema.org/draft-07/hyper-schema#",
        "https://json-schema.org/draft/2019-09/schema",
        "https://json-schema.org/draft/2020-12/schema",
    }
)

SCHEMA_KEY_PROBES = ("@schema", "_schema", "$schema")  # extensible_validator.py:113-115

KEY_TRIGGERS = ("unique", "primary_key", "index")
REF_TRIGGERS = ("foreign_keys", "join_keys")

_CHECK_KEYWORDS = (
    "type",
    "enum",
    "const",
    "pattern",
    "minimum",
    "maximum",
    "exclusiveMinimum",
    "exclusiveMaximum",
    "minLength",
    "maxLength",
    "minItems",
    "maxItems",
    "uniqueItems",
    "multipleOf",
    "format",
)

# first draft LEVEL whose jsonschema validator enforces each keyword
# ([verified] probes: Draft3/4 ignore const; Draft3/4 treat
# exclusiveMinimum as the boolean minimum-modifier, never standalone;
# Draft3 has divisibleBy, not multipleOf, and no min/maxProperties).
# Compiling a keyword below its level would over-validate vs the
# validator the reference's PLAIN_VALIDATOR_MAPPER picks.
_KW_MIN_LEVEL = {
    "const": 6,
    "contains": 6,
    "propertyNames": 6,
    "multipleOf": 4,
    "minProperties": 4,
    "maxProperties": 4,
}
# (exclusiveMinimum/Maximum are draft-split by VALUE ROLE instead —
# see the bounds-compilation block)

# keywords expressible as a predicate over ONE scalar value — the
# subset compiled inside propertyNames / patternProperties subschemas
_SCALAR_KWS = (
    "type",
    "enum",
    "const",
    "pattern",
    "minLength",
    "maxLength",
    "format",
    "minimum",
    "maximum",
    "exclusiveMinimum",
    "exclusiveMaximum",
    "multipleOf",
)

# annotation-only keywords silently ignorable inside scalar subschemas
_ANNOTATION_KWS = frozenset(
    {"$comment", "title", "description", "examples", "default", "$schema", "$id"}
)

_JSON_TYPES = {"string", "integer", "number", "boolean", "object", "array", "null"}


def normalized_json_hash(obj: Any) -> str:
    """SHA1 of the canonical serialization — exact GetNormalizedJSONHash
    parity (extensible_validator.py:832-839)."""
    canon = json.dumps(obj, sort_keys=True, indent=None, separators=(",", ":"))
    return hashlib.sha1(canon.encode("utf-8")).hexdigest()


@dataclass
class SchemaIssue:
    file: str
    # no_schema | schema_unknown | no_id | dup_id | schema_error |
    # fatal | schema_warning
    reason: str
    description: str
    # "error" issues reject the schema (⇔ reference exit 1);
    # "warning" issues record partial enforcement (e.g. a combinator
    # branch keyword the engine cannot compile) without rejecting —
    # silent under-validation is the one failure mode a validator must
    # not have, so every dropped check leaves a trace here.
    severity: str = "error"


@dataclass
class CompiledSchema:
    uri: str
    file: str
    schema: Mapping
    schema_hash: str
    table_spec: TableSpec
    # paths needing INSTANCE literal columns (checks; a path ending in
    # [] is the element-literal array) and paths needing VALUE-LIST
    # columns (key/FK members, MaterializeJPath semantics, stored as
    # `<path>#v` array<string> columns by docshred.shred)
    instance_paths: tuple = ()
    value_paths: tuple = ()
    # object paths (possibly "" = root) whose property-name arrays the
    # shredder must emit as `<path>#keys` (additionalProperties checks)
    props_paths: tuple = ()
    # object paths whose (name → canonical value literal) maps the
    # shredder must emit as `<path>#entries` (patternProperties checks)
    entries_paths: tuple = ()
    # array-ELEMENT locations (e.g. "a[]") whose per-element
    # property-name arrays the shredder must emit as `<loc>#keys`
    # (array<array<string>>, inner NULL for non-object elements) —
    # items-level additionalProperties/min-maxProperties/propertyNames
    elem_props_paths: tuple = ()
    # array-ELEMENT locations whose per-element (name → literal) maps
    # the shredder must emit as `<loc>#entries`
    # (array<map<string,string>>) — items-level patternProperties and
    # schema-form additionalProperties values
    elem_entries_paths: tuple = ()
    # compile-time warning strings (partial-enforcement traces) — the
    # library-fallback escape hatch activates per schema on these
    warnings: tuple = ()
    # {uri: raw schema dict} of the load this schema came from — the
    # RefResolver store for the library fallback (⇔ the reference's
    # refSchemaCache, extensible_validator.py:1155-1159)
    ref_cache: Optional[Mapping] = None


# ---------------------------------------------------------------------------
# file loading
# ---------------------------------------------------------------------------


def parse_json_or_yaml(path: str) -> Any:
    """JSON parse with YAML fallback (extensible_validator.py:233-268
    for schemas, :1014-1053 for documents).  Raises ValueError when
    neither parses."""
    with open(path, "r", encoding="utf-8") as fh:
        text = fh.read()
    try:
        return json.loads(text)
    except json.JSONDecodeError as jde:
        try:
            import yaml  # the reference hard-requires PyYAML; we gate it

            return yaml.safe_load(text)
        except ImportError:
            raise ValueError(f"{path}: invalid JSON and PyYAML unavailable: {jde}")
        except Exception as mye:
            raise ValueError(f"{path}: neither JSON nor YAML: {jde} / {mye}")


def scan_files(root: str, suffixes: Tuple[str, ...] = (".json", ".yaml", ".yml")) -> List[str]:
    """Recursive scan, dotfiles skipped, sorted for determinism
    (⇔ the dir walk at extensible_validator.py:203-229 — the reference
    takes os.listdir order; we sort so survivors are stable)."""
    if os.path.isfile(root):
        return [root]
    out: List[str] = []
    for dirpath, dirnames, filenames in os.walk(root):
        dirnames[:] = sorted(d for d in dirnames if not d.startswith("."))
        for f in sorted(filenames):
            if f.startswith("."):
                continue
            if any(f.endswith(s) or s[1:] + "." in f for s in suffixes):
                out.append(os.path.join(dirpath, f))
    return out


# ---------------------------------------------------------------------------
# trigger grammar validation (meta-schema fragments,
# index_check.py:91-131 / fk_check.py:104-137)
# ---------------------------------------------------------------------------


def _bad(msg: str) -> str:
    return msg


def _validate_key_decl(decl: Any) -> Optional[str]:
    if isinstance(decl, bool):
        return None
    if isinstance(decl, list):
        if not decl or not all(isinstance(m, str) and m for m in decl):
            return _bad("members array must be non-empty strings")
        if len(set(decl)) != len(decl):
            return _bad("members must be unique")
        return None
    if isinstance(decl, dict):
        if "members" not in decl:
            return _bad("object form requires 'members'")
        m = decl["members"]
        if not isinstance(m, bool):
            err = _validate_key_decl(m if isinstance(m, list) else None)
            if err:
                return err
        if "name" in decl and not (isinstance(decl["name"], str) and decl["name"]):
            return _bad("'name' must be a non-empty string")
        if "limit_scope" in decl and not isinstance(
            decl["limit_scope"], (bool, type(None))
        ):
            return _bad("'limit_scope' must be boolean")
        return None
    return _bad(f"malformed key declaration {decl!r}")


def _validate_fk_decl(decl: Any) -> Optional[str]:
    if not isinstance(decl, list):
        return _bad("foreign/join keys must be an array")
    for entry in decl:
        if not isinstance(entry, dict):
            return _bad(f"entry must be an object, got {entry!r}")
        if "members" not in entry:
            return _bad("entry requires 'members'")
        m = entry["members"]
        if (
            not isinstance(m, list)
            or not m
            or not all(isinstance(x, str) and x for x in m)
            or len(set(m)) != len(m)
        ):
            return _bad("members must be a unique non-empty string array")
        if "schema_id" in entry and not (
            isinstance(entry["schema_id"], str) and entry["schema_id"]
        ):
            return _bad("'schema_id' must be a non-empty string")
        if "refers_to" in entry and not (
            isinstance(entry["refers_to"], str) and entry["refers_to"]
        ):
            return _bad("'refers_to' must be a non-empty string")
    return None


# ---------------------------------------------------------------------------
# traversal → TableSpec
# ---------------------------------------------------------------------------


def _join_path(prefix: str, member: str) -> str:
    return f"{prefix}.{member}" if prefix else member


def _pointer_walk(schema: Any, fragment: str) -> Any:
    node = schema
    for part in fragment.lstrip("/").split("/"):
        if part == "":
            continue
        part = part.replace("~1", "/").replace("~0", "~")
        if isinstance(node, list):
            node = node[int(part)]
        else:
            node = node[part]
    return node


# keywords whose values are instance DATA, not schemas — anchor/
# override discovery must not descend into them: a {"$anchor": "a"}
# inside enum/const/default is data, and jsonschema's referencing
# registry would leave '#a' unresolved rather than target it
_DATA_KEYWORDS = frozenset(("enum", "const", "default", "examples"))


def _find_anchor(
    root: Any, name: str, dynamic_only: bool = False, _is_root: bool = True
) -> Optional[Mapping]:
    """The subschema of ``root``'s resource declaring ``$anchor: name``
    (or ``$dynamicAnchor: name``); ``dynamic_only`` restricts to
    dynamic anchors.  Embedded resources (non-root nodes carrying
    their own ``$id``) are anchor-scope boundaries and are skipped,
    per the 2019-09/2020-12 resource model.  Data-position subtrees
    (enum/const/default/examples) are skipped — jsonschema discovers
    anchors only at schema locations."""
    if isinstance(root, dict):
        if not _is_root and "$id" in root:
            return None
        if root.get("$dynamicAnchor") == name or (
            not dynamic_only and root.get("$anchor") == name
        ):
            return root
        for k, v in root.items():
            if k in _DATA_KEYWORDS:
                continue
            found = _find_anchor(v, name, dynamic_only, _is_root=False)
            if found is not None:
                return found
    elif isinstance(root, list):
        for v in root:
            found = _find_anchor(v, name, dynamic_only, _is_root=False)
            if found is not None:
                return found
    return None


def _contains_kv(obj: Any, key: str, value: Any) -> bool:
    """True when ``key: value`` appears anywhere in ``obj`` at a
    possible SCHEMA position (data-position subtrees skipped, matching
    _find_anchor) — used to decide whether a dynamic-scope override of
    a lexical $recursiveRef/$dynamicRef target is POSSIBLE."""
    if isinstance(obj, dict):
        if obj.get(key) == value:
            return True
        return any(
            _contains_kv(v, key, value)
            for k, v in obj.items()
            if k not in _DATA_KEYWORDS
        )
    if isinstance(obj, list):
        return any(_contains_kv(v, key, value) for v in obj)
    return False


class _Compiler:
    def __init__(
        self,
        uri: str,
        schema: Mapping,
        cache: Mapping[str, Mapping],
        formats: Optional[Mapping] = None,
    ):
        self.uri = uri
        self.schema = schema
        self.cache = cache  # uri → schema (the $ref closure universe)
        # per-compilation custom-format overlay (scoped customFormats)
        self.formats = formats or {}
        # prefixItems only exists from 2019-09 on; compiling it under
        # draft-07 would over-validate vs jsonschema (which ignores
        # unknown keywords)
        draft = str(schema.get("$schema", ""))
        # numeric draft level, matching the validator the reference's
        # PLAIN_VALIDATOR_MAPPER would pick (extend_validator_helpers
        # .py:50-64) — including its quirk of mapping the draft-06
        # HYPER schema to Draft4Validator
        if "2020-12" in draft:
            self.draft_level = 20
        elif "2019-09" in draft:
            self.draft_level = 19
        elif "draft-07" in draft:
            self.draft_level = 7
        elif "draft-06/hyper" in draft:
            self.draft_level = 4
        elif "draft-06" in draft:
            self.draft_level = 6
        elif "draft-04" in draft:
            self.draft_level = 4
        else:
            self.draft_level = 3
        self.draft_2019_plus = self.draft_level >= 19
        # 2020-12 swaps jsonschema's legacy unevaluated* annotation
        # walk for the is_valid-based one — the static subsets differ
        self.draft_2020 = self.draft_level >= 20
        # if/then/else exists from draft-07 on (older drafts ignore it)
        self.draft_07_plus = self.draft_level >= 7
        # contains/const exist from draft-06 on
        self.draft_06_plus = self.draft_level >= 6
        self.checks: List[ColumnCheck] = []
        self.unique: List[KeySpec] = []
        self.primary_keys: List[KeySpec] = []
        self.indexes: List[KeySpec] = []
        self.foreign_keys: List[ForeignKeySpec] = []
        self.join_keys: List[ForeignKeySpec] = []
        self.errors: List[str] = []
        self.warnings: List[str] = []
        self.instance_paths: set = set()
        self.value_paths: set = set()
        self.props_paths: set = set()
        self.entries_paths: set = set()
        self.elem_props_paths: set = set()
        self.elem_entries_paths: set = set()

    # -- helpers ------------------------------------------------------------

    def _touch(self, path: str, kind: str = "instance") -> None:
        if not path:
            return
        (self.instance_paths if kind == "instance" else self.value_paths).add(path)

    def _key_members(self, decl: Any, prefix: str) -> Optional[List[str]]:
        """Absolute member paths for a key declaration at ``prefix``.
        ``members: true`` (or a bare ``true``) keys the annotated node
        itself (bootstrap reads poss_members, index_check.py:160-168);
        a list holds node-relative JSONPaths.

        A trigger under an ARRAY location (prefix contains ``[]``)
        fires once PER ELEMENT in the reference (the jsonschema keyword
        callback runs on each element instance), so the atomic-vs-
        wrapped key decision is per element — such members compile to
        the element-grouped form ``<array loc>#e#<relative path>``
        which the shredder emits as array<array<string>> and
        keys.key_strings fans out per element."""
        members: Any = decl
        if isinstance(decl, dict):
            members = decl["members"]
        if isinstance(members, bool):
            if not members:
                return None
            if not prefix:
                self.errors.append("members:true at schema root is not keyable")
                return None
            if "[]" in prefix:
                loc = prefix[: prefix.rindex("[]") + 2]
                rel = prefix[len(loc):].lstrip(".")
                return [f"{loc}#e#{rel}"]
            return [prefix]
        if "[]" in prefix:
            return [f"{prefix}#e#{m}" for m in members]
        return [_join_path(prefix, m) for m in members]

    def _resolve_ref(self, ref: str, base_uri: str) -> Optional[Tuple[Any, str]]:
        """→ (target node, its base uri) or None when unresolvable.
        Fragments are JSON pointers (``#/a/b``) or plain anchor names
        (``#name`` ⇔ 2019-09+ ``$anchor``/``$dynamicAnchor``, which
        jsonschema resolves for plain ``$ref`` too — probed 4.26)."""
        target, fragment = urldefrag(urljoin(base_uri, ref))
        if target in ("", base_uri):
            root: Any = self.cache.get(base_uri, self.schema)
            new_base = base_uri
        else:
            root = self.cache.get(target)
            new_base = target
            if root is None:
                self.errors.append(f"unresolvable $ref {ref!r}")
                return None
        if fragment and not fragment.startswith("/"):
            node = _find_anchor(root, fragment)
            if node is None:
                self.errors.append(f"unresolvable $ref anchor {ref!r}")
                return None
            return node, new_base
        try:
            return _pointer_walk(root, fragment) if fragment else root, new_base
        except (KeyError, IndexError, ValueError, TypeError):
            self.errors.append(f"unresolvable $ref fragment {ref!r}")
            return None

    def _resolve_dynamic(
        self, kw: str, val: str, base_uri: str, prefix: str
    ) -> Optional[Tuple[Any, str]]:
        """Lexical-scope resolution of ``$dynamicRef`` (2020-12) /
        ``$recursiveRef`` (2019-09) — the jsonschema-delegation path the
        reference inherits (extend_validator_helpers.py:50-64, invoked
        extensible_validator.py:1163-1194).  With no same-named
        ``$dynamicAnchor`` (resp. no ``$recursiveAnchor: true``) in any
        OTHER loaded resource, the dynamic scope cannot override the
        lexical target, so the fallback is EXACT ([verified] probes:
        ``$recursiveRef: "#"`` ≡ ``$ref: "#"``, ``$dynamicRef: "#a"`` ≡
        ``$ref: "#a"`` in a single resource).  When an override is
        possible the lexical target still compiles but a schema_warning
        records the partial enforcement — never a silent drop."""
        if kw == "$recursiveRef":
            if val != "#":
                self.warnings.append(
                    f"/{prefix}: $recursiveRef {val!r} (not '#') is not "
                    f"compiled — only partially enforced"
                )
                return None
            root = self.cache.get(base_uri, self.schema)
            if any(
                _contains_kv(s, "$recursiveAnchor", True)
                for s in self.cache.values()
                if s is not root
            ):
                self.warnings.append(
                    f"/{prefix}: $recursiveRef '#' compiled as its lexical "
                    f"root; a $recursiveAnchor elsewhere in the dynamic "
                    f"scope could override it — only partially enforced"
                )
            return root, base_uri
        target, fragment = urldefrag(urljoin(base_uri, val))
        if target in ("", base_uri):
            root, new_base = self.cache.get(base_uri, self.schema), base_uri
        else:
            root, new_base = self.cache.get(target), target
            if root is None:
                self.warnings.append(
                    f"/{prefix}: unresolvable $dynamicRef {val!r} is not "
                    f"compiled — only partially enforced"
                )
                return None
        anchor_name = None
        if fragment and not fragment.startswith("/"):
            node = _find_anchor(root, fragment)
            if node is None:
                self.warnings.append(
                    f"/{prefix}: unresolvable $dynamicRef anchor {val!r} is "
                    f"not compiled — only partially enforced"
                )
                return None
            if node.get("$dynamicAnchor") == fragment:
                anchor_name = fragment
        else:
            try:
                node = _pointer_walk(root, fragment) if fragment else root
            except (KeyError, IndexError, ValueError, TypeError):
                self.warnings.append(
                    f"/{prefix}: unresolvable $dynamicRef fragment {val!r} "
                    f"is not compiled — only partially enforced"
                )
                return None
        # per 2020-12 §8.2.3.2 the dynamic dance only happens when the
        # initial target IS a $dynamicAnchor; pointer/static-anchor
        # targets behave exactly like $ref
        if anchor_name is not None and any(
            _find_anchor(s, anchor_name, dynamic_only=True) is not None
            for s in self.cache.values()
            if s is not root
        ):
            self.warnings.append(
                f"/{prefix}: $dynamicRef {val!r} compiled via its lexical "
                f"$dynamicAnchor; a same-named $dynamicAnchor elsewhere in "
                f"the dynamic scope could override it — only partially "
                f"enforced"
            )
        return node, new_base

    def _ref_expansions(
        self,
        node: Mapping,
        prefix: str,
        base_uri: str,
        ref_chain: Tuple,
        warn_cycles: bool = False,
    ) -> Tuple[list, bool]:
        """Resolved ``(target, new_base, new_chain)`` expansions for the
        reference keywords at this node, plus whether the node's OWN
        sibling keywords still apply (2019-09+ ``$ref`` keeps siblings,
        [verified] probe; drafts ≤07 replace the node wholly —
        jsonschema parity)."""
        exps: list = []
        consumed = False
        if "$ref" in node:
            consumed = True
            key = (base_uri, "$ref", node["$ref"])
            if key in ref_chain:
                if warn_cycles:
                    self.warnings.append(
                        f"/{prefix}: circular $ref {node['$ref']!r} in "
                        f"combinator branch treated as always-true"
                    )
            else:
                resolved = self._resolve_ref(node["$ref"], base_uri)
                if resolved is not None:
                    t, nb = resolved
                    exps.append((t, nb, ref_chain + (key,)))
        dyn_kw = None
        if self.draft_2020 and isinstance(node.get("$dynamicRef"), str):
            dyn_kw = "$dynamicRef"  # 2020-12 only ([verified] gating)
        elif self.draft_level == 19 and isinstance(node.get("$recursiveRef"), str):
            dyn_kw = "$recursiveRef"  # 2019-09 only
        if dyn_kw is not None:
            key = (base_uri, dyn_kw, node[dyn_kw])
            if key in ref_chain:
                # one level of self-recursion is inlined; deeper
                # levels stop at the cycle guard — recorded, not silent
                self.warnings.append(
                    f"/{prefix}: recursive {dyn_kw} {node[dyn_kw]!r} beyond "
                    f"one level is not compiled — only partially enforced"
                )
            else:
                res = self._resolve_dynamic(dyn_kw, node[dyn_kw], base_uri, prefix)
                if res is not None:
                    t, nb = res
                    exps.append((t, nb, ref_chain + (key,)))
        siblings = self.draft_2019_plus or not consumed
        return exps, siblings

    # -- keyword compilation --------------------------------------------------

    def _kw_ok(self, k: str) -> bool:
        """False for keywords this draft's jsonschema validator
        IGNORES (compiling them would over-validate)."""
        return self.draft_level >= _KW_MIN_LEVEL.get(k, 0)

    def _legacy_bounds_pairs(self, pairs: Tuple) -> Tuple:
        """Drafts 03/04: boolean exclusiveMinimum/Maximum are MODIFIERS
        of the paired bound (jsonschema's legacy minimum/maximum
        validators), never standalone keywords.  Rewrites a scalar
        kw-pair tuple accordingly: truthy modifier + bound → the
        internal strict kws exclusiveMinimum4/exclusiveMaximum4
        (compiled strict, REPORTED under minimum/maximum); the raw
        modifier keys are removed (a bare `double > true` predicate
        would fail analysis — caught by round-4 review)."""
        if self.draft_level >= 6 or not pairs:
            return pairs
        d = dict(pairs)
        emin = d.pop("exclusiveMinimum", None)
        emax = d.pop("exclusiveMaximum", None)
        if "minimum" in d and emin:
            d["exclusiveMinimum4"] = d.pop("minimum")
        if "maximum" in d and emax:
            d["exclusiveMaximum4"] = d.pop("maximum")
        return tuple(d.items())

    def _scalar_format_ok(self, name: Any) -> bool:
        """True when a `format` value is safe inside the scalar subset
        (compiled within forall/map_filter lambdas): unknown formats
        (annotation-only), regex strings, and HOF-safe Column callables
        qualify; Python-UDF-backed checkers (regex/idn-hostname and
        reference-protocol customFormats) do NOT — Spark rejects
        Python UDFs inside higher-order functions (caught by round-4
        review), so those drop WITH a warning instead of crashing."""
        from .checks.row_checks import FORMATS

        ck = self.formats.get(name, FORMATS.get(name))
        if ck is None or isinstance(ck, str):
            return True
        return bool(getattr(ck, "hof_safe", False))

    def _scalar_kw_value(self, k: str, v: Any) -> Any:
        """Normalize one scalar keyword value for compilation —
        list→tuple, plus the draft-03/04 strict-integer token."""
        v2 = tuple(v) if isinstance(v, list) else v
        if k == "type" and self.draft_level < 6:
            if isinstance(v2, tuple):
                v2 = tuple("integer4" if x == "integer" else x for x in v2)
            elif v2 == "integer":
                v2 = "integer4"
        return v2

    def _scalar_subset(self, sub: Any, where: str) -> Optional[Tuple]:
        """Scalar-keyword pairs for a propertyNames / patternProperties
        subschema (row_checks._scalar_kw_pred consumes them).  Boolean
        subschemas map to ()/always-fail; unsupported keywords are
        DROPPED WITH A RECORDED WARNING (never silently).  Returns None
        when nothing is compilable."""
        if sub is True:
            return ()
        if sub is False:
            return (("never", True),)
        if not isinstance(sub, dict):
            self.warnings.append(f"{where}: malformed subschema {sub!r} dropped")
            return None
        out: List[Tuple[str, Any]] = []
        dropped: List[str] = []
        for k, v in sub.items():
            if k == "divisibleBy" and self.draft_level == 3:
                out.append(("divisibleBy", v))
            elif k == "format" and not self._scalar_format_ok(v):
                dropped.append("format (Python-backed checker)")
            elif k in _SCALAR_KWS:
                # below-draft keywords are EXACTLY ignored (matching
                # this draft's jsonschema validator) — no warning
                if self._kw_ok(k):
                    out.append((k, self._scalar_kw_value(k, v)))
            elif k not in _ANNOTATION_KWS:
                dropped.append(k)
        if dropped:
            self.warnings.append(
                f"{where}: keywords {dropped} outside the scalar subset "
                f"dropped — only partially enforced"
            )
        out = list(self._legacy_bounds_pairs(tuple(out)))
        return tuple(out) if out else ()

    def _compile_branch(
        self, node: Any, prefix: str, base_uri: Optional[str], ref_chain: Tuple
    ) -> Tuple:
        """One combinator branch → flat tuple of ColumnCheck /
        CombinatorCheck items whose CONJUNCTION is the branch verdict.
        Walks properties / allOf / nested combinators like walk(), but
        collects instead of appending (triggers inside branches are
        registered separately by _walk_triggers_only)."""
        if node is True or (isinstance(node, dict) and not node):
            return ()
        if node is False:
            # `false` schema: fails on any instance the branch reaches
            return (
                ColumnCheck(column=prefix if prefix else "#root",
                            sql_predicate="false"),
            )
        if not isinstance(node, dict):
            self.warnings.append(
                f"/{prefix}: malformed combinator branch {node!r} dropped"
            )
            return ()
        base_uri = base_uri or self.uri
        # chain keys are PREFIX-INDEPENDENT: with nested inlining the
        # prefix grows every hop, so a cross-schema cycle (a→b→a) would
        # never repeat a (base, kw, ref) triple — the reference likewise
        # de-cycles at URI level (visitedURIs,
        # extensible_validator.py:631-651)
        exps, siblings = self._ref_expansions(
            node, prefix, base_uri, ref_chain, warn_cycles=True
        )
        ref_checks: List = []
        for target, new_base, new_chain in exps:
            ref_checks.extend(
                self._compile_branch(target, prefix, new_base, new_chain)
            )
        if not siblings:
            # drafts ≤07: $ref replaces the node wholly (jsonschema
            # ignores siblings, [verified] probe)
            return tuple(ref_checks)
        checks: List = ref_checks
        checks.extend(self._node_checks(node, prefix, base_uri, ref_chain))
        props = node.get("properties")
        if isinstance(props, dict):
            for name, child in props.items():
                child_path = _join_path(prefix, name)
                if (
                    self.draft_level == 3
                    and "[]" not in prefix
                    and isinstance(child, dict)
                    and child.get("required") is True
                ):
                    # draft-03 boolean required (see walk())
                    scope = prefix if prefix else "#root"
                    self._touch(scope)
                    self._touch(child_path)
                    checks.append(
                        ColumnCheck(
                            column=child_path,
                            required=True,
                            required_scope=scope,
                        )
                    )
                checks.extend(
                    self._compile_branch(
                        child, child_path, base_uri, ref_chain
                    )
                )
        items = node.get("items")
        if isinstance(items, dict) and not (
            self.draft_2020 and isinstance(node.get("prefixItems"), list)
        ):
            # (2020-12 items-after-prefixItems compiles as tail checks
            # inside _node_checks — a full descent would over-apply)
            checks.extend(
                self._compile_branch(
                    items, (prefix + "[]") if prefix else "#root[]",
                    base_uri, ref_chain,
                )
            )
        for branch in node.get("allOf") or []:
            checks.extend(self._compile_branch(branch, prefix, base_uri, ref_chain))
        for branch in self._extends_branches(node):
            checks.extend(self._compile_branch(branch, prefix, base_uri, ref_chain))
        checks.extend(self._combinator_checks(node, prefix, base_uri, ref_chain))
        return tuple(checks)

    def _combinator_checks(
        self, node: Mapping, prefix: str, base_uri: Optional[str], ref_chain: Tuple
    ) -> List:
        """anyOf/oneOf/not at this node → CombinatorCheck items
        (⇔ the reference's full combinator semantics inherited from
        jsonschema, extend_validator_helpers.py:50-64 + invocation
        extensible_validator.py:1163-1194: a document failing every
        anyOf branch FAILS validation with reason 'anyOf')."""
        out: List = []
        if self.draft_level < 4:
            # draft-03 predates anyOf/oneOf/not (Draft3Validator has no
            # combinator validators, [verified] — the draft-03
            # randomized net caught the over-validation)
            return out
        if "[]" in prefix:
            return self._element_combinators(node, prefix)
        gate = prefix if prefix else "#root"
        for kind in ("anyOf", "oneOf"):
            raw = node.get(kind)
            if isinstance(raw, list) and raw:
                self._touch(gate)
                out.append(
                    CombinatorCheck(
                        column=gate,
                        kind=kind,
                        branches=tuple(
                            self._compile_branch(b, prefix, base_uri, ref_chain)
                            for b in raw
                        ),
                    )
                )
        if "not" in node and isinstance(node["not"], (dict, bool)):
            self._touch(gate)
            out.append(
                CombinatorCheck(
                    column=gate,
                    kind="not",
                    branches=(
                        self._compile_branch(node["not"], prefix, base_uri, ref_chain),
                    ),
                )
            )
        if (
            self.draft_07_plus
            and isinstance(node.get("if"), (dict, bool))
            and ("then" in node or "else" in node)
        ):
            self._touch(gate)
            out.append(
                CombinatorCheck(
                    column=gate,
                    kind="ifThenElse",
                    branches=(
                        self._compile_branch(node["if"], prefix, base_uri, ref_chain),
                        self._compile_branch(
                            node.get("then", True), prefix, base_uri, ref_chain
                        ),
                        self._compile_branch(
                            node.get("else", True), prefix, base_uri, ref_chain
                        ),
                    ),
                )
            )
        return out

    def _extends_branches(self, node: Mapping) -> list:
        """Draft-03 ``extends`` ≡ allOf (single schema or list), with
        LEAF reasons via the normal conjunctive walk ([verified]
        Draft3 probes)."""
        if self.draft_level != 3:
            return []
        ext = node.get("extends")
        if isinstance(ext, dict):
            return [ext]
        if isinstance(ext, list):
            return [b for b in ext if isinstance(b, dict)]
        return []

    def _scalar_subset_exact(self, sub: Any, where: str) -> Optional[Tuple]:
        """_scalar_subset, but ONLY when it loses nothing: any dropped
        keyword disqualifies the branch (probed against a throwaway
        warning list).  A weaker branch must never compile inside a
        combinator — under `not`/`oneOf` it would OVER-validate (flag
        conforming documents), strictly worse than the recorded-warning
        fallback."""
        saved = self.warnings
        self.warnings = []
        try:
            out = self._scalar_subset(sub, where)
            dropped = bool(self.warnings)
        finally:
            self.warnings = saved
        return None if dropped else out

    def _element_combinators(self, node: Mapping, prefix: str) -> List:
        """Combinators inside an `items` subschema → per-element
        compilation over the element-literal array (ColumnCheck
        .element_combinators), the same forall trick the scalar `items`
        subset uses.  Compiled ONLY when every branch is exactly
        scalar-expressible; anything else records a warning — never a
        silent drop.  Reasons match jsonschema's items descent
        ([verified] probes): anyOf/oneOf/not report the combinator
        name, if/then/else reports leaf keyword names.

        Supported locations: ONE array level anywhere (element or
        aligned sub-property arrays), or a DIRECT nested-array element
        location at any depth ("a[].b[]" — flat-filtered leaf
        collection, verdict-equivalent per element; round 5)."""
        out: List = []
        one_level = prefix.count("[]") == 1 or prefix.endswith("[]")
        combos: List = []
        warn_kinds: List[str] = []
        has_ite = (
            self.draft_07_plus
            and isinstance(node.get("if"), (dict, bool))
            and ("then" in node or "else" in node)
        )
        for kind in ("anyOf", "oneOf"):
            raw = node.get(kind)
            if not (isinstance(raw, list) and raw):
                continue
            if not one_level:
                warn_kinds.append(kind)
                continue
            branches = [
                self._scalar_subset_exact(b, f"/{prefix} {kind} branch")
                for b in raw
            ]
            if all(b is not None for b in branches):
                combos.append((kind, tuple(branches)))
            else:
                warn_kinds.append(kind)
        if "not" in node and isinstance(node["not"], (dict, bool)):
            b = (
                self._scalar_subset_exact(node["not"], f"/{prefix} not")
                if one_level
                else None
            )
            if b is not None:
                combos.append(("not", (b,)))
            else:
                warn_kinds.append("not")
        if has_ite:
            parts = (
                [
                    self._scalar_subset_exact(
                        node.get(k, True), f"/{prefix} {k}"
                    )
                    for k in ("if", "then", "else")
                ]
                if one_level
                else [None]
            )
            if all(p is not None for p in parts):
                combos.append(("ifThenElse", tuple(parts)))
            else:
                warn_kinds.append("if/then/else")
        if combos:
            self._touch(prefix)
            out.append(
                ColumnCheck(column=prefix, element_combinators=tuple(combos))
            )
        if warn_kinds:
            self.warnings.append(
                f"/{prefix}: combinators {warn_kinds} under an array-element "
                f"location are not compiled — only partially enforced"
            )
        return out

    def _node_checks(
        self,
        node: Mapping,
        prefix: str,
        base_uri: Optional[str] = None,
        ref_chain: Tuple = (),
    ) -> List:
        """Conjunctive checks declared AT this node (no recursion into
        properties/items/combinators — walk()/_compile_branch do that).
        Returns the list instead of appending so combinator branches
        can reuse the exact same keyword compilation."""
        out: List = []
        if "[]" in prefix:
            # per-element (items) keywords, ONE array level supported:
            # - DIRECT element location (trailing "[]"): the scalar
            #   subset compiles to a forall over the element-literal
            #   array with LEAF reasons (jsonschema descends into
            #   items), and `required` compiles per element (object
            #   elements must carry the member — aligned sub arrays);
            # - SUB-PROPERTY location ("loc[].rel", properties of
            #   object elements): the scalar subset compiles over the
            #   ALIGNED sub-instance literal array (absent → NULL entry
            #   → vacuous), `required` in nested objects likewise.
            # Deeper shapes (nested arrays, the object-keyword families
            # below) are recorded as warnings, never silently dropped.
            one_level = prefix.count("[]") == 1
            direct = one_level and prefix.endswith("[]")
            sub_level = one_level and not direct
            # nested-array DIRECT element locations ("a[].b[]",
            # "a[][]", any depth): the flat-filtered leaf collection
            # (docshred.flat_instances) is verdict-equivalent to the
            # aligned form for per-element scalars/combinators, so the
            # same forall machinery applies — round-5 extension; the
            # object-keyword families and per-element required below
            # still need aligned per-element structures and stay
            # one-level (warned beyond)
            flat_direct = prefix.endswith("[]") and not one_level
            scalar = {
                k: node[k]
                for k in _SCALAR_KWS
                if k in node
                and self._kw_ok(k)
                and not (
                    k == "format" and not self._scalar_format_ok(node[k])
                )
            }
            if self.draft_level == 3 and isinstance(
                node.get("divisibleBy"), (int, float)
            ):
                scalar["divisibleBy"] = node["divisibleBy"]
            if scalar and (direct or sub_level or flat_direct):
                self._touch(prefix)
                kwpairs = self._legacy_bounds_pairs(
                    tuple(
                        (k, self._scalar_kw_value(k, v))
                        for k, v in scalar.items()
                    )
                )
                out.append(
                    ColumnCheck(column=prefix, element_checks=kwpairs)
                    if (direct or flat_direct)
                    else ColumnCheck(
                        column=prefix, element_sub_checks=kwpairs
                    )
                )
            required = node.get("required")
            req_done = False
            if one_level and isinstance(required, list):
                # per-element required: OBJECT entries of the parent's
                # aligned literal array must carry the member
                req_done = True
                self._touch(prefix)
                for r in required:
                    if not isinstance(r, str):
                        continue
                    rp = f"{prefix}.{r}"
                    self._touch(rp)
                    out.append(
                        ColumnCheck(
                            column=rp, element_required_scope=prefix
                        )
                    )
            # object-keyword families at the element location, via
            # per-element keys arrays (`<loc>#keys` array<array>) and
            # aligned member arrays — reasons match jsonschema's items
            # descent ([verified] probes)
            el_allowed = tuple(
                sorted(node["properties"])
                if isinstance(node.get("properties"), dict)
                else ()
            )
            el_patterns = (
                tuple(sorted(node["patternProperties"]))
                if isinstance(node.get("patternProperties"), dict)
                else ()
            )
            ap_done = False
            if (direct or sub_level) and node.get("additionalProperties") is False:
                ap_done = True
                self.elem_props_paths.add(prefix)
                out.append(
                    ColumnCheck(
                        column=prefix + "#keys",
                        allowed_keys=el_allowed,
                        allowed_key_patterns=el_patterns or None,
                        per_element=True,
                    )
                )
            mp_done = False
            if (direct or sub_level) and self._kw_ok("minProperties") and (
                isinstance(node.get("minProperties"), int)
                or isinstance(node.get("maxProperties"), int)
            ):
                mp_done = True
                self.elem_props_paths.add(prefix)
                out.append(
                    ColumnCheck(
                        column=prefix + "#keys",
                        min_properties=node.get("minProperties"),
                        max_properties=node.get("maxProperties"),
                        per_element=True,
                    )
                )
            pn_done = False
            el_pn = (
                node.get("propertyNames")
                if ((direct or sub_level) and self.draft_06_plus)
                else None
            )
            if isinstance(el_pn, (dict, bool)):
                pn_sub = self._scalar_subset(
                    el_pn, f"/{prefix} propertyNames"
                )
                if pn_sub:
                    pn_done = True
                    self.elem_props_paths.add(prefix)
                    out.append(
                        ColumnCheck(
                            column=prefix + "#keys",
                            property_names=pn_sub,
                            per_element=True,
                        )
                    )
                elif pn_sub == ():
                    pn_done = True  # always-true subschema, exactly
            # patternProperties / schema-form additionalProperties
            # VALUES per element, via `<loc>#entries`
            # array<map<string,string>> — leaf reasons ([verified])
            pp_done = False
            el_pp = node.get("patternProperties") if one_level else None
            if isinstance(el_pp, dict) and el_pp:
                pp_entries = []
                for regex, sub in sorted(el_pp.items()):
                    subkw = self._scalar_subset(
                        sub, f"/{prefix} patternProperties[{regex!r}]"
                    )
                    if subkw:
                        pp_entries.append((regex, subkw))
                pp_done = True
                if pp_entries:
                    self.elem_entries_paths.add(prefix)
                    out.append(
                        ColumnCheck(
                            column=prefix + "#entries",
                            pattern_properties=tuple(pp_entries),
                            per_element=True,
                        )
                    )
            apv_done = False
            el_ap = node.get("additionalProperties") if one_level else None
            if isinstance(el_ap, dict) and el_ap:
                apv_sub = self._scalar_subset(
                    el_ap, f"/{prefix} additionalProperties"
                )
                apv_done = True
                if apv_sub:
                    self.elem_entries_paths.add(prefix)
                    out.append(
                        ColumnCheck(
                            column=prefix + "#entries",
                            additional_entries=(
                                el_allowed,
                                el_patterns,
                                apv_sub,
                            ),
                            per_element=True,
                        )
                    )
            # static `unevaluatedProperties: false` inside items: the
            # same draft-split static walk as the object-level path
            # (2019 legacy AP-own-keys quirk; 2020 AP={} vacuous,
            # dict-AP value-dependent → stays warned), per element via
            # the keys arrays — reason `unevaluatedProperties`
            up_done = False
            if one_level and self.draft_2019_plus:
                el_up = node.get("unevaluatedProperties")
                el_in_place = [
                    k
                    for k in (
                        "allOf", "anyOf", "oneOf", "if",
                        "dependentSchemas", "$ref", "$dynamicRef",
                        "$recursiveRef",
                    )
                    if k in node
                ]
                el_ap_node = node.get("additionalProperties")
                el_up_vac = (el_ap_node is True) or (
                    self.draft_2020
                    and el_ap_node == {}
                    and "additionalProperties" in node
                )
                if el_up is False and not el_up_vac and not el_in_place:
                    if self.draft_2020 and isinstance(el_ap_node, dict) and el_ap_node:
                        pass  # 2020 value-dependent AP walk → warned
                    else:
                        up_allowed = set(el_allowed)
                        if not self.draft_2020 and isinstance(el_ap_node, dict):
                            # legacy-walk quirk: object-form AP
                            # contributes its OWN KEYS ([verified])
                            up_allowed |= set(el_ap_node)
                        up_done = True
                        self.elem_props_paths.add(prefix)
                        out.append(
                            ColumnCheck(
                                column=prefix + "#keys",
                                allowed_keys=tuple(sorted(up_allowed)),
                                allowed_key_patterns=el_patterns or None,
                                keys_reason="unevaluatedProperties",
                                per_element=True,
                            )
                        )
            # required-form dependencies per element: trigger entry
            # present → member entry present (aligned arrays zip)
            el_dep_kw = (
                "dependentRequired" if self.draft_2019_plus else "dependencies"
            )
            el_deps = node.get(el_dep_kw)
            deps_done = False
            if one_level and isinstance(el_deps, dict):
                deps_done = True
                for trig in sorted(el_deps):
                    dep = el_deps[trig]
                    if isinstance(dep, list):
                        tp = f"{prefix}.{trig}"
                        self._touch(tp)
                        for r in dep:
                            if not isinstance(r, str):
                                continue
                            rp = f"{prefix}.{r}"
                            self._touch(rp)
                            out.append(
                                ColumnCheck(
                                    column=rp,
                                    dependent_on=tp,
                                    dependent_reason=el_dep_kw,
                                    per_element=True,
                                )
                            )
                    else:
                        # schema-form entries stay uncompiled → warn
                        deps_done = False
            # constraining unevaluated* in an element subschema is
            # also beyond the per-element subset (True/{} are vacuous)
            unev_here = tuple(
                k
                for k in ("unevaluatedProperties", "unevaluatedItems")
                if self.draft_2019_plus
                and (node.get(k) is False or node.get(k) not in (None, True, {}))
            )
            # object/array keyword families not compiled at element
            # locations — every present one must leave a trace
            deps_kws = (
                ("dependentRequired", "dependentSchemas")
                if self.draft_2019_plus
                else ("dependencies",)
            )
            obj_kws = tuple(
                k
                for k in (
                    "additionalProperties",
                    "patternProperties",
                    "propertyNames",
                    "minProperties",
                    "maxProperties",
                    "contains",
                    *deps_kws,
                )
                if self._kw_ok(k)
            )
            dropped = [
                k
                for k in (*_CHECK_KEYWORDS, "required", *obj_kws, *unev_here)
                if k in node
                and self._kw_ok(k)  # below-draft = exactly ignored
                and not ((direct or sub_level or flat_direct) and k in scalar)
                and not (k == "required" and req_done)
                and not (k == "additionalProperties" and (ap_done or apv_done))
                and not (k == "patternProperties" and pp_done)
                and not (
                    k in ("minProperties", "maxProperties") and mp_done
                )
                and not (k == "propertyNames" and pn_done)
                and not (k == el_dep_kw and deps_done)
                and not (k == "unevaluatedProperties" and up_done)
            ]
            if isinstance(node.get("items"), list) or (
                self.draft_2020 and isinstance(node.get("prefixItems"), list)
            ):
                dropped.append("items/prefixItems (tuple form)")
            if dropped:
                self.warnings.append(
                    f"/{prefix}: per-element keywords {dropped} are not "
                    f"compiled — only partially enforced"
                )
            return out
        # contains / minContains / maxContains (contains: draft-06+;
        # the bounds: 2019-09+, ignored by earlier drafts like
        # jsonschema does)
        contains = node.get("contains") if self.draft_06_plus else None
        if isinstance(contains, (dict, bool)):
            subkw = self._scalar_subset(contains, f"/{prefix or ''} contains")
            if subkw is not None:
                arr_path = (prefix + "[]") if prefix else "#root[]"
                minc = node.get("minContains") if self.draft_2019_plus else None
                maxc = node.get("maxContains") if self.draft_2019_plus else None
                self._touch(arr_path)
                out.append(
                    ColumnCheck(
                        column=arr_path,
                        contains_checks=subkw,
                        min_contains=minc if isinstance(minc, int) else None,
                        max_contains=maxc if isinstance(maxc, int) else None,
                    )
                )
        # tuple-form items (draft ≤07) / prefixItems (2019-09+):
        # per-INDEX scalar keyword checks over the element array
        tuple_items = (
            node["items"] if isinstance(node.get("items"), list) else None
        )
        if (
            tuple_items is None
            # prefixItems exists only from 2020-12 — Draft201909Validator
            # ignores it entirely ([verified] probe), so compiling it
            # under 2019-09 would over-validate
            and self.draft_2020
            and isinstance(node.get("prefixItems"), list)
        ):
            tuple_items = node["prefixItems"]
            items_after = node.get("items")
            if isinstance(items_after, dict):
                # 2020-12: `items` applies only PAST the prefix — its
                # scalar subset compiles over the tail slice with LEAF
                # reasons (jsonschema descends into items per tail
                # element); non-scalar parts warn via _scalar_subset.
                # walk() skips its usual full descent for this shape
                # (which would over-apply the checks to every element).
                tail_sub = self._scalar_subset(
                    items_after, f"/{prefix or ''} items (after prefixItems)"
                )
                if tail_sub:
                    arr_path = (prefix + "[]") if prefix else "#root[]"
                    self._touch(arr_path)
                    out.append(
                        ColumnCheck(
                            column=arr_path,
                            tail_item_checks=(len(tuple_items), tail_sub),
                        )
                    )
        if tuple_items is not None:
            arr_path = (prefix + "[]") if prefix else "#root[]"
            idx_checks = []
            for i, sub in enumerate(tuple_items):
                subkw = self._scalar_subset(
                    sub, f"/{prefix or ''} items[{i}]"
                )
                if subkw:
                    idx_checks.append((i, subkw))
            if idx_checks:
                self._touch(arr_path)
                out.append(
                    ColumnCheck(column=arr_path, index_checks=tuple(idx_checks))
                )
            # additionalItems (drafts 03–2019-09; 2020-12 dropped the
            # keyword) applies only alongside TUPLE-form items
            # ([verified] probes: false → reason `additionalItems` on
            # longer arrays; schema-form → LEAF reasons on the tail;
            # ignored next to dict-form items)
            ai = (
                node.get("additionalItems")
                if (not self.draft_2020 and isinstance(node.get("items"), list))
                else None
            )
            if ai is False:
                self._touch(arr_path)
                out.append(
                    ColumnCheck(
                        column=arr_path,
                        max_unevaluated_items=len(tuple_items),
                        max_unevaluated_items_reason="additionalItems",
                    )
                )
            elif isinstance(ai, dict) and ai:
                ai_sub = self._scalar_subset(
                    ai, f"/{prefix or ''} additionalItems"
                )
                if ai_sub:
                    self._touch(arr_path)
                    out.append(
                        ColumnCheck(
                            column=arr_path,
                            tail_item_checks=(len(tuple_items), ai_sub),
                        )
                    )
        kw = {
            k: node[k]
            for k in _CHECK_KEYWORDS
            if k in node and self._kw_ok(k)
        }
        keys_col = (prefix + "#keys") if prefix else "#keys"
        entries_col = (prefix + "#entries") if prefix else "#entries"
        node_allowed = tuple(
            sorted(node.get("properties", {}))
            if isinstance(node.get("properties"), dict)
            else ()
        )
        node_patterns = (
            tuple(sorted(node["patternProperties"]))
            if isinstance(node.get("patternProperties"), dict)
            else ()
        )
        # additionalProperties: false → the node's actual property
        # names must all be declared or match a patternProperties
        # regex
        if node.get("additionalProperties") is False:
            self.props_paths.add(prefix)
            out.append(
                ColumnCheck(
                    column=keys_col,
                    allowed_keys=node_allowed,
                    allowed_key_patterns=node_patterns or None,
                )
            )
        # schema-form additionalProperties: undeclared, unpatterned
        # property VALUES validate against the subschema's scalar
        # subset — leaf reasons like jsonschema's descent.  () = the
        # subschema accepts everything → nothing to enforce.
        ap_node = node.get("additionalProperties")
        ap_sub = None
        ap_lossy = False
        if isinstance(ap_node, dict) and ap_node:
            # lossy = keywords were dropped (the _scalar_subset call
            # records the warning), so ap_sub under-states the AP
            # schema — the 2020-12 UP walk below must not treat it as
            # the exact evaluated-value predicate silently
            n_warn = len(self.warnings)
            ap_sub = self._scalar_subset(
                ap_node, f"/{prefix or ''} additionalProperties"
            )
            ap_lossy = len(self.warnings) > n_warn
            if ap_sub:
                self.entries_paths.add(prefix)
                out.append(
                    ColumnCheck(
                        column=entries_col,
                        additional_entries=(
                            node_allowed,
                            node_patterns,
                            ap_sub,
                        ),
                    )
                )
        # 2019-09+ unevaluatedProperties / unevaluatedItems.  Parity
        # target is the jsonschema LIBRARY's actual annotation walk
        # (the engine the reference delegates to): legacy
        # find_evaluated_property_keys_by_schema for 2019-09 vs the
        # is_valid-based one for 2020-12 (jsonschema
        # _legacy_keywords.py / _utils.py, probed on 4.26).  The
        # STATIC subset — no in-place applicator at the node —
        # compiles exactly; the dynamic remainder warns, never a
        # silent drop.  Draft-07 ignores both keywords (so does
        # jsonschema).  `not` is never a blocker: neither walk
        # descends into it.
        if self.draft_2019_plus:
            in_place = [
                k
                for k in (
                    "allOf",
                    "anyOf",
                    "oneOf",
                    "if",
                    "dependentSchemas",
                    "$ref",
                    "$dynamicRef",
                    "$recursiveRef",
                )
                if k in node
            ]
            up = node.get("unevaluatedProperties")
            ap = node.get("additionalProperties")
            # AP=True evaluates everything in both walks; 2020-12
            # additionally treats any value-accepting AP schema that
            # way (AP={} accepts all values) → vacuous, exact silence
            up_vacuous = (ap is True) or (
                self.draft_2020 and ap == {} and "additionalProperties" in node
            )
            # 2020-12 decides AP coverage by VALIDATING each value
            # against the AP schema — value-dependent for a non-empty
            # schema, compiled via the #entries map when the AP
            # subschema is scalar-expressible
            up_dynamic = self.draft_2020 and isinstance(ap, dict) and ap
            if (up is False or (isinstance(up, dict) and up)) and not up_vacuous:
                # up_sub: None ⇔ UP is false (nothing passes);
                # up_state: True = compilable, None = vacuous (UP
                # accepts every value), False = not compilable
                up_sub = None
                up_state = True
                if isinstance(up, dict):
                    up_sub = self._scalar_subset(
                        up, f"/{prefix or ''} unevaluatedProperties"
                    )
                    if up_sub is None:
                        up_state = False
                    elif up_sub == ():
                        up_state = None
                if in_place:
                    self.warnings.append(
                        f"/{prefix}: unevaluatedProperties alongside "
                        f"{in_place} is not compiled — only partially "
                        f"enforced"
                    )
                elif up_state is None:
                    pass  # UP accepts everything → never fires
                elif up_state is False:
                    self.warnings.append(
                        f"/{prefix}: schema-form unevaluatedProperties is "
                        f"not compiled — only partially enforced"
                    )
                elif up_dynamic:
                    # 2020-12 with object-form AP: a property passes
                    # iff declared, pattern-matched, AP-valid
                    # (evaluated), or — schema-form — UP-valid
                    if ap_lossy:
                        # the compiled AP subset under-states the AP
                        # schema, so the evaluated-value predicate is
                        # approximate — record the UP consequence
                        # explicitly, not just the AP-attributed
                        # _scalar_subset warning
                        self.warnings.append(
                            f"/{prefix}: unevaluatedProperties alongside a "
                            f"partially-compiled additionalProperties is "
                            f"not fully compiled — only partially enforced"
                        )
                    if ap_sub:
                        self.entries_paths.add(prefix)
                        out.append(
                            ColumnCheck(
                                column=entries_col,
                                unevaluated_entries=(
                                    node_allowed,
                                    node_patterns,
                                    ap_sub,
                                    up_sub,
                                ),
                            )
                        )
                    elif ap_sub == ():
                        # AP's compiled subset accepts every value →
                        # everything evaluated; EXACT silence only when
                        # nothing was dropped (ap_lossy warned above)
                        pass
                    else:
                        self.warnings.append(
                            f"/{prefix}: unevaluatedProperties alongside "
                            f"malformed additionalProperties is not "
                            f"compiled — only partially enforced"
                        )
                elif isinstance(up, dict):
                    # schema-form UP, no value-based evaluator: names
                    # outside the evaluated set must carry UP-valid
                    # values; the legacy walk additionally counts AP's
                    # and UP's OWN KEYS as evaluated names ([verified]
                    # quirk)
                    allowed = set(node_allowed)
                    if not self.draft_2020:
                        if isinstance(ap, dict):
                            allowed |= set(ap)
                        allowed |= set(up)
                    self.entries_paths.add(prefix)
                    out.append(
                        ColumnCheck(
                            column=entries_col,
                            unevaluated_entries=(
                                tuple(sorted(allowed)),
                                node_patterns,
                                None,
                                up_sub,
                            ),
                        )
                    )
                else:
                    # UP false, fully static → cheap keys-array check
                    allowed = set(node_allowed)
                    if not self.draft_2020 and isinstance(ap, dict):
                        # legacy-walk quirk, [verified]: an object-form
                        # additionalProperties contributes its OWN KEYS
                        # as evaluated property names
                        allowed |= set(ap)
                    self.props_paths.add(prefix)
                    out.append(
                        ColumnCheck(
                            column=keys_col,
                            allowed_keys=tuple(sorted(allowed)),
                            allowed_key_patterns=node_patterns or None,
                            keys_reason="unevaluatedProperties",
                        )
                    )

            ui = node.get("unevaluatedItems")
            items = node.get("items")
            # full-coverage items forms → unevaluatedItems can never
            # fire: 2020-12 bails out for ANY `items`; the legacy walk
            # for dict-form `items` or tuple+additionalItems
            ui_vacuous = ("items" in node) and (
                self.draft_2020
                or isinstance(items, dict)
                or "additionalItems" in node
            )
            if (ui is False or (isinstance(ui, dict) and ui)) and not ui_vacuous:
                ui_sub = None  # None ⇔ UI is false (nothing passes)
                ui_state = True
                if isinstance(ui, dict):
                    ui_sub = self._scalar_subset(
                        ui, f"/{prefix or ''} unevaluatedItems"
                    )
                    if ui_sub is None:
                        ui_state = False
                    elif ui_sub == ():
                        ui_state = None
                # `contains` coverage is is_valid-per-element in BOTH
                # walks → dynamic, warn
                if in_place or "contains" in node:
                    self.warnings.append(
                        f"/{prefix}: unevaluatedItems alongside "
                        f"{in_place or ['contains']} is not compiled — "
                        f"only partially enforced"
                    )
                elif ui_state is None:
                    pass  # UI accepts everything → never fires
                elif ui_state is False:
                    self.warnings.append(
                        f"/{prefix}: schema-form unevaluatedItems is not "
                        f"compiled — only partially enforced"
                    )
                else:
                    if self.draft_2020:
                        # prefixItems covers its positions (2020-12)
                        prefix_len = (
                            len(node["prefixItems"])
                            if isinstance(node.get("prefixItems"), list)
                            else 0
                        )
                    else:
                        # the legacy walk only honors tuple-form items
                        # (prefixItems is not a 2019-09 keyword)
                        prefix_len = (
                            len(items) if isinstance(items, list) else 0
                        )
                    ui_arr = (prefix + "[]") if prefix else "#root[]"
                    self._touch(ui_arr)
                    out.append(
                        ColumnCheck(
                            column=ui_arr,
                            max_unevaluated_items=prefix_len,
                        )
                        if ui_sub is None
                        else ColumnCheck(
                            column=ui_arr,
                            unevaluated_item_checks=(prefix_len, ui_sub),
                        )
                    )
        # patternProperties: every property whose name matches a regex
        # must carry a value satisfying that regex's (scalar-subset)
        # subschema — real per-key checks over the `#entries` map
        pp = node.get("patternProperties")
        if isinstance(pp, dict) and pp:
            entries: List[Tuple[str, Tuple]] = []
            for regex, sub in sorted(pp.items()):
                subkw = self._scalar_subset(
                    sub, f"/{prefix or ''} patternProperties[{regex!r}]"
                )
                if subkw:  # empty subset = always-true subschema
                    entries.append((regex, subkw))
            if entries:
                self.entries_paths.add(prefix)
                out.append(
                    ColumnCheck(
                        column=(prefix + "#entries") if prefix else "#entries",
                        pattern_properties=tuple(entries),
                    )
                )
        # propertyNames: subschema over every property NAME (draft-06+)
        pn = node.get("propertyNames") if self.draft_06_plus else None
        if isinstance(pn, (dict, bool)):
            subkw = self._scalar_subset(pn, f"/{prefix or ''} propertyNames")
            if subkw:
                self.props_paths.add(prefix)
                out.append(ColumnCheck(column=keys_col, property_names=subkw))
        # minProperties / maxProperties: property-count bounds (04+)
        if self._kw_ok("minProperties") and (
            isinstance(node.get("minProperties"), int)
            or isinstance(node.get("maxProperties"), int)
        ):
            self.props_paths.add(prefix)
            out.append(
                ColumnCheck(
                    column=keys_col,
                    min_properties=node.get("minProperties"),
                    max_properties=node.get("maxProperties"),
                )
            )
        # dependencies / dependentRequired / dependentSchemas —
        # draft-split like jsonschema ([verified] probes): legacy
        # `dependencies` is DROPPED from the 2019-09/2020-12 metas,
        # and the split keywords don't exist before 2019-09; compiling
        # either out of its draft would over-validate
        for dep_kw in ("dependencies", "dependentRequired", "dependentSchemas"):
            if (dep_kw == "dependencies") == self.draft_2019_plus:
                continue
            deps = node.get(dep_kw)
            if not isinstance(deps, dict):
                continue
            for trig_prop in sorted(deps):
                dep = deps[trig_prop]
                trig_path = _join_path(prefix, trig_prop)
                if isinstance(dep, list) and dep_kw != "dependentSchemas":
                    # required-form: trigger present → listed present
                    self._touch(trig_path)
                    for r in dep:
                        if not isinstance(r, str):
                            continue
                        rp = _join_path(prefix, r)
                        self._touch(rp)
                        out.append(
                            ColumnCheck(
                                column=rp,
                                dependent_on=trig_path,
                                dependent_reason=dep_kw,
                            )
                        )
                elif isinstance(dep, (dict, bool)) and dep_kw != "dependentRequired":
                    # schema-form: trigger present → parent validates
                    # against the subschema
                    self._touch(trig_path)
                    self._touch(prefix if prefix else "#root")
                    out.append(
                        CombinatorCheck(
                            column=prefix if prefix else "#root",
                            kind="dependentSchema",
                            branches=(
                                self._compile_branch(
                                    dep, prefix, base_uri, ref_chain
                                ),
                            ),
                            gate_member=trig_path,
                            reason=dep_kw,
                        )
                    )
                else:
                    self.warnings.append(
                        f"/{prefix}: malformed {dep_kw} entry "
                        f"{trig_prop!r}: {dep!r} dropped"
                    )
        if self.draft_level == 3 and "disallow" in node:
            # disallow: the instance must NOT match any listed type
            # name (strict draft-03 integer; reason `disallow`,
            # [verified] probes).  Schema-form entries warn.
            dis = node["disallow"]
            entries = (
                [dis] if isinstance(dis, str)
                else list(dis) if isinstance(dis, list) else []
            )
            names = [x for x in entries if isinstance(x, str)]
            rest = [x for x in entries if not isinstance(x, str)]
            if names:
                gate = prefix if prefix else "#root"
                self._touch(gate)
                if "any" in names:
                    branch: Tuple = ()  # matches everything → always fail
                else:
                    unknown = [x for x in names if x not in _JSON_TYPES]
                    if unknown:
                        # jsonschema Draft3 raises UnknownType when the
                        # disallow entry names no known type; the engine
                        # compiles the known entries and records the
                        # drop (never-silent-drop invariant)
                        self.warnings.append(
                            f"/{prefix}: disallow entries {unknown!r} name "
                            f"no known type (jsonschema raises UnknownType)"
                            f" — only partially enforced"
                        )
                    mapped = tuple(
                        "integer4" if x == "integer" else x
                        for x in names
                        if x in _JSON_TYPES
                    )
                    branch = (
                        ColumnCheck(
                            column=gate,
                            dtype=mapped[0] if len(mapped) == 1 else mapped,
                        ),
                    ) if mapped else None
                if branch is not None:
                    out.append(
                        CombinatorCheck(
                            column=gate,
                            kind="not",
                            branches=(branch,),
                            reason="disallow",
                        )
                    )
            if rest:
                self.warnings.append(
                    f"/{prefix}: schema-form disallow entries are not "
                    f"compiled — only partially enforced"
                )
        required = node.get("required")
        if isinstance(required, list):
            scope = prefix if prefix else "#root"
            # the parent's instance literal must exist for the vacuity
            # guard (required only applies to OBJECT instances)
            self._touch(scope)
            for r in required:
                if not isinstance(r, str):
                    continue
                p = _join_path(prefix, r)
                self._touch(p)
                out.append(
                    ColumnCheck(
                        column=p,
                        required=True,
                        required_scope=scope,
                    )
                )
        has_div3 = self.draft_level == 3 and isinstance(
            node.get("divisibleBy"), (int, float)
        )
        if not kw and not has_div3:
            return out
        # root-level keywords (type: object etc.) check the whole
        # document: the shredder emits its literal as column "#root"
        args: Dict[str, Any] = {"column": prefix if prefix else "#root"}
        if "type" in kw:
            t = kw["type"]
            ts = [t] if isinstance(t, str) else list(t)
            if all(x in _JSON_TYPES for x in ts):
                if self.draft_level < 6:
                    # drafts 03/04: strict int (1.0 is NOT integer)
                    ts = ["integer4" if x == "integer" else x for x in ts]
                args["dtype"] = ts[0] if len(ts) == 1 else tuple(ts)
            else:
                self.errors.append(f"{prefix}: unknown type {t!r}")
        if "enum" in kw:
            args["enum"] = tuple(kw["enum"])
        if "const" in kw:
            if kw["const"] is None:
                args["const_null"] = True
            else:
                args["const"] = kw["const"]
        if "pattern" in kw:
            args["pattern"] = kw["pattern"]
        # exclusiveMinimum/Maximum are draft-SPLIT by LEVEL, matching
        # jsonschema's validators ([verified]): under draft-03/04 any
        # TRUTHY exclusiveMinimum (the legacy `minimum` validator does
        # `schema.get("exclusiveMinimum", False)` — numerics count!)
        # tightens the paired bound to strict and has no standalone
        # effect; draft-06+ they are standalone numerics (the boolean
        # form is meta-rejected there)
        emin, emax = kw.get("exclusiveMinimum"), kw.get("exclusiveMaximum")
        if self.draft_level < 6:
            if "minimum" in kw:
                if emin:
                    args["exclusive_minimum"] = kw["minimum"]
                    # legacy validators report the strict bound under
                    # `minimum` — jsonschema Draft3/4 parity
                    args["legacy_exclusive_bounds"] = True
                else:
                    args["minimum"] = kw["minimum"]
            if "maximum" in kw:
                if emax:
                    args["exclusive_maximum"] = kw["maximum"]
                    args["legacy_exclusive_bounds"] = True
                else:
                    args["maximum"] = kw["maximum"]
        else:
            if "minimum" in kw:
                args["minimum"] = kw["minimum"]
            if emin is not None:
                args["exclusive_minimum"] = emin
            if "maximum" in kw:
                args["maximum"] = kw["maximum"]
            if emax is not None:
                args["exclusive_maximum"] = emax
        if "minLength" in kw:
            args["min_length"] = kw["minLength"]
        if "maxLength" in kw:
            args["max_length"] = kw["maxLength"]
        if "multipleOf" in kw:
            args["multiple_of"] = kw["multipleOf"]
        if self.draft_level == 3 and isinstance(
            node.get("divisibleBy"), (int, float)
        ):
            # draft-03 spelling of multipleOf, reported as divisibleBy
            args["multiple_of"] = node["divisibleBy"]
            args["multiple_of_reason"] = "divisibleBy"
        if "format" in kw:
            from .checks.row_checks import FORMATS

            if kw["format"] in self.formats or kw["format"] in FORMATS:
                args["format"] = kw["format"]
            # unknown formats are annotations per spec — ignored
        if "minItems" in kw or "maxItems" in kw or kw.get("uniqueItems") is True:
            arr_path = (prefix + "[]") if prefix else "#root[]"
            self._touch(arr_path)
            out.append(
                ColumnCheck(
                    column=arr_path,
                    min_items=kw.get("minItems"),
                    max_items=kw.get("maxItems"),
                    unique_items=kw.get("uniqueItems") is True,
                )
            )
        if len(args) > 1:
            self._touch(args["column"])
            out.append(ColumnCheck(**args))
        return out

    def _compile_triggers(self, node: Mapping, prefix: str) -> None:
        for trig in KEY_TRIGGERS:
            if trig not in node:
                continue
            decl = node[trig]
            err = _validate_key_decl(decl)
            if err:
                self.errors.append(f"{trig} at /{prefix}: {err}")
                continue
            members = self._key_members(decl, prefix)
            if members is None:
                continue
            for m in members:
                self._touch(m, "values")
            ks = KeySpec(
                members=tuple(members),
                name=decl.get("name") if isinstance(decl, dict) else None,
                limit_scope=bool(decl.get("limit_scope", False))
                if isinstance(decl, dict)
                else False,
            )
            getattr(
                self, {"unique": "unique", "primary_key": "primary_keys", "index": "indexes"}[trig]
            ).append(ks)
        for trig in REF_TRIGGERS:
            if trig not in node:
                continue
            decl = node[trig]
            err = _validate_fk_decl(decl)
            if err:
                self.errors.append(f"{trig} at /{prefix}: {err}")
                continue
            for entry in decl:
                ref = entry.get("schema_id")
                if not ref:
                    # missing schema_id → self-reference (fk_check.py:174-175)
                    abs_ref = self.uri
                elif urlsplit(self.uri).scheme:
                    # urijoin only when the referring URI is absolute
                    # (fk_check.py:176-179); plain ids are used verbatim
                    abs_ref, _ = urldefrag(urljoin(self.uri, ref))
                else:
                    abs_ref = ref
                if "[]" in prefix:
                    members = tuple(
                        f"{prefix}#e#{m}" for m in entry["members"]
                    )
                else:
                    members = tuple(
                        _join_path(prefix, m) for m in entry["members"]
                    )
                for m in members:
                    self._touch(m, "values")
                fk = ForeignKeySpec(
                    members=members,
                    ref_table=abs_ref,
                    refers_to=entry.get("refers_to"),
                )
                (self.foreign_keys if trig == "foreign_keys" else self.join_keys).append(fk)

    # -- walk -----------------------------------------------------------------

    def walk(self, node: Any, prefix: str = "", base_uri: Optional[str] = None,
             ref_chain: Tuple = ()) -> None:
        if not isinstance(node, dict):
            return
        base_uri = base_uri or self.uri
        # $ref / $dynamicRef / $recursiveRef inline their (lexically)
        # resolved targets; 2019-09+ keeps walking the node's own
        # sibling keywords afterwards while drafts ≤07 stop (jsonschema
        # parity, [verified] probes).  Cycles skip (reference detects
        # and skips, extensible_validator.py:654-660).
        exps, siblings = self._ref_expansions(node, prefix, base_uri, ref_chain)
        for target, new_base, new_chain in exps:
            self.walk(target, prefix, new_base, new_chain)
        if not siblings:
            return
        self._compile_triggers(node, prefix)
        self.checks.extend(self._node_checks(node, prefix, base_uri, ref_chain))
        props = node.get("properties")
        if isinstance(props, dict):
            for name, child in props.items():
                child_path = _join_path(prefix, name)
                if (
                    self.draft_level == 3
                    and isinstance(child, dict)
                    and child.get("required") is True
                ):
                    # draft-03 boolean `required` lives ON the property
                    # subschema and is read by the PARENT's properties
                    # validator ([verified] Draft3 probe) — compiled at
                    # the descent point so allOf-branch/`$ref` shapes
                    # jsonschema does NOT enforce stay unenforced
                    if "[]" in prefix:
                        self._touch(prefix if prefix else "#root")
                        self._touch(child_path)
                        self.checks.append(
                            ColumnCheck(
                                column=child_path,
                                element_required_scope=prefix,
                            )
                        )
                    else:
                        scope = prefix if prefix else "#root"
                        self._touch(scope)
                        self._touch(child_path)
                        self.checks.append(
                            ColumnCheck(
                                column=child_path,
                                required=True,
                                required_scope=scope,
                            )
                        )
                self.walk(child, child_path, base_uri, ref_chain)
        items = node.get("items")
        if isinstance(items, dict):
            el_prefix = (prefix + "[]") if prefix else "#root[]"
            if self.draft_2020 and isinstance(node.get("prefixItems"), list):
                # 2020-12 items-after-prefixItems applies only past the
                # prefix: tail checks compile in _node_checks; only
                # TRIGGERS walk the subschema here
                self._walk_triggers_only(
                    items, el_prefix, base_uri, ref_chain
                )
            else:
                self.walk(items, el_prefix, base_uri, ref_chain)
        # allOf branches apply conjunctively at the same location —
        # walk them fully (checks + triggers).  anyOf/oneOf/not
        # branches are DISJUNCTIVE for keywords: each branch compiles
        # to a conjunctive Column and the CombinatorCheck OR/XOR/NOT-
        # combines them (_combinator_checks) — full jsonschema verdict
        # parity.  The reference's custom trigger callbacks ALSO
        # execute per branch during validation (jsonschema evaluates
        # every branch, including `not` via is_valid→iter_errors), so
        # key/FK TRIGGERS inside them register; mirror that by walking
        # the branches in triggers-only mode.
        for branch in node.get("allOf") or []:
            self.walk(branch, prefix, base_uri, ref_chain)
        for branch in self._extends_branches(node):
            self.walk(branch, prefix, base_uri, ref_chain)
        self.checks.extend(
            self._combinator_checks(node, prefix, base_uri, ref_chain)
        )
        for comb in ("anyOf", "oneOf"):
            for branch in node.get(comb) or []:
                self._walk_triggers_only(branch, prefix, base_uri, ref_chain)
        if isinstance(node.get("not"), dict):
            self._walk_triggers_only(node["not"], prefix, base_uri, ref_chain)

    def _walk_triggers_only(
        self, node: Any, prefix: str, base_uri: Optional[str], ref_chain: Tuple
    ) -> None:
        if not isinstance(node, dict):
            return
        base_uri = base_uri or self.uri
        exps, siblings = self._ref_expansions(node, prefix, base_uri, ref_chain)
        for target, new_base, new_chain in exps:
            self._walk_triggers_only(target, prefix, new_base, new_chain)
        if not siblings:
            return
        self._compile_triggers(node, prefix)
        props = node.get("properties")
        if isinstance(props, dict):
            for name, child in props.items():
                self._walk_triggers_only(
                    child, _join_path(prefix, name), base_uri, ref_chain
                )
        items = node.get("items")
        if isinstance(items, dict):
            self._walk_triggers_only(
                items, (prefix + "[]") if prefix else "#root[]",
                base_uri, ref_chain,
            )
        for comb in ("allOf", "anyOf", "oneOf"):
            for branch in node.get(comb) or []:
                self._walk_triggers_only(branch, prefix, base_uri, ref_chain)
        for branch in self._extends_branches(node):
            self._walk_triggers_only(branch, prefix, base_uri, ref_chain)


def _dedup(seq: list) -> list:
    """Order-preserving dedup (a $ref diamond / combinator overlap can
    visit the same declaration twice; the reference's id()-keyed worlds
    collapse those too)."""
    seen = set()
    out = []
    for x in seq:
        if x not in seen:
            seen.add(x)
            out.append(x)
    return out


def compile_schema(
    uri: str,
    schema: Mapping,
    cache: Mapping[str, Mapping],
    file: str = "(inline)",
    formats: Optional[Mapping] = None,
) -> Tuple[Optional[CompiledSchema], List[SchemaIssue]]:
    comp = _Compiler(uri, schema, cache, formats=formats)
    comp.walk(schema)
    for attr in ("unique", "primary_keys", "indexes", "foreign_keys", "join_keys"):
        setattr(comp, attr, _dedup(getattr(comp, attr)))
    # a node visited along several walk paths (combinator branch +
    # triggers-only pass, $ref diamonds) would record the same warning
    # repeatedly — one trace per distinct issue is enough
    comp.warnings = _dedup(comp.warnings)
    comp.errors = _dedup(comp.errors)
    issues = [SchemaIssue(file, "schema_error", e) for e in comp.errors]
    issues.extend(
        SchemaIssue(file, "schema_warning", w, severity="warning")
        for w in comp.warnings
    )
    if comp.errors:
        return None, issues
    spec = TableSpec(
        name=uri,
        row_id="__file",
        scope_col="__file",
        checks=comp.checks,
        unique=comp.unique,
        primary_keys=comp.primary_keys,
        indexes=comp.indexes,
        foreign_keys=comp.foreign_keys,
        join_keys=comp.join_keys,
        canonical_json=True,
        custom_formats=dict(formats) if formats else None,
    )
    return (
        CompiledSchema(
            uri=uri,
            file=file,
            schema=schema,
            schema_hash=normalized_json_hash(schema),
            table_spec=spec,
            instance_paths=tuple(sorted(comp.instance_paths)),
            value_paths=tuple(sorted(comp.value_paths)),
            props_paths=tuple(sorted(comp.props_paths)),
            entries_paths=tuple(sorted(comp.entries_paths)),
            elem_props_paths=tuple(sorted(comp.elem_props_paths)),
            elem_entries_paths=tuple(sorted(comp.elem_entries_paths)),
            warnings=tuple(comp.warnings),
            ref_cache=cache,
        ),
        issues,
    )


def export_resolved(
    context_uri: str, schema: Any, cache: Mapping[str, Mapping],
    _chain: frozenset = frozenset(),
) -> Any:
    """Consolidated-schema export: inline ``$ref``s for downstream
    consumers — exact semantics of the reference's
    ``export_resolved_references``
    (extend_validator_helpers.py:405-471, exposed via
    ``getValidSchemas(do_resolve=True)``,
    extensible_validator.py:743-754), including its quirks:

    - a dict containing ``$ref`` is REPLACED WHOLLY by the (recursively
      resolved) target — sibling keys are discarded;
    - recursion is chain-scoped on the context URI: re-entering a
      context returns the raw target unresolved (the reference prints
      ``RECURSION DETECTED`` and stops descending);
    - a child resolution that comes back falsy (empty dict) or
      unchanged does NOT replace the original value
      (``if resolved_ref and resolved_ref != value``).

    Raises ValueError when a $ref cannot be resolved (⇔ the
    reference's ``Unable to finish resolution`` exception)."""
    if isinstance(schema, dict):
        if "$ref" in schema:
            ref = schema["$ref"]
            target, fragment = urldefrag(urljoin(context_uri, ref))
            root = cache.get(target if target else urldefrag(context_uri)[0])
            if root is None:
                raise ValueError(
                    f"Unable to finish resolution (related to {context_uri}): "
                    f"$ref {ref!r}"
                )
            try:
                node = _pointer_walk(root, fragment) if fragment else root
            except (KeyError, IndexError, ValueError, TypeError):
                raise ValueError(
                    f"Unable to finish resolution (related to {context_uri}): "
                    f"fragment of $ref {ref!r}"
                )
            if context_uri in _chain:
                return node
            new_ctx = target if target else context_uri
            if fragment:
                new_ctx = f"{new_ctx}#{fragment}"
            return export_resolved(new_ctx, node, cache, _chain | {context_uri})
        out = dict(schema)
        for k, v in schema.items():
            rv = export_resolved(context_uri, v, cache, _chain)
            if rv and rv != v:
                out[k] = rv
        return out
    if isinstance(schema, list):
        out_l = list(schema)
        for i, v in enumerate(schema):
            rv = export_resolved(context_uri, v, cache, _chain)
            if rv and rv != v:
                out_l[i] = rv
        return out_l
    return schema


def export_resolved_schemas(
    registry: Mapping[str, "CompiledSchema"]
) -> Dict[str, Any]:
    """{uri: $ref-inlined schema} for every compiled schema — the
    registry-level analogue of ``getValidSchemas(do_resolve=True)``
    (SURVEY §3 entry point 3)."""
    cache = {uri: cs.schema for uri, cs in registry.items()}
    return {
        uri: export_resolved(uri, cs.schema, cache)
        for uri, cs in registry.items()
    }


def normalize_custom_formats(custom_formats) -> Dict[str, Any]:
    """User formats → a {name: regex-string | Column→Column callable}
    overlay mapping (⇔ the reference's ``customFormats`` constructor
    parameter, extensible_validator.py:77-84,117-138).  Accepts:

    - a mapping {name: regex-string | Column→Column callable}, or
    - an iterable of objects following the reference's protocol:
      ``FormatName`` attribute + ``IsCorrectFormat(value)`` callable
      (a plain per-value Python predicate).  Those compile to an
      Arrow-batched pandas UDF so the engine stays vectorized — never
      row-at-a-time Python.

    The overlay is SCOPED to one compilation (TableSpec.custom_formats
    → row_checks.compile_battery(formats=...)), matching the
    reference's per-ExtensibleValidator-instance scoping — it never
    mutates the process-global FORMATS registry.
    """
    out: Dict[str, Any] = {}
    if hasattr(custom_formats, "items"):
        from .spec import SpecError

        for name, checker in custom_formats.items():
            if not name or not isinstance(name, str):
                raise SpecError(
                    f"format name must be a non-empty string, got {name!r}"
                )
            if not (isinstance(checker, str) or callable(checker)):
                raise SpecError(
                    f"format {name!r}: checker must be a regex or callable"
                )
            out[name] = checker
        return out
    for fmt in custom_formats:
        name = getattr(fmt, "FormatName", None)
        is_ok = getattr(fmt, "IsCorrectFormat", None)
        if not name or not callable(is_ok):
            raise ValueError(
                f"custom format {fmt!r} needs FormatName + IsCorrectFormat "
                f"(reference protocol, extensible_validator.py:77-84)"
            )

        def _column_pred(col, _fn=is_ok):
            from pyspark.sql import functions as F
            from pyspark.sql.functions import pandas_udf

            @pandas_udf("boolean")
            def _batch(s):
                return s.map(lambda v: bool(_fn(v)) if v is not None else True)

            return F.coalesce(_batch(col), F.lit(True))

        # the raw per-value predicate rides along so the library
        # fallback can register it on its FormatChecker
        # (library_fallback.build_validator ⇔ the reference's
        # customFormatCheckerInstance.checks registration)
        _column_pred.py_pred = is_ok
        out[name] = _column_pred
    return out


def register_custom_formats(custom_formats) -> None:
    """PROCESS-GLOBAL format registration (explicit opt-in): writes the
    normalized formats into row_checks.FORMATS for every later
    compilation in this process.  Prefer
    ``load_schemas(custom_formats=...)``, which scopes the formats to
    that compilation only (the reference scopes customFormats per
    validator instance)."""
    from .checks.row_checks import register_format

    for name, checker in normalize_custom_formats(custom_formats).items():
        register_format(name, checker)


# in-memory load_schemas memo (r08) — see the docstring note
_LOAD_MEMO: Dict[str, Tuple[Dict[str, "CompiledSchema"], list]] = {}


def load_schemas(
    path_or_schemas,
    custom_formats=None,
) -> Tuple[Dict[str, CompiledSchema], List[SchemaIssue]]:
    """Load + compile a schema directory (or an in-memory list of
    ``(file, schema_dict)``) into a registry {uri: CompiledSchema}.

    Mirrors the reference's load pipeline (extensible_validator.py
    :233-365): parse → draft check → $id check → dup-id check →
    meta-fragment validation → compile.  Issues carry the reference's
    reason codes.  ``custom_formats`` is SCOPED to this load: the
    normalized overlay rides each CompiledSchema's
    ``table_spec.custom_formats`` and shadows the global FORMATS
    registry only for these schemas' batteries — no process-global
    mutation (⇔ the reference's per-instance customFormats,
    extensible_validator.py:77-84,117-138).

    r08: in-memory schema lists with no custom-format overlay are
    MEMOIZED on their canonical JSON — meta-validation + compile is a
    pure function of the schema content (CompiledSchema is plain
    Python, no JVM handles), and a long-running validator compiles
    each schema once.  Directory loads are filesystem-dependent and
    never memoized."""
    memo_key = None
    if custom_formats is None and not isinstance(path_or_schemas, str):
        try:
            memo_key = json.dumps(
                list(path_or_schemas), sort_keys=True
            )
        except (TypeError, ValueError):
            memo_key = None
        if memo_key is not None and memo_key in _LOAD_MEMO:
            reg, iss = _LOAD_MEMO[memo_key]
            return dict(reg), list(iss)
    formats = (
        normalize_custom_formats(custom_formats)
        if custom_formats is not None
        else None
    )
    raw: List[Tuple[str, Any]] = []
    issues: List[SchemaIssue] = []
    if isinstance(path_or_schemas, str):
        for f in scan_files(path_or_schemas):
            try:
                raw.append((f, parse_json_or_yaml(f)))
            except ValueError as e:
                issues.append(SchemaIssue(f, "fatal", str(e)))
    else:
        raw = list(path_or_schemas)

    registry: Dict[str, CompiledSchema] = {}
    cache: Dict[str, Mapping] = {}
    pending: List[Tuple[str, str, Mapping]] = []
    for f, schema in raw:
        if not isinstance(schema, dict):
            issues.append(SchemaIssue(f, "schema_error", "schema is not an object"))
            continue
        draft = schema.get("$schema")
        if draft is None:
            issues.append(
                SchemaIssue(f, "no_schema", "JSON Schema attribute '$schema' is missing")
            )
            continue
        if draft not in KNOWN_DRAFTS:
            issues.append(
                SchemaIssue(f, "schema_unknown", f"'$schema' id {draft} not acknowledged")
            )
            continue
        uri = schema.get("$id") or schema.get("id")
        if uri is None:
            issues.append(SchemaIssue(f, "no_id", "'$id'/'id' is missing"))
            continue
        uri, _ = urldefrag(uri)
        if uri in cache:
            issues.append(SchemaIssue(f, "dup_id", f"duplicate schema id {uri}"))
            continue
        cache[uri] = schema
        pending.append((f, uri, schema))

    for f, uri, schema in pending:
        compiled, c_issues = compile_schema(
            uri, schema, cache, file=f, formats=formats
        )
        issues.extend(c_issues)
        if compiled is not None:
            registry[uri] = compiled
    if memo_key is not None:
        if len(_LOAD_MEMO) > 32:  # bound driver memory
            _LOAD_MEMO.clear()
        _LOAD_MEMO[memo_key] = (dict(registry), list(issues))
    return registry, issues
