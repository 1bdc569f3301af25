"""Document shredding: dynamic JSON documents → a flat Spark table of
canonical JSON literal columns, ready for the engine's json-literal
mode (spec.TableSpec.canonical_json).

Two column families per CompiledSchema (schemas.py):

- INSTANCE columns (named exactly the path): the canonical JSON
  literal of the instance at that path — what jsonschema keywords
  validate.  A path ending in ``[]`` yields the array of element
  literals (for minItems/maxItems).  Absent → NULL; JSON null →
  ``null`` (presence and null stay distinct, unlike typed columns).
- VALUE-LIST columns (named ``<path>#v``): ``array<string>`` of the
  MaterializeJPath value list (index_check.py:194-244 — dotted steps,
  one-level array flattening per step, ``[i]`` indexing, silently
  empty on missing steps).  Key/FK members read these; non-atomic
  values canonicalize to sorted-key JSON exactly like the reference
  (:240-242).

Shredding is map-only: the distributed path is mapInPandas over
(file, json-text) rows — Arrow-batched, no shuffle, linear scans only,
so it holds at any scale.  The driver-side helper exists for the tiny
reference test suites.
"""

from __future__ import annotations

import json
import re
from typing import Any, Iterable, List, Optional, Sequence, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from .schemas import CompiledSchema

ATOMIC = (int, bytes, str, float, bool, type(None))  # index_check.py:10

# EXACT JStepPat (index_check.py:191) including its quirk: the index
# alternation is ``0|[1-9][0-9]+`` — single-digit indices 1-9 NEVER
# match ("a[0]" and "a[10]" are array steps, but "a[3]" parses as a
# plain property literally named "a[3]", silently yielding no values
# on normal documents).  [verified] by tests/test_jpath_property.py
# against the reference's own MaterializeJPath.
_STEP_PAT = re.compile(r"^([^\[]+)\[(0|[1-9][0-9]+)?\]$")


def _canon(v: Any) -> str:
    """Canonical literal: compact dumps for atomics, sorted-key dumps
    for objects/arrays (index_check.py:240-242 / GenKeyStrings).
    ensure_ascii=False so Python-side literals byte-match Spark's
    to_json (raw UTF-8) — keys from shredded tables, typed tables, and
    providers must all join.  Doubles: Python's repr form here IS the
    canonical rendering; typed columns match it via
    keys.py_double_repr (round 6 — previously a documented '1e+20' vs
    '1.0E20' divergence; now property-tested identical in
    tests/test_double_keys.py)."""
    return json.dumps(v, sort_keys=True, separators=(",", ":"),
                      ensure_ascii=False)


def materialize_jpath(doc: Any, path: str) -> List[Any]:
    """Exact MaterializeJPath semantics (index_check.py:194-244):
    NOTE arrays flatten one level per step even WITHOUT an explicit
    ``[]`` marker, and ``x[]`` on a non-array appends the scalar —
    the marker only matters for ``[i]`` indexing."""
    objectives: List[Any] = [doc]
    steps = path.split(".") if path not in (".", "") else [None]
    for step in steps:
        new: List[Any] = []
        array_index: Optional[int] = None
        name = step
        if step in ("[]", "#root[]"):
            # the document-root element step (root-level `items`):
            # flatten the objective itself
            name = None
        elif step is not None:
            m = _STEP_PAT.search(step)
            if m is not None:
                if m.group(2) is not None:
                    array_index = int(m.group(2))
                name = m.group(1)
        for obj in objectives:
            if name is not None:
                if not (isinstance(obj, dict) and name in obj):
                    continue
                value = obj[name]
            else:
                value = obj
            if isinstance(value, (list, tuple)):
                if array_index is not None:
                    if 0 <= array_index < len(value):
                        new.append(value[array_index])
                else:
                    new.extend(value)
            else:
                new.append(value)
        objectives = new
    return objectives


def instance_at(doc: Any, path: str) -> Tuple[bool, Any]:
    """(present, value) of the single instance at a dotted/indexed
    path — NO array flattening (this is what jsonschema keywords see).
    A ``[]`` step maps over elements (used for element-array columns).
    """
    if path in (".", ""):
        return True, doc
    node = doc
    steps = path.split(".")
    for i, step in enumerate(steps):
        if step in ("[]", "#root[]"):
            # the document-root element step (root-level `items`)
            if not isinstance(node, list):
                return False, None
            rest = ".".join(steps[i + 1:])
            if not rest:
                return True, node
            out = []
            for el in node:
                ok, v = instance_at(el, rest)
                if ok:
                    out.append(v)
            return True, out
        m = _STEP_PAT.search(step)
        if m is not None and m.group(2) is None:
            # elements step: collect element instances of the rest
            name = m.group(1)
            if not (isinstance(node, dict) and name in node):
                return False, None
            arr = node[name]
            if not isinstance(arr, list):
                return False, None
            rest = ".".join(steps[i + 1:])
            if not rest:
                return True, arr
            out = []
            for el in arr:
                ok, v = instance_at(el, rest)
                if ok:
                    out.append(v)
            return True, out
        if m is not None:
            name, idx = m.group(1), int(m.group(2))
            if not (isinstance(node, dict) and name in node):
                return False, None
            arr = node[name]
            if not isinstance(arr, list) or not (0 <= idx < len(arr)):
                return False, None
            node = arr[idx]
        else:
            if not (isinstance(node, dict) and step in node):
                return False, None
            node = node[step]
    return True, node


def flat_instances(doc: Any, path: str) -> List[Any]:
    """All LEAF instances at a trailing-``[]`` path with ≥2 array
    levels (``a[].b[]``, ``a[][]``, ``#root[][]``), FILTERED: absent
    members and non-array nodes contribute nothing.  For per-element
    scalar checks and combinators this filtered collection is
    verdict-equivalent to an aligned one — every dropped entry is a
    node where jsonschema's ``items``/``properties`` descent is
    vacuous — which is what lets nested-array keywords compile to the
    same flat forall as the one-level case."""
    segs = path.split("[]")
    if segs[-1] != "":
        raise ValueError(f"flat_instances needs a trailing-[] path: {path}")
    cur: List[Any] = [doc]
    for seg in segs[:-1]:
        seg = seg.lstrip(".")
        nxt: List[Any] = []
        for node in cur:
            if seg in ("", "#root"):
                ok, val = True, node
            else:
                ok, val = instance_at(node, seg)
            if ok and isinstance(val, list):
                nxt.extend(val)
        cur = nxt
    return cur


def shred_record(doc: Any, compiled: CompiledSchema) -> dict:
    """One document → {column name: literal | [literals] | None}."""
    out: dict = {}
    for p in compiled.instance_paths:
        if p.endswith("[]") and p.count("[]") >= 2:
            # nested-array leaf collection (flat, filtered — see
            # flat_instances): never NULL, empty when nothing matches
            out[p] = [_canon(x) for x in flat_instances(doc, p)]
            continue
        if p == "#root":
            present, v = True, doc
        elif p == "#root[]":
            present, v = True, doc  # root element array (root minItems)
        else:
            present, v = instance_at(doc, p)
        if not present:
            out[p] = None
        elif p.endswith("[]"):
            out[p] = [_canon(x) for x in v] if isinstance(v, list) else None
        elif "[]" in p:
            # "loc[].rel": ALIGNED per-element sub-instance literals —
            # entry i is element i's `rel` literal or None when absent,
            # so per-element required/scalar checks can zip with the
            # element array (one array level supported by the compiler)
            loc, rel = p.split("[]", 1)
            rel = rel.lstrip(".")
            okl, arr = instance_at(doc, loc + "[]")
            if not okl or not isinstance(arr, list):
                out[p] = None
            else:
                vals = []
                for el in arr:
                    ok_el, sub = instance_at(el, rel)
                    vals.append(_canon(sub) if ok_el else None)
                out[p] = vals
        else:
            out[p] = _canon(v)
    for p in compiled.value_paths:
        if "#e#" in p:
            # element-grouped member (trigger under an array location):
            # one inner value-list per element instance, so the
            # atomic-vs-wrapped key decision happens per element like
            # the reference's per-instance keyword callback
            loc, rel = p.split("#e#", 1)
            out[p + "#v"] = [
                [
                    _canon(v) if isinstance(v, ATOMIC)
                    else json.dumps(v, sort_keys=True, ensure_ascii=False)
                    for v in materialize_jpath(el, rel)
                ]
                for el in materialize_jpath(doc, loc)
            ]
            continue
        vals = materialize_jpath(doc, p)
        out[p + "#v"] = [
            _canon(v) if isinstance(v, ATOMIC)
            else json.dumps(v, sort_keys=True, ensure_ascii=False)
            for v in vals
        ]
    for p in compiled.props_paths:
        present, v = (True, doc) if p == "" else instance_at(doc, p)
        out[p + "#keys"] = (
            sorted(v.keys()) if present and isinstance(v, dict) else None
        )
    for p in compiled.elem_props_paths:
        # per-ELEMENT property-name arrays ("a[]#keys"): inner NULL for
        # non-object elements (items-level object keywords are vacuous
        # there), whole column NULL when the array itself is absent
        ok_arr, arr = instance_at(doc, p)
        out[p + "#keys"] = (
            [
                sorted(el.keys()) if isinstance(el, dict) else None
                for el in arr
            ]
            if ok_arr and isinstance(arr, list)
            else None
        )
    for p in compiled.elem_entries_paths:
        # per-ELEMENT (name → canonical literal) maps ("a[]#entries")
        ok_arr, arr = instance_at(doc, p)
        out[p + "#entries"] = (
            [
                {k: _canon(x) for k, x in el.items()}
                if isinstance(el, dict)
                else None
                for el in arr
            ]
            if ok_arr and isinstance(arr, list)
            else None
        )
    for p in compiled.entries_paths:
        present, v = (True, doc) if p == "" else instance_at(doc, p)
        out[p + "#entries"] = (
            {k: _canon(x) for k, x in v.items()}
            if present and isinstance(v, dict)
            else None
        )
    return out


def _shred_schema(
    compiled: CompiledSchema,
    corrupt_flag: bool = False,
    keep_raw: bool = False,
) -> T.StructType:
    fields = [T.StructField("__file", T.StringType())]
    if corrupt_flag:
        fields.append(T.StructField("__corrupt", T.BooleanType()))
    if keep_raw:
        # raw document text for the library-fallback escape hatch
        # (library_fallback.library_errors_column reads __raw)
        fields.append(T.StructField("__raw", T.StringType()))
    for p in compiled.instance_paths:
        # element arrays AND aligned per-element sub-instance arrays
        t = T.ArrayType(T.StringType()) if "[]" in p else T.StringType()
        fields.append(T.StructField(p, t))
    for p in compiled.value_paths:
        t = (
            T.ArrayType(T.ArrayType(T.StringType()))
            if "#e#" in p
            else T.ArrayType(T.StringType())
        )
        fields.append(T.StructField(p + "#v", t))
    for p in compiled.props_paths:
        fields.append(T.StructField(p + "#keys", T.ArrayType(T.StringType())))
    for p in compiled.elem_props_paths:
        fields.append(
            T.StructField(
                p + "#keys", T.ArrayType(T.ArrayType(T.StringType()))
            )
        )
    for p in compiled.elem_entries_paths:
        fields.append(
            T.StructField(
                p + "#entries",
                T.ArrayType(T.MapType(T.StringType(), T.StringType())),
            )
        )
    for p in compiled.entries_paths:
        # patternProperties reads (name → canonical value literal)
        fields.append(
            T.StructField(p + "#entries", T.MapType(T.StringType(), T.StringType()))
        )
    return T.StructType(fields)


def shred_documents(
    spark: SparkSession,
    docs: Sequence[Tuple[str, Any]],
    compiled: CompiledSchema,
    keep_raw: bool = False,
) -> DataFrame:
    """Driver-side shredder for in-memory documents (the reference
    test-suite scale).  docs: [(file, parsed document)].
    ``keep_raw``: carry each document's JSON serialization in a
    ``__raw`` column (the library-fallback input)."""
    rows = []
    for fname, doc in docs:
        rec = shred_record(doc, compiled)
        rec["__file"] = fname
        if keep_raw:
            rec["__raw"] = json.dumps(doc, ensure_ascii=False)
        rows.append(rec)
    schema = _shred_schema(compiled, keep_raw=keep_raw)
    return spark.createDataFrame(
        [tuple(r.get(f.name) for f in schema.fields) for r in rows], schema
    )


def shred_json_strings(
    df: DataFrame,
    compiled: CompiledSchema,
    file_col: str = "file",
    json_col: str = "json",
    keep_raw: bool = False,
) -> DataFrame:
    """Distributed shredder: (file, json text) rows → shredded table.
    mapInPandas (Arrow-batched), map-only — the scale path for
    validating dynamic JSON documents stored one-per-row.
    ``keep_raw``: pass the input text through as ``__raw`` (the
    library-fallback input)."""
    import pandas as pd

    schema = _shred_schema(compiled, corrupt_flag=True, keep_raw=keep_raw)
    names = [f.name for f in schema.fields]

    def shred_batches(batches: Iterable["pd.DataFrame"]) -> Iterable["pd.DataFrame"]:
        for pdf in batches:
            out = {n: [] for n in names}
            for fname, text in zip(pdf[file_col], pdf[json_col]):
                # distinguish the VALID document `null` (shreds like
                # any non-object: root literal 'null') from a parse
                # failure (all-NULL row + __corrupt=True, so callers
                # can emit the reference's 'fatal' instead of letting
                # vacuous checks pass garbage)
                try:
                    doc = json.loads(text)
                    parsed = True
                except (json.JSONDecodeError, TypeError):
                    parsed = False
                rec = shred_record(doc, compiled) if parsed else {}
                out["__file"].append(fname)
                out["__corrupt"].append(not parsed)
                if keep_raw:
                    out["__raw"].append(text)
                for n in names:
                    if n not in ("__file", "__corrupt", "__raw"):
                        out[n].append(rec.get(n))
            yield pd.DataFrame(out, columns=names)

    return df.mapInPandas(shred_batches, schema)
