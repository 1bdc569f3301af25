"""End-to-end runner for reference-style validation suites: a schema
directory + a document directory, exactly the reference CLI's shape
(``ejv schemadir docdir``) — the compatibility entry point a user of
inab/python-extended-json-schema-validator switches to.

Pipeline: load_schemas (schemas.py) → document scan with JSON→YAML
fallback (extensible_validator.py:1014-1053) → schema dispatch via the
``@schema``/``_schema``/``$schema`` probe (:113-115, :1130-1139, the
first probe that matches wins; overridable like --schema_id_path) →
shred per schema (docshred.py) → ONE ValidationEngine run across all
schemas (cross-schema FK/JK dims resolve within the run, exactly like
the reference's shared PK contexts) → per-file reasons + exit code.

Exit codes (⇔ __main__.py:302-471): 0 clean, 1 no schema loaded,
2 any document validation error.  (The reference resets a schema-load
exit 3 once documents validate — quirk preserved by simply not gating
on schema issues when ≥1 schema loaded.)

Inline key providers come from the reference's YAML config
(``primary_key.inline_provider`` — test-data/fk_with_inline/
ejv_inline.yaml), mapped to engine InlineProviders; duplicate
semantics follow ``allow_provider_duplicates`` (pk_check.py:216-240).
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field
from typing import Any, Dict, List, Mapping, Optional, Sequence, Tuple, Union

from pyspark.sql import SparkSession

from .docshred import shred_documents
from .engine import EngineConfig, ValidationEngine
from .providers import InlineProvider
from .schemas import (
    SCHEMA_KEY_PROBES,
    CompiledSchema,
    SchemaIssue,
    load_schemas,
    parse_json_or_yaml,
    scan_files,
)


@dataclass
class SuiteResult:
    exit_code: int
    per_file: Dict[str, List[str]]  # file → sorted violation reasons
    schema_issues: List[SchemaIssue] = field(default_factory=list)
    registry: Dict[str, CompiledSchema] = field(default_factory=dict)
    violations: Optional[object] = None  # the collected violation rows
    unmatched: List[str] = field(default_factory=list)  # files with no schema
    doc_schema: Dict[str, str] = field(default_factory=dict)  # file → schema uri

    def report(
        self,
        quiet: bool = False,
        error_report: bool = False,
        annot: Optional[Dict[str, Any]] = None,
        docs: Optional[Dict[str, Any]] = None,
        annotation: Optional[str] = None,
    ) -> list:
        """Reference-shaped JSON report (⇔ __main__.py:311-338 +
        ParsedContentEntry): leading entries one per loaded schema
        ``{file, uri, id_key, schema_hash, errors[, schema]}``
        (``quiet`` drops the schema body — the reference is quiet by
        DEFAULT and ``--verbose-report`` flips it,
        reference __main__.py:196-202), then one entry per document
        ``{file, schema_id, schema_hash, errors: [{reason,
        description, path}]}``; ``error_report`` keeps only erroring
        entries (--error-report).

        ``docs`` ({file: parsed doc}): with ``quiet=False`` each doc
        entry embeds its parsed contents under ``json`` (⇔
        --verbose-report, reference __main__.py:421-424).
        ``annotation`` (a JSONPath): extracted from each SCHEMA body
        into that schema entry's ``annot`` (reference
        __main__.py:331-334) and — when ``annot`` wasn't precomputed —
        from each doc in ``docs`` (reference :418-421)."""
        out: list = []
        for uri in sorted(self.registry):
            cs = self.registry[uri]
            entry = {
                "file": cs.file,
                "uri": uri,
                "id_key": "$id",
                "schema_hash": cs.schema_hash,
                "errors": [],
            }
            if annotation is not None:
                # extracted from the schema BODY, before any quiet
                # deletion (reference order, __main__.py:331-336)
                found, val = extract_annotation(cs.schema, annotation)
                if found:
                    entry["annot"] = val
            if not quiet:
                entry["schema"] = cs.schema
            out.append(entry)
        if annot is None and annotation is not None and docs is not None:
            annot = {}
            for fname, doc in docs.items():
                found, val = extract_annotation(doc, annotation)
                if found:
                    annot[fname] = val
        fkmap: Dict[str, object] = {}
        for cs in self.registry.values():
            spec = cs.table_spec
            for kind, fks in (("fk", spec.foreign_keys), ("jk", spec.join_keys)):
                for fk in fks:
                    fkmap[f"{kind}:{spec.name}.{fk.label}"] = fk
        by_file: Dict[str, list] = {}
        for r in self.violations or []:
            by_file.setdefault(r.row_id, []).append(
                {
                    "reason": r.reason,
                    "description": _describe(r, fkmap),
                    "path": r.path if "path" in r.__fields__ else None,
                }
            )
        for fname in sorted(self.per_file):
            errs = by_file.get(fname, [])
            if "fatal" in self.per_file[fname]:
                errs = [
                    {"reason": "fatal", "description": "Unable to parse file",
                     "path": None}
                ] + errs
            # guess-mode failures are recorded only in per_file (no
            # violation rows exist) — surface them in the report too
            n_guess = self.per_file[fname].count("schema_error")
            if n_guess and not by_file.get(fname):
                errs = errs + [
                    {"reason": "schema_error",
                     "description": "validated against no loaded schema",
                     "path": None}
                ] * n_guess
            if error_report and not errs:
                continue
            uri = self.doc_schema.get(fname)
            cs = self.registry.get(uri) if uri else None
            entry = {
                "file": fname,
                "schema_id": uri,
                "schema_hash": cs.schema_hash if cs else None,
                "errors": errs,
            }
            # ⇔ --verbose-report (__main__.py:421-424): the parsed doc
            # contents ride under "json"; quiet (the default) omits it
            if not quiet and docs is not None and fname in docs:
                entry["json"] = docs[fname]
            # ⇔ --annotation (__main__.py:418-421): first JSONPath
            # match per DOCUMENT entry lands under the "annot" key;
            # no match → no key
            if annot is not None and fname in annot:
                entry["annot"] = annot[fname]
            out.append(entry)
        return out


def extract_annotation(doc: Any, path: str) -> Tuple[bool, Any]:
    """Driver-side annotation extraction for the CLI report
    (⇔ --annotation with jsonpath-ng, reference __main__.py:340-345,
    418-421).  Supports the dotted/indexed subset this engine compiles
    everywhere else (`$.a.b`, `$._id`, `a.b`, `a[0].c`); returns
    (found, value) so a missing member differs from a None value."""
    p = path[2:] if path.startswith("$.") else path.lstrip("$")
    cur = doc
    if not p:
        return False, None
    for raw in p.split("."):
        m = re.match(r"^([^\[\]]*)((\[\d+\])*)$", raw)
        if not m:
            return False, None
        name, idxs = m.group(1), re.findall(r"\[(\d+)\]", raw)
        if name:
            if not isinstance(cur, Mapping) or name not in cur:
                return False, None
            cur = cur[name]
        for i in idxs:
            i = int(i)
            if not isinstance(cur, (list, tuple)) or i >= len(cur):
                return False, None
            cur = cur[i]
    return True, cur


def _describe(r, fkmap: Mapping) -> str:
    """Reference-template violation descriptions (byte-exact parity is
    impossible — the reference embeds id()-random names for unnamed
    keys and the mutable survivor file set — but the message SHAPES
    match: unique_check.py:137-146, fk_check.py:436-449,469-476)."""
    cid = r.constraint_id
    obs = r.observed_value
    if r.reason in ("dup_unique", "dup_pk"):
        trigger = "unique" if r.reason == "dup_unique" else "primary_key"
        label = cid.split(":", 1)[1] if ":" in cid else cid
        return (
            f"Duplicated {trigger} value for UK {label} -=> {obs} <=-  "
            f"(got from {r.path})"
        )
    fk = fkmap.get(cid)
    if r.reason == "stale_fk" and fk is not None:
        which = (
            "primary key " + fk.refers_to if fk.refers_to else "any primary key"
        )
        return (
            f"Unmatching FK ({obs}) in {r.row_id} to schema "
            f"{fk.ref_table} ({which})"
        )
    if r.reason in ("dangling_fk", "dangling_jk") and fk is not None:
        return (
            f"No available documents from {fk.ref_table} schema, "
            f"required by {r.row_id}"
        )
    return f"{cid}: {obs!r}"


def scan_documents(
    doc_dir: str, iterate_over_arrays: bool = False
) -> List[Tuple[str, Any, Optional[str]]]:
    """(file, parsed doc | None, parse error | None), sorted by path —
    sorting replaces the reference's os.listdir order so duplicate
    survivors are deterministic (min file wins both here and when the
    differential harness feeds the reference the same sorted list).

    ``iterate_over_arrays`` (⇔ --iter-arrays): a file holding a JSON
    array yields one entry per element named ``file [i]``
    (extensible_validator.py:976-1013)."""
    out = []
    for f in scan_files(doc_dir):
        try:
            doc = parse_json_or_yaml(f)
        except ValueError as e:
            out.append((f, None, str(e)))
            continue
        if iterate_over_arrays and isinstance(doc, list):
            out.extend((f"{f} [{i}]", elem, None) for i, elem in enumerate(doc))
        else:
            out.append((f, doc, None))
    return out


def dispatch_uri(doc: Any, probes: Sequence[str] = SCHEMA_KEY_PROBES) -> Optional[str]:
    """First matching schema-id probe (extensible_validator.py:
    113-115; dotted paths supported like --schema_id_path)."""
    if not isinstance(doc, dict):
        return None
    for probe in probes:
        node = doc
        ok = True
        for step in probe.split("."):
            if isinstance(node, dict) and step in node:
                node = node[step]
            else:
                ok = False
                break
        if ok and isinstance(node, str):
            return node
    return None


def providers_from_config(
    config: Optional[Mapping],
    schema_uris: Sequence[str] = (),
    opener=None,
    cache_dir: Optional[str] = None,
    cache_read_only: bool = False,
) -> List[InlineProvider]:
    """primary_key.inline_provider → InlineProviders (YAML grammar of
    test-data/fk_with_inline/ejv_inline.yaml; duplicate flag
    pk_check.py:216-240, default strict).  When the config carries the
    REMOTE grammar (``provider`` URL(s) + ``accept`` header,
    pk_check.py:156-204), each loaded schema URI (except the
    ``schema_prefix`` one) gets its key list fetched once on the
    driver via providers.fetch_remote_provider."""
    if not config:
        return []
    pk_cfg = config.get("primary_key") or {}
    inline = pk_cfg.get("inline_provider") or {}
    allow = bool(pk_cfg.get("allow_provider_duplicates", False))
    out = [
        InlineProvider(
            table=uri,
            keys=[tuple(k) if isinstance(k, list) else k for k in keys],
            allow_duplicates=allow,
        )
        for uri, keys in inline.items()
    ]
    accept = pk_cfg.get("accept")
    url_bases = pk_cfg.get("provider")
    if accept is not None and url_bases:
        from .providers import cached_opener, fetch_remote_provider

        eff_opener = opener
        if eff_opener is None and cache_dir:
            # the cache wrapper needs an explicit base opener —
            # replicate fetch_remote_provider's default
            from urllib.request import Request, urlopen

            def eff_opener(url: str, _accept=accept):  # pragma: no cover
                req = Request(url, headers={"Accept": _accept})
                with urlopen(req) as f:
                    return f.getcode(), str(f.read(), "utf-8")

        if cache_dir and eff_opener is not None:
            eff_opener = cached_opener(
                cache_dir, eff_opener, read_only=cache_read_only
            )
        prefix = pk_cfg.get("schema_prefix")
        for uri in schema_uris:
            if prefix == uri:
                continue
            prov = fetch_remote_provider(
                uri, url_bases, accept, allow_duplicates=allow,
                opener=eff_opener,
            )
            if prov.keys:
                out.append(prov)
    return out


def _library_overrides(
    registry: Mapping[str, CompiledSchema], library_fallback: bool
) -> Dict[str, object]:
    """{uri: library-errors Column} for WARNED schemas only (the
    library-verdict escape hatch, library_fallback.py).  Compiled-clean
    schemas are never keyed — their plans stay fully JVM-side."""
    if not library_fallback:
        return {}
    from .library_fallback import library_errors_column

    out: Dict[str, object] = {}
    for uri, cs in registry.items():
        if cs.warnings:
            out[uri] = library_errors_column(
                cs.schema, uri, cs.ref_cache or {uri: cs.schema},
                cs.table_spec.custom_formats,
            )
    return out


def validate_json_table(
    spark: SparkSession,
    schemas: Union[str, Sequence[Tuple[str, Mapping]]],
    df,
    file_col: str = "file",
    json_col: str = "json",
    config: Optional[Mapping] = None,
    probes: Sequence[str] = SCHEMA_KEY_PROBES,
    engine_config: Optional[EngineConfig] = None,
    uri_col: Optional[str] = None,
    library_fallback: bool = True,
    keep_raw: bool = False,
):
    """The DISTRIBUTED document-validation entry point: a DataFrame of
    ``(file, json text)`` rows — a 10^12-row table of one-JSON-per-row
    documents — validated against a schema directory.

    Everything stays on executors: schema dispatch is a JVM
    ``get_json_object`` coalesce over the probe paths (no Python), the
    per-schema shred is one Arrow ``mapInPandas`` pass
    (docshred.shred_json_strings, map-only), and the engine runs its
    usual declarative plans over the shredded tables.  Returns
    (ValidationResult, registry) — violations row_ids are the file
    names.  Documents matching no schema are simply not validated
    (mirroring the reference's skip; count them by anti-joining the
    input against the union of shredded tables).

    ``library_fallback`` defaults to True (round 6): the reference
    enforces EVERY JSON-Schema shape unconditionally
    (extensible_validator.py:1163-1194), so a default-config run must
    never under-report vs it — warned schemas validate through the
    jsonschema library in one Arrow-batched map-only stage
    (library_fallback.py), matching ``forget_mode="sequential"``'s
    parity-by-default policy.  Compiled-clean schemas never enter
    Python regardless (plan-asserted, tests/test_plans.py); at 10^12
    rows only the warned schemas' documents pay the Python stage, so
    opt out (``library_fallback=False``) only when a warned schema's
    partial JVM enforcement is an acceptable trade for that stage.

    Scan shape: one filtered pass over the input PER SCHEMA (the
    filter + (file, json) projection push into the scan, so each pass
    is cheap).  With many schemas over one huge input, pre-partition
    the storage by the dispatch column (``df.write.partitionBy``) so
    each pass prunes to its own partition, or persist() the tagged
    frame for a one-read trade of memory for IO."""
    from .docshred import shred_json_strings
    from pyspark.sql import functions as F

    if isinstance(config, str):
        config = parse_json_or_yaml(config)
    registry, issues = load_schemas(schemas)
    if not registry:
        raise ValueError(f"no usable schema loaded: {issues}")

    if uri_col is not None:
        # pre-dispatched table (schema id already a column — the
        # common shape for partitioned document stores); unparseable
        # documents still dispatch and get flagged 'fatal', unlike the
        # embedded-probe path where get_json_object cannot extract an
        # id from a broken document (those rows are skipped unmatched)
        tagged = df.select(
            F.col(file_col).alias("file"),
            F.col(json_col).alias("json"),
            F.col(uri_col).alias("__uri"),
        )
    else:
        probe_cols = [
            F.get_json_object(
                F.col(json_col), "$['" + p.replace(".", "']['") + "']"
            )
            for p in probes
        ]
        tagged = df.select(
            F.col(file_col).alias("file"),
            F.col(json_col).alias("json"),
            F.coalesce(*probe_cols).alias("__uri"),
        )
    tables = {
        uri: shred_json_strings(
            tagged.where(F.col("__uri") == uri), registry[uri],
            # keep_raw=True: carry the document text as __raw on every
            # table (verbose report_df embedding); otherwise only
            # warned schemas carry it (library-fallback input)
            keep_raw=keep_raw
            or (library_fallback and bool(registry[uri].warnings)),
        )
        for uri in registry
    }
    specs = [cs.table_spec for cs in registry.values()]
    engine = ValidationEngine(
        specs,
        providers=providers_from_config(config, schema_uris=list(registry)),
        # reference-parity surface → sequential forget (the canonical
        # policy paragraph lives on EngineConfig.forget_mode); pass an
        # explicit EngineConfig to opt back into the scale default
        config=engine_config or EngineConfig(forget_mode="sequential"),
    )
    result = engine.validate(
        tables, row_overrides=_library_overrides(registry, library_fallback)
    )
    # unparseable documents (shredder __corrupt flag) get the
    # reference's 'fatal' — without this, a schema with no `required`
    # keywords would pass garbage rows vacuously
    for uri, shredded in tables.items():
        fatal = shredded.where(F.col("__corrupt")).select(
            F.lit("doc:parse").alias("constraint_id"),
            F.lit("fatal").alias("reason"),
            F.col("__file").alias("row_id"),
            F.lit(None).cast("string").alias("observed_value"),
            F.lit("/").alias("path"),
        )
        result.row_viol[uri] = result.row_viol[uri].unionByName(fatal)
    return result, registry


def _guess_dispatch(
    spark: SparkSession,
    registry: Mapping[str, CompiledSchema],
    candidates: Sequence[str],
    pending: Sequence[Tuple[str, Any]],
    dispatched: Sequence[Tuple[str, Any, str]] = (),
    providers: Sequence = (),
    library_fallback: bool = True,
) -> Tuple[Dict[str, str], Dict[str, List[str]]]:
    """Guess-mode dispatch with the reference's EXACT sequential
    semantics ([verified] round-5 probes): guessing INTERLEAVES with
    dispatched validation in corpus order — a guessed doc's keys can
    make a LATER dispatched doc a duplicate — and a try is REJECTED
    not only on structural failure but also when the doc's keys
    collide with the keys registered so far (falling through to the
    next candidate; extensible_validator.py:1229-1340 + the extension
    validators firing during each try).  A doc claimed by nobody
    reports the accumulated errors of every failed try (structural
    leaf reasons + dup_* per colliding registration).

    Split of labor (the Spark-first shape):
    - ONE distributed job computes every (document, schema)
      structural verdict: merged shred over the union of all relevant
      schemas' column families + one fused projection of per-schema
      ``pass1_ok`` booleans (warned schemas score through the library
      fallback when enabled — the reference's guess also runs the full
      jsonschema stack, :1259-1263);
    - ONE distributed job collects the failed-try structural REASONS
      for the pending docs (lazy per-candidate violation frames,
      unioned);
    - the sequential claim/forget/register walk itself is a pure
      Python pass over (file, key-string) sets — ``keys.
      key_strings_py`` is the property-tested driver twin of the
      engine's key canonicalization — sized by the corpus file count,
      the same driver budget as the per-file report this CLI mode
      exists to produce.  Shadow providers (allow_duplicates=False)
      seed the worlds, exactly like the engine's dims.

    Returns ``(assigned {file: uri}, failed {file: [reasons]})``.
    Claimed docs then flow through the engine run, whose sequential
    forget fixpoint reproduces the same worlds — dup violations and
    FK behavior stay consistent by construction."""
    import dataclasses
    from functools import reduce as _reduce

    from pyspark.sql import functions as F

    from .checks import row_checks
    from .keys import key_strings_py
    from .providers import canonical_key_py

    if not candidates or not pending:
        return {}, {}
    relevant = list(dict.fromkeys(
        list(candidates) + [u for _, _, u in dispatched]
    ))
    css = [registry[u] for u in relevant]
    merged = dataclasses.replace(
        css[0],
        instance_paths=tuple(
            sorted({p for c in css for p in c.instance_paths})
        ),
        value_paths=tuple(sorted({p for c in css for p in c.value_paths})),
        props_paths=tuple(sorted({p for c in css for p in c.props_paths})),
        entries_paths=tuple(
            sorted({p for c in css for p in c.entries_paths})
        ),
        elem_props_paths=tuple(
            sorted({p for c in css for p in c.elem_props_paths})
        ),
        elem_entries_paths=tuple(
            sorted({p for c in css for p in c.elem_entries_paths})
        ),
    )
    any_lib = library_fallback and any(c.warnings for c in css)
    all_docs = [(f, d) for f, d, _ in dispatched] + list(pending)
    shredded = shred_documents(spark, all_docs, merged, keep_raw=any_lib)

    # ---- distributed job 1: every (doc, schema) structural verdict
    ok_cols = []
    batteries: Dict[str, tuple] = {}
    for i, uri in enumerate(relevant):
        cs = registry[uri]
        if library_fallback and cs.warnings:
            from .library_fallback import (
                library_errors_column,
                library_pass1_ok,
            )

            errs = library_errors_column(
                cs.schema, uri, cs.ref_cache or {uri: cs.schema},
                cs.table_spec.custom_formats,
            )
            ok = library_pass1_ok(errs)
            batteries[uri] = ("lib", errs)
        else:
            battery = row_checks.compile_battery(
                cs.table_spec.checks, json_mode=True,
                formats=cs.table_spec.custom_formats,
            )
            ok = row_checks.pass1_ok(battery)
            batteries[uri] = ("bat", battery)
        ok_cols.append(ok.alias(f"__ok_{i}"))
    ok_map: Dict[str, Dict[str, bool]] = {}
    for r in shredded.select(F.col("__file"), *ok_cols).collect():
        ok_map[r["__file"]] = {
            relevant[i]: bool(r[f"__ok_{i}"]) for i in range(len(relevant))
        }

    # ---- distributed job 2: failed-try structural reasons (pending)
    pending_names = [f for f, _ in pending]
    pend_df = shredded.where(F.col("__file").isin(pending_names))
    frames = []
    for uri in candidates:
        kind, obj = batteries[uri]
        if kind == "bat":
            v = row_checks.row_violations(
                pend_df, F.col("__file"), obj
            ).select(F.lit(uri).alias("__uri"), "row_id", "reason")
        else:
            v = pend_df.select(
                F.lit(uri).alias("__uri"),
                F.col("__file").alias("row_id"),
                F.explode(obj).alias("e"),
            ).select("__uri", "row_id", F.col("e.reason").alias("reason"))
        frames.append(v)
    struct_reasons: Dict[Tuple[str, str], List[str]] = {}
    if frames:
        allv = _reduce(lambda a, b: a.unionByName(b), frames)
        for r in allv.collect():
            struct_reasons.setdefault(
                (r["__uri"], r["row_id"]), []
            ).append(r["reason"])

    # ---- sequential claim walk (pure Python, corpus order)
    keylist: Dict[str, list] = {}
    worlds: Dict[tuple, set] = {}
    for u in relevant:
        spec = registry[u].table_spec
        kl = [(ks, "dup_unique", False) for ks in spec.unique] + [
            (ks, "dup_pk", True) for ks in spec.primary_keys
        ]
        keylist[u] = kl
        for ki, (ks, _, is_pk) in enumerate(kl):
            w: set = set()
            if is_pk:
                for prov in providers:
                    if prov.table != u or prov.allow_duplicates:
                        continue
                    if (
                        prov.refers_to is not None
                        and prov.refers_to != ks.name
                    ):
                        continue
                    w.update(canonical_key_py(k) for k in prov.keys)
            worlds[(u, ki)] = w

    def try_doc(doc, uri, fname):
        """(dup reasons, local registrations) of one try — failed
        tries leave no residue (the reference's forget)."""
        dups: List[str] = []
        local: Dict[tuple, set] = {}
        for ki, (ks, reason, _) in enumerate(keylist[uri]):
            for k in key_strings_py(
                doc, ks.members, limit_scope=ks.limit_scope, scope=fname
            ):
                w = (uri, ki)
                if k in worlds[w] or k in local.get(w, set()):
                    dups.append(reason)
                else:
                    local.setdefault(w, set()).add(k)
        return dups, local

    assigned: Dict[str, str] = {}
    failed: Dict[str, List[str]] = {}
    events = sorted(
        [(f, d, u) for f, d, u in dispatched]
        + [(f, d, None) for f, d in pending]
    , key=lambda e: e[0])
    for fname, doc, uri in events:
        if uri is not None:
            # dispatched doc: clean ⟺ struct-ok AND dup-free at its
            # turn; only then do its keys hold (register-then-forget)
            dups, local = try_doc(doc, uri, fname)
            if ok_map.get(fname, {}).get(uri, False) and not dups:
                for w, ks_ in local.items():
                    worlds[w].update(ks_)
            continue
        reasons: List[str] = []
        for cand in candidates:
            dups, local = try_doc(doc, cand, fname)
            if ok_map.get(fname, {}).get(cand, False) and not dups:
                for w, ks_ in local.items():
                    worlds[w].update(ks_)
                assigned[fname] = cand
                break
            # failed try: its errors accumulate (cumulative report,
            # extensible_validator.py:1310-1340)
            reasons.extend(struct_reasons.get((cand, fname), []))
            reasons.extend(dups)
        else:
            failed[fname] = reasons
    return assigned, failed


def run_suite(
    spark: SparkSession,
    schemas: Union[str, Sequence[Tuple[str, Mapping]]],
    docs: Union[str, Sequence[Tuple[str, Any]]],
    config: Optional[Mapping] = None,
    probes: Sequence[str] = SCHEMA_KEY_PROBES,
    engine_config: Optional[EngineConfig] = None,
    guess_unmatched: Union[bool, Sequence[str]] = False,
    iterate_over_arrays: bool = False,
    max_violations: int = 1_000_000,
    cache_dir: Optional[str] = None,
    cache_read_only: bool = False,
    library_fallback: bool = True,
) -> SuiteResult:
    """Run one suite.  ``schemas``: directory or [(file, schema dict)];
    ``docs``: directory or [(file, parsed doc)].  ``config``: the
    reference's YAML config dict (inline providers etc.), or a path to
    it.

    ``guess_unmatched`` (⇔ the CLI --guess-schema,
    extensible_validator.py:1229-1340): documents with no recognizable
    schema id are tried against every loaded schema IN LOAD ORDER
    (optionally restricted to a given uri list), with the reference's
    EXACT sequential semantics since round 5 ([verified] probes):
    guessing interleaves with dispatched validation in corpus order, a
    try is rejected on structural failure OR key collision with the
    registered-so-far worlds (falling through to the next candidate),
    claimed docs register keys / FK-check exactly as if dispatched,
    failed tries leave no key residue (forget), and a doc claimed by
    nobody reports every try's accumulated errors.  See
    _guess_dispatch for the distributed/driver split."""
    if isinstance(config, str):
        config = parse_json_or_yaml(config)
    registry, issues = load_schemas(schemas)

    if isinstance(docs, str):
        scanned = scan_documents(docs, iterate_over_arrays=iterate_over_arrays)
    else:
        scanned = [(f, d, None) for f, d in docs]
        if iterate_over_arrays:
            expanded = []
            for f, d, e in scanned:
                if isinstance(d, list):
                    expanded.extend(
                        (f"{f} [{i}]", el, None) for i, el in enumerate(d)
                    )
                else:
                    expanded.append((f, d, e))
            scanned = expanded

    per_file: Dict[str, List[str]] = {}
    unmatched: List[str] = []
    doc_schema: Dict[str, str] = {}
    by_uri: Dict[str, List[Tuple[str, Any]]] = {}
    for fname, doc, err in scanned:
        per_file.setdefault(fname, [])
        if err is not None:
            # ⇔ "Unable to parse file" reason "fatal"
            per_file[fname].append("fatal")
            continue
        uri = dispatch_uri(doc, probes)
        if uri is None or uri not in registry:
            unmatched.append(fname)
            continue
        doc_schema[fname] = uri
        by_uri.setdefault(uri, []).append((fname, doc))

    if not registry:
        return SuiteResult(
            exit_code=1, per_file=per_file, schema_issues=issues, unmatched=unmatched
        )

    providers = providers_from_config(
        config,
        schema_uris=list(registry),
        cache_dir=cache_dir,
        cache_read_only=cache_read_only,
    )

    if guess_unmatched and unmatched:
        parsed = {f: d for f, d, e in scanned if e is None}
        pending = [(f, parsed[f]) for f in unmatched if f in parsed]
        candidates = [
            uri
            for uri in registry
            if not isinstance(guess_unmatched, (list, tuple))
            or uri in guess_unmatched
        ]
        assigned, failed = _guess_dispatch(
            spark, registry, candidates, pending,
            dispatched=[
                (f, d, uri)
                for uri, grp in by_uri.items()
                for f, d in grp
            ],
            providers=providers,
            library_fallback=library_fallback,
        )
        for f, doc in pending:
            uri = assigned.get(f)
            if uri is not None:
                doc_schema[f] = uri
                by_uri.setdefault(uri, []).append((f, doc))
            else:
                # failed every candidate: the accumulated errors of
                # every try — structural leaf reasons plus dup_* per
                # colliding registration (⇔ cumulative schema errors,
                # extensible_validator.py:1310-1340)
                per_file[f].extend(failed.get(f, []))
        unmatched = [f for f in unmatched if f not in doc_schema]

    tables = {
        uri: shred_documents(
            spark, group, registry[uri],
            keep_raw=library_fallback and bool(registry[uri].warnings),
        )
        for uri, group in by_uri.items()
    }
    specs = [cs.table_spec for cs in registry.values()]
    engine = ValidationEngine(
        specs,
        providers=providers,
        # reference-parity surface → sequential forget (canonical
        # policy paragraph: EngineConfig.forget_mode)
        config=engine_config or EngineConfig(forget_mode="sequential"),
    )
    result = engine.validate(
        tables, row_overrides=_library_overrides(registry, library_fallback)
    )
    # Bounded collect: the per-file reason aggregation below is a
    # driver-side reduction sized for the reference's CLI corpora
    # (per-file documents).  A mispointed run against a huge corpus
    # must not materialize unbounded rows on the driver — limit(n+1)
    # detects overflow for the cost of one extra row, and the caller
    # is told to raise the cap or use the fully-distributed path
    # (validate_json_table keeps violations lazy end-to-end).
    if tables:
        rows = result.violations.limit(max_violations + 1).collect()
        if len(rows) > max_violations:
            raise ValueError(
                f"run_suite: violation count exceeds max_violations="
                f"{max_violations}; per-file reasons would be incomplete. "
                f"Raise max_violations or use validate_json_table for the "
                f"distributed path."
            )
    else:
        rows = []
    for r in rows:
        per_file.setdefault(r.row_id, []).append(r.reason)
    per_file = {k: sorted(v) for k, v in per_file.items()}
    any_errors = any(v for v in per_file.values())
    return SuiteResult(
        exit_code=2 if any_errors else 0,
        per_file=per_file,
        schema_issues=issues,
        registry=registry,
        violations=rows,
        unmatched=unmatched,
        doc_schema=doc_schema,
    )
