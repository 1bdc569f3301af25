"""Subprocess runner for the reference validator.

The reference keeps id()-keyed registries that survive across
ExtensibleValidator instances within one process (key worlds observed
leaking between runs — e.g. a limit_scope flag from one run's named key
bleeding into the next run's same-named key, and FK locations
double-registering).  Differential tests therefore execute each
reference run in a FRESH process: stdin takes one JSON object
``{"schemas": [...], "docs": [[name, doc], ...], "config": {...},
"warm_up": bool}``, stdout emits ``{file: sorted error reasons}``.
"""

import json
import sys
import tempfile
import types
import urllib.parse


def _install_shims():
    fake = types.ModuleType("ijson")
    fake.items = lambda *a, **k: iter(())
    fake.common = types.SimpleNamespace(IncompleteJSONError=ValueError)
    sys.modules["ijson"] = fake
    ut = types.ModuleType("uritools")
    ut.uridefrag = lambda u: tuple(urllib.parse.urldefrag(u))
    ut.isabsuri = lambda u: bool(urllib.parse.urlsplit(u).scheme)
    ut.urijoin = urllib.parse.urljoin
    sys.modules["uritools"] = ut
    xdg = types.ModuleType("xdg")
    bd = types.ModuleType("xdg.BaseDirectory")
    bd.save_cache_path = lambda *a: tempfile.mkdtemp(prefix="xdgcache")
    xdg.BaseDirectory = bd
    sys.modules["xdg"] = xdg
    sys.modules["xdg.BaseDirectory"] = bd


def main() -> None:
    _install_shims()
    sys.path.insert(0, "/root/reference")
    from extended_json_schema_validator.extensible_validator import (
        ExtensibleValidator,
    )

    payload = json.load(sys.stdin)
    schemas = payload["schemas"]
    docs = payload["docs"]
    config = payload.get("config") or {}
    warm_up = payload.get("warm_up", False)

    d = tempfile.mkdtemp(prefix="schemas")
    for i, s in enumerate(schemas):
        with open(f"{d}/s{i}.json", "w") as fh:
            json.dump(s, fh)
    ev = ExtensibleValidator(config=config)
    n = ev.loadJSONSchemas(d)
    assert n == len(schemas), f"reference loaded {n}/{len(schemas)} schemas"
    if payload.get("resolve"):
        # export_resolved_references prints RECURSION DETECTED to
        # stdout on cycles — divert so the JSON channel stays clean
        import contextlib

        with contextlib.redirect_stdout(sys.stderr):
            vs = ev.getValidSchemas(do_resolve=True)
            resolved = {
                uri: obj["resolved_schema"] for uri, obj in vs.items()
            }
        json.dump(resolved, sys.stdout)
        return
    if warm_up:
        ev.warmUpCaches()
    entries = [{"file": name, "json": doc, "errors": []} for name, doc in docs]
    out = ev.jsonValidate(*entries, guess_unmatched=payload.get("guess", False))
    agg: dict = {}
    for e in out:
        agg.setdefault(e["file"], []).extend(
            err["reason"] or "schema_error" for err in e["errors"]
        )
    result: dict = {k: sorted(v) for k, v in agg.items()}
    if payload.get("report"):
        # report-shaped extras (⇔ __main__.py:311-338 schema entries +
        # ParsedContentEntry fields): per-schema uri/hash, per-doc
        # schema binding
        result = {
            "per_file": result,
            "schemas": [
                {"uri": uri, "schema_hash": s["schema_hash"]}
                for uri, s in sorted(ev.getValidSchemas().items())
            ],
            "docs": [
                {
                    "file": e["file"],
                    "schema_id": e.get("schema_id"),
                    "schema_hash": e.get("schema_hash"),
                    # the reference's --verbose-report embeds this
                    # (reference __main__.py:421-424 deletes it only
                    # when quiet)
                    "json": e.get("json"),
                }
                for e in out
            ],
        }
    json.dump(result, sys.stdout)


if __name__ == "__main__":
    main()
