"""DIFFERENTIAL parity: run the ACTUAL reference validator
(/root/reference, in-process, with stdlib shims for its two missing
pure-utility deps) and this engine on the same logical data, and
compare per-document violation reasons.

This is the strongest parity evidence available in-sandbox: not our
reading of the reference's semantics, but the reference itself.
"""

import sys
import types
import urllib.parse

import pytest

from python_extended_json_schema_validator_spark import (
    ColumnCheck,
    ForeignKeySpec,
    KeySpec,
    TableSpec,
    ValidationEngine,
)


# --- shims: ijson (only used by --iter-arrays) and uritools (thin
#     wrappers over urllib.parse) ------------------------------------------
def _install_shims():
    if "ijson" not in sys.modules:
        fake = types.ModuleType("ijson")
        fake.items = lambda *a, **k: iter(())
        fake.common = types.SimpleNamespace(IncompleteJSONError=ValueError)
        sys.modules["ijson"] = fake
    if "uritools" not in sys.modules:
        ut = types.ModuleType("uritools")
        ut.uridefrag = lambda u: tuple(urllib.parse.urldefrag(u))
        ut.isabsuri = lambda u: bool(urllib.parse.urlsplit(u).scheme)
        ut.urijoin = urllib.parse.urljoin
        sys.modules["uritools"] = ut
    if "xdg" not in sys.modules:
        import tempfile

        xdg = types.ModuleType("xdg")
        bd = types.ModuleType("xdg.BaseDirectory")
        bd.save_cache_path = lambda *a: tempfile.mkdtemp(prefix="xdgcache")
        xdg.BaseDirectory = bd
        sys.modules["xdg"] = xdg
        sys.modules["xdg.BaseDirectory"] = bd


@pytest.fixture(scope="module")
def reference():
    """Run the reference validator in a FRESH subprocess per call (see
    tests/ref_runner.py — the reference leaks key-world state across
    ExtensibleValidator instances within one process, so in-process
    reuse makes results order-dependent).

    schemas: list of schema dicts; docs: list of (name, dict).
    → {file: sorted list of error reasons}
    warm_up ⇔ the CLI's --warm-up: the inline provider only takes
    effect after an eager warmUpCaches (pk_check.py's inline path
    sets gotIdsSet but doPopulate only becomes non-None via
    cleanup() after a prior warm-up — lazy mode silently skips
    provider population)."""
    import json
    import os
    import subprocess

    runner = os.path.join(os.path.dirname(__file__), "ref_runner.py")

    def run(schemas: list, docs: list, config: dict = {}, warm_up: bool = False):
        payload = json.dumps(
            {
                "schemas": schemas,
                "docs": [[n, d] for n, d in docs],
                "config": config,
                "warm_up": warm_up,
            }
        )
        proc = subprocess.run(
            [sys.executable, runner],
            input=payload,
            capture_output=True,
            text=True,
            timeout=120,
        )
        assert proc.returncode == 0, f"reference runner failed: {proc.stderr[-2000:]}"
        return json.loads(proc.stdout)

    return run


DRAFT = "http://json-schema.org/draft-07/schema#"


def engine_reasons(spark, specs, tables, id_order):
    res = ValidationEngine(specs).validate(tables)
    rows = res.violations.collect()
    out = {rid: [] for rid in id_order}
    for r in rows:
        # engine keyword reasons (minimum/required/...) ⇔ reference's
        # generic 'schema_error' for structural failures
        reason = r.reason
        if reason not in (
            "dup_unique", "dup_pk", "stale_fk", "dangling_fk",
            "stale_jk", "dangling_jk",
        ):
            reason = "schema_error"
        out.setdefault(r.row_id, []).append(reason)
    return {k: sorted(v) for k, v in out.items()}


def test_diff_unique_duplicates(spark, reference):
    schema = {
        "$id": "diff://unique/1.0",
        "$schema": DRAFT,
        "type": "object",
        "properties": {"local_id": {"type": "string", "unique": True}},
        "required": ["local_id"],
    }
    docs = [
        ("r1", {"@schema": "diff://unique/1.0", "local_id": "uno"}),
        ("r2", {"@schema": "diff://unique/1.0", "local_id": "dos"}),
        ("r3", {"@schema": "diff://unique/1.0", "local_id": "uno"}),
    ]
    ref = reference([schema], docs)

    spec = TableSpec(name="t", row_id="rid", unique=[KeySpec(("local_id",))])
    df = spark.createDataFrame(
        [(n, d["local_id"]) for n, d in docs], "rid string, local_id string"
    )
    got = engine_reasons(spark, [spec], {"t": df}, [n for n, _ in docs])
    assert ref == got == {"r1": [], "r2": [], "r3": ["dup_unique"]}


def test_diff_missing_member_exclusion(spark, reference):
    schema = {
        "$id": "diff://cpk/1.0",
        "$schema": DRAFT,
        "type": "object",
        "primary_key": ["local_id", "other_id"],
        "properties": {
            "local_id": {"type": "string"},
            "other_id": {"type": "string"},
        },
    }
    docs = [
        ("r1", {"@schema": "diff://cpk/1.0", "local_id": "solo"}),
        ("r2", {"@schema": "diff://cpk/1.0", "local_id": "solo"}),
    ]
    ref = reference([schema], docs)

    spec = TableSpec(
        name="t", row_id="rid", primary_keys=[KeySpec(("local_id", "other_id"))]
    )
    df = spark.createDataFrame(
        [("r1", "solo", None), ("r2", "solo", None)],
        "rid string, local_id string, other_id string",
    )
    got = engine_reasons(spark, [spec], {"t": df}, ["r1", "r2"])
    assert ref == got == {"r1": [], "r2": []}


def test_diff_fk_revocation(spark, reference):
    dim_schema = {
        "$id": "diff://dim/1.0",
        "$schema": DRAFT,
        "type": "object",
        "properties": {
            "local_id": {"type": "string", "primary_key": True},
            "weight": {"type": "integer", "minimum": 0},
        },
        "required": ["local_id", "weight"],
    }
    fact_schema = {
        "$id": "diff://fact/1.0",
        "$schema": DRAFT,
        "type": "object",
        "foreign_keys": [
            {"schema_id": "diff://dim/1.0", "members": ["ref_id"]}
        ],
        "properties": {"ref_id": {"type": "string"}},
    }
    docs = [
        ("d1", {"@schema": "diff://dim/1.0", "local_id": "uno", "weight": 1}),
        ("d2", {"@schema": "diff://dim/1.0", "local_id": "cuatro", "weight": -5}),
        ("f1", {"@schema": "diff://fact/1.0", "ref_id": "uno"}),
        ("f2", {"@schema": "diff://fact/1.0", "ref_id": "cuatro"}),
    ]
    ref = reference([dim_schema, fact_schema], docs)

    dspec = TableSpec(
        name="dim", row_id="rid",
        checks=[ColumnCheck(column="weight", minimum=0)],
        primary_keys=[KeySpec(("local_id",))],
    )
    fspec = TableSpec(
        name="fact", row_id="rid",
        foreign_keys=[ForeignKeySpec(("ref_id",), ref_table="dim")],
    )
    ddf = spark.createDataFrame(
        [("d1", "uno", 1), ("d2", "cuatro", -5)],
        "rid string, local_id string, weight long",
    )
    fdf = spark.createDataFrame(
        [("f1", "uno"), ("f2", "cuatro")], "rid string, ref_id string"
    )
    got = engine_reasons(
        spark, [dspec, fspec], {"dim": ddf, "fact": fdf}, ["d1", "d2", "f1", "f2"]
    )
    assert ref == got == {
        "d1": [],
        "d2": ["schema_error"],
        "f1": [],
        "f2": ["stale_fk"],
    }


def test_diff_refers_to_named_pk(spark, reference):
    dim_schema = {
        "$id": "diff://ndim/1.0",
        "$schema": DRAFT,
        "type": "object",
        "properties": {
            "a": {"type": "string",
                  "primary_key": {"name": "pk", "members": True}},
            "z": {"type": "string",
                  "primary_key": {"name": "zk", "members": True}},
        },
    }
    fact_schema = {
        "$id": "diff://nfact/1.0",
        "$schema": DRAFT,
        "type": "object",
        "foreign_keys": [
            {"schema_id": "diff://ndim/1.0", "members": ["ra"],
             "refers_to": "pk"}
        ],
        "properties": {"ra": {"type": "string"}},
    }
    docs = [
        ("d1", {"@schema": "diff://ndim/1.0", "a": "uno", "z": "zzz"}),
        ("f1", {"@schema": "diff://nfact/1.0", "ra": "uno"}),
        # zzz exists only in the zk world → must be stale via refers_to pk
        ("f2", {"@schema": "diff://nfact/1.0", "ra": "zzz"}),
    ]
    ref = reference([dim_schema, fact_schema], docs)

    dspec = TableSpec(
        name="ndim", row_id="rid",
        primary_keys=[KeySpec(("a",), name="pk"), KeySpec(("z",), name="zk")],
    )
    fspec = TableSpec(
        name="nfact", row_id="rid",
        foreign_keys=[ForeignKeySpec(("ra",), ref_table="ndim", refers_to="pk")],
    )
    ddf = spark.createDataFrame([("d1", "uno", "zzz")], "rid string, a string, z string")
    fdf = spark.createDataFrame([("f1", "uno"), ("f2", "zzz")], "rid string, ra string")
    got = engine_reasons(spark, [dspec, fspec], {"ndim": ddf, "nfact": fdf},
                         ["d1", "f1", "f2"])
    assert ref == got == {"d1": [], "f1": [], "f2": ["stale_fk"]}


def test_diff_join_keys_index(spark, reference):
    dim_schema = {
        "$id": "diff://jdim/1.0",
        "$schema": DRAFT,
        "type": "object",
        "properties": {"code": {"type": "string", "index": True}},
    }
    fact_schema = {
        "$id": "diff://jfact/1.0",
        "$schema": DRAFT,
        "type": "object",
        "join_keys": [{"schema_id": "diff://jdim/1.0", "members": ["rc"]}],
        "properties": {"rc": {"type": "string"}},
    }
    docs = [
        ("d1", {"@schema": "diff://jdim/1.0", "code": "A"}),
        ("d2", {"@schema": "diff://jdim/1.0", "code": "A"}),  # dup: no error
        ("f1", {"@schema": "diff://jfact/1.0", "rc": "A"}),
        ("f2", {"@schema": "diff://jfact/1.0", "rc": "C"}),
    ]
    ref = reference([dim_schema, fact_schema], docs)

    dspec = TableSpec(
        name="jdim", row_id="rid", indexes=[KeySpec(("code",))]
    )
    fspec = TableSpec(
        name="jfact", row_id="rid",
        join_keys=[ForeignKeySpec(("rc",), ref_table="jdim")],
    )
    ddf = spark.createDataFrame([("d1", "A"), ("d2", "A")], "rid string, code string")
    fdf = spark.createDataFrame([("f1", "A"), ("f2", "C")], "rid string, rc string")
    got = engine_reasons(spark, [dspec, fspec], {"jdim": ddf, "jfact": fdf},
                         ["d1", "d2", "f1", "f2"])
    # reference QUIRK: join-key misses report stale_fk, not the
    # declared stale_jk (fk_check.py:378,440 hardcode the string)
    assert ref == got == {"d1": [], "d2": [], "f1": [], "f2": ["stale_fk"]}


def test_diff_compound_fk(spark, reference):
    dim_schema = {
        "$id": "diff://cdim/1.0",
        "$schema": DRAFT,
        "type": "object",
        "primary_key": ["a", "b"],
        "properties": {"a": {"type": "string"}, "b": {"type": "string"}},
    }
    fact_schema = {
        "$id": "diff://cfact/1.0",
        "$schema": DRAFT,
        "type": "object",
        "foreign_keys": [
            {"schema_id": "diff://cdim/1.0", "members": ["ra", "rb"]}
        ],
        "properties": {"ra": {"type": "string"}, "rb": {"type": "string"}},
    }
    docs = [
        ("d1", {"@schema": "diff://cdim/1.0", "a": "uno", "b": "diez"}),
        ("f1", {"@schema": "diff://cfact/1.0", "ra": "uno", "rb": "diez"}),
        ("f2", {"@schema": "diff://cfact/1.0", "ra": "siete", "rb": "setenta"}),
    ]
    ref = reference([dim_schema, fact_schema], docs)

    dspec = TableSpec(name="cdim", row_id="rid", primary_keys=[KeySpec(("a", "b"))])
    fspec = TableSpec(
        name="cfact", row_id="rid",
        foreign_keys=[ForeignKeySpec(("ra", "rb"), ref_table="cdim")],
    )
    ddf = spark.createDataFrame([("d1", "uno", "diez")], "rid string, a string, b string")
    fdf = spark.createDataFrame(
        [("f1", "uno", "diez"), ("f2", "siete", "setenta")],
        "rid string, ra string, rb string",
    )
    got = engine_reasons(spark, [dspec, fspec], {"cdim": ddf, "cfact": fdf},
                         ["d1", "f1", "f2"])
    assert ref == got == {"d1": [], "f1": [], "f2": ["stale_fk"]}


def test_diff_inline_provider(spark, reference):
    """fk_with_inline scenario: the dim schema has NO documents; PK
    values come from the inline provider config."""
    dim_schema = {
        "$id": "diff://pdim/1.0",
        "$schema": DRAFT,
        "type": "object",
        "primary_key": ["a", "b"],
        "properties": {"a": {"type": "string"}, "b": {"type": "string"}},
    }
    fact_schema = {
        "$id": "diff://pfact/1.0",
        "$schema": DRAFT,
        "type": "object",
        "foreign_keys": [
            {"schema_id": "diff://pdim/1.0", "members": ["ra", "rb"]}
        ],
        "properties": {"ra": {"type": "string"}, "rb": {"type": "string"}},
    }
    docs = [
        ("f1", {"@schema": "diff://pfact/1.0", "ra": "uno", "rb": "diez"}),
        ("f2", {"@schema": "diff://pfact/1.0", "ra": "dos", "rb": "20"}),
    ]
    config = {
        "primary_key": {
            "inline_provider": {
                "diff://pdim/1.0": [["uno", "diez"], ["dos", "veinte"]]
            }
        }
    }
    ref = reference([dim_schema, fact_schema], docs, config=config, warm_up=True)

    from python_extended_json_schema_validator_spark.providers import InlineProvider

    dspec = TableSpec(name="pdim", row_id="rid", primary_keys=[KeySpec(("a", "b"))])
    fspec = TableSpec(
        name="pfact", row_id="rid",
        foreign_keys=[ForeignKeySpec(("ra", "rb"), ref_table="pdim")],
    )
    prov = InlineProvider(table="pdim", keys=[("uno", "diez"), ("dos", "veinte")])
    fdf = spark.createDataFrame(
        [("f1", "uno", "diez"), ("f2", "dos", "20")],
        "rid string, ra string, rb string",
    )
    res = ValidationEngine([dspec, fspec], providers=[prov]).validate({"pfact": fdf})
    rows = res.violations.collect()
    got = {"f1": [], "f2": []}
    for r in rows:
        got[r.row_id].append(r.reason)
    assert ref == got == {"f1": [], "f2": ["stale_fk"]}


def test_diff_provider_duplicates_flag(spark, reference):
    """allow_provider_duplicates semantics: with the flag OFF, a
    document repeating a provider key is a dup_pk; with it ON the
    provider world is a shadow only the FK pass sees."""
    dim_schema = {
        "$id": "diff://sdim/1.0",
        "$schema": DRAFT,
        "type": "object",
        "properties": {"a": {"type": "string", "primary_key": True}},
    }
    docs = [("d1", {"@schema": "diff://sdim/1.0", "a": "uno"})]
    base = {"inline_provider": {"diff://sdim/1.0": ["uno"]}}

    ref_strict = reference(
        [dim_schema], docs, config={"primary_key": dict(base)}, warm_up=True
    )
    ref_lax = reference(
        [dim_schema],
        docs,
        config={"primary_key": {**base, "allow_provider_duplicates": True}},
        warm_up=True,
    )

    from python_extended_json_schema_validator_spark.providers import InlineProvider

    spec = TableSpec(name="sdim", row_id="rid", primary_keys=[KeySpec(("a",))])
    df = spark.createDataFrame([("d1", "uno")], "rid string, a string")

    def run(allow):
        prov = InlineProvider(table="sdim", keys=["uno"], allow_duplicates=allow)
        res = ValidationEngine([spec], providers=[prov]).validate({"sdim": df})
        return sorted(r.reason for r in res.violations.collect())

    assert ref_strict == {"d1": ["dup_pk"]}
    assert run(False) == ["dup_pk"]
    assert ref_lax == {"d1": []}
    assert run(True) == []


def test_diff_limit_scope(spark, reference):
    """limit_scope: uniqueness scoped per source file — two docs with
    the same key in DIFFERENT files are fine; in the SAME file they
    duplicate.  (No reference test-data covers this; differential run
    is the ground truth.)"""
    schema = {
        "$id": "diff://scoped/1.0",
        "$schema": DRAFT,
        "type": "object",
        "properties": {
            "local_id": {
                "type": "string",
                "unique": {"members": True, "limit_scope": True},
            }
        },
    }
    docs = [
        ("fileA", {"@schema": "diff://scoped/1.0", "local_id": "uno"}),
        ("fileB", {"@schema": "diff://scoped/1.0", "local_id": "uno"}),
        ("fileA", {"@schema": "diff://scoped/1.0", "local_id": "uno"}),
    ]
    ref = reference([schema], docs)

    spec = TableSpec(
        name="t", row_id="rid", scope_col="part",
        unique=[KeySpec(("local_id",), limit_scope=True)],
    )
    df = spark.createDataFrame(
        [("fileA", "r1", "uno"), ("fileB", "r2", "uno"), ("fileA", "r3", "uno")],
        "part string, rid string, local_id string",
    )
    res = ValidationEngine([spec]).validate({"t": df})
    rows = res.violations.collect()
    # compare per-scope reason multisets (the reference blames by file)
    got = {"fileA": [], "fileB": []}
    scope_of = {"r1": "fileA", "r2": "fileB", "r3": "fileA"}
    for r in rows:
        got[scope_of[r.row_id]].append(r.reason)
    assert ref == got == {"fileA": ["dup_unique"], "fileB": []}


def test_diff_int_str_key_distinctness(spark, reference):
    dim_schema = {
        "$id": "diff://idim/1.0",
        "$schema": DRAFT,
        "type": "object",
        "properties": {"k": {"type": "integer", "primary_key": True}},
    }
    fact_schema = {
        "$id": "diff://ifact/1.0",
        "$schema": DRAFT,
        "type": "object",
        "foreign_keys": [{"schema_id": "diff://idim/1.0", "members": ["rk"]}],
        "properties": {"rk": {}},
    }
    docs = [
        ("d1", {"@schema": "diff://idim/1.0", "k": 2}),
        ("f1", {"@schema": "diff://ifact/1.0", "rk": 2}),
        ("f2", {"@schema": "diff://ifact/1.0", "rk": "2"}),  # str != int
    ]
    ref = reference([dim_schema, fact_schema], docs)

    dspec = TableSpec(name="idim", row_id="rid", primary_keys=[KeySpec(("k",))])
    fspec = TableSpec(
        name="ifact", row_id="rid",
        foreign_keys=[ForeignKeySpec(("rk",), ref_table="idim")],
    )
    ddf = spark.createDataFrame([("d1", 2)], "rid string, k long")
    # engine side: rk is a string column carrying "2" for f2, and a
    # separate long column for f1 — model as two fact tables sharing
    # the FK spec? simpler: one table with both typed columns
    f1df = spark.createDataFrame([("f1", 2)], "rid string, rk long")
    f2df = spark.createDataFrame([("f2", "2")], "rid string, rk string")
    got1 = engine_reasons(spark, [dspec, fspec], {"idim": ddf, "ifact": f1df}, ["f1"])
    fspec2 = TableSpec(
        name="ifact", row_id="rid",
        foreign_keys=[ForeignKeySpec(("rk",), ref_table="idim")],
    )
    got2 = engine_reasons(spark, [dspec, fspec2], {"idim": ddf, "ifact": f2df}, ["f2"])
    assert ref["f1"] == got1["f1"] == []
    assert ref["f2"] == got2["f2"] == ["stale_fk"]


def test_diff_fk_to_scoped_key(spark, reference):
    """refers_to → limit_scope key: the reference scopes BOTH sides —
    stored keys carry the dim document's file (index_check.py:346-349)
    and the probe prepends the FK document's file (fk_check.py:405-411)
    — so a cross-file FK to a same-valued key is stale."""
    dim_schema = {
        "$id": "diff://scdim/1.0",
        "$schema": DRAFT,
        "type": "object",
        "properties": {
            "a": {
                "type": "string",
                "primary_key": {"name": "pk", "members": True,
                                "limit_scope": True},
            }
        },
    }
    fact_schema = {
        "$id": "diff://scfact/1.0",
        "$schema": DRAFT,
        "type": "object",
        "foreign_keys": [
            {"schema_id": "diff://scdim/1.0", "members": ["ra"],
             "refers_to": "pk"}
        ],
        "properties": {"ra": {"type": "string"}},
    }
    docs = [
        ("fileA", {"@schema": "diff://scdim/1.0", "a": "uno"}),
        ("fileA", {"@schema": "diff://scfact/1.0", "ra": "uno"}),  # same file: ok
        ("fileB", {"@schema": "diff://scfact/1.0", "ra": "uno"}),  # cross: stale
    ]
    ref = reference([dim_schema, fact_schema], docs)

    dspec = TableSpec(
        name="scdim", row_id="rid", scope_col="part",
        primary_keys=[KeySpec(("a",), name="pk", limit_scope=True)],
    )
    fspec = TableSpec(
        name="scfact", row_id="rid", scope_col="part",
        foreign_keys=[ForeignKeySpec(("ra",), ref_table="scdim", refers_to="pk")],
    )
    ddf = spark.createDataFrame(
        [("fileA", "d1", "uno")], "part string, rid string, a string"
    )
    fdf = spark.createDataFrame(
        [("fileA", "f1", "uno"), ("fileB", "f2", "uno")],
        "part string, rid string, ra string",
    )
    res = ValidationEngine([dspec, fspec]).validate({"scdim": ddf, "scfact": fdf})
    got = {"fileA": [], "fileB": []}
    scope_of = {"d1": "fileA", "f1": "fileA", "f2": "fileB"}
    for r in res.violations.collect():
        got[scope_of[r.row_id]].append(r.reason)
    assert ref == got == {"fileA": [], "fileB": ["stale_fk"]}


def test_diff_runtime_empty_target_is_dangling(spark, reference):
    """A target whose declared key worlds recorded ZERO values (every
    dim doc revoked by pass 1) is DANGLING, not stale: the reference
    only registers PK contexts with len(values)>0 (fk_check.py:305-317),
    so the FK cluster falls into the no-documents branch (:453-476)."""
    dim_schema = {
        "$id": "diff://edim/1.0",
        "$schema": DRAFT,
        "type": "object",
        "properties": {
            "local_id": {"type": "string", "primary_key": True},
            "weight": {"type": "integer", "minimum": 0},
        },
        "required": ["local_id", "weight"],
    }
    fact_schema = {
        "$id": "diff://efact/1.0",
        "$schema": DRAFT,
        "type": "object",
        "foreign_keys": [{"schema_id": "diff://edim/1.0", "members": ["ref_id"]}],
        "properties": {"ref_id": {"type": "string"}},
    }
    docs = [
        # the ONLY dim doc fails minimum → revoked → world is empty
        ("d1", {"@schema": "diff://edim/1.0", "local_id": "uno", "weight": -1}),
        ("f1", {"@schema": "diff://efact/1.0", "ref_id": "uno"}),
    ]
    ref = reference([dim_schema, fact_schema], docs)

    dspec = TableSpec(
        name="edim", row_id="rid",
        checks=[ColumnCheck(column="weight", minimum=0)],
        primary_keys=[KeySpec(("local_id",))],
    )
    fspec = TableSpec(
        name="efact", row_id="rid",
        foreign_keys=[ForeignKeySpec(("ref_id",), ref_table="edim")],
    )
    ddf = spark.createDataFrame([("d1", "uno", -1)],
                                "rid string, local_id string, weight long")
    fdf = spark.createDataFrame([("f1", "uno")], "rid string, ref_id string")
    got = engine_reasons(spark, [dspec, fspec], {"edim": ddf, "efact": fdf},
                         ["d1", "f1"])
    assert ref == got == {"d1": ["schema_error"], "f1": ["dangling_fk"]}


def test_diff_named_worlds_confined_per_class(spark, reference):
    """Named key worlds are per join class (fk_check.py:296-327 filters
    on joinClass before by_name registration): a join_keys refers_to
    naming a PRIMARY KEY resolves nothing among INDEX worlds → stale
    "key not found" (while the index world keeps the context alive)."""
    dim_schema = {
        "$id": "diff://ccdim/1.0",
        "$schema": DRAFT,
        "type": "object",
        "properties": {
            "a": {"type": "string",
                  "primary_key": {"name": "k1", "members": True}},
            "z": {"type": "string",
                  "index": {"name": "k2", "members": True}},
        },
    }
    fact_schema = {
        "$id": "diff://ccfact/1.0",
        "$schema": DRAFT,
        "type": "object",
        "join_keys": [
            {"schema_id": "diff://ccdim/1.0", "members": ["ra"],
             "refers_to": "k1"}
        ],
        "properties": {"ra": {"type": "string"}},
    }
    docs = [
        ("d1", {"@schema": "diff://ccdim/1.0", "a": "uno", "z": "uno"}),
        # ra=uno IS in both worlds by value — but refers_to k1 must not
        # resolve among index worlds, so the probe misses
        ("f1", {"@schema": "diff://ccfact/1.0", "ra": "uno"}),
    ]
    ref = reference([dim_schema, fact_schema], docs)

    dspec = TableSpec(
        name="ccdim", row_id="rid",
        primary_keys=[KeySpec(("a",), name="k1")],
        indexes=[KeySpec(("z",), name="k2")],
    )
    fspec = TableSpec(
        name="ccfact", row_id="rid",
        join_keys=[ForeignKeySpec(("ra",), ref_table="ccdim", refers_to="k1")],
    )
    ddf = spark.createDataFrame([("d1", "uno", "uno")],
                                "rid string, a string, z string")
    fdf = spark.createDataFrame([("f1", "uno")], "rid string, ra string")
    got = engine_reasons(spark, [dspec, fspec], {"ccdim": ddf, "ccfact": fdf},
                         ["d1", "f1"])
    assert ref == got == {"d1": [], "f1": ["stale_fk"]}


def test_diff_array_member_pk_fanout(spark, reference):
    """Array-valued key members FAN OUT: each element is a key
    (GenKeyStrings cartesian, index_check.py:262-293).  A single
    member with >1 values wraps each element alone (["b"]); with
    exactly one value the raw atomic is the key; an empty array
    contributes no key at all."""
    schema = {
        "$id": "diff://arr/1.0",
        "$schema": DRAFT,
        "type": "object",
        "primary_key": ["tags"],
        "properties": {"tags": {"type": "array", "items": {"type": "string"}}},
    }
    docs = [
        ("r1", {"@schema": "diff://arr/1.0", "tags": ["a", "b"]}),
        ("r2", {"@schema": "diff://arr/1.0", "tags": ["b", "c"]}),  # ["b"] dup
        ("r3", {"@schema": "diff://arr/1.0", "tags": []}),          # no key
        ("r4", {"@schema": "diff://arr/1.0", "tags": []}),          # no key
    ]
    ref = reference([schema], docs)

    spec = TableSpec(name="t", row_id="rid", primary_keys=[KeySpec(("tags",))])
    df = spark.createDataFrame(
        [("r1", ["a", "b"]), ("r2", ["b", "c"]), ("r3", []), ("r4", [])],
        "rid string, tags array<string>",
    )
    got = engine_reasons(spark, [spec], {"t": df}, ["r1", "r2", "r3", "r4"])
    assert ref == got == {"r1": [], "r2": ["dup_pk"], "r3": [], "r4": []}


def test_diff_array_fanout_atomic_vs_wrapped(spark, reference):
    """The atomic fast path is VALUE-COUNT dependent: a 1-element
    array keys as the raw atomic, so it collides with a scalar-keyed
    doc of the same value; a 2-element array keys as wrapped ["v"]
    elements, which do NOT collide with the raw atomic."""
    schema = {
        "$id": "diff://arr2/1.0",
        "$schema": DRAFT,
        "type": "object",
        "primary_key": ["v"],
        "properties": {"v": {}},
    }
    docs = [
        ("r1", {"@schema": "diff://arr2/1.0", "v": "x"}),          # atomic "x"
        ("r2", {"@schema": "diff://arr2/1.0", "v": ["x"]}),        # 1-elem → atomic "x": dup!
        ("r3", {"@schema": "diff://arr2/1.0", "v": ["x", "y"]}),   # ["x"],["y"]: no dup
    ]
    ref = reference([schema], docs)
    assert ref == {"r1": [], "r2": ["dup_pk"], "r3": []}

    # engine side: same value shapes via a shredded-document run (the
    # typed-column world cannot hold mixed scalar/array in one column)
    from python_extended_json_schema_validator_spark.suite import run_suite

    res = run_suite(spark, [("s.json", schema)], [(n, d) for n, d in docs])
    got = {f: [r for r in v] for f, v in res.per_file.items()}
    assert got == {"r1": [], "r2": ["dup_pk"], "r3": []}


def test_diff_array_fk_fanout(spark, reference):
    """FK members fan out too: EVERY combination is probed
    (fk_check.py:425-449) — one bad element makes the row stale."""
    dim = {
        "$id": "diff://adim/1.0",
        "$schema": DRAFT,
        "type": "object",
        "properties": {"k": {"type": "string", "primary_key": True}},
    }
    fact = {
        "$id": "diff://afact/1.0",
        "$schema": DRAFT,
        "type": "object",
        "foreign_keys": [{"schema_id": "diff://adim/1.0", "members": ["refs"]}],
        "properties": {"refs": {"type": "array", "items": {"type": "string"}}},
    }
    docs = [
        ("d1", {"@schema": "diff://adim/1.0", "k": "a"}),
        ("d2", {"@schema": "diff://adim/1.0", "k": "b"}),
        # 2 values → probes ["a"],["b"]... but dim keys are ATOMIC
        # ("a"), so wrapped probes MISS: the reference flags both!
        ("f1", {"@schema": "diff://afact/1.0", "refs": ["a", "b"]}),
        # 1 value → atomic probe "a" → hits
        ("f2", {"@schema": "diff://afact/1.0", "refs": ["a"]}),
        ("f3", {"@schema": "diff://afact/1.0", "refs": ["a", "zzz"]}),
    ]
    ref = reference([dim, fact], docs)

    dspec = TableSpec(name="adim", row_id="rid", primary_keys=[KeySpec(("k",))])
    fspec = TableSpec(
        name="afact", row_id="rid",
        foreign_keys=[ForeignKeySpec(("refs",), ref_table="adim")],
    )
    ddf = spark.createDataFrame([("d1", "a"), ("d2", "b")], "rid string, k string")
    fdf = spark.createDataFrame(
        [("f1", ["a", "b"]), ("f2", ["a"]), ("f3", ["a", "zzz"])],
        "rid string, refs array<string>",
    )
    got = engine_reasons(spark, [dspec, fspec], {"adim": ddf, "afact": fdf},
                         ["d1", "d2", "f1", "f2", "f3"])
    assert ref == got
