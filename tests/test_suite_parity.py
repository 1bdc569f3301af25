"""GOLDEN parity on the reference's OWN test-data suites: run the
actual reference validator (fresh subprocess, tests/ref_runner.py) and
this engine's suite runner on the same schema files + document dirs,
and compare per-file violation reasons and pass/fail.

This is the acceptance test for JSON Schema document ingestion
(schemas.py + docshred.py + suite.py): a user of the reference can
point this engine at their existing test-data/*/schemas/*.json and
get the same verdicts.

Documents are fed to BOTH sides in sorted order, so the reference's
first-seen duplicate survivor == this engine's min-row_id survivor.
"""

import json
import os
import subprocess
import sys

import pytest

from python_extended_json_schema_validator_spark.schemas import (
    load_schemas,
    parse_json_or_yaml,
    scan_files,
)
from python_extended_json_schema_validator_spark.suite import run_suite, scan_documents

BASE = "/root/reference/test-data"
RUNNER = os.path.join(os.path.dirname(__file__), "ref_runner.py")

KEY_REASONS = {
    "dup_unique", "dup_pk", "stale_fk", "dangling_fk", "stale_jk", "dangling_jk",
}


def normalize(per_file: dict) -> dict:
    """Engine keyword reasons (type/minimum/...) ⇔ the reference's
    generic 'schema_error' for structural failures."""
    return {
        f: sorted(r if r in KEY_REASONS else "schema_error" for r in reasons)
        for f, reasons in per_file.items()
    }


def reference_run(schema_files, docs, config=None, warm_up=False):
    payload = json.dumps(
        {
            "schemas": [
                parse_json_or_yaml(f) if isinstance(f, str) else f
                for f in schema_files
            ],
            "docs": [[n, d] for n, d in docs],
            "config": config or {},
            "warm_up": warm_up,
        }
    )
    proc = subprocess.run(
        [sys.executable, RUNNER], input=payload, capture_output=True,
        text=True, timeout=180,
    )
    assert proc.returncode == 0, f"reference runner failed: {proc.stderr[-2000:]}"
    return json.loads(proc.stdout)


def schema_files_for(suite: str, source) -> list:
    if source == "schemas":
        return scan_files(f"{BASE}/{suite}/schemas")
    return [f"{BASE}/{suite}/{f}" for f in source]


# (suite, schema source, doc subdirs, config file, warm_up)
SUITES = [
    ("compound_pk", ["compound_pk_schema.json"],
     ["good_validation", "bad_validation"], None, False),
    ("compound_unique", ["compound_unique_schema.json"],
     ["good_validation", "bad_validation"], None, False),
    ("fk_simple_example", "schemas",
     ["good_validation", "bad_validation", "bad_validation_2"], None, False),
    ("fk_to_named_pk", "schemas",
     ["good_validation", "bad_validation"], None, False),
    ("fk_with_inline", "schemas",
     ["good_validation", "bad_validation"], "ejv_inline.yaml", True),
    ("fk_with_inline_simple", "schemas",
     ["good_validation", "bad_validation"], "ejv_inline_simple.yaml", True),
    ("foreign_key_example", "schemas",
     ["good_validation", "bad_validation"], None, False),
    ("multiple_unique", ["multiple_unique_schema.json"],
     ["good_validation", "bad_validation"], None, False),
    ("named_pk", ["named_pk_schema.json"], ["good_validation"], None, False),
    ("named_unique", ["named_unique_schema.json"],
     ["good_validation", "bad_validation"], None, False),
    ("unique_simple", ["unique_schema.json"],
     ["good_validation", "bad_validation"], None, False),
]

CASES = [
    pytest.param(suite, source, sub, cfg, warm, id=f"{suite}-{sub}")
    for suite, source, subs, cfg, warm in SUITES
    for sub in subs
]


@pytest.mark.parametrize("suite,source,sub,cfg,warm", CASES)
def test_suite_parity(spark, suite, source, sub, cfg, warm):
    sfiles = schema_files_for(suite, source)
    docs = [
        (os.path.basename(f), d)
        for f, d, err in scan_documents(f"{BASE}/{suite}/{sub}")
        if err is None
    ]
    config = parse_json_or_yaml(f"{BASE}/{suite}/{cfg}") if cfg else None

    ref = reference_run(sfiles, docs, config=config, warm_up=warm)

    schemas = [(f, parse_json_or_yaml(f)) for f in sfiles]
    res = run_suite(spark, schemas, docs, config=config)

    assert [
        i for i in res.schema_issues if i.severity == "error"
    ] == [], res.schema_issues
    got = normalize(res.per_file)
    want = normalize(ref)
    assert got == want, f"{suite}/{sub}: engine {got} != reference {want}"
    # pass/fail parity: reference exit 2 ⇔ any error ⇔ engine exit 2
    ref_fails = any(v for v in want.values())
    assert (res.exit_code == 2) == ref_fails
    if not ref_fails:
        assert res.exit_code == 0


def test_wrong_schema_rejected():
    """unique_schema_wrong.json carries `unique: 18` — the reference
    rejects it at schema-validation time (exit 1 with no loadable
    schema, [verified]); load_schemas must reject it too."""
    f = f"{BASE}/unique_simple/unique_schema_wrong.json"
    registry, issues = load_schemas([(f, parse_json_or_yaml(f))])
    assert registry == {}
    assert any(i.reason == "schema_error" for i in issues)


def test_duplicate_schema_id_rejected():
    """named_unique ships three files sharing one $id — later files
    are dup_id rejects (extensible_validator.py:347-365)."""
    files = [
        f"{BASE}/named_unique/named_unique_schema.json",
        f"{BASE}/named_unique/duplicated_named_unique_schema.json",
    ]
    registry, issues = load_schemas([(f, parse_json_or_yaml(f)) for f in files])
    assert len(registry) == 1
    assert [i.reason for i in issues] == ["dup_id"]


def test_schema_hash_matches_reference():
    """GetNormalizedJSONHash parity (extensible_validator.py:832-839)."""
    from python_extended_json_schema_validator_spark.schemas import (
        normalized_json_hash,
    )

    schema = parse_json_or_yaml(f"{BASE}/compound_pk/compound_pk_schema.json")
    import hashlib

    want = hashlib.sha1(
        json.dumps(
            schema, sort_keys=True, indent=None, separators=(",", ":")
        ).encode("utf-8")
    ).hexdigest()
    assert normalized_json_hash(schema) == want


def test_yaml_document_fallback(tmp_path, spark):
    """A corrupt-JSON-but-valid-YAML document parses via the fallback
    (extensible_validator.py:1014-1053)."""
    sdir = tmp_path / "docs"
    sdir.mkdir()
    (sdir / "doc1.json").write_text(
        '"@schema": compound_pk_example/1.0\nlocal_id: uno\nother_id: diez\n'
    )
    schemas = [
        (
            "s.json",
            parse_json_or_yaml(f"{BASE}/compound_pk/compound_pk_schema.json"),
        )
    ]
    res = run_suite(spark, schemas, str(sdir))
    assert res.exit_code == 0
    assert list(res.per_file.values()) == [[]]


def test_unparseable_document_is_fatal(tmp_path, spark):
    (tmp_path / "bad.json").write_text("{: not json or yaml :}{")
    schemas = [
        (
            "s.json",
            parse_json_or_yaml(f"{BASE}/compound_pk/compound_pk_schema.json"),
        )
    ]
    res = run_suite(spark, schemas, str(tmp_path))
    assert res.exit_code == 2
    assert list(res.per_file.values()) == [["fatal"]]


def reference_report(schema_files, docs, config=None, warm_up=False):
    payload = json.dumps(
        {
            "schemas": [parse_json_or_yaml(f) for f in schema_files],
            "docs": [[n, d] for n, d in docs],
            "config": config or {},
            "warm_up": warm_up,
            "report": True,
        }
    )
    proc = subprocess.run(
        [sys.executable, RUNNER], input=payload, capture_output=True,
        text=True, timeout=180,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    return json.loads(proc.stdout)


def test_report_parity_schema_entries_and_bindings(spark):
    """Report shape parity on fk_to_named_pk: per-schema entries carry
    the SAME normalized schema_hash as the reference
    (GetNormalizedJSONHash), and per-doc entries bind the same
    schema_id + schema_hash."""
    suite = "fk_to_named_pk"
    sfiles = scan_files(f"{BASE}/{suite}/schemas")
    docs = [
        (os.path.basename(f), d)
        for f, d, err in scan_documents(f"{BASE}/{suite}/bad_validation")
        if err is None
    ]
    ref = reference_report(sfiles, docs)

    schemas = [(f, parse_json_or_yaml(f)) for f in sfiles]
    res = run_suite(spark, schemas, docs)
    rep = res.report(quiet=True)

    got_schemas = sorted(
        (e["uri"], e["schema_hash"]) for e in rep if "uri" in e
    )
    want_schemas = sorted((e["uri"], e["schema_hash"]) for e in ref["schemas"])
    assert got_schemas == want_schemas

    got_docs = {
        e["file"]: (e["schema_id"], e["schema_hash"]) for e in rep if "schema_id" in e
    }
    want_docs = {
        e["file"]: (e["schema_id"], e["schema_hash"]) for e in ref["docs"]
    }
    assert got_docs == want_docs

    # quiet report carries no schema bodies; non-quiet does
    assert all("schema" not in e for e in rep if "uri" in e)
    full = res.report(quiet=False)
    assert any("schema" in e for e in full if "uri" in e)

    # --verbose-report parity: doc entries embed the SAME parsed
    # contents the reference's verbose report embeds (its entries
    # carry "json" until the quiet branch deletes it)
    verbose = res.report(quiet=False, docs=dict(docs))
    got_json = {
        e["file"]: e["json"] for e in verbose if "schema_id" in e
    }
    want_json = {e["file"]: e["json"] for e in ref["docs"]}
    assert got_json == want_json

    # error_report keeps only erroring doc entries
    err_rep = res.report(error_report=True)
    doc_entries = [e for e in err_rep if "schema_id" in e]
    assert doc_entries and all(e["errors"] for e in doc_entries)


def test_guess_mode_parity(spark):
    """Full guess mode (--guess-schema): docs WITHOUT a schema id are
    assigned by brute-force validation against every loaded schema;
    guessed docs register keys and participate in FK checks exactly as
    dispatched docs (failed tries leave no key residue).  Compared
    against the reference running guess_unmatched=True on the same
    docs: identical assignments and reasons."""
    dim_schema = {
        "$schema": "http://json-schema.org/draft-07/schema#",
        "$id": "guess://dim/1.0",
        "type": "object",
        "properties": {"local_id": {"type": "string", "primary_key": True},
                       "weight": {"type": "integer"}},
        "required": ["local_id"],
        "additionalProperties": False,
    }
    fact_schema = {
        "$schema": "http://json-schema.org/draft-07/schema#",
        "$id": "guess://fact/1.0",
        "type": "object",
        "properties": {"ref_id": {"type": "string"}},
        "foreign_keys": [{"schema_id": "guess://dim/1.0", "members": ["ref_id"]}],
        "required": ["ref_id"],
        "additionalProperties": False,
    }
    docs = [
        ("d1", {"local_id": "uno", "weight": 1}),
        ("d2", {"local_id": "dos", "weight": 2}),
        ("f1", {"ref_id": "uno"}),
        ("f2", {"ref_id": "nope"}),     # guessed as fact, stale FK
        ("x1", {"mystery": True}),      # matches neither schema
    ]

    payload = json.dumps(
        {
            "schemas": [dim_schema, fact_schema],
            "docs": [[n, d] for n, d in docs],
            "config": {},
            "warm_up": False,
            "guess": True,
            "report": True,
        }
    )
    proc = subprocess.run(
        [sys.executable, RUNNER], input=payload, capture_output=True,
        text=True, timeout=180,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    ref = json.loads(proc.stdout)

    res = run_suite(
        spark,
        [("dim.json", dim_schema), ("fact.json", fact_schema)],
        docs,
        guess_unmatched=True,
    )
    # identical schema assignments
    ref_assign = {e["file"]: e["schema_id"] for e in ref["docs"]}
    assert res.doc_schema == {
        f: u for f, u in ref_assign.items() if u is not None
    }
    assert res.doc_schema == {
        "d1": "guess://dim/1.0", "d2": "guess://dim/1.0",
        "f1": "guess://fact/1.0", "f2": "guess://fact/1.0",
    }
    # identical reasons (normalize keyword reasons to schema_error)
    got = normalize(res.per_file)
    want = normalize(ref["per_file"])
    # the reference reports one error per failed (schema, keyword) for
    # the unguessable doc; collapse both sides to set-of-reasons there
    got = {f: sorted(set(v)) if f == "x1" else v for f, v in got.items()}
    want = {f: sorted(set(v)) if f == "x1" else v for f, v in want.items()}
    assert got == want
    assert res.exit_code == 2


def test_cli_exit_codes_and_report(spark, tmp_path):
    """The module CLI (⇔ the reference's `ejv schemadir docs...`):
    exit 2 on violations with a reference-shaped report, exit 0 on the
    good dir, exit 1 with no usable schema."""
    from python_extended_json_schema_validator_spark.__main__ import main

    rep = str(tmp_path / "rep.json")
    rc = main([
        f"{BASE}/fk_simple_example/schemas",
        f"{BASE}/fk_simple_example/bad_validation",
        "--report", rep, "--quiet-report",
    ])
    assert rc == 2
    entries = json.load(open(rep))
    bad = sorted(
        os.path.basename(e["file"]) for e in entries if e.get("errors")
    )
    assert bad == [
        "ref_dos_bad_2.json", "ref_siete.json", "trestres.json", "uno.json"
    ]
    # schema entries lead with hashes
    assert sum(1 for e in entries if "uri" in e) == 2

    rc = main([
        f"{BASE}/fk_simple_example/schemas",
        f"{BASE}/fk_simple_example/good_validation",
    ])
    assert rc == 0

    empty = tmp_path / "noschemas"
    empty.mkdir()
    rc = main([str(empty), f"{BASE}/fk_simple_example/good_validation"])
    assert rc == 1


def test_cli_annotation_and_version(spark, tmp_path, capsys):
    """--annotation extracts a dotted path into each doc entry's
    'annot' key (⇔ reference __main__.py:340-345,418-421); -V prints
    the version string."""
    from python_extended_json_schema_validator_spark.__main__ import main
    from python_extended_json_schema_validator_spark.suite import (
        extract_annotation,
    )

    # unit: the dotted/indexed subset
    doc = {"_id": "d1", "a": {"b": [10, {"c": 7}]}}
    assert extract_annotation(doc, "$._id") == (True, "d1")
    assert extract_annotation(doc, "a.b[1].c") == (True, 7)
    assert extract_annotation(doc, "$.missing") == (False, None)
    assert extract_annotation(doc, "a.b[9]") == (False, None)

    rep = str(tmp_path / "rep.json")
    rc = main([
        f"{BASE}/fk_simple_example/schemas",
        f"{BASE}/fk_simple_example/bad_validation",
        "--report", rep, "--quiet-report",
        "--annotation", "$.something.ref_local_id",
    ])
    assert rc == 2
    entries = json.load(open(rep))
    docs = [e for e in entries if "schema_id" in e]
    with_annot = [e for e in docs if "annot" in e]
    assert with_annot, "ref_* docs carry something.ref_local_id"
    # every annot value equals the member in the source file
    for e in with_annot:
        src = json.load(open(e["file"]))
        assert e["annot"] == src["something"]["ref_local_id"]
    assert any("annot" not in e for e in docs), "no-match docs skip the key"

    import pytest as _pytest

    with _pytest.raises(SystemExit) as ei:
        main(["-V"])
    assert ei.value.code == 0
    assert "version" in capsys.readouterr().out


def test_iter_arrays_suite(spark, tmp_path):
    """--iter-arrays: an array file shreds into `file [i]` entries;
    duplicate keys ACROSS elements of one file flag normally."""
    d = tmp_path / "docs"
    d.mkdir()
    (d / "arr.json").write_text(json.dumps([
        {"@schema": "compound_pk_example/1.0", "local_id": "a", "other_id": "x"},
        {"@schema": "compound_pk_example/1.0", "local_id": "b", "other_id": "y"},
        {"@schema": "compound_pk_example/1.0", "local_id": "a", "other_id": "x"},
    ]))
    schemas = [(
        "s.json",
        parse_json_or_yaml(f"{BASE}/compound_pk/compound_pk_schema.json"),
    )]
    res = run_suite(spark, schemas, str(d), iterate_over_arrays=True)
    assert res.exit_code == 2
    flagged = {os.path.basename(f): v for f, v in res.per_file.items() if v}
    assert list(flagged.values()) == [["dup_pk"]]
    assert list(flagged)[0].endswith("arr.json [2]")


def test_fk_inside_array_items_parity(spark):
    """foreign_keys declared INSIDE an items schema: the trigger fires
    per array element in the reference (jsonschema walks elements), so
    members are element-relative — compiled here as `arr[].member`
    paths with fan-out probes."""
    dim = {
        "$schema": "http://json-schema.org/draft-07/schema#",
        "$id": "arr://dim/1.0",
        "type": "object",
        "properties": {"k": {"type": "string", "primary_key": True}},
    }
    fact = {
        "$schema": "http://json-schema.org/draft-07/schema#",
        "$id": "arr://fact/1.0",
        "type": "object",
        "properties": {
            "links": {
                "type": "array",
                "items": {
                    "type": "object",
                    "properties": {"ref": {"type": "string"}},
                    "foreign_keys": [
                        {"schema_id": "arr://dim/1.0", "members": ["ref"]}
                    ],
                },
            }
        },
    }
    docs = [
        ("d1", {"@schema": "arr://dim/1.0", "k": "a"}),
        ("f1", {"@schema": "arr://fact/1.0",
                "links": [{"ref": "a"}, {"ref": "zzz"}]}),
        ("f2", {"@schema": "arr://fact/1.0", "links": [{"ref": "a"}]}),
        ("f3", {"@schema": "arr://fact/1.0", "links": []}),
    ]
    payload = json.dumps({
        "schemas": [dim, fact], "docs": [[n, d] for n, d in docs],
        "config": {}, "warm_up": False,
    })
    proc = subprocess.run([sys.executable, RUNNER], input=payload,
                          capture_output=True, text=True, timeout=180)
    assert proc.returncode == 0, proc.stderr[-2000:]
    ref = json.loads(proc.stdout)

    res = run_suite(spark, [("dim.json", dim), ("fact.json", fact)], docs)
    assert normalize(res.per_file) == normalize(ref), (res.per_file, ref)


def test_unnamed_fk_to_scoped_pool_parity(spark):
    """Unnamed FK whose target pool's (first) key is limit_scope: the
    probe scopes by the FK doc's own file (PKKeys.limit_scope,
    fk_check.py:309-317,405-411) — same-file match passes, cross-file
    is stale."""
    dim = {
        "$schema": "http://json-schema.org/draft-07/schema#",
        "$id": "usc://dim/1.0",
        "type": "object",
        "properties": {
            "k": {"type": "string",
                  "primary_key": {"members": True, "limit_scope": True}}
        },
    }
    fact = {
        "$schema": "http://json-schema.org/draft-07/schema#",
        "$id": "usc://fact/1.0",
        "type": "object",
        "foreign_keys": [{"schema_id": "usc://dim/1.0", "members": ["r"]}],
        "properties": {"r": {"type": "string"}},
    }
    docs = [
        ("fileA", {"@schema": "usc://dim/1.0", "k": "uno"}),
        ("fileA", {"@schema": "usc://fact/1.0", "r": "uno"}),   # same file: ok
        ("fileB", {"@schema": "usc://fact/1.0", "r": "uno"}),   # cross: stale
    ]
    ref = reference_run([dim, fact], docs)
    res = run_suite(spark, [("dim.json", dim), ("fact.json", fact)], docs)
    assert normalize(res.per_file) == normalize(ref), (res.per_file, ref)
    assert normalize(ref) == {"fileA": [], "fileB": ["stale_fk"]}


def test_custom_schema_id_path(spark):
    r"""--schema_id_path: a dotted custom probe replaces the default
    @schema/_schema/\$schema set."""
    schema = {
        "$schema": "http://json-schema.org/draft-07/schema#",
        "$id": "sip://t/1.0",
        "type": "object",
        "properties": {"v": {"type": "string", "unique": True}},
    }
    docs = [
        ("r1", {"meta": {"kind": "sip://t/1.0"}, "v": "a"}),
        ("r2", {"meta": {"kind": "sip://t/1.0"}, "v": "a"}),
    ]
    res = run_suite(spark, [("s.json", schema)], docs, probes=("meta.kind",))
    assert normalize(res.per_file) == {"r1": [], "r2": ["dup_unique"]}
    assert res.doc_schema == {"r1": "sip://t/1.0", "r2": "sip://t/1.0"}


def test_validate_json_table_distributed(spark):
    """The distributed entry point: (file, json) rows dispatched via
    JVM get_json_object, shredded by mapInPandas, validated by the
    engine — same verdicts as the driver-side suite runner on the
    fk_simple_example bad suite."""
    from pyspark.sql import functions as F

    from python_extended_json_schema_validator_spark.suite import (
        validate_json_table,
    )

    sfiles = scan_files(f"{BASE}/fk_simple_example/schemas")
    schemas = [(f, parse_json_or_yaml(f)) for f in sfiles]
    docs = [
        (os.path.basename(f), d)
        for f, d, err in scan_documents(f"{BASE}/fk_simple_example/bad_validation")
        if err is None
    ]
    df = spark.createDataFrame(
        [(n, json.dumps(d)) for n, d in docs], "file string, json string"
    )
    result, registry = validate_json_table(spark, schemas, df)
    got: dict = {n: [] for n, _ in docs}
    for r in result.violations.collect():
        got[r.row_id].append(r.reason)
    got = {k: sorted(v) for k, v in got.items()}
    want = run_suite(spark, schemas, docs).per_file
    assert got == want
    assert sorted(k for k, v in got.items() if v) == [
        "ref_dos_bad_2.json", "ref_siete.json", "trestres.json", "uno.json"
    ]


def test_ref_closure_and_allof_parity(spark):
    """Triggers behind $ref (PK inside #/definitions) and inside allOf
    branches fire in the reference — the compiler's closure walk must
    find both."""
    dim = {
        "$schema": "http://json-schema.org/draft-07/schema#",
        "$id": "ref://dim/1.0", "type": "object",
        "definitions": {"ident": {"type": "string", "primary_key": True}},
        "properties": {"k": {"$ref": "#/definitions/ident"}},
    }
    fact = {
        "$schema": "http://json-schema.org/draft-07/schema#",
        "$id": "ref://fact/1.0", "type": "object",
        "allOf": [
            {"properties": {"r": {"type": "string"}},
             "foreign_keys": [{"schema_id": "ref://dim/1.0", "members": ["r"]}]}
        ],
        "properties": {"extra": {"type": "integer", "minimum": 10}},
    }
    docs = [
        ("d1", {"@schema": "ref://dim/1.0", "k": "a"}),
        ("d2", {"@schema": "ref://dim/1.0", "k": "a"}),     # dup via $ref'd PK
        ("f1", {"@schema": "ref://fact/1.0", "r": "a", "extra": 11}),
        ("f2", {"@schema": "ref://fact/1.0", "r": "zzz", "extra": 12}),  # stale via allOf FK
        ("f3", {"@schema": "ref://fact/1.0", "r": "zzz", "extra": 3}),   # revoked by minimum
    ]
    ref = reference_run([dim, fact], docs)
    res = run_suite(spark, [("dim.json", dim), ("fact.json", fact)], docs)
    assert normalize(res.per_file) == normalize(ref)
    assert normalize(ref) == {
        "d1": [], "d2": ["dup_pk"], "f1": [], "f2": ["stale_fk"],
        "f3": ["schema_error"],
    }


def test_report_description_templates(spark):
    """Violation descriptions follow the reference's message shapes
    (unique_check.py:137-146, fk_check.py:436-449)."""
    res = run_suite(
        spark,
        [(f, parse_json_or_yaml(f))
         for f in scan_files(f"{BASE}/fk_simple_example/schemas")],
        [(os.path.basename(f), d)
         for f, d, e in scan_documents(f"{BASE}/fk_simple_example/bad_validation")
         if e is None],
    )
    rep = res.report(quiet=True)
    descs = [err["description"] for e in rep for err in e.get("errors", [])]
    assert any(d.startswith("Unmatching FK (2) in ref_dos_bad_2.json to schema "
                            "simple_pk_example/1.0 (any primary key)")
               for d in descs), descs
    assert any("Duplicated primary_key value for UK" in d for d in descs)


def test_root_type_check_parity(spark):
    """A non-object document must fail a root `type: object` check —
    the reference's jsonschema pass flags it; the shredded engine
    checks the whole-document literal (#root column)."""
    schema = {
        "$schema": "http://json-schema.org/draft-07/schema#",
        "$id": "root://t/1.0",
        "type": "object",
        "properties": {"v": {"type": "string"}},
    }
    docs = [
        ("good", {"@schema": "root://t/1.0", "v": "x"}),
    ]
    res = run_suite(spark, [("s.json", schema)], docs)
    assert res.per_file == {"good": []}
    # arrays/strings can't dispatch via @schema, so drive the shredded
    # check directly: guess mode assigns nothing (battery fails), and
    # the distributed path flags the root type
    from python_extended_json_schema_validator_spark.docshred import (
        shred_documents,
    )
    from python_extended_json_schema_validator_spark.schemas import load_schemas
    from python_extended_json_schema_validator_spark import ValidationEngine

    registry, _ = load_schemas([("s.json", schema)])
    cs = registry["root://t/1.0"]
    shredded = shred_documents(
        spark, [("arr", [1, 2, 3]), ("num", 7), ("obj", {"v": "x"})], cs
    )
    out = ValidationEngine([cs.table_spec]).validate(
        {cs.uri: shredded}
    ).violations.collect()
    got = {}
    for r in out:
        got.setdefault(r.row_id, []).append((r.constraint_id, r.reason))
    assert got == {
        "arr": [("check:#root:type", "type")],
        "num": [("check:#root:type", "type")],
    }


def test_compound_key_inside_items_parity(spark):
    """Compound unique inside items: the per-element cartesian binds
    members of the SAME element (["x","1"] dups ["x","1"], but
    {"a":"x","b":"2"} is a different tuple); a missing member in an
    element contributes no key."""
    schema = {
        "$schema": "http://json-schema.org/draft-07/schema#",
        "$id": "mg://t/1.0", "type": "object",
        "properties": {
            "rows": {"type": "array", "items": {
                "type": "object",
                "properties": {"a": {"type": "string"},
                               "b": {"type": "string"}},
                "unique": ["a", "b"]}}},
    }
    docs = [
        ("d1", {"@schema": "mg://t/1.0",
                "rows": [{"a": "x", "b": "1"}, {"a": "y", "b": "2"}]}),
        ("d2", {"@schema": "mg://t/1.0", "rows": [{"a": "x", "b": "1"}]}),
        ("d3", {"@schema": "mg://t/1.0", "rows": [{"a": "x"}]}),
        ("d4", {"@schema": "mg://t/1.0", "rows": [{"a": "x", "b": "2"}]}),
    ]
    ref = reference_run([schema], docs)
    res = run_suite(spark, [("s.json", schema)], docs)
    assert normalize(res.per_file) == normalize(ref)
    assert normalize(ref) == {"d1": [], "d2": ["dup_unique"], "d3": [],
                              "d4": []}


def test_nested_required_keywordless_parent(spark):
    """Regression (review finding): nested `required` under a parent
    object with NO keywords of its own must not reference a missing
    shred column — and a present-but-non-object parent makes required
    vacuous (jsonschema semantics), while an object parent missing the
    property flags it."""
    schema = {
        "$schema": "http://json-schema.org/draft-07/schema#",
        "$id": "nr://t/1.0", "type": "object",
        "properties": {
            "addr": {"properties": {"street": {"type": "string"}},
                     "required": ["street"]}
        },
    }
    docs = [
        ("ok", {"@schema": "nr://t/1.0", "addr": {"street": "s"}}),
        ("missing", {"@schema": "nr://t/1.0", "addr": {}}),
        ("nonobj", {"@schema": "nr://t/1.0", "addr": 5}),
        ("absent", {"@schema": "nr://t/1.0"}),
    ]
    ref = reference_run([schema], docs)
    res = run_suite(spark, [("s.json", schema)], docs)
    assert normalize(res.per_file) == normalize(ref)
    assert normalize(ref) == {
        "ok": [], "missing": ["schema_error"], "nonobj": [], "absent": [],
    }


def test_integer_accepts_integral_floats(spark):
    """Regression (review finding): draft-6/7 `integer` validates any
    number with zero fractional part (2.0, 1e22) — jsonschema-parity."""
    schema = {
        "$schema": "http://json-schema.org/draft-07/schema#",
        "$id": "int://t/1.0", "type": "object",
        "properties": {"n": {"type": "integer"}},
    }
    docs = [
        ("i", {"@schema": "int://t/1.0", "n": 2}),
        ("f0", {"@schema": "int://t/1.0", "n": 2.0}),
        ("fbig", {"@schema": "int://t/1.0", "n": 1.5e22}),
        ("frac", {"@schema": "int://t/1.0", "n": 2.5}),
        ("s", {"@schema": "int://t/1.0", "n": "2"}),
    ]
    ref = reference_run([schema], docs)
    res = run_suite(spark, [("s.json", schema)], docs)
    assert normalize(res.per_file) == normalize(ref)
    assert normalize(ref) == {
        "i": [], "f0": [], "fbig": [], "frac": ["schema_error"],
        "s": ["schema_error"],
    }


def test_shred_json_strings_null_document(spark):
    """Regression (review finding): the VALID JSON document `null`
    shreds like any non-object (root literal 'null' fails a root
    object-type check), distinct from a parse failure (all-NULL row,
    vacuous checks)."""
    from python_extended_json_schema_validator_spark import ValidationEngine
    from python_extended_json_schema_validator_spark.docshred import (
        shred_json_strings,
    )
    from python_extended_json_schema_validator_spark.schemas import load_schemas

    schema = {
        "$schema": "http://json-schema.org/draft-07/schema#",
        "$id": "nul://t/1.0", "type": "object",
        "properties": {"v": {"type": "string"}},
    }
    registry, _ = load_schemas([("s.json", schema)])
    cs = registry["nul://t/1.0"]
    df = spark.createDataFrame(
        [("null_doc", "null"), ("broken", "{nope"), ("good", '{"v":"x"}')],
        "file string, json string",
    )
    shredded = shred_json_strings(df, cs)
    out = ValidationEngine([cs.table_spec]).validate({cs.uri: shredded})
    got = {}
    for r in out.violations.collect():
        got.setdefault(r.row_id, []).append(r.reason)
    assert got == {"null_doc": ["type"]}

    # the distributed entry point flags DISPATCHED-but-unparseable
    # documents as 'fatal' (Spark's lenient get_json_object can pull
    # the @schema out of a truncated document that strict json.loads
    # rejects); documents with no extractable schema id are skipped as
    # unmatched, mirroring the reference
    from python_extended_json_schema_validator_spark.suite import (
        validate_json_table,
    )

    df2 = spark.createDataFrame(
        [
            ("trunc", "nul://t/1.0", '{"v": 12'),
            ("good", "nul://t/1.0", '{"v": "x"}'),
            ("bad_type", "nul://t/1.0", '{"v": 5}'),
        ],
        "file string, uri string, json string",
    )
    result, _ = validate_json_table(
        spark, [("s.json", schema)], df2, uri_col="uri"
    )
    got2 = {}
    for r in result.violations.collect():
        got2.setdefault(r.row_id, []).append(r.reason)
    assert got2 == {"trunc": ["fatal"], "bad_type": ["type"]}


def test_run_suite_violation_cap(spark):
    """The CLI-path collect is bounded: exceeding max_violations raises
    (limit(n+1) overflow probe) instead of materializing unbounded rows
    on the driver; the distributed path (validate_json_table) stays
    lazy and is the escape hatch."""
    import pytest as _pytest

    schema = {
        "$schema": "http://json-schema.org/draft-07/schema#",
        "$id": "cap://t/1.0",
        "type": "object",
        "required": ["must_have"],
        "properties": {"must_have": {"type": "string"}},
    }
    docs = [(f"d{i}", {"@schema": "cap://t/1.0"}) for i in range(20)]
    with _pytest.raises(ValueError, match="max_violations"):
        run_suite(spark, [("s.json", schema)], docs, max_violations=5)
    res = run_suite(spark, [("s.json", schema)], docs, max_violations=100)
    assert res.exit_code == 2
    assert sum(1 for v in res.per_file.values() if v) == 20


def test_verbose_report_embeds_json_and_schema_annot(spark):
    """--verbose-report parity (reference __main__.py:196-202,331-334,
    418-424): quiet is the DEFAULT; verbose embeds each doc's parsed
    contents under "json" and the schema body under "schema"; a
    JSONPath --annotation is extracted from the SCHEMA body into
    schema entries' "annot" as well as from each doc."""
    schema = {
        "$schema": "http://json-schema.org/draft-07/schema#",
        "$id": "vr://t/1.0",
        "type": "object",
        "properties": {"_id": {"type": "string"},
                       "v": {"type": "integer", "minimum": 0}},
        "title": "probe-title",
    }
    docs = [
        ("d1", {"$schema": "vr://t/1.0", "_id": "a", "v": 1}),
        ("d2", {"$schema": "vr://t/1.0", "_id": "b", "v": -1}),
    ]
    res = run_suite(spark, [("s.json", schema)], docs)
    docmap = dict(docs)

    verbose = res.report(quiet=False, docs=docmap, annotation="$._id")
    by_file = {e["file"]: e for e in verbose}
    assert by_file["s.json"]["schema"] == schema      # schema body rides
    assert by_file["d1"]["json"] == docmap["d1"]      # doc contents ride
    assert by_file["d2"]["json"] == docmap["d2"]
    assert by_file["d1"]["annot"] == "a"              # doc annot
    assert "annot" not in by_file["s.json"]           # no _id in schema

    # a schema-body annotation path lands on SCHEMA entries too
    with_t = res.report(quiet=True, docs=docmap, annotation="$.title")
    by_file_t = {e["file"]: e for e in with_t}
    assert by_file_t["s.json"]["annot"] == "probe-title"
    assert "annot" not in by_file_t["d1"]

    # quiet (the reference default): no schema body, no json contents
    quiet = res.report(quiet=True, docs=docmap)
    by_file_q = {e["file"]: e for e in quiet}
    assert "schema" not in by_file_q["s.json"]
    assert "json" not in by_file_q["d1"]
