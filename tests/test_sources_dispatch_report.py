"""Sources (array shredding, corrupt JSON), schema dispatch, report
sink and exit codes."""

import json
import tempfile

import pytest
from pyspark.sql import functions as F

from python_extended_json_schema_validator_spark import (
    ColumnCheck,
    KeySpec,
    TableSpec,
    ValidationEngine,
)
from python_extended_json_schema_validator_spark import report as report_mod
from python_extended_json_schema_validator_spark.dispatch import SchemaDispatcher
from python_extended_json_schema_validator_spark.sources import (
    read_json_documents,
    shred_arrays,
)


def test_read_json_documents_with_corrupt(spark):
    with tempfile.TemporaryDirectory() as d:
        with open(f"{d}/good.json", "w") as f:
            json.dump({"local_id": "uno", "n": 1}, f)
        with open(f"{d}/bad.json", "w") as f:
            f.write("{not json at all")
        df = read_json_documents(
            spark, d, schema="local_id string, n long"
        )
        rows = {r.file.split("/")[-1]: r for r in df.collect()}
        assert rows["good.json"].local_id == "uno"
        assert rows["bad.json"]._corrupt is not None
        assert rows["bad.json"].local_id is None


def test_shred_arrays_synthetic_names(spark):
    df = spark.createDataFrame(
        [("f1.json", [10, 20, 30])], "file string, items array<long>"
    )
    out = shred_arrays(df, "items").collect()
    # the reference names shredded entries `f [i]`
    assert [(r.file, r.doc) for r in out] == [
        ("f1.json [0]", 10),
        ("f1.json [1]", 20),
        ("f1.json [2]", 30),
    ]


def test_schema_dispatch_routing(spark):
    df = spark.createDataFrame(
        [
            ("f1", "tA", 5, None),
            ("f2", "tB", None, "ok"),
            ("f3", "tB", None, "this-is-too-long"),
            ("f4", None, 1, None),       # no_id
            ("f5", "ghost", 1, None),    # schema_unknown
        ],
        "file string, `_schema` string, size long, name string",
    )
    disp = SchemaDispatcher(
        {
            "tA": TableSpec(
                name="tA", row_id="file",
                checks=[ColumnCheck(column="size", minimum=1)],
            ),
            "tB": TableSpec(
                name="tB", row_id="file",
                checks=[ColumnCheck(column="name", max_length=5)],
            ),
        }
    )
    got = {(r.reason, r.row_id) for r in disp.validate(df).collect()}
    assert got == {
        ("no_id", "f4"),
        ("schema_unknown", "f5"),
        ("maxLength", "f3"),
    }


def test_guess_mode_first_match_wins(spark):
    df = spark.createDataFrame(
        [("f1", 5), ("f2", -5)], "file string, v long"
    )
    disp = SchemaDispatcher(
        {
            "pos": TableSpec(name="pos", row_id="file",
                             checks=[ColumnCheck(column="v", minimum=0)]),
            "neg": TableSpec(name="neg", row_id="file",
                             checks=[ColumnCheck(column="v", maximum=0)]),
        }
    )
    got = {r["file"]: r["__matched_schema"] for r in
           disp.guess(df).select("file", "__matched_schema").collect()}
    assert got == {"f1": "pos", "f2": "neg"}


def test_json_report_and_exit_codes(spark):
    spec = TableSpec(
        name="t", row_id="rid",
        checks=[ColumnCheck(column="v", minimum=0)],
        unique=[KeySpec(("v",))],
    )
    df = spark.createDataFrame(
        [("r1", 1), ("r2", -1), ("r3", 1)], "rid string, v long"
    )
    res = ValidationEngine([spec]).validate({"t": df})
    rep = report_mod.json_report(res)
    by_id = {e["file"]: e for e in rep}
    assert len(by_id) == 3
    assert by_id["r1"]["errors"] == []
    assert {e["reason"] for e in by_id["r2"]["errors"]} == {"minimum"}
    assert {e["reason"] for e in by_id["r3"]["errors"]} == {"dup_unique"}

    err_only = report_mod.json_report(res, error_report=True)
    assert {e["file"] for e in err_only} == {"r2", "r3"}

    # exit-code contract incl. the verified report-mode quirk
    assert report_mod.exit_code(0, 0) == 0
    assert report_mod.exit_code(0, 5) == 2
    assert report_mod.exit_code(0, 5, report_mode=True) == 0
    assert report_mod.exit_code(2, 5) == 3
    assert report_mod.exit_code(0, 0, schemas_loaded=False) == 1


def test_dot_from_registry_renders_ports_and_edges():
    from python_extended_json_schema_validator_spark.graph import dot_from_registry
    from python_extended_json_schema_validator_spark.schemas import (
        load_schemas, parse_json_or_yaml, scan_files,
    )

    files = scan_files("/root/reference/test-data/fk_to_named_pk/schemas")
    registry, issues = load_schemas(
        [(f, parse_json_or_yaml(f)) for f in files]
    )
    assert not issues
    dot = dot_from_registry(registry, title="fk_to_named_pk")
    assert dot.startswith("digraph")
    # schema header with $id subscript
    assert "named_pk_example/1.0" in dot
    # nested key member row present with its named-PK badge
    assert "ejemplo.local_id_2" in dot and "PK 2pk" in dot
    # FK edge lands on the referenced key's member port
    assert (
        "p_fk_to_named_pk_1_0:p_something_ref_local_id -> "
        "p_named_pk_example_1_0:p_local_id" in dot
    )


def test_report_df_matches_json_report(spark):
    """report_df is the lazy 10^12-row path: same entry shape as
    json_report (built on the same frames), no driver collect until
    the caller acts."""
    from pyspark.sql import DataFrame

    spec = TableSpec(
        name="t", row_id="rid",
        checks=[ColumnCheck(column="v", minimum=0)],
        unique=[KeySpec(("v",))],
    )
    spec2 = TableSpec(
        name="u", row_id="rid",
        checks=[ColumnCheck(column="w", max_length=2)],
    )
    res = ValidationEngine([spec, spec2]).validate({
        "t": spark.createDataFrame(
            [("r1", 1), ("r2", -1), ("r3", 1)], "rid string, v long"
        ),
        "u": spark.createDataFrame(
            [("u1", "ok"), ("u2", "toolong")], "rid string, w string"
        ),
    })
    rdf = report_mod.report_df(res, annotations={"val": "v"})
    assert isinstance(rdf, DataFrame)  # lazy — nothing collected yet
    assert [f.name for f in rdf.schema.fields] == [
        "table", "file", "annotations", "errors"
    ]
    want = report_mod.json_report(res, annotations={"val": "v"})
    got_rows = {
        (r.table, r.file): r for r in rdf.collect()
    }
    assert len(got_rows) == len(want) == 5
    for entry in want:
        r = got_rows[(entry["table"], entry["file"])]
        assert sorted(e.reason for e in (r.errors or [])) == sorted(
            e["reason"] for e in entry["errors"]
        )
        assert dict(r.annotations or {}) == entry.get("annotations", {})

    # error_report filter agrees too
    err_df = report_mod.report_df(res, error_report=True)
    assert {(r.table, r.file) for r in err_df.collect()} == {
        (e["table"], e["file"])
        for e in report_mod.json_report(res, error_report=True)
    } == {("t", "r2"), ("t", "r3"), ("u", "u2")}


def test_report_df_verbose_parity_with_driver_report(spark):
    """Round-5 item: the DISTRIBUTED report (report_df over
    validate_json_table's shredded tables, doc_json_col='__raw' +
    annotation_path) is entry-for-entry equal to the driver path's
    verbose report (SuiteResult.report(quiet=False, docs=...,
    annotation=...)) including the `json` document embedding and the
    `annot` key — the scale report is feature-complete vs the CLI."""
    import json as _json

    from python_extended_json_schema_validator_spark.suite import (
        run_suite,
        validate_json_table,
    )

    schema = {
        "$schema": "http://json-schema.org/draft-07/schema#",
        "$id": "rep://v/1.0",
        "type": "object",
        "required": ["rid"],
        "properties": {
            "rid": {"type": "string"},
            "n": {"type": "integer", "minimum": 0},
            "something": {
                "type": "object",
                "properties": {"ref_local_id": {"type": "string"}},
            },
        },
    }
    docs = [
        ("f1", {"@schema": "rep://v/1.0", "rid": "a", "n": 3,
                "something": {"ref_local_id": "A1"}}),
        ("f2", {"@schema": "rep://v/1.0", "rid": "b", "n": -2}),
        ("f3", {"@schema": "rep://v/1.0", "n": 1,
                "something": {"ref_local_id": "C3"}}),
    ]
    # driver path: verbose report with embedded docs + annotation
    res = run_suite(spark, [("s.json", schema)], docs)
    driver = res.report(
        quiet=False,
        docs={f: d for f, d in docs},
        annotation="$.something.ref_local_id",
    )
    driver_docs = {e["file"]: e for e in driver if "schema" not in e}

    # distributed path: same docs as a (file, json) table
    rows = [(n, _json.dumps(d)) for n, d in docs]
    df = spark.createDataFrame(rows, "file string, json string")
    result, registry = validate_json_table(
        spark, [("s.json", schema)], df, keep_raw=True
    )
    rdf = report_mod.report_df(
        result,
        doc_json_col="__raw",
        annotation_path="$.something.ref_local_id",
    )
    assert [f.name for f in rdf.schema.fields] == [
        "table", "file", "annotations", "json", "annot", "errors"
    ]
    dist = {r.file: r for r in rdf.collect()}

    assert set(dist) == set(driver_docs) == {"f1", "f2", "f3"}
    for fname, want in driver_docs.items():
        got = dist[fname]
        # errors: same reason multiset and paths shape
        assert sorted(e.reason for e in (got.errors or [])) == sorted(
            e["reason"] for e in want["errors"]
        )
        # json: embedded document contents equal (verbose mode)
        assert _json.loads(got.json) == want["json"]
        # annot: same extraction, absent ⇔ NULL
        assert got.annot == want.get("annot"), (fname, got.annot, want)
