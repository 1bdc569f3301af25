"""Key canonicalization parity with the reference's GenKeyStrings
(index_check.py:247-293) — SURVEY.md §1.3 semantics."""

import json

from pyspark.sql import functions as F

from python_extended_json_schema_validator_spark.keys import (
    canonical_key,
    json_scalar,
    key_columns,
)
from python_extended_json_schema_validator_spark.providers import canonical_key_py


def test_json_scalar_type_distinctness(spark):
    df = spark.createDataFrame(
        [(2, "2", 2.5, True, "dos", None)],
        "i long, s string, f double, b boolean, t string, n string",
    )
    row = df.select(
        json_scalar(F.col("i")).alias("i"),
        json_scalar(F.col("s")).alias("s"),
        json_scalar(F.col("f")).alias("f"),
        json_scalar(F.col("b")).alias("b"),
        json_scalar(F.col("t")).alias("t"),
        json_scalar(F.col("n")).alias("n"),
    ).first()
    assert row.i == "2"
    assert row.s == '"2"'  # int 2 != str "2" — verified reference behavior
    assert row.f == "2.5"
    assert row.b == "true"
    assert row.t == '"dos"'
    assert row.n is None


def test_composite_matches_reference_json_dumps(spark):
    # reference: json.dumps(list, sort_keys=True, separators=(",",":"))
    df = spark.createDataFrame([("tres", "treinta")], "a string, b string")
    got = df.select(canonical_key([F.col("a"), F.col("b")]).alias("k")).first().k
    assert got == json.dumps(["tres", "treinta"], separators=(",", ":"))
    assert got == '["tres","treinta"]'


def test_missing_member_yields_null_key(spark):
    df = spark.createDataFrame([("solo", None), (None, None)], "a string, b string")
    keys = [r.k for r in df.select(canonical_key([F.col("a"), F.col("b")]).alias("k")).collect()]
    assert keys == [None, None]


def test_escaping_in_composite(spark):
    df = spark.createDataFrame([('he"llo', "a,b")], "a string, b string")
    got = df.select(canonical_key([F.col("a"), F.col("b")]).alias("k")).first().k
    assert got == json.dumps(['he"llo', "a,b"], separators=(",", ":"))


def test_limit_scope_prefixes_scope(spark):
    df = spark.createDataFrame([("f1", "uno")], "part string, v string")
    key, obs = key_columns(["v"], limit_scope=True, scope_col="part")
    r = df.select(key.alias("k"), obs.alias("o")).first()
    assert r.k == '"f1"|"uno"'
    assert r.o == "uno"  # observed value never carries the scope


def test_python_twin_matches_spark(spark):
    cases = [(2,), ("2",), ("dos",), (("a", "b"),), ((1, "x"),)]
    df = spark.createDataFrame(
        [(2, "2", "dos", "a", "b", 1, "x")],
        "i long, s string, d string, a string, b string, one long, x string",
    )
    assert canonical_key_py(2) == df.select(canonical_key([F.col("i")]).alias("k")).first().k
    assert canonical_key_py("2") == df.select(canonical_key([F.col("s")]).alias("k")).first().k
    assert (
        canonical_key_py(("a", "b"))
        == df.select(canonical_key([F.col("a"), F.col("b")]).alias("k")).first().k
    )
    assert (
        canonical_key_py((1, "x"))
        == df.select(canonical_key([F.col("one"), F.col("x")]).alias("k")).first().k
    )


def test_null_array_elements_render_json_null(spark):
    """A NULL element inside a TYPED array key member must render as
    the JSON literal 'null' (reference json.dumps([1, None]) →
    elements '1', 'null'), not SQL NULL — the typed fast paths in
    _element_literal (plain cast / py_double_repr) regressed this in
    round 6 (ADVICE r06 medium): a NULL key element silently misses
    every ledger semi-join."""
    from python_extended_json_schema_validator_spark.keys import (
        key_strings,
        key_strings_py,
    )

    for ddl, arr, doc_arr in [
        ("arr array<bigint>", [1, None], [1, None]),
        ("arr array<double>", [2.5, None], [2.5, None]),
        ("arr array<string>", ["x", None], ["x", None]),
        ("arr array<boolean>", [True, None], [True, None]),
    ]:
        df = spark.createDataFrame([(arr,)], ddl)
        keys_col, _obs = key_strings(["arr"], df)
        got = df.select(keys_col.alias("k")).first().k
        want = key_strings_py({"arr": doc_arr}, ["arr"])
        assert got == want, (ddl, got, want)
        assert None not in got, (ddl, got)
        assert any("null" in k for k in got), (ddl, got)


def test_nested_struct_members(spark):
    df = spark.createDataFrame(
        [((("l2", "o2"),))], "ejemplo struct<local_id_2:string, other_id_2:string>"
    )
    got = (
        df.select(
            canonical_key(
                [F.col("ejemplo.local_id_2"), F.col("ejemplo.other_id_2")]
            ).alias("k")
        )
        .first()
        .k
    )
    assert got == '["l2","o2"]'
