"""Golden-corpus parity: uniqueness family (FIXTURES.md F1-F4, F10 ⇔
reference test-data unique_simple / multiple_unique / compound_unique /
compound_pk / named_pk; verdicts verified against the reference)."""

from python_extended_json_schema_validator_spark import (
    KeySpec,
    TableSpec,
    ValidationEngine,
)
from tests.conftest import viol_set


def run(spark, spec, rows, schema):
    df = spark.createDataFrame(rows, schema)
    return ValidationEngine([spec]).validate({spec.name: df})


def test_f1_unique_simple_good(spark):
    spec = TableSpec(name="t1", row_id="row_id", unique=[KeySpec(("local_id",))])
    res = run(
        spark,
        spec,
        [("r1", "uno"), ("r2", "dos"), ("r3", "tres")],
        "row_id string, local_id string",
    )
    assert viol_set(res.violations) == set()


def test_f1_unique_simple_bad(spark):
    spec = TableSpec(name="t1", row_id="row_id", unique=[KeySpec(("local_id",))])
    res = run(
        spark,
        spec,
        [("r1", "uno"), ("r2", "dos"), ("r4", "uno")],
        "row_id string, local_id string",
    )
    # survivor = min(row_id) = r1; r4 blamed (deterministic tiebreak)
    assert viol_set(res.violations) == {
        ("unique:local_id", "dup_unique", "r4", "uno")
    }


def test_f2_multiple_unique_independent(spark):
    spec = TableSpec(
        name="t2",
        row_id="row_id",
        unique=[KeySpec(("local_id",)), KeySpec(("other_id",))],
    )
    res = run(
        spark,
        spec,
        [("r1", "uno", "diez"), ("r2", "dos", "veinte"), ("r3", "tres", "diez")],
        "row_id string, local_id string, other_id string",
    )
    assert viol_set(res.violations) == {
        ("unique:other_id", "dup_unique", "r3", "diez")
    }


def test_f3_compound_pk(spark):
    spec = TableSpec(
        name="t3",
        row_id="row_id",
        primary_keys=[KeySpec(("local_id", "other_id"))],
    )
    res = run(
        spark,
        spec,
        [
            ("r1", "uno", "diez"),
            ("r2", "dos", "veinte"),
            ("r3", "tres", "treinta"),
            ("r4", "tres", "treinta"),
            # same local_id different other_id: NOT a dup of the compound key
            ("r5", "uno", "once"),
        ],
        "row_id string, local_id string, other_id string",
    )
    # observed value is the canonical JSON array (verified reference output)
    assert viol_set(res.violations) == {
        ("pk:local_id,other_id", "dup_pk", "r4", '["tres","treinta"]')
    }


def test_f3_missing_member_exclusion(spark):
    # two identical rows missing other_id → NO violation (verified)
    spec = TableSpec(
        name="t3",
        row_id="row_id",
        primary_keys=[KeySpec(("local_id", "other_id"))],
    )
    res = run(
        spark,
        spec,
        [("r1", "solo", None), ("r2", "solo", None)],
        "row_id string, local_id string, other_id string",
    )
    assert viol_set(res.violations) == set()


def test_f4_named_pk_nested(spark):
    spec = TableSpec(
        name="t4",
        row_id="row_id",
        primary_keys=[
            KeySpec(("local_id", "other_id"), name="pk"),
            KeySpec(("ejemplo.local_id_2", "ejemplo.other_id_2"), name="2pk"),
        ],
    )
    rows = [
        ("r1", "a", "b", ("x", "y")),
        ("r2", "c", "d", ("x", "y")),  # dup of nested 2pk only
    ]
    schema = (
        "row_id string, local_id string, other_id string, "
        "ejemplo struct<local_id_2:string, other_id_2:string>"
    )
    res = run(spark, spec, rows, schema)
    assert viol_set(res.violations) == {
        ("pk:2pk", "dup_pk", "r2", '["x","y"]')
    }


def test_f10_limit_scope(spark):
    spec = TableSpec(
        name="t10",
        row_id="row_id",
        scope_col="part_id",
        unique=[KeySpec(("local_id",), limit_scope=True)],
    )
    res = run(
        spark,
        spec,
        [
            ("p1", "r1", "uno"),
            ("p2", "r2", "uno"),  # same key, different scope → OK
            ("p1", "r3", "uno"),  # same key same scope → dup
        ],
        "part_id string, row_id string, local_id string",
    )
    assert viol_set(res.violations) == {
        ("unique:local_id", "dup_unique", "r3", "uno")
    }


def test_int_str_key_distinctness(spark):
    # int 2 and str "2" are DIFFERENT keys (verified reference behavior)
    spec = TableSpec(name="t", row_id="row_id", unique=[KeySpec(("a", "b"))])
    res = run(
        spark,
        spec,
        [("r1", 2, "x"), ("r2", 2, "x")],
        "row_id string, a long, b string",
    )
    assert viol_set(res.violations) == {
        ("unique:a,b", "dup_unique", "r2", '[2,"x"]')
    }
