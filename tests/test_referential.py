"""Golden-corpus parity: referential family (FIXTURES.md F5-F9 ⇔
reference test-data fk_simple_example / foreign_key_example /
fk_to_named_pk + the index/join_keys gap the reference corpus lacks)."""

from python_extended_json_schema_validator_spark import (
    ColumnCheck,
    ForeignKeySpec,
    KeySpec,
    TableSpec,
    ValidationEngine,
)
from tests.conftest import viol_set

FACT_SCHEMA = "row_id string, something struct<ref_local_id:string, somedesc:string>"


def dim5_spec(checks=()):
    return TableSpec(
        name="dim5",
        row_id="row_id",
        checks=list(checks),
        primary_keys=[KeySpec(("local_id",))],
    )


def fact5_spec():
    return TableSpec(
        name="fact5",
        row_id="row_id",
        foreign_keys=[
            ForeignKeySpec(("something.ref_local_id",), ref_table="dim5")
        ],
    )


def test_f5_fk_good(spark):
    dim = spark.createDataFrame(
        [("d1", "uno", "one"), ("d2", "dos", "two")],
        "row_id string, local_id string, desc string",
    )
    fact = spark.createDataFrame(
        [("f1", ("uno", "x")), ("f2", ("dos", "y"))], FACT_SCHEMA
    )
    res = ValidationEngine([dim5_spec(), fact5_spec()]).validate(
        {"dim5": dim, "fact5": fact}
    )
    assert viol_set(res.violations) == set()


def test_f5_fk_stale(spark):
    dim = spark.createDataFrame(
        [("d1", "uno", "one")], "row_id string, local_id string, desc string"
    )
    fact = spark.createDataFrame(
        [("f1", ("uno", "x")), ("f2", ("siete", "y"))], FACT_SCHEMA
    )
    res = ValidationEngine([dim5_spec(), fact5_spec()]).validate(
        {"dim5": dim, "fact5": fact}
    )
    assert viol_set(res.violations) == {
        (
            "fk:fact5.something.ref_local_id->dim5",
            "stale_fk",
            "f2",
            "siete",
        )
    }


def test_f5_bad2_pass1_revocation(spark):
    """fk_simple_example/bad_validation_2 (verified): a dim row failing
    a row-level check contributes NO PK, so the FK to it goes stale."""
    dim = spark.createDataFrame(
        [("d1", "uno", 10), ("d2", "cuatro", -5)],
        "row_id string, local_id string, weight long",
    )
    dspec = TableSpec(
        name="dim5",
        row_id="row_id",
        checks=[ColumnCheck(column="weight", minimum=0)],
        primary_keys=[KeySpec(("local_id",))],
    )
    fact = spark.createDataFrame([("f1", ("cuatro", "x"))], FACT_SCHEMA)
    res = ValidationEngine([dspec, fact5_spec()]).validate(
        {"dim5": dim, "fact5": fact}
    )
    got = viol_set(res.violations)
    assert ("check:weight:minimum", "minimum", "d2", "-5") in got
    assert (
        "fk:fact5.something.ref_local_id->dim5",
        "stale_fk",
        "f1",
        "cuatro",
    ) in got
    assert len(got) == 2


def test_f6_compound_fk(spark):
    dim = TableSpec(
        name="dim6", row_id="row_id", primary_keys=[KeySpec(("a", "b"))]
    )
    fact = TableSpec(
        name="fact6",
        row_id="row_id",
        foreign_keys=[ForeignKeySpec(("ra", "rb"), ref_table="dim6")],
    )
    ddf = spark.createDataFrame(
        [("d1", "uno", "diez"), ("d2", "dos", "veinte")],
        "row_id string, a string, b string",
    )
    fdf = spark.createDataFrame(
        [("f1", "uno", "diez"), ("f2", "siete", "setenta")],
        "row_id string, ra string, rb string",
    )
    res = ValidationEngine([dim, fact]).validate({"dim6": ddf, "fact6": fdf})
    assert viol_set(res.violations) == {
        ("fk:fact6.ra,rb->dim6", "stale_fk", "f2", '["siete","setenta"]')
    }


def test_f7_refers_to_named_pk(spark):
    dim = TableSpec(
        name="dim7",
        row_id="row_id",
        primary_keys=[
            KeySpec(("a",), name="pk"),
            KeySpec(("z",), name="zk"),
        ],
    )
    fact = TableSpec(
        name="fact7",
        row_id="row_id",
        foreign_keys=[
            ForeignKeySpec(("ra",), ref_table="dim7", refers_to="pk")
        ],
    )
    ddf = spark.createDataFrame(
        [("d1", "uno", "zzz")], "row_id string, a string, z string"
    )
    # 'zzz' exists in the zk world but fk refers_to 'pk' → stale
    fdf = spark.createDataFrame(
        [("f1", "uno"), ("f2", "zzz")], "row_id string, ra string"
    )
    res = ValidationEngine([dim, fact]).validate({"dim7": ddf, "fact7": fdf})
    assert viol_set(res.violations) == {
        ("fk:fact7.ra->dim7.pk", "stale_fk", "f2", "zzz")
    }


def test_f7_refers_to_missing_name_all_stale(spark):
    """refers_to names a PK nobody recorded → EVERY fk row errors
    (J4, fk_check.py:349-389 'key not found')."""
    dim = TableSpec(
        name="dim7", row_id="row_id", primary_keys=[KeySpec(("a",), name="pk")]
    )
    fact = TableSpec(
        name="fact7",
        row_id="row_id",
        foreign_keys=[
            ForeignKeySpec(("ra",), ref_table="dim7", refers_to="nope")
        ],
    )
    ddf = spark.createDataFrame([("d1", "uno")], "row_id string, a string")
    fdf = spark.createDataFrame(
        [("f1", "uno"), ("f2", "dos")], "row_id string, ra string"
    )
    res = ValidationEngine([dim, fact]).validate({"dim7": ddf, "fact7": fdf})
    assert viol_set(res.violations) == {
        ("fk:fact7.ra->dim7.nope", "stale_fk", "f1", "uno"),
        ("fk:fact7.ra->dim7.nope", "stale_fk", "f2", "dos"),
    }


def test_unnamed_fk_matches_any_pk_world(spark):
    """Unnamed FK matches ANY recorded PK world of the target
    (fk_check.py:399,429-434)."""
    dim = TableSpec(
        name="dim",
        row_id="row_id",
        primary_keys=[KeySpec(("a",), name="pk1"), KeySpec(("z",), name="pk2")],
    )
    fact = TableSpec(
        name="fact",
        row_id="row_id",
        foreign_keys=[ForeignKeySpec(("r",), ref_table="dim")],
    )
    ddf = spark.createDataFrame(
        [("d1", "uno", "zeta")], "row_id string, a string, z string"
    )
    fdf = spark.createDataFrame(
        [("f1", "uno"), ("f2", "zeta"), ("f3", "nope")],
        "row_id string, r string",
    )
    res = ValidationEngine([dim, fact]).validate({"dim": ddf, "fact": fdf})
    assert viol_set(res.violations) == {
        ("fk:fact.r->dim", "stale_fk", "f3", "nope")
    }


def test_f9_join_keys_index(spark):
    """join_keys probe INDEX worlds; index duplicates are allowed and
    never violations (A3, index_check.py:295-370)."""
    dim = TableSpec(
        name="dim9",
        row_id="row_id",
        indexes=[KeySpec(("code",), name="codes")],
    )
    fact = TableSpec(
        name="fact9",
        row_id="row_id",
        join_keys=[ForeignKeySpec(("ref_code",), ref_table="dim9")],
    )
    ddf = spark.createDataFrame(
        [("d1", "A"), ("d2", "A"), ("d3", "B")], "row_id string, code string"
    )
    fdf = spark.createDataFrame(
        [("f1", "A"), ("f2", "C")], "row_id string, ref_code string"
    )
    res = ValidationEngine([dim, fact]).validate({"dim9": ddf, "fact9": fdf})
    # reason is stale_fk even for join keys — reference hardcode quirk
    # (fk_check.py:378,440), verified differentially
    assert viol_set(res.violations) == {
        ("jk:fact9.ref_code->dim9", "stale_fk", "f2", "C")
    }


def test_f9_dangling_no_key_worlds(spark):
    """Target table declares NO index at all → dangling_jk for every
    jk row (J5)."""
    dim = TableSpec(name="dim9", row_id="row_id")  # no keys declared
    fact = TableSpec(
        name="fact9",
        row_id="row_id",
        join_keys=[ForeignKeySpec(("ref_code",), ref_table="dim9")],
    )
    ddf = spark.createDataFrame([("d1", "A")], "row_id string, code string")
    fdf = spark.createDataFrame([("f1", "A")], "row_id string, ref_code string")
    res = ValidationEngine([dim, fact]).validate({"dim9": ddf, "fact9": fdf})
    assert viol_set(res.violations) == {
        ("jk:fact9.ref_code->dim9", "dangling_jk", "f1", "A")
    }


def test_fk_null_member_excluded(spark):
    dim = spark.createDataFrame(
        [("d1", "uno", "x")], "row_id string, local_id string, desc string"
    )
    fact = spark.createDataFrame([("f1", (None, "y"))], FACT_SCHEMA)
    res = ValidationEngine([dim5_spec(), fact5_spec()]).validate(
        {"dim5": dim, "fact5": fact}
    )
    assert viol_set(res.violations) == set()


def test_fk_no_schema_rejected(spark):
    import pytest

    from python_extended_json_schema_validator_spark import SpecError

    fact = TableSpec(
        name="fact",
        row_id="row_id",
        foreign_keys=[ForeignKeySpec(("r",), ref_table="ghost")],
    )
    with pytest.raises(SpecError, match="fk_no_schema"):
        ValidationEngine([fact])
