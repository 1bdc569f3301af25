"""Row-level check battery (SURVEY.md §2.2 P4/P5) — JSON-Schema
keyword semantics compiled to predicates, incl. NULL vacuity and the
verdict column."""

from pyspark.sql import functions as F

from python_extended_json_schema_validator_spark import (
    ColumnCheck,
    TableSpec,
    ValidationEngine,
)
from python_extended_json_schema_validator_spark.spec import SpecError, parse_table_spec
from tests.conftest import viol_set


def test_keyword_battery(spark):
    spec = TableSpec(
        name="t",
        row_id="row_id",
        checks=[
            ColumnCheck(column="name", required=True, min_length=2, max_length=5),
            ColumnCheck(column="size", minimum=1, maximum=50),
            ColumnCheck(column="fmt", enum=("jpeg", "png", "webp")),
            ColumnCheck(column="code", pattern="^[A-Z]{2}[0-9]+$"),
        ],
    )
    rows = [
        ("r1", "ok", 10, "png", "AB12"),      # clean
        ("r2", None, 10, "png", "AB12"),      # required
        ("r3", "toolong", 0, "gif", "xx"),    # maxLength, minimum, enum, pattern
        ("r4", "ok", None, None, None),       # NULLs pass non-required checks
    ]
    df = spark.createDataFrame(
        rows, "row_id string, name string, size long, fmt string, code string"
    )
    res = ValidationEngine([spec]).validate({"t": df})
    assert viol_set(res.violations) == {
        ("check:name:required", "required", "r2", None),
        ("check:name:maxLength", "maxLength", "r3", "toolong"),
        ("check:size:minimum", "minimum", "r3", "0"),
        ("check:fmt:enum", "enum", "r3", "gif"),
        ("check:code:pattern", "pattern", "r3", "xx"),
    }
    verdicts = {r.row_id: r.ok for r in res.verdicts("t").collect()}
    assert verdicts == {"r1": True, "r2": False, "r3": False, "r4": True}


def test_format_and_sql_predicate(spark):
    spec = TableSpec(
        name="t",
        row_id="row_id",
        checks=[
            ColumnCheck(column="d", format="date"),
            ColumnCheck(column="w", sql_predicate="w < h"),
        ],
    )
    df = spark.createDataFrame(
        [("r1", "2026-08-16", 1, 2), ("r2", "16/08/2026", 3, 2)],
        "row_id string, d string, w long, h long",
    )
    res = ValidationEngine([spec]).validate({"t": df})
    assert viol_set(res.violations) == {
        ("check:d:format", "format", "r2", "16/08/2026"),
        ("check:w:sql", "sql", "r2", "3"),
    }


def test_type_check_castability(spark):
    spec = TableSpec(
        name="t", row_id="row_id", checks=[ColumnCheck(column="v", dtype="long")]
    )
    df = spark.createDataFrame(
        [("r1", "123"), ("r2", "abc"), ("r3", None)], "row_id string, v string"
    )
    res = ValidationEngine([spec]).validate({"t": df})
    assert viol_set(res.violations) == {("check:v:type", "type", "r2", "abc")}


def test_dict_grammar_parse_and_reject(spark):
    spec = parse_table_spec(
        "imgs",
        {
            "row_id": "image_id",
            "scope_col": "part",
            "checks": [{"column": "w", "required": True, "minimum": 1}],
            "unique": [{"members": ["phash"], "name": "ph", "limit_scope": True}],
            "primary_key": ["image_id"],
            "foreign_keys": [{"schema_id": "formats", "members": ["fmt"]}],
        },
    )
    assert spec.primary_keys[0].members == ("image_id",)
    assert spec.unique[0].limit_scope
    assert spec.foreign_keys[0].ref_table == "formats"

    import pytest

    # reference rejects `unique: 18` at schema load (verified exit 1)
    with pytest.raises(SpecError):
        parse_table_spec("t", {"row_id": "id", "unique": 18})


def test_partition_verdicts(spark):
    spec = TableSpec(
        name="t",
        row_id="row_id",
        scope_col="part",
        checks=[ColumnCheck(column="v", minimum=0)],
    )
    df = spark.createDataFrame(
        [("p1", "r1", 1), ("p1", "r2", -1), ("p2", "r3", 5)],
        "part string, row_id string, v long",
    )
    res = ValidationEngine([spec]).validate({"t": df})
    pv = {r.partition: (r.n_rows, r.n_failed, r["pass"]) for r in res.partition_verdicts("t").collect()}
    assert pv == {"p1": (2, 1, False), "p2": (1, 0, True)}
