from python_extended_json_schema_validator_spark import (
    ColumnCheck,
    ForeignKeySpec,
    KeySpec,
    TableSpec,
)
from python_extended_json_schema_validator_spark.graph import constraint_graph


def test_constraint_graph_dot():
    specs = [
        TableSpec(
            name="images", row_id="image_id",
            checks=[ColumnCheck(column="w", minimum=1)],
            primary_keys=[KeySpec(("image_id",))],
            unique=[KeySpec(("phash",))],
            foreign_keys=[ForeignKeySpec(("fmt",), ref_table="formats")],
        ),
        TableSpec(name="formats", row_id="fmt",
                  primary_keys=[KeySpec(("fmt",), name="fmtpk")]),
    ]
    dot = constraint_graph(specs)
    assert dot.startswith("digraph constraints {") and dot.endswith("}")
    assert '"images" -> "formats"' in dot
    assert "PK image_id" in dot and "UQ phash" in dot
    assert "1 row checks" in dot
