"""The full north-star validation suite for an image+caption table:
engine constraints (PK/unique/FK/row checks) + payload battery +
column-wise caption equality, unioned into one violations DataFrame.

This is the flagship composition BASELINE.json describes: constraint
specs compiled to DataFrame predicate plans, hash-partitioned dedup
windows for uniqueness, broadcast anti-join against the formats dim,
and Arrow-batched payload UDFs — one lazy plan end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..engine import ValidationEngine
from ..spec import ColumnCheck, ForeignKeySpec, KeySpec, TableSpec
from . import image_checks, synth


def image_table_spec() -> TableSpec:
    return TableSpec(
        name="images",
        row_id="image_id",
        scope_col="part",
        checks=[
            ColumnCheck(column="w", minimum=1),
            ColumnCheck(column="h", minimum=1),
            ColumnCheck(column="caption", required=True),
        ],
        primary_keys=[KeySpec(("image_id",))],
        unique=[KeySpec(("phash",))],
        foreign_keys=[ForeignKeySpec(("fmt",), ref_table="formats")],
    )


def formats_spec() -> TableSpec:
    return TableSpec(
        name="formats", row_id="fmt", primary_keys=[KeySpec(("fmt",))]
    )


def validate_images(
    images: DataFrame,
    formats: DataFrame,
    with_payload: bool = True,
    with_caption: bool = True,
    with_phash: bool = False,
) -> DataFrame:
    """→ unified violations DataFrame (constraint_id, reason, row_id,
    observed_value, path).

    ``with_phash`` adds the declared-vs-recomputed perceptual-hash
    check (payload/phash.py) as a second map-only Arrow leg.  It is
    OPT-IN because it requires the table's ``phash`` column to
    actually be the DCT pHash of the pixels — on a table whose phash
    is an unrelated fingerprint (any injective id, like the F11
    synthetic corpus) it would flag every row."""
    eng = ValidationEngine([image_table_spec(), formats_spec()])
    res = eng.validate({"images": images, "formats": formats})
    out = res.violations
    if with_payload:
        out = out.unionByName(image_checks.payload_violations(images))
    if with_phash:
        from . import phash as phash_mod

        out = out.unionByName(phash_mod.phash_violations(images))
    if with_caption:
        ref = F.concat(F.lit("caption for image "), F.col("image_id"))
        out = out.unionByName(image_checks.caption_violations(images, ref))
    return out
