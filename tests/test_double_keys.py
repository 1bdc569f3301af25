"""Double-key canonicalization across sources (round 6).

The engine's canonical rendering of a double key is
``keys.py_double_repr`` — Java Double.toString digits reformatted to
Python repr STYLE in Column algebra — and every key source funnels
through it: typed columns via json_scalar, Python-rendered canonical
literals (shredded tables) via canon_literal_norm, provider keys at
the dimension boundary.  Before round 6 a typed double key '1.0E20'
could silently miss-join a shredded '1e+20' (documented divergence in
docshred._canon); these tests pin the fix:

1. renderer contract — round-trips exactly, matches json.dumps FORM
   everywhere and DIGITS except the documented JDK-17 legacy residue
   (JDK-4511638), and the normalized Python literal always equals the
   typed rendering (the join contract);
2. three-source key equality — typed / canonical-literal / provider
   renderings of the same doubles are byte-identical;
3. engine-level FK join across the scientific-notation boundary —
   a canonical-literal fact table FK-checks clean against a typed
   double dimension, including a legacy-digit value, and a provider
   key fills a hole in the dim.
"""

import json
import math
import random
import struct

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from python_extended_json_schema_validator_spark import (
    ForeignKeySpec,
    KeySpec,
    TableSpec,
    ValidationEngine,
)
from python_extended_json_schema_validator_spark.keys import (
    canon_literal_norm,
    canonical_key,
    key_columns,
    py_double_repr,
)
from python_extended_json_schema_validator_spark.providers import InlineProvider

BOUNDARY = [
    1e20, 1.5e16, 9.99e-4, 1e-4, 0.001, 1e7, 12345678.0, 1e16, -0.0, 0.0,
    0.1, 2.5e-10, 5e-324, 1.7976931348623157e308, -9.165411812000722e+16,
    7.071148258783561e+18, 123.456, 1.0, -1.5, 9999999999999998.0, 1e15,
    1e-3, 9.999999999999999e6, -6.029447690049172e+18,
    2.3851136372966235e+25, float("inf"), float("-inf"), float("nan"),
]


def _random_doubles(n: int, seed: int = 7):
    rng = random.Random(seed)
    out = []
    while len(out) < n:
        x = struct.unpack("<d", struct.pack("<Q", rng.getrandbits(64)))[0]
        if math.isfinite(x):
            out.append(x)
    for e in range(-320, 309, 3):
        for m in (1.0, 1.5, 9.999999, 1.0000001):
            try:
                v = float(f"{m}e{e}")
            except OverflowError:
                continue
            if math.isfinite(v):
                out.append(v)
    return out


def test_renderer_contract(spark):
    vals = BOUNDARY + _random_doubles(20000)
    df = spark.createDataFrame(
        [(v, json.dumps(v)) for v in vals], "x double, pylit string"
    )
    rows = df.select(
        "x",
        py_double_repr(F.col("x")).alias("r"),
        py_double_repr(F.col("x")).cast("double").alias("rt"),
        canon_literal_norm(F.col("pylit")).alias("normed"),
    ).collect()
    digit_residue = 0
    for r in rows:
        x = r.x
        # join contract: normalized Python literal == typed rendering
        assert r.normed == r.r, (x, r.normed, r.r)
        if math.isnan(x):
            assert r.r == "NaN"
            continue
        if math.isinf(x):
            assert r.r == ("Infinity" if x > 0 else "-Infinity")
            continue
        # validity: exact round-trip (also pins -0.0's sign)
        assert r.rt == x and math.copysign(1, r.rt) == math.copysign(1, x), (
            x, r.r,
        )
        want = json.dumps(x)
        if r.r != want:
            # only the documented legacy-digit residue: same value,
            # same plain/sci form — never a formatting bug
            digit_residue += 1
            assert float(r.r) == x, (x, r.r)
            assert ("e" in r.r) == ("e" in want), (x, r.r, want)
    # the residue is rare (~0.3% of uniform-bit doubles on JDK 17,
    # zero on JDK 19+); a form bug would blow way past this bound
    assert digit_residue <= len(vals) * 0.01, digit_residue


def test_three_source_key_equality(spark):
    vals = [v for v in BOUNDARY if math.isfinite(v)] + _random_doubles(2000)
    typed = spark.createDataFrame([(v,) for v in vals], "val double")
    typed_keys = [
        r.k
        for r in typed.select(
            canonical_key([F.col("val")], [T.DoubleType()]).alias("k")
        ).collect()
    ]
    lits = spark.createDataFrame(
        [(json.dumps(v),) for v in vals], "val string"
    )
    key, _ = key_columns(["val"], df=lits, canonical=True)
    lit_keys = [r.k for r in lits.select(key.alias("k")).collect()]
    prov_df = InlineProvider(table="t", keys=vals).dimension(spark)
    prov_keys = {r["__key"] for r in prov_df.collect()}
    assert typed_keys == lit_keys
    assert set(typed_keys) == prov_keys


def test_fk_join_across_sci_boundary(spark):
    # dim: TYPED double PK; fact: canonical-literal FK member — the
    # exact cross-source shape that used to miss-join.  Includes a
    # JDK-17 legacy-digit value: both sides normalize through
    # py_double_repr, so it still joins.
    match = [1e20, 1.5e16, -9.927526082972116e+17, 9.99e-4, 5e-324, 2.5]
    hole = 7e300  # in fact only → must flag; provider later fills it
    dim = spark.createDataFrame(
        [(f"d{i}", v) for i, v in enumerate(match)], "did string, val double"
    )
    fact = spark.createDataFrame(
        [(f"f{i}", json.dumps(v)) for i, v in enumerate(match + [hole])],
        "fid string, ref string",
    )
    specs = [
        TableSpec(
            name="dim", row_id="did", primary_keys=[KeySpec(("val",))]
        ),
        TableSpec(
            name="fact",
            row_id="fid",
            canonical_json=True,
            foreign_keys=[ForeignKeySpec(("ref",), ref_table="dim")],
        ),
    ]
    res = ValidationEngine(specs).validate({"dim": dim, "fact": fact})
    flagged = {r.row_id for r in res.violations.collect()}
    assert flagged == {f"f{len(match)}"}, flagged

    # a PROVIDER key (third source) fills the hole
    res2 = ValidationEngine(
        specs, providers=[InlineProvider(table="dim", keys=[hole])]
    ).validate({"dim": dim, "fact": fact})
    assert res2.violations.count() == 0
