"""Physical-plan quality gates: these are the properties that keep the
engine viable at 100 TB, asserted against the actual Catalyst output so
regressions fail CI, not the cluster.

- column pruning: constraint branches must never read `bytes`;
- predicate pushdown: required-checks reach the parquet scan;
- broadcast: FK dims (DISTINCT keys) join as BroadcastHashJoin;
- codegen: the row-check battery runs inside WholeStageCodegen.
"""

import tempfile

import pytest
from pyspark.sql import functions as F

from python_extended_json_schema_validator_spark.engine import ValidationEngine
from python_extended_json_schema_validator_spark.payload import synth
from python_extended_json_schema_validator_spark.payload.image_checks import (
    payload_violations,
)
from python_extended_json_schema_validator_spark.payload.validate import (
    formats_spec,
    image_table_spec,
)


@pytest.fixture(scope="module")
def images_parquet(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("imgplan") / "images")
    synth.images_from_range(spark, 500, partitions=4).write.parquet(d)
    return spark.read.parquet(d)


def final_plan(df) -> str:
    df.collect()  # materialize THIS QueryExecution so AQE finalizes it
    return df._jdf.queryExecution().executedPlan().toString()


def read_schemas(plan: str) -> str:
    """Concatenated ReadSchema fragments — the columns scans touch."""
    return " ".join(
        seg.split("ReadSchema:", 1)[1].split("\n", 1)[0]
        for seg in plan.split("FileScan")
        if "ReadSchema:" in seg
    )


@pytest.fixture(scope="module")
def engine_result(spark, images_parquet):
    eng = ValidationEngine([image_table_spec(), formats_spec()])
    return eng.validate(
        {"images": images_parquet, "formats": synth.formats_dim(spark)}
    )


def test_dedup_branch_prunes_bytes(spark, engine_result):
    plan = final_plan(engine_result.key_viol["images"])
    # the key-violations job must never scan the binary column
    assert "bytes" not in read_schemas(plan)


def test_ref_branch_prunes_and_broadcasts(spark, engine_result):
    plan = final_plan(engine_result.ref_viol["images"])
    assert "bytes" not in read_schemas(plan)  # FK branch never reads payloads
    # AQE converts the anti-join against the tiny DISTINCT-fmt dim to
    # a broadcast join at runtime
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_row_checks_jvm_side_and_pruned(spark, engine_result):
    plan = final_plan(engine_result.row_viol["images"])
    # violations branch scans every row by design (it REPORTS failures,
    # so there is no row filter to push); what must hold is pruning and
    # zero Python in the battery
    assert "bytes" not in read_schemas(plan)
    assert "BatchEvalPython" not in plan and "PythonUDF" not in plan


def test_survivor_filter_pushdown(spark, engine_result):
    # the survivors path (feeding key worlds / FK tuples) pushes the
    # `required` IsNotNull down into the parquet scan
    plan = final_plan(engine_result.ref_viol["images"])
    assert "PushedFilters: [IsNotNull(caption)" in plan


def test_payload_stage_reads_only_needed_columns(spark, images_parquet):
    plan = final_plan(payload_violations(images_parquet))
    rs = read_schemas(plan)
    # bytes IS read here (that's the point) but caption/phash are not
    assert "bytes" in rs
    assert "caption" not in rs
    assert "phash" not in rs


def test_fk_dim_scan_prunes_to_key_columns(spark):
    """A standalone FK check over parquet reads only key+id columns."""
    from python_extended_json_schema_validator_spark import (
        ForeignKeySpec,
        KeySpec,
        TableSpec,
    )

    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            [(i, f"n{i}", float(i), f"x{i % 5}") for i in range(100)],
            "id long, name string, val double, code string",
        ).write.parquet(f"{d}/dim")
        spark.createDataFrame(
            [(i, f"x{i % 7}") for i in range(100)], "fid long, rc string"
        ).write.parquet(f"{d}/fact")
        dim = spark.read.parquet(f"{d}/dim")
        fact = spark.read.parquet(f"{d}/fact")
        specs = [
            TableSpec(name="dim", row_id="id", primary_keys=[KeySpec(("code",))]),
            TableSpec(
                name="fact", row_id="fid",
                foreign_keys=[ForeignKeySpec(("rc",), ref_table="dim")],
            ),
        ]
        res = ValidationEngine(specs).validate({"dim": dim, "fact": fact})
        plan = final_plan(res.ref_viol["fact"])
        rs = read_schemas(plan)
        # dim side must scan only `code` — name/val pruned
        assert "name" not in rs
        assert "val:" not in rs


def test_array_fanout_prunes_and_stays_jvm_side(spark):
    """key_array_fanout: the fan-out key path must stay pure column
    algebra (no Python in the plan) and prune the scan to the key
    member + row id."""
    import __spark_entry__ as entrymod

    df = entrymod.q_key_array_fanout(spark, "/root/testdata/sf0.001")
    plan = final_plan(df)
    assert "BatchEvalPython" not in plan and "PythonUDF" not in plan
    rs = read_schemas(plan)
    assert "p_name" in rs and "p_partkey" in rs
    assert "p_retailprice" not in rs and "p_comment" not in rs
    assert "Generate" in plan  # the explode of the cartesian key array


def test_schema_ingest_shred_is_single_arrow_stage(spark):
    """schema_ingest: shredding is ONE mapInPandas (Arrow) over a
    pruned (file, json) projection; the only Python in the plan is
    that shredder — checks/keys run as JVM expressions above it."""
    import __spark_entry__ as entrymod

    df = entrymod.q_schema_ingest(spark, "/root/testdata/sf0.001")
    plan = final_plan(df)
    assert plan.count("MapInPandas") >= 1
    assert "BatchEvalPython" not in plan  # no row-at-a-time Python


def test_bucketed_dim_join_has_no_dim_side_exchange(spark, tmp_path):
    """A pre-bucketed dimension joins with NO Exchange on the dim side
    (the run-to-run scale path for huge dims that can't broadcast)."""
    from python_extended_json_schema_validator_spark import (
        ForeignKeySpec, KeySpec, TableSpec,
    )
    from python_extended_json_schema_validator_spark.bucketing import (
        bucketed_referential_violations, write_bucketed_dim,
    )

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        dim_df = spark.createDataFrame(
            [(i, f"k{i}") for i in range(5000)], "id long, code string"
        )
        fact_df = spark.createDataFrame(
            [(i, f"k{i % 6000}") for i in range(10000)], "fid long, rc string"
        )
        dspec = TableSpec(name="dim", row_id="id",
                          primary_keys=[KeySpec(("code",))])
        fspec = TableSpec(
            name="fact", row_id="fid",
            foreign_keys=[ForeignKeySpec(("rc",), ref_table="dim")],
        )
        write_bucketed_dim(dim_df, dspec, dspec.primary_keys[0],
                           "bucketed_dim_t", buckets=8)
        out = bucketed_referential_violations(
            fact_df, fspec, fspec.foreign_keys[0], "bucketed_dim_t"
        )
        n = out.count()
        assert n == 1000  # keys 5000..5999 appear once each and miss
        plan = out._jdf.queryExecution().executedPlan().toString()
        # the dim-side scan feeds the join WITHOUT an exchange: exactly
        # ONE shuffle in the whole plan (the fact-side repartition)
        assert plan.count("Exchange") == 1, plan
        assert "SortMergeJoin" in plan and "LeftAnti" in plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS bucketed_dim_t")


def test_ivf_assignment_is_map_only(spark):
    """IVF cell assignment must be map-only: the literal-centroid-
    matrix argmin (similarity._centroid_probes) replaces the old
    crossJoin×k + row_number window, so the executed plan contains NO
    Exchange — at 10^12 rows the assignment never shuffles
    vector-carrying rows."""
    import random

    from python_extended_json_schema_validator_spark.pipeline import similarity

    rng = random.Random(7)
    df = spark.createDataFrame(
        [(i, [rng.gauss(0.0, 1.0) for _ in range(8)]) for i in range(200)],
        "vec_id long, embedding array<double>",
    )
    cents = [[rng.gauss(0.0, 1.0) for _ in range(8)] for _ in range(4)]
    out = similarity.ivf_assign(df, cents, nprobe=2)
    assert out.count() == 400  # 200 rows × nprobe
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_element_battery_stays_jvm_side(spark):
    """The round-4 per-element machinery (aligned sub arrays, keys
    arrays, entries maps, zip_with required, element combinators) must
    compile to built-in HOFs only — zero Python beyond the Arrow shred
    source, no Exchange (the battery is one projection)."""
    from pyspark.sql import functions as F

    from python_extended_json_schema_validator_spark.checks import row_checks
    from python_extended_json_schema_validator_spark.docshred import (
        shred_json_strings,
    )
    from python_extended_json_schema_validator_spark.schemas import load_schemas

    schema = {
        "$schema": "https://json-schema.org/draft/2019-09/schema",
        "$id": "plan://elements/1.0",
        "type": "object",
        "properties": {"a": {"items": {
            "type": "object",
            "properties": {"b": {"type": "integer", "minimum": 0},
                           "v": {"anyOf": [{"type": "integer"},
                                           {"type": "string"}]}},
            "required": ["b"],
            "additionalProperties": False,
            "minProperties": 1,
            "dependentRequired": {"b": ["v"]},
        }}},
    }
    registry, issues = load_schemas([("s.json", schema)])
    assert not [i for i in issues if i.severity == "error"], issues
    cs = registry["plan://elements/1.0"]
    docs = spark.range(0, 100).select(
        F.concat(F.lit("f"), F.col("id")).alias("file"),
        F.to_json(F.struct(F.array(
            F.struct(F.col("id").cast("int").alias("b"),
                     F.lit("x").alias("v"))
        ).alias("a"))).alias("json"),
    )
    shredded = shred_json_strings(docs, cs)
    battery = row_checks.compile_battery(cs.table_spec.checks, json_mode=True)
    viol = row_checks.row_violations(shredded, F.col("__file"), battery)
    plan = final_plan(viol)
    # the ONLY Python stage is the Arrow shredder (mapInPandas source)
    assert plan.count("ArrowEvalPython") == 0
    assert plan.count("BatchEvalPython") == 0
    assert "Exchange" not in plan


def test_double_key_canonicalization_stays_jvm_side(spark):
    """Round 6: py_double_repr / canon_literal_norm are pure Column
    algebra — a unique-key dedup over a DOUBLE member plus a
    canonical-literal member must show zero Python stages and exactly
    the one dedup Exchange the window always costs, with the double
    branch compiled away for int/string keys (identical plan shape)."""
    from python_extended_json_schema_validator_spark import (
        KeySpec,
        TableSpec,
        ValidationEngine,
    )

    df = spark.range(0, 1000, 1, 4).select(
        F.col("id").cast("string").alias("rid"),
        (F.col("id") % 37 * 1e18).alias("dval"),
        F.concat(F.lit("1e+"), (F.col("id") % 5 + 18).cast("string")).alias(
            "lit"
        ),
    )
    spec = TableSpec(
        name="t",
        row_id="rid",
        unique=[KeySpec(("dval",))],
    )
    res = ValidationEngine([spec]).validate({"t": df})
    plan = final_plan(res.row_viol["t"].unionByName(
        res.violations.limit(0)
    ))
    assert "ArrowEvalPython" not in plan
    assert "BatchEvalPython" not in plan and "PythonUDF" not in plan

    # canonical-literal table: the float-literal normalization (rlike
    # gate + surgery) also compiles to pure JVM expressions
    lit_spec = TableSpec(
        name="lt", row_id="rid", canonical_json=True,
        unique=[KeySpec(("lit",))],
    )
    ldf = df.select("rid", "lit")
    lres = ValidationEngine([lit_spec]).validate({"lt": ldf})
    lplan = final_plan(lres.violations)
    assert "ArrowEvalPython" not in lplan
    assert "BatchEvalPython" not in lplan and "PythonUDF" not in lplan


def test_resume_pending_filter_is_broadcast_anti_join(spark, tmp_path):
    """manifest.filter_pending: the completed-partition set is tiny by
    construction (one row per partition) and must reach the plan as a
    BroadcastHashJoin LeftAnti — never a shuffle of the full scan."""
    from python_extended_json_schema_validator_spark.manifest import (
        PartitionManifest,
    )

    man = PartitionManifest(str(tmp_path / "man"))
    metrics = spark.createDataFrame(
        [("p0", 10, 0, 0), ("p1", 5, 1, 2)],
        "partition string, n_rows long, n_failed long, n_violations long",
    )
    man.record(metrics)
    df = spark.range(0, 1000, 1, 4).select(
        F.col("id"), F.concat(F.lit("p"), (F.col("id") % 8).cast("string")).alias("part")
    )
    plan = final_plan(man.filter_pending(df, "part"))
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_phash_pipeline_prunes_and_bands_jvm_side(spark, images_parquet):
    """Perceptual-hash leg: signatures scan ONLY (image_id, bytes);
    everything after the Arrow stage — bit rendering, exploded block
    keys, the bucketed self-join, chunked bit_count hamming — stays
    JVM-side, and the expensive decode+DCT stage runs EXACTLY ONCE
    per image (the posexplode banding + repartition make the join's
    two sides share one materialized signature pass — the union form
    measured 7× the decode work at max_hamming=6)."""
    from python_extended_json_schema_validator_spark.payload import codec, phash

    sig = phash.phash_signatures(images_parquet)
    sig_plan = final_plan(sig)
    rs = read_schemas(sig_plan)
    assert "bytes" in rs and "image_id" in rs
    assert "caption" not in rs and "phash" not in rs and "fmt" not in rs

    n_images = images_parquet.count()
    acc = spark.sparkContext.accumulator(0)

    def counting_decode(buf):
        acc.add(1)
        return codec.decode(buf)

    pairs = phash.phash_near_duplicates(
        phash.phash_signatures(images_parquet, decoder=counting_decode)
    )
    pairs.count()
    assert acc.value == n_images
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    # only the signature stage is Python — at most one per join side,
    # and the runtime decode count above proves they dedupe to one
    assert plan.count("MapInPandas") + plan.count("ArrowEvalPython") <= 2


def test_embedding_ledger_probe_stays_jvm_side(spark, tmp_path):
    """EmbeddingLedger probe (round 7): seeded-plane bucketing and
    the exact cosine verify are pure column algebra — the whole
    cross-increment plan has ZERO Python stages, and candidates come
    from a bucket EQUI-join (never a nested-loop/cartesian against
    history)."""
    from python_extended_json_schema_validator_spark.pipeline.incremental_neardup import (
        EmbeddingLedger,
        cross_increment_embedding_duplicates,
    )

    rows = [
        (f"e{i}", [1.0 if j == i % 6 else 0.0 for j in range(6)])
        for i in range(8)
    ]
    inc = spark.createDataFrame(
        rows, "vec_id string, embedding array<double>"
    )
    led = EmbeddingLedger(str(tmp_path / "emb"), dim=6)
    cross_increment_embedding_duplicates(inc, "vec_id", led)
    probe = cross_increment_embedding_duplicates(
        inc, "vec_id", led, update=False
    )
    plan = probe._jdf.queryExecution().executedPlan().toString()
    for bad in ("BatchEvalPython", "MapInPandas", "ArrowEvalPython",
                "CartesianProduct", "BroadcastNestedLoopJoin"):
        assert bad not in plan, (bad, plan)
