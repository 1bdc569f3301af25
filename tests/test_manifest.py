"""Resume manifest: completed-partition filtering, lineage append,
idempotent re-runs, failure retry."""

import tempfile

import pytest
from pyspark.sql import functions as F

from python_extended_json_schema_validator_spark.manifest import (
    PartitionManifest,
    partition_metrics,
    run_resumable,
)
from python_extended_json_schema_validator_spark.payload import synth


@pytest.fixture()
def manifest():
    with tempfile.TemporaryDirectory() as d:
        yield PartitionManifest(path=f"{d}/manifest")


def test_resume_cycle(spark, manifest):
    images = synth.images_from_range(spark, 200, partitions=4).cache()
    formats = synth.formats_dim(spark)

    # first increment validates everything
    viol1, metrics1, rid1 = run_resumable(images, formats, manifest)
    m1 = {r.partition: r for r in metrics1.collect()}
    assert len(m1) == 16  # part p0..p15
    assert sum(r.n_rows for r in m1.values()) == 200
    assert viol1.count() > 0

    # second increment: nothing pending
    viol2, metrics2, rid2 = run_resumable(images, formats, manifest)
    assert metrics2.count() == 0
    assert viol2.count() == 0
    assert rid1 != rid2

    # lineage keeps both runs
    lineage = manifest.read(spark)
    assert lineage.select("run_id").distinct().count() == 1  # run2 recorded 0 rows
    assert lineage.count() == 16


def test_failed_partitions_are_retried(spark, manifest):
    images = synth.images_from_range(spark, 100, partitions=2).cache()
    formats = synth.formats_dim(spark)
    viol, metrics, _ = run_resumable(images, formats, manifest)
    metrics.collect()

    # mark p0 as failed in a later record → becomes pending again
    p0 = metrics.where(F.col("partition") == "p0")
    manifest.record(p0, status="failed")
    pending = manifest.filter_pending(images, "part")
    parts = {r.part for r in pending.select("part").distinct().collect()}
    assert parts == {"p0"}


def test_partition_metrics_counts(spark):
    images = synth.images_from_range(spark, 200, partitions=4)
    from python_extended_json_schema_validator_spark.payload.validate import (
        validate_images,
    )

    viol = validate_images(images, synth.formats_dim(spark))
    viol = viol.persist()
    m = partition_metrics(images, viol, "image_id", "part")
    rows = m.collect()
    assert sum(r.n_rows for r in rows) == 200
    total_viol = viol.count()
    # attribution rule: dup-id violations implicate every partition
    # holding the colliding id, so the sum can exceed the raw count
    assert total_viol <= sum(r.n_violations for r in rows) <= total_viol + 4
    for r in rows:
        assert r.n_failed <= r.n_violations
