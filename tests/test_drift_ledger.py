"""Cross-increment drift ledger (pipeline/drift_ledger.py, round 6):
persisted per-group quantile snapshots, first/latest baseline modes,
and the materialize-before-append ordering."""

from pyspark.sql import functions as F

from python_extended_json_schema_validator_spark.pipeline.drift_ledger import (
    QuantileLedger,
    cross_increment_drift,
)


def _inc(spark, vals, group="g1"):
    return spark.createDataFrame(
        [(group, float(v)) for v in vals], "grp string, x double"
    )


def test_first_increment_records_without_verdicts(spark, tmp_path):
    led = QuantileLedger(str(tmp_path / "led"))
    v1 = cross_increment_drift(
        _inc(spark, range(100)), led, "t", "x", ["grp"]
    )
    assert v1.count() == 0
    assert led.next_seq(spark, "t", "x") == 2  # snapshot landed


def test_drift_vs_first_baseline(spark, tmp_path):
    led = QuantileLedger(str(tmp_path / "led"))
    cross_increment_drift(_inc(spark, range(100)), led, "t", "x", ["grp"])
    # same distribution: no drift
    same = cross_increment_drift(
        _inc(spark, range(100)), led, "t", "x", ["grp"], update=False
    ).collect()
    assert len(same) == 1 and not same[0].drifted and same[0].shift == 0.0
    # shifted by 2x the inter-decile range: drifted
    moved = cross_increment_drift(
        _inc(spark, [v + 200 for v in range(100)]),
        led, "t", "x", ["grp"], update=False,
    ).collect()
    assert moved[0].drifted and moved[0].shift > 1.0


def test_latest_vs_first_baseline_modes(spark, tmp_path):
    led = QuantileLedger(str(tmp_path / "led"))
    cross_increment_drift(_inc(spark, range(100)), led, "t", "x", ["grp"])
    # increment 2 drifts and IS recorded (update=True)
    cross_increment_drift(
        _inc(spark, [v + 200 for v in range(100)]), led, "t", "x", ["grp"]
    )
    probe = _inc(spark, [v + 200 for v in range(100)])
    vs_first = cross_increment_drift(
        probe, led, "t", "x", ["grp"], update=False, baseline_mode="first"
    ).collect()[0]
    vs_latest = cross_increment_drift(
        probe, led, "t", "x", ["grp"], update=False, baseline_mode="latest"
    ).collect()[0]
    assert vs_first.drifted  # still far from launch distribution
    assert not vs_latest.drifted and vs_latest.shift == 0.0  # no jump
