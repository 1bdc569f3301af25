"""spark-submit entry point for the validation engine.

Launch (the north-rule invocation shape)::

    zip -r engine.zip python_extended_json_schema_validator_spark
    spark-submit --py-files engine.zip spark_submit_main.py \
        --sf-dir /root/testdata/sf0.01 \
        --output /tmp/validation_out \
        --manifest /tmp/validation_out/manifest

On a real cluster add ``--master`` / executor confs; the job code is
identical — everything below is expressed against the SparkSession.

The job: build (or read) the north-star image+caption table, validate
only partitions the manifest hasn't completed, write the violations
and per-partition metrics, record lineage, exit 0 if all rows passed,
2 if violations were found (the reference CLI's exit-code contract,
__main__.py:461-465 — 2 ⇔ document errors).
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import SparkSession


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--output", default="/tmp/validation_out")
    ap.add_argument("--manifest", default=None)
    ap.add_argument("--fail-fast", action="store_true",
                    help="stop at the first violation (reference's "
                         "no-continue mode): plans a LIMIT 1 scan")
    ap.add_argument("--ledgers", default=None, metavar="DIR",
                    help="enable all five cross-increment ledger "
                         "families rooted at DIR: exact keys "
                         "(keys/), caption near-dups (neardup/), "
                         "visual near-dups via DCT phash (phash/), "
                         "w/h/phash distribution drift (drift/), "
                         "and the HLL cardinality screen on "
                         "image_id (hll/)")
    ap.add_argument("--av", action="store_true",
                    help="attach deterministic audio/video payload "
                         "columns to the synth table and enable "
                         "their ledger families (audio/, video/ "
                         "under the --ledgers root; requires "
                         "--ledgers)")
    args = ap.parse_args(argv)
    if args.av and not args.ledgers:
        ap.error("--av requires --ledgers")

    spark = SparkSession.builder.appName("image-validation").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from python_extended_json_schema_validator_spark.manifest import (
        PartitionManifest,
        run_resumable,
    )
    from python_extended_json_schema_validator_spark.payload import synth

    images = synth.materialize_images(spark, args.sf_dir)
    formats = synth.formats_dim(spark)
    manifest = PartitionManifest(args.manifest or f"{args.output}/manifest")

    ledger_kwargs = {}
    if args.ledgers:
        from python_extended_json_schema_validator_spark.manifest import (
            KeyLedger,
        )
        from python_extended_json_schema_validator_spark.pipeline.cardinality_ledger import (
            HllLedger,
        )
        from python_extended_json_schema_validator_spark.pipeline.drift_ledger import (
            QuantileLedger,
        )
        from python_extended_json_schema_validator_spark.pipeline.incremental_neardup import (
            MinHashLedger,
            PhashLedger,
        )

        ledger_kwargs = dict(
            key_ledger=KeyLedger(f"{args.ledgers}/keys"),
            neardup_ledger=MinHashLedger(f"{args.ledgers}/neardup"),
            phash_ledger=PhashLedger(f"{args.ledgers}/phash"),
            drift_ledger=QuantileLedger(f"{args.ledgers}/drift"),
            hll_ledger=HllLedger(f"{args.ledgers}/hll"),
        )
        if args.av:
            from python_extended_json_schema_validator_spark.pipeline.incremental_neardup import (
                AudioLedger,
                VideoLedger,
            )

            images = synth.attach_av_columns(images)
            ledger_kwargs.update(
                audio_ledger=AudioLedger(f"{args.ledgers}/audio"),
                video_ledger=VideoLedger(f"{args.ledgers}/video"),
            )

    violations, metrics, run_id = run_resumable(
        images, formats, manifest, **ledger_kwargs
    )

    if args.fail_fast:
        first = violations.limit(1).collect()
        n_viol = len(first)
        if first:
            print(json.dumps({"run_id": run_id, "first_violation": first[0].asDict()}))
    else:
        violations.write.mode("overwrite").parquet(f"{args.output}/violations")
        n_viol = spark.read.parquet(f"{args.output}/violations").count()

    summary = {
        "run_id": run_id,
        "n_violations": int(n_viol),
        "partitions": int(metrics.count()),
        "output": args.output,
    }
    print(json.dumps(summary))
    spark.stop()
    # reference exit codes: 0 clean, 2 document errors (__main__.py:461-465)
    return 0 if n_viol == 0 else 2


if __name__ == "__main__":
    sys.exit(main())
