"""Incremental validation over Structured Streaming.

The reference is strictly batch (SURVEY.md §2.5: no streaming
operators exist) — this module is the engine's forward extension for
continuously-arriving data: new image/document files are validated as
micro-batches, with cross-batch uniqueness held in streaming state.

Design:
- **row-level checks stream as-is** — the compiled predicate battery
  is stateless, so the same ``row_checks`` plan runs on a streaming
  DataFrame unchanged.
- **payload battery streams as-is** — ``mapInPandas`` is supported on
  streaming DataFrames.
- **uniqueness needs state**: ``dup_violations_stream`` uses
  ``dropDuplicates`` state to admit the first occurrence of each key
  and flag later ones, with a watermark bounding state (late
  duplicates beyond the watermark are not detected — the documented
  trade-off of infinite streams).
- **referential checks** against *static* dimensions are stream-static
  joins (supported natively); stream-stream FK would need watermarked
  interval joins and is out of scope (the reference has no analogue).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..checks import row_checks
from ..spec import TableSpec


def row_violations_stream(stream_df: DataFrame, spec: TableSpec) -> DataFrame:
    """The pass-1 battery over a streaming DataFrame — identical plan
    to batch (stateless projection)."""
    compiled = row_checks.compile_battery(
        spec.checks, json_mode=spec.canonical_json,
        formats=spec.custom_formats,
    )
    return row_checks.row_violations(stream_df, F.col(spec.row_id), compiled)


def dup_flags_stream(
    stream_df: DataFrame,
    key_col: str,
    row_id: str,
    ts_col: Optional[str] = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming uniqueness: survivors pass through; the returned
    frame carries ``__is_first`` so downstream can route violations.

    Implementation: dropDuplicates on the key keeps the first-seen row
    per key in state; joining back is not possible stream-stream
    without time bounds, so instead we mark first-occurrence via
    dropDuplicates and derive violations as stream minus survivors is
    NOT streamable — the supported shape is: consume survivors for the
    clean path, and count duplicates per trigger via
    ``foreachBatch`` with the batch dedup engine (see
    ``validate_stream_foreach_batch``)."""
    out = stream_df
    if ts_col:
        out = out.withWatermark(ts_col, watermark)
        return out.dropDuplicates([key_col]).withColumn("__is_first", F.lit(True))
    return out.dropDuplicates([key_col]).withColumn("__is_first", F.lit(True))


def windowed_partition_verdicts(
    stream_df: DataFrame,
    spec: TableSpec,
    ts_col: str,
    window: str = "10 minutes",
    watermark: str = "20 minutes",
) -> DataFrame:
    """Per (event-time window, partition) pass/fail over a stream —
    the streaming twin of ValidationResult.partition_verdicts: the
    row-check battery evaluates inline (stateless), counts aggregate
    per window × partition, and the WATERMARK bounds late-data state
    (rows later than ``watermark`` behind the max event time are
    dropped; windows finalize for append sinks once the watermark
    passes them)."""
    compiled = row_checks.compile_battery(
        spec.checks, json_mode=spec.canonical_json,
        formats=spec.custom_formats,
    )
    ok = row_checks.pass1_ok(compiled)
    flags = stream_df.withWatermark(ts_col, watermark).select(
        F.window(F.col(ts_col), window).alias("win"),
        F.col(spec.scope_col).alias("partition"),
        (~ok).cast("int").alias("__failed"),
    )
    return (
        flags.groupBy("win", "partition")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("__failed").alias("n_failed"),
        )
        .withColumn("pass", F.col("n_failed") == 0)
    )


def stateful_dup_violations(
    stream_df: DataFrame,
    key_col: str,
    row_id: str,
    timeout: str = "NoTimeout",
):
    """Cross-batch duplicate VIOLATIONS as a custom stateful streaming
    operator (``applyInPandasWithState`` — the engine's answer to
    "uniqueness needs state" that actually EMITS the violation rows,
    where dropDuplicates can only pass survivors through).

    Per key group, state holds the survivor row_id (first seen, min
    row_id within its arriving batch for determinism — matching the
    batch engine's min-row_id survivor when all rows arrive in one
    batch).  Every later row yields ``(key, row_id, survivor)``.
    State size: ONE short string per distinct key — the streaming twin
    of the batch key world, bounded the same way (distinct keys), with
    an optional processing-time timeout to forget idle keys on
    unbounded streams.

    timeout: "NoTimeout" or "ProcessingTimeTimeout" (caller sets TTL
    via state.setTimeoutDuration in a subclass if needed).
    """
    import pandas as pd

    def flag_dups(key, pdfs, state):
        survivor = state.get[0] if state.exists else None
        # gather the WHOLE batch for this key before sorting: Arrow
        # chunk boundaries are nondeterministic, so per-chunk sorting
        # would make the survivor depend on delivery order (state is
        # one id per key; batch rows for one key are bounded by the
        # trigger volume)
        rids = []
        for pdf in pdfs:
            rids.extend(pdf[row_id].astype(str))
        dups = []
        for rid in sorted(rids):
            if survivor is None:
                survivor = rid
            elif rid != survivor:
                dups.append((key[0], rid, survivor))
        state.update((survivor,))
        if dups:
            yield pd.DataFrame(dups, columns=["key", "row_id", "survivor"])

    return (
        stream_df.select(
            F.col(key_col).cast("string").alias("__k"),
            F.col(row_id).cast("string").alias(row_id),
        )
        .groupBy("__k")
        .applyInPandasWithState(
            flag_dups,
            outputStructType="key string, row_id string, survivor string",
            stateStructType="survivor string",
            outputMode="append",
            timeoutConf=timeout,
        )
    )


def validate_stream_foreach_batch(
    stream_df: DataFrame,
    spec: TableSpec,
    sink_path: str,
    checkpoint: str,
    formats_df: Optional[DataFrame] = None,
):
    """The practical incremental-validation shape: each micro-batch
    runs the FULL batch engine (row checks + dedup-within-batch + FK
    against static dims) via foreachBatch and appends violations to a
    sink — cross-batch uniqueness comes from the manifest/key-dim
    tables exactly like batch resume (manifest.run_resumable).

    Returns the StreamingQuery (caller awaits/stops it)."""
    from ..engine import ValidationEngine

    def process(batch_df: DataFrame, batch_id: int):
        tables = {spec.name: batch_df}
        engine_specs = [spec]
        if formats_df is not None:
            from ..payload.validate import formats_spec

            engine_specs.append(formats_spec())
            tables["formats"] = formats_df
        res = ValidationEngine(engine_specs).validate(tables)
        (
            res.violations.withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(sink_path)
        )

    return (
        stream_df.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def stateful_visual_dups(
    stream_df: DataFrame,
    row_id: str = "image_id",
    bytes_col: str = "bytes",
    max_hamming: int = 6,
    timeout: str = "NoTimeout",
):
    """Cross-batch VISUAL near-duplicate emissions — the streaming
    mirror of the batch PhashLedger: signatures via the map-only
    DCT-phash stage (stateless, so streaming-safe), pigeonhole block
    keys via posexplode, then ``applyInPandasWithState`` per
    (blk, bkey) bucket whose state is the bucket's signature registry
    (docs array<string>, hashes array<long>).  Every arriving
    signature emits (doc_new, doc_prior, hamming) against all
    partners within the budget — cross-batch via state, in-batch via
    sorted arrival order (earlier-sorted doc = prior, matching the
    batch min-id survivor discipline) — then registers itself.

    A pair agreeing on several blocks emits once PER BLOCK: callers
    ``.distinct()`` the output (the contract query does).  Emitting
    per block keeps the operator append-only and join-free inside the
    stream.

    State discipline at scale: across all buckets the state totals
    (τ+1) block entries per corpus image, each one short id + 8-byte
    hash — signatures, never pixels.  Beyond executor state budgets
    the batch ledger (availableNow increments over
    incremental_neardup.PhashLedger) is the recommended shape; this
    operator is for genuinely continuous ingestion.

    Contracts: UNDECODABLE payloads are skipped here (they carry no
    signature) — route them through the stateless decode battery on
    the same stream for payload:decode violations; duplicate ids in
    one batch never self-pair (mirroring the batch path's
    doc_a < doc_b), though each occurrence still registers."""
    from ..payload import phash as phash_mod

    sig = phash_mod.phash_signatures(
        stream_df, row_id=row_id, bytes_col=bytes_col
    )
    return stateful_signature_dups(
        sig, row_id, "phash_dct", max_hamming=max_hamming,
        timeout=timeout,
    )


def stateful_signature_dups(
    sig: DataFrame,
    id_col: str,
    sig_col: str,
    max_hamming: int = 6,
    timeout: str = "NoTimeout",
):
    """The signature-agnostic core of ``stateful_visual_dups``
    (round 7 factoring): any STREAMING (id, int64-signature) frame —
    DCT phash, audio band-occupancy fingerprint, any future 64-bit
    sketch — gets the same pigeonhole block keys + per-bucket
    signature-registry state + exact in-state hamming verify.  All
    the state-discipline and emission contracts of
    ``stateful_visual_dups`` apply verbatim."""
    import pandas as pd

    from ..payload import phash as phash_mod

    blocked = phash_mod.phash_blocks(
        sig, id_col=id_col, phash_col=sig_col, max_hamming=max_hamming,
        carry_cols=(sig_col,),
    ).withColumnRenamed(sig_col, "phash")

    def flag(key, pdfs, state):
        if state.exists:
            docs, hashes = list(state.get[0]), list(state.get[1])
        else:
            docs, hashes = [], []
        rows = []
        for pdf in pdfs:
            rows.extend(zip(pdf["doc"].astype(str), pdf["phash"]))
        out = []
        for doc, h in sorted(rows):
            h = int(h)
            for prior_doc, prior_h in zip(docs, hashes):
                if prior_doc == doc:
                    continue  # duplicate ids never self-pair
                ham = phash_mod.hamming64(h, int(prior_h))
                if ham <= max_hamming:
                    out.append((doc, prior_doc, ham))
            docs.append(doc)
            hashes.append(h)
        state.update((docs, hashes))
        if out:
            yield pd.DataFrame(
                out, columns=["doc_new", "doc_prior", "hamming"]
            )

    return blocked.groupBy("blk", "bkey").applyInPandasWithState(
        flag,
        outputStructType="doc_new string, doc_prior string, hamming int",
        stateStructType="docs array<string>, hashes array<long>",
        outputMode="append",
        timeoutConf=timeout,
    )


def stateful_audio_dups(
    stream_df: DataFrame,
    row_id: str = "audio_id",
    bytes_col: str = "bytes",
    max_hamming: int = 1,
    timeout: str = "NoTimeout",
):
    """Cross-batch AUDIO near-duplicate emissions — the streaming
    mirror of the batch AudioLedger, via the signature-agnostic core:
    clips fingerprint through the map-only band-occupancy stage
    (stateless, streaming-safe), then share
    ``stateful_signature_dups`` at the audio-measured τ=1 (two 32-bit
    block keys: buckets only form around half-fingerprint agreement,
    so per-bucket registries stay tiny).  Undecodable clips are
    skipped (NULL fingerprints carry no signature) — route them
    through the stateless decode battery on the same stream."""
    from ..pipeline.multimodal import audio_fingerprints

    sig = audio_fingerprints(
        stream_df, id_col=row_id, bytes_col=bytes_col
    ).where(F.col("afp").isNotNull())
    return stateful_signature_dups(
        sig, row_id, "afp", max_hamming=max_hamming, timeout=timeout
    )
