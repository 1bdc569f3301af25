"""Perceptual-hash (DCT pHash) leg of the image payload battery.

The classic public algorithm (pHash, Zauner "Implementation and
Benchmarking of Perceptual Image Hash Functions", 2010): grayscale →
32×32 bilinear resize → 2-D orthonormal DCT-II → keep the top-left
8×8 low-frequency block → threshold every coefficient against the
block median → 64-bit signature.  Visually-identical images hash to
identical bits; small pixel perturbations (re-encodes, mild noise)
flip only a few bits, so hamming distance on the signature is a
near-duplicate metric for IMAGES the way SimHash is for text.

Engine roles (north-star input carries a declared ``phash:int64``):

- ``phash_violations`` — declared-vs-actual metadata check, the phash
  sibling of the dims/fmt checks in ``image_checks``
  (reference extension point: extensible_validator.py:77-84 custom
  formats, scaled out as one Arrow-batched map-only stage);
- ``phash_signatures`` — recompute the signature from pixels as a
  column (map-only), feeding
- ``phash_near_duplicates`` — ALL image pairs within a hamming budget
  via the same pigeonhole banding as SimHash
  (``dedup.simhash_pairs_from_signatures``): recall 1.0, candidates
  from per-block equi-joins, never all-pairs.

Scale notes (100 TB):
- signature computation is map-only over (id, bytes) — select those
  two columns before the stage so the parquet scan prunes the rest;
  all pixel math is numpy over Arrow batches (resize/DCT batched
  across the whole batch with one einsum), no per-row Python
  expressions;
- the banded join splits 64 bits into ``max_hamming + 1`` blocks —
  64/(h+1)-bit keys.  At 10^12 images keep ``max_hamming`` SMALL
  (≤3 → ≥16-bit blocks → ≥65k buckets/block): like the documented
  simhash ``positions`` trap, too-narrow block keys make buckets
  quadratic.  τ=6 (9-bit blocks) is a corpus-scale default for ≤10^8
  images; beyond that either tighten τ or pre-partition by a cheap
  group key (fmt, coarse size class) and band within groups;
- ``phash_violations`` fuses recompute + compare into ONE mapInPandas
  (no join back): declared phash rides the same Arrow batch.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Callable, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import codec
from ..errors import VIOLATION_SCHEMA

RESIZE = 32
BLOCK = 8
BITS = BLOCK * BLOCK  # 64
#: declared-vs-recomputed budget: identical pixels recompute to hamming
#: 0, re-encode noise stays ≤4 bits (measured over the deterministic
#: corpus at sf0.01 and sf0.1), random images sit ≥10 apart.
CHECK_MAX_HAMMING = 8
#: near-duplicate budget for the banded join — measured margins: true
#: near-dups ≤4 bits, unrelated images ≥10 bits (both scales).
NEAR_MAX_HAMMING = 6


def _dct_basis() -> np.ndarray:
    x = np.arange(RESIZE)
    d = np.cos(np.pi * (2 * x[None, :] + 1) * x[:, None] / (2 * RESIZE))
    d[0] *= np.sqrt(1.0 / RESIZE)
    d[1:] *= np.sqrt(2.0 / RESIZE)
    return d


_DCT = _dct_basis()


@lru_cache(maxsize=None)
def _resize_weights(n_src: int) -> np.ndarray:
    """RESIZE×n_src bilinear interpolation weights (half-pixel center
    mapping, edge-clamped) — separable resize is two matmuls."""
    out = np.zeros((RESIZE, n_src))
    if n_src == 1:
        out[:, 0] = 1.0
        return out
    pos = (np.arange(RESIZE) + 0.5) * n_src / RESIZE - 0.5
    lo = np.floor(pos).astype(int)
    frac = pos - lo
    lo0 = np.clip(lo, 0, n_src - 1)
    lo1 = np.clip(lo + 1, 0, n_src - 1)
    out[np.arange(RESIZE), lo0] += 1.0 - frac
    out[np.arange(RESIZE), lo1] += frac
    return out


def _gray32(px: np.ndarray) -> np.ndarray:
    """(h, w, 3) uint8 → (32, 32) float64 grayscale."""
    g = px.astype(np.float64).mean(axis=2)
    return _resize_weights(g.shape[0]) @ g @ _resize_weights(g.shape[1]).T


def phash_batch(grays: "list[np.ndarray]") -> np.ndarray:
    """Batched DCT + threshold: list of (32,32) grayscales → int64
    signatures (two's complement — bit 63 of the hash is the sign
    bit of the long, exactly how a Spark ``long`` column stores it)."""
    stack = np.stack(grays)
    # two broadcasted matmuls, NOT an unoptimized einsum — einsum
    # without a contraction path runs the full nested loop (O(n·32^4),
    # measured ~20× slower end-to-end on this numpy build)
    coef = _DCT @ (stack @ _DCT.T)
    block = coef[:, :BLOCK, :BLOCK].reshape(len(grays), BITS)
    med = np.median(block, axis=1, keepdims=True)
    bits = block > med
    weights = np.uint64(1) << np.arange(BITS - 1, -1, -1, dtype=np.uint64)
    return (bits.astype(np.uint64) * weights).sum(axis=1).view(np.int64)


def phash64(px: np.ndarray) -> int:
    """64-bit DCT perceptual hash of one (h, w, 3) uint8 image as a
    signed Python int (Spark-long compatible)."""
    return int(phash_batch([_gray32(px)])[0])


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")


def _sig_rows(
    pdf: pd.DataFrame, decoder: Callable
) -> "tuple[list, list, np.ndarray]":
    """Decode a batch → (row ids decoded ok, row ids failed, int64
    signatures aligned with the ok ids)."""
    ok_ids, bad_ids, grays = [], [], []
    for rid, buf in zip(pdf["__row_id"], pdf["__bytes"]):
        ok, _fmt, _w, _h, px = decoder(buf)
        if not ok or px is None:
            bad_ids.append(rid)
            continue
        ok_ids.append(rid)
        grays.append(_gray32(px))
    sigs = phash_batch(grays) if grays else np.empty(0, dtype=np.int64)
    return ok_ids, bad_ids, sigs


def phash_signatures(
    df: DataFrame,
    row_id: str = "image_id",
    bytes_col: str = "bytes",
    out_col: str = "phash_dct",
    decoder: Callable = codec.decode,
) -> DataFrame:
    """(row_id, phash_dct, decode_ok) — recomputed signature per image;
    undecodable payloads keep the row with a NULL hash so callers can
    route them to the decode check instead of silently dropping them.
    Project (id, bytes) before the Arrow stage; narrow scans fan out
    to cluster parallelism first (parallel.ensure_parallelism — decode
    cost must track cores, not the input's split count)."""
    from ..parallel import ensure_parallelism

    cols = ensure_parallelism(
        df.select(
            F.col(row_id).cast("string").alias("__row_id"),
            F.col(bytes_col).alias("__bytes"),
        ),
        "__row_id",
    )
    schema = T.StructType(
        [
            T.StructField(row_id, T.StringType(), False),
            T.StructField(out_col, T.LongType(), True),
            T.StructField("decode_ok", T.BooleanType(), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            ok_ids, bad_ids, sigs = _sig_rows(pdf, decoder)
            # masked Int64 keeps the hashes in native int64 end to end
            # (r08: a list of np scalars became an OBJECT column —
            # per-element Arrow conversion cost ~40% of the stage; a
            # float64 round-trip would corrupt 2^63-scale hashes, the
            # same hazard phash_violations documents)
            vals = np.zeros(len(ok_ids) + len(bad_ids), dtype=np.int64)
            vals[: len(sigs)] = sigs
            mask = np.zeros(len(vals), dtype=bool)
            mask[len(sigs):] = True
            yield pd.DataFrame(
                {
                    row_id: ok_ids + bad_ids,
                    out_col: pd.arrays.IntegerArray(vals, mask),
                    "decode_ok": np.concatenate(
                        [
                            np.ones(len(ok_ids), dtype=bool),
                            np.zeros(len(bad_ids), dtype=bool),
                        ]
                    ),
                }
            )

    return cols.mapInPandas(run, schema=schema)


def phash_violations(
    df: DataFrame,
    row_id: str = "image_id",
    bytes_col: str = "bytes",
    declared_col: str = "phash",
    max_hamming: int = CHECK_MAX_HAMMING,
    decoder: Callable = codec.decode,
) -> DataFrame:
    """Declared-vs-actual perceptual hash check (``payload:phash``,
    reason ``phash``): flag rows whose declared phash is more than
    ``max_hamming`` bits from the hash recomputed off the decoded
    pixels.  NULL declared values and undecodable payloads are not
    flagged here (the decode check owns the latter).  One fused
    map-only Arrow stage — recompute and compare share the batch, no
    join back to the table.

    The declared hash crosses the Arrow boundary as a STRING: a
    nullable long column reaches pandas as float64, and float64
    round-trips corrupt ~2^63-scale hashes (measured: ~11% of random
    64-bit values flip >8 bits) — one NULL row in a batch would
    poison every comparison in it.  Declared values are also aligned
    POSITIONALLY with the batch rows, never keyed by row id —
    duplicate ids (an injection class elsewhere in this engine) must
    each check against their own declared value."""
    from ..parallel import ensure_parallelism

    cols = ensure_parallelism(
        df.select(
            F.col(row_id).cast("string").alias("__row_id"),
            F.col(bytes_col).alias("__bytes"),
            F.col(declared_col).cast("long").cast("string").alias("__declared"),
        ),
        "__row_id",
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("constraint_id", "reason", "row_id",
                                   "observed_value", "path")}
            ok_rows, grays = [], []
            for rid, buf, dec in zip(
                pdf["__row_id"], pdf["__bytes"], pdf["__declared"]
            ):
                if dec is None or pd.isna(dec):
                    continue
                ok, _fmt, _w, _h, px = decoder(buf)
                if not ok or px is None:
                    continue
                ok_rows.append((rid, int(dec)))
                grays.append(_gray32(px))
            sigs = (
                phash_batch(grays) if grays
                else np.empty(0, dtype=np.int64)
            )
            for (rid, dec), sig in zip(ok_rows, sigs):
                ham = hamming64(dec, int(sig))
                if ham > max_hamming:
                    out["constraint_id"].append("payload:phash")
                    out["reason"].append("phash")
                    out["row_id"].append(rid)
                    out["observed_value"].append(
                        f"declared={dec} actual={int(sig)} hamming={ham}"
                    )
                    out["path"].append("/bytes")
            yield pd.DataFrame(out)

    return cols.mapInPandas(run, schema=VIOLATION_SCHEMA)


def phash_bitstring(col: F.Column) -> F.Column:
    """long → 64-char '0'/'1' string (unsigned rendering — negative
    longs are hashes with bit 63 set, not errors).  Two 32-bit halves
    because ``conv`` of a full negative long would sign-mangle."""
    hi = F.shiftrightunsigned(col, 32)
    lo = col.bitwiseAND(F.lit(0xFFFFFFFF))
    return F.concat(
        F.lpad(F.conv(hi.cast("string"), 10, 2), 32, "0"),
        F.lpad(F.conv(lo.cast("string"), 10, 2), 32, "0"),
    )


def phash_blocks(
    sig: DataFrame,
    id_col: str = "image_id",
    phash_col: str = "phash_dct",
    max_hamming: int = NEAR_MAX_HAMMING,
    carry_cols: "tuple[str, ...]" = (),
) -> DataFrame:
    """(doc, [carry_cols...,] blk, bkey) pigeonhole block keys for
    each signature — one posexplode, no union (see
    banded_hamming_pairs on why that matters for map-only lineages).
    Any two signatures within ``max_hamming`` bits share at least one
    (blk, bkey); the bounds come from ``dedup.block_bounds``, so
    ledger block keys recorded by one increment match the keys a
    later increment probes with.  ``carry_cols`` ride along unchanged
    (e.g. the hash itself, for consumers that verify in place —
    streaming.stateful_visual_dups)."""
    from ..pipeline.dedup import block_bounds

    bounds = block_bounds(BITS, max_hamming + 1)
    bits = phash_bitstring(F.col(phash_col))
    return sig.where(F.col(phash_col).isNotNull()).select(
        F.col(id_col).alias("doc"),
        *[F.col(c) for c in carry_cols],
        F.posexplode(
            F.array(*[F.substring(bits, s, ln) for s, ln in bounds])
        ).alias("blk", "bkey"),
    )


def phash_near_duplicates(
    sig: DataFrame,
    id_col: str = "image_id",
    phash_col: str = "phash_dct",
    max_hamming: int = NEAR_MAX_HAMMING,
) -> DataFrame:
    """ALL image pairs within ``max_hamming`` bits of each other —
    (doc_a, doc_b, hamming), doc_a < doc_b.  Renders the int64 hash as
    a bit string and bands it with the single-scan pigeonhole form
    (``dedup.banded_hamming_pairs``): recall 1.0, bucketed equi-joins
    on block keys, full-hash verify on integer chunks.  NULL
    signatures (undecodable images) are excluded.

    Plan shape matters here because the signature lineage is map-only
    and EXPENSIVE (decode + DCT): banding uses the single-scan
    ``dedup.banded_hamming_pairs`` (posexplode of the block-key array,
    not a per-block union), whose explicit (blk, bkey) repartition is
    the ONE exchange both join sides share via ReusedExchange — so the
    decode pass runs once (accumulator-verified N decodes for N
    images, plan-asserted in tests/test_plans.py; the former extra
    ``repartition("doc")`` reuse point became redundant in r08 and was
    dropped — one less exchange on the signature lineage)."""
    from ..pipeline.dedup import banded_hamming_pairs

    sh = (
        sig.where(F.col(phash_col).isNotNull())
        .select(
            F.col(id_col).alias("doc"),
            phash_bitstring(F.col(phash_col)).alias("simhash"),
        )
    )
    return banded_hamming_pairs(sh, max_hamming, positions=BITS)
