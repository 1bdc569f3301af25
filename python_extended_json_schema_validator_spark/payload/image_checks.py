"""Image-payload checks (north star: decode validity, declared
w/h/fmt vs actual, PSNR≥40dB vs reference decode) as an Arrow-batched
``mapInPandas`` stage — the reference's custom-format extension point
(P5, extensible_validator.py:77-84,117-138) scaled out.

Plumbing notes (the part that must survive 100 TB):
- the stage consumes ONLY the columns it needs (row id, bytes,
  declared w/h/fmt, caption) — select them *before* mapInPandas so the
  parquet scan prunes everything else, in particular it never
  materializes ``bytes`` for constraints that don't read pixels;
- batches arrive via Arrow (spark.sql.execution.arrow.*); per batch
  we loop images but all pixel math is numpy — there is no per-row
  Python *expression* work, matching "vectorized pandas/Arrow UDFs,
  no per-row Python" as closely as variable-size payloads allow;
- output is the standard violations schema, so payload violations
  union with engine violations transparently;
- caption equality is NOT here: it is pure column algebra
  (``caption != ref_caption``) and stays in codegen.

Skew: payload cost scales with w*h, not row count — callers should
``repartition(n)`` (round-robin) before this stage when the table is
clustered by size/format (see synth.images_from_part which salts).
"""

from __future__ import annotations

from typing import Callable, Iterator, Optional

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import codec
from ..errors import VIOLATION_SCHEMA

PSNR_MIN_DB = 40.0


def payload_violations(
    df: DataFrame,
    row_id: str = "image_id",
    bytes_col: str = "bytes",
    w_col: str = "w",
    h_col: str = "h",
    fmt_col: str = "fmt",
    psnr_min: float = PSNR_MIN_DB,
    decoder: Callable = codec.decode,
    ref: Callable = codec.ref_pixels,
    seed_from_header: bool = True,
) -> DataFrame:
    """Violations DataFrame for the payload battery:

    - ``payload:decode``   bytes fail structural decode (reason decode)
    - ``payload:dims``     decoded (w,h) != declared (reason dims)
    - ``payload:fmt``      decoded fmt != declared (reason fmt)
    - ``payload:psnr``     PSNR(decoded, reference decode) < psnr_min
    """
    from ..parallel import ensure_parallelism

    cols = ensure_parallelism(
        df.select(
            F.col(row_id).cast("string").alias("__row_id"),
            F.col(bytes_col).alias("__bytes"),
            F.col(w_col).cast("int").alias("__w"),
            F.col(h_col).cast("int").alias("__h"),
            F.col(fmt_col).cast("string").alias("__fmt"),
        ),
        "__row_id",
    )

    vectorized = decoder is codec.decode and ref is codec.ref_pixels

    def check_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("constraint_id", "reason", "row_id",
                                   "observed_value", "path")}

            def emit(cid, reason, rid, obs):
                out["constraint_id"].append(cid)
                out["reason"].append(reason)
                out["row_id"].append(rid)
                out["observed_value"].append(obs)
                out["path"].append("/bytes")

            # per-image structural pass (header parse + zlib decode) —
            # collects decoded pixels for one BATCHED psnr computation
            pix_bufs, pix_rids, pix_seeds, pix_lossy, pix_sizes = [], [], [], [], []
            for rid, buf, dw, dh, dfmt in zip(
                pdf["__row_id"], pdf["__bytes"], pdf["__w"], pdf["__h"], pdf["__fmt"]
            ):
                ok, fmt, w, h, px = decoder(buf)
                if not ok:
                    emit("payload:decode", "decode", rid,
                         f"len={0 if buf is None else len(buf)}")
                    continue
                if pd.isna(dw) or pd.isna(dh):
                    # NULL declared dims: nothing to compare against —
                    # flag it (int(NaN) would otherwise kill the task)
                    emit("payload:dims", "dims", rid,
                         f"declared=NULLxNULL actual={w}x{h}")
                elif (w, h) != (int(dw), int(dh)):
                    emit("payload:dims", "dims", rid,
                         f"declared={int(dw)}x{int(dh)} actual={w}x{h}")
                if fmt != dfmt:
                    emit("payload:fmt", "fmt", rid,
                         f"declared={dfmt} actual={fmt}")
                if px is None or not seed_from_header:
                    continue
                if not vectorized:
                    # production-decoder seam: per-image reference path
                    seed = codec._HDR.unpack_from(bytes(buf), 0)[4]
                    expected = ref(seed, w, h)
                    if dfmt in codec.LOSSY or fmt in codec.LOSSY:
                        expected = (expected & np.uint8(0xFC))
                    p = codec.psnr(px, expected)
                    if p < psnr_min:
                        emit("payload:psnr", "psnr", rid, f"{p:.1f}dB")
                    continue
                pix_bufs.append(px.reshape(-1))
                pix_rids.append(rid)
                pix_seeds.append(codec._HDR.unpack_from(bytes(buf), 0)[4])
                pix_lossy.append(dfmt in codec.LOSSY or fmt in codec.LOSSY)
                pix_sizes.append(px.size)

            if pix_bufs:
                # ONE vectorized pass over every decoded pixel in the
                # batch: regenerate all reference pixels with the
                # 32-bit counter generator, quantize the lossy ones,
                # reduce squared error per image with add.reduceat
                flat = np.concatenate(pix_bufs)
                sizes = np.asarray(pix_sizes, dtype=np.int64)
                offsets = np.zeros(len(sizes), dtype=np.int64)
                np.cumsum(sizes[:-1], out=offsets[1:])
                seeds = np.asarray(
                    [codec.seed32(s) for s in pix_seeds], dtype=np.uint32
                )
                # counter for element j of image i = (j - offset_i) + seed32_i
                base = np.repeat(seeds - offsets.astype(np.uint32), sizes)
                counters = np.arange(flat.size, dtype=np.uint32) + base
                refs = codec.ref_bytes_flat(counters)
                lossy_mask = np.repeat(np.asarray(pix_lossy), sizes)
                refs = np.where(lossy_mask, refs & np.uint8(0xFC), refs)
                d = flat.astype(np.int32) - refs.astype(np.int32)
                sq_sums = np.add.reduceat(d * d, offsets)
                mse = sq_sums / sizes
                with np.errstate(divide="ignore"):
                    psnr_db = 10.0 * np.log10(255.0 * 255.0 / mse)
                for i in np.flatnonzero(psnr_db < psnr_min):
                    emit("payload:psnr", "psnr", pix_rids[i],
                         f"{psnr_db[i]:.1f}dB")
            yield pd.DataFrame(out)

    return cols.mapInPandas(check_batches, schema=VIOLATION_SCHEMA)


def caption_violations(
    df: DataFrame,
    ref_caption_expr,
    row_id: str = "image_id",
    caption_col: str = "caption",
) -> DataFrame:
    """Column-wise caption equality vs a reference expression/column —
    pure Catalyst, no UDF (north star: 'caption equality is verified
    column-wise')."""
    c = F.col(caption_col)
    bad = df.where(~(c.eqNullSafe(ref_caption_expr)))
    return bad.select(
        F.lit("payload:caption").alias("constraint_id"),
        F.lit("caption").alias("reason"),
        F.col(row_id).cast("string").alias("row_id"),
        c.cast("string").alias("observed_value"),
        F.lit("/caption").alias("path"),
    )
