"""Multimodal columns: image/audio/video as opaque ``binary`` columns
with typed metadata, processed by Arrow-batched ``mapInPandas`` stages.

The real decoders (libjpeg/ffmpeg/libsndfile) are not in this
container, so the *codecs* are deterministic fakes with the same
interface (documented seam, like payload/codec.py) — but everything
Spark-side is real and tested: schemas, column pruning before the
Arrow boundary, batch shapes, per-row → per-frame fan-out, and the
numpy feature math (RMS/zero-crossings/resize) which is identical for
real payloads.

Container formats (little-endian):
  video  b'FVID' u32 n_frames then n x (u32 len, FIMG frame blob)
  audio  b'FAUD' u32 sample_rate u32 n_samples then int16 PCM
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..payload import codec as imgcodec

VID_MAGIC = b"FVID"
AUD_MAGIC = b"FAUD"


# ---------------------------------------------------------------------------
# fake encoders (deterministic synth)
# ---------------------------------------------------------------------------


def encode_video(seed: int, n_frames: int, w: int = 16, h: int = 12,
                 noise_amp: int = 0) -> bytes:
    frames = [
        imgcodec.encode(seed * 1000 + i, w, h, "png", noise_amp=noise_amp)
        for i in range(n_frames)
    ]
    out = [VID_MAGIC, struct.pack("<I", n_frames)]
    for fr in frames:
        out.append(struct.pack("<I", len(fr)))
        out.append(fr)
    return b"".join(out)


def encode_audio(seed: int, n_samples: int = 8000, rate: int = 8000) -> bytes:
    rng = np.random.Generator(np.random.Philox(seed))
    t = np.arange(n_samples, dtype=np.float64)
    freq = 100.0 + (seed % 20) * 50.0
    wave = 0.5 * np.sin(2 * np.pi * freq * t / rate) + 0.05 * rng.standard_normal(
        n_samples
    )
    pcm = np.clip(wave * 32767, -32768, 32767).astype("<i2")
    return AUD_MAGIC + struct.pack("<II", rate, n_samples) + pcm.tobytes()


# ---------------------------------------------------------------------------
# distributed operators
# ---------------------------------------------------------------------------

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("video_id", T.StringType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_bytes", T.BinaryType(), True),
        T.StructField("w", T.IntegerType(), True),
        T.StructField("h", T.IntegerType(), True),
    ]
)


def sample_frames(
    df: DataFrame, every_k: int = 2, id_col: str = "video_id", bytes_col: str = "bytes"
) -> DataFrame:
    """Every k-th frame of each video → one row per sampled frame
    (decoded header metadata included).  Row → many-rows fan-out
    through mapInPandas; only (id, bytes) crosses the Arrow boundary."""
    cols = df.select(
        F.col(id_col).cast("string").alias("__id"), F.col(bytes_col).alias("__b")
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {f.name: [] for f in FRAME_SCHEMA.fields}
            for vid, buf in zip(pdf["__id"], pdf["__b"]):
                if buf is None or bytes(buf[:4]) != VID_MAGIC:
                    continue
                # malformed-but-magic containers (truncated mid-frame)
                # must not kill the task: stop at the first short read
                try:
                    (n,) = struct.unpack_from("<I", buf, 4)
                    off = 8
                    for i in range(n):
                        (ln,) = struct.unpack_from("<I", buf, off)
                        off += 4
                        frame = bytes(buf[off : off + ln])
                        off += ln
                        if len(frame) < ln:
                            break  # truncated payload
                        if i % every_k != 0:
                            continue
                        ok, fmt, w, h, _ = imgcodec.decode(frame)
                        out["video_id"].append(vid)
                        out["frame_idx"].append(i)
                        out["frame_bytes"].append(frame if ok else None)
                        out["w"].append(w if ok else None)
                        out["h"].append(h if ok else None)
                except struct.error:
                    continue
            yield pd.DataFrame(out)

    return cols.mapInPandas(gen, schema=FRAME_SCHEMA)


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("audio_id", T.StringType(), False),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("duration_s", T.DoubleType(), True),
        T.StructField("rms", T.DoubleType(), True),
        T.StructField("zero_crossings", T.LongType(), True),
        T.StructField("peak", T.DoubleType(), True),
    ]
)


def decode_audio_fake(buf) -> "tuple[int, np.ndarray]":
    """The deterministic FAUD parser in the audio-decode seam
    signature: ``buf -> (sample_rate, mono float64 in [-1,1])``,
    ValueError on malformed input.  Production installs swap in
    ``payload.adapters.soundfile_decode`` (auto-detected by
    ``payload.adapters.auto_audio_decoder``) — same signature, real
    wav/flac/ogg."""
    if buf is None or bytes(buf[:4]) != AUD_MAGIC:
        raise ValueError("not a FAUD clip")
    try:
        rate, n = struct.unpack_from("<II", buf, 4)
    except struct.error:
        raise ValueError("truncated FAUD header")
    raw = bytes(buf[12 : 12 + 2 * n])
    pcm = np.frombuffer(raw[: len(raw) - (len(raw) % 2)], dtype="<i2")
    if rate == 0 or pcm.size == 0:
        raise ValueError("empty/zero-rate clip")
    return rate, pcm.astype(np.float64) / 32768.0


def audio_features(
    df: DataFrame,
    id_col: str = "audio_id",
    bytes_col: str = "bytes",
    decoder=decode_audio_fake,
) -> DataFrame:
    """Audio feature extraction (duration, RMS, zero-crossing count,
    peak) — all-numpy per clip, Arrow-batched.  ``decoder`` is the
    codec seam (see decode_audio_fake); any failure nulls that clip's
    features without killing the task."""
    cols = df.select(
        F.col(id_col).cast("string").alias("__id"), F.col(bytes_col).alias("__b")
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {f.name: [] for f in AUDIO_FEATURES_SCHEMA.fields}
            for aid, buf in zip(pdf["__id"], pdf["__b"]):
                out["audio_id"].append(aid)
                try:
                    rate, x = decoder(buf)
                    out["sample_rate"].append(rate)
                    out["duration_s"].append(x.size / rate)
                    out["rms"].append(float(np.sqrt(np.mean(x * x))))
                    out["zero_crossings"].append(
                        int(np.sum(np.signbit(x[1:]) != np.signbit(x[:-1])))
                    )
                    out["peak"].append(float(np.max(np.abs(x))))
                except (ValueError, ZeroDivisionError):
                    # malformed clip: null features, task lives
                    for k in ("sample_rate", "duration_s", "rms",
                              "zero_crossings", "peak"):
                        out[k].append(None)
            yield pd.DataFrame(out)

    return cols.mapInPandas(gen, schema=AUDIO_FEATURES_SCHEMA)


def resize_images(
    df: DataFrame,
    out_w: int,
    out_h: int,
    id_col: str = "image_id",
    bytes_col: str = "bytes",
) -> DataFrame:
    """Nearest-neighbor resize, re-encoded — a real pixel transform
    (the interpolation kernel is what a production PIL/opencv swap
    would change, not the Spark plumbing)."""
    schema = T.StructType(
        [
            T.StructField("image_id", T.StringType(), False),
            T.StructField("bytes", T.BinaryType(), True),
            T.StructField("w", T.IntegerType(), True),
            T.StructField("h", T.IntegerType(), True),
        ]
    )
    cols = df.select(
        F.col(id_col).cast("string").alias("__id"), F.col(bytes_col).alias("__b")
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {f.name: [] for f in schema.fields}
            for iid, buf in zip(pdf["__id"], pdf["__b"]):
                ok, fmt, w, h, px = imgcodec.decode(buf)
                out["image_id"].append(iid)
                if not ok:
                    out["bytes"].append(None)
                    out["w"].append(None)
                    out["h"].append(None)
                    continue
                yi = (np.arange(out_h) * h // out_h).astype(np.int64)
                xi = (np.arange(out_w) * w // out_w).astype(np.int64)
                resized = px[yi][:, xi]
                # re-encode losslessly with a seed derived from content
                payload = resized.tobytes()
                import zlib

                comp = zlib.compress(payload, level=1)
                hdr = imgcodec._HDR.pack(
                    imgcodec.MAGIC, imgcodec.FMT_CODES["png"], out_w, out_h,
                    0, zlib.crc32(comp) & 0xFFFFFFFF,
                )
                out["bytes"].append(hdr + comp)
                out["w"].append(out_w)
                out["h"].append(out_h)
            yield pd.DataFrame(out)

    return cols.mapInPandas(gen, schema=schema)


# ---------------------------------------------------------------------------
# Audio fingerprint near-dup (4th dedup modality)
# ---------------------------------------------------------------------------

AFP_BANDS = 64


AFP_FMAX_HZ = 4000.0


def audio_fingerprint64(rate: int, x: "np.ndarray") -> int:
    """64-bit spectral band-occupancy fingerprint: the clip's power
    spectrum split into 64 equal PHYSICAL-frequency bands over
    [0, AFP_FMAX_HZ), bit m = band energy above the spectral mean.
    Band edges are computed in Hz from ``rate`` and the clip length
    (exact cumsum binning — no leftover-bin bias on the last band),
    so the same content resampled or length-changed occupies the same
    bands; content above AFP_FMAX_HZ is ignored.  Scale-invariant
    (gain cancels in the comparison) and robust to additive noise far
    below the tonal content — the stationary-signal cousin of the
    Haitsma-Kalker fingerprint (whose time-difference bits are
    noise-dominated on stationary clips; measured before choosing
    this form).  Same signed-int64 contract as payload.phash: the
    banded hamming machinery applies as-is."""
    spec = np.abs(np.fft.rfft(x)) ** 2
    hz_per_bin = rate / x.size
    edges = np.ceil(
        np.arange(AFP_BANDS + 1) * (AFP_FMAX_HZ / AFP_BANDS) / hz_per_bin
    ).astype(int)
    edges = np.clip(edges, 0, spec.shape[0])
    if edges[-1] - edges[0] < AFP_BANDS:
        raise ValueError("clip too short to fingerprint")
    cs = np.concatenate([[0.0], np.cumsum(spec)])
    E = cs[edges[1:]] - cs[edges[:-1]]
    bits = E > E.mean()
    weights = np.uint64(1) << np.arange(63, -1, -1, dtype=np.uint64)
    packed = (bits.astype(np.uint64) * weights).sum()
    return int(np.uint64(packed).view(np.int64))


def audio_fingerprints(
    df: DataFrame,
    id_col: str = "audio_id",
    bytes_col: str = "bytes",
    decoder=decode_audio_fake,
) -> DataFrame:
    """(id, afp, decode_ok) — recomputed fingerprint per clip;
    undecodable clips keep their row with a NULL fingerprint (same
    contract as payload.phash.phash_signatures).  Map-only Arrow
    stage; project (id, bytes) upstream."""
    cols = df.select(
        F.col(id_col).cast("string").alias("__id"),
        F.col(bytes_col).alias("__b"),
    )
    schema = T.StructType(
        [
            T.StructField(id_col, T.StringType(), False),
            T.StructField("afp", T.LongType(), True),
            T.StructField("decode_ok", T.BooleanType(), False),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fps, oks = [], [], []
            for aid, buf in zip(pdf["__id"], pdf["__b"]):
                ids.append(aid)
                try:
                    # TypeError covers NULL payloads (e.g. rows a
                    # LEFT payload-join left bare) — same undecodable
                    # contract as a corrupt buffer
                    rate, x = decoder(buf)
                    fps.append(audio_fingerprint64(rate, x))
                    oks.append(True)
                except (ValueError, ZeroDivisionError, TypeError):
                    fps.append(None)
                    oks.append(False)
            yield pd.DataFrame({id_col: ids, "afp": fps, "decode_ok": oks})

    return cols.mapInPandas(gen, schema=schema)


def audio_near_duplicates(
    sig: DataFrame,
    id_col: str = "audio_id",
    afp_col: str = "afp",
    max_hamming: int = 1,
) -> DataFrame:
    """ALL clip pairs within ``max_hamming`` fingerprint bits —
    delegates to the signature-agnostic phash banding
    (payload.phash.phash_near_duplicates: posexplode block keys,
    bucketed self-join, chunked bit_count verify, single decode pass
    via repartition).  τ=1 (two 32-bit block keys) is the measured
    split for band-occupancy fingerprints: same-content clips under
    gain change + fresh noise + int16 re-quantization land at hamming
    0; distinct chords sit ≥2 apart at 20k clips (≥4 at 2k)."""
    from ..payload import phash as phash_mod

    return phash_mod.phash_near_duplicates(
        sig, id_col=id_col, phash_col=afp_col, max_hamming=max_hamming
    )


def neardup_audio_from_keys(keys_df: DataFrame) -> DataFrame:
    """Deterministic audio near-dup corpus (the F12 pattern on the
    audio modality), one FAUD clip per key k:

    - chord: 8 distinct tones at band centers, slots = 4 + (md5(k')
      bytes % 56) — band-ALIGNED so the occupied-band pattern is
      injective in the slot set;
    - near-dup pair   k % 7 == 3 (k≥3) → chord of k-1 at gain 0.45
      (vs 0.5) with the row's OWN noise seed → (k-1, k) sound alike
      but differ byte-wise;
    - otherwise unique chord for k.

    Measured margins (sf0.01 AND sf0.1 cardinalities): injected pairs
    at fingerprint hamming 0, every other pair ≥ 2."""
    import hashlib

    schema = T.StructType(
        [
            T.StructField("audio_id", T.StringType(), False),
            T.StructField("bytes", T.BinaryType(), True),
        ]
    )

    def slots(kp: int):
        out = []
        for b in hashlib.md5(str(kp).encode()).digest():
            s = 4 + (b % 56)
            if s not in out:
                out.append(s)
            if len(out) == 8:
                break
        return out

    def clip(kp: int, noise_seed: int, gain: float) -> bytes:
        rng = np.random.Generator(np.random.Philox(noise_seed))
        t = np.arange(8000, dtype=np.float64)
        x = np.zeros(8000)
        for s in slots(kp):
            f = 62.5 * s + 31.25
            x += 0.1 * np.sin(2 * np.pi * f * t / 8000.0)
        x = gain * x + 0.02 * rng.standard_normal(8000)
        pcm = np.clip(x * 32767, -32768, 32767).astype("<i2")
        return AUD_MAGIC + struct.pack("<II", 8000, 8000) + pcm.tobytes()

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, bufs = [], []
            for k in pdf["k"]:
                k = int(k)
                if k % 7 == 3 and k >= 3:
                    buf = clip(k - 1, noise_seed=k, gain=0.45)
                else:
                    buf = clip(k, noise_seed=k, gain=0.5)
                ids.append(f"aud{k:08d}")
                bufs.append(buf)
            yield pd.DataFrame({"audio_id": ids, "bytes": bufs})

    return keys_df.mapInPandas(gen, schema=schema)


# ---------------------------------------------------------------------------
# Video near-dup (5th dedup modality): per-frame phash voting
# ---------------------------------------------------------------------------


def video_near_duplicates(
    df: DataFrame,
    id_col: str = "video_id",
    bytes_col: str = "bytes",
    every_k: int = 1,
    max_hamming: int = 6,
    min_shared_frames: int = 2,
) -> DataFrame:
    """Video pairs sharing ≥ ``min_shared_frames`` visually
    near-duplicate frames: sample frames (mapInPandas fan-out) →
    per-frame DCT phash (the image machinery on composite
    video#frame ids) → banded hamming join on FRAME signatures →
    vote per video pair.  (video_a, video_b, shared_frames), a < b.

    Scale shape: frames never all-pair — candidates come from the
    frame-hash pigeonhole blocks; the vote is one groupBy over the
    (already tiny) frame-pair set.  ``every_k`` subsamples frames
    (cost ∝ sampled frames); ``min_shared_frames`` suppresses
    single-frame coincidences."""
    from ..payload import phash as phash_mod

    frames = sample_frames(df, every_k=every_k, id_col=id_col,
                           bytes_col=bytes_col)
    # composite frame id: FIXED-WIDTH numeric prefix + video id — no
    # separator, so ids containing any character (incl. '#') survive
    # the round trip; width 9 because Spark's lpad TRUNCATES past the
    # target (a 6-digit pad would collide frame 10^6 with 10^5 and
    # undercount the vote), and 10^9 frames exceeds any container
    fid = frames.select(
        F.concat(
            F.lpad(F.col("frame_idx").cast("string"), 9, "0"),
            F.col(id_col),
        ).alias("fid"),
        F.col("frame_bytes"),
    )
    sig = phash_mod.phash_signatures(fid, row_id="fid",
                                     bytes_col="frame_bytes")
    fpairs = phash_mod.phash_near_duplicates(
        sig, id_col="fid", max_hamming=max_hamming
    )
    va = F.expr("substring(doc_a, 10)")
    vb = F.expr("substring(doc_b, 10)")
    norm = fpairs.where(va != vb).select(
        F.least(va, vb).alias("video_a"),
        F.greatest(va, vb).alias("video_b"),
        F.when(va <= vb, F.col("doc_a")).otherwise(F.col("doc_b")).alias("fa"),
        F.when(va <= vb, F.col("doc_b")).otherwise(F.col("doc_a")).alias("fb"),
    )
    # vote = DISTINCT shared frames on the smaller side, not raw pair
    # count — repeated (static-scene) frames would otherwise inflate
    # the vote quadratically past min_shared_frames
    return (
        norm.groupBy("video_a", "video_b")
        .agg(
            F.least(
                F.countDistinct("fa"), F.countDistinct("fb")
            ).alias("shared_frames")
        )
        .where(F.col("shared_frames") >= min_shared_frames)
    )


def neardup_videos_from_keys(keys_df: DataFrame) -> DataFrame:
    """Deterministic video near-dup corpus (F12 pattern, video
    modality): video k = FVID container of 3 + (k' % 3) PNG frames
    from seeds k'*1000+i; near-dup rows (k % 7 == 3, k≥3) rebuild row
    k-1's frames with ±2 pixel noise — byte-different videos whose
    every frame is a visual near-dup of the source's."""
    schema = T.StructType(
        [
            T.StructField("video_id", T.StringType(), False),
            T.StructField("bytes", T.BinaryType(), True),
        ]
    )

    def build(kp: int, noise: int) -> bytes:
        return encode_video(kp, 3 + (kp % 3), w=16, h=12, noise_amp=noise)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, bufs = [], []
            for k in pdf["k"]:
                k = int(k)
                if k % 7 == 3 and k >= 3:
                    buf = build(k - 1, noise=2)
                else:
                    buf = build(k, noise=0)
                ids.append(f"vid{k:08d}")
                bufs.append(buf)
            yield pd.DataFrame({"video_id": ids, "bytes": bufs})

    return keys_df.mapInPandas(gen, schema=schema)
