"""Multimodal column plumbing (SURVEY.md §2.10 ``llm_multimodal_cols``).

Media (image/audio/video) are opaque ``binary`` columns + a typed
metadata struct; all Spark-side mechanics — schema, partition-sized
Arrow batches, ``mapInPandas`` signatures — are real and tested.

Decode is capability-gated: PNG images (8-bit grey/RGB/±alpha,
non-interlaced; pure-stdlib codec `llm.png`) decode to REAL PIXELS
and WAV audio (PCM 8/16-bit; `llm.wav`) decodes to REAL SAMPLES, each
yielding exact statistics with ``decoded=true``; any other byte
content (video, other formats — their libraries are not in this
container) falls back to a deterministic byte-histogram feature with
``decoded=false``. Swapping the codecs for PIL/av/soundfile widens
the gate without touching the Spark plumbing.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T
from steam_data_pipeline_spark.llm.png import (
    PNG_MAGIC,
    PngError,
    decode_apng,
    decode_png,
)
from steam_data_pipeline_spark.llm.wav import WavError, decode_wav

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), nullable=False),
        T.StructField("doc_id", T.LongType()),
        T.StructField("modality", T.StringType()),  # image | audio | video
        T.StructField("content", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, modality string, n_bytes long, content_hash string, "
    "decoded boolean, feature array<double>"
)


def _pixel_array(px, w: int, h: int, ch: int):
    """Decoded sample buffer → (h, w, ch) uint8 array."""
    return np.frombuffer(bytes(px), dtype=np.uint8).reshape(h, w, ch)


def _channel_means(a) -> tuple[float, float, float]:
    """Exact channel means — integer sums divided ONCE, so DuckDB
    oracles reproduce the doubles bit-identically. Shared by the
    still-image feature, the per-frame extractor, and anything else
    whose oracle re-derives means analytically: the arithmetic must
    stay identical across all decode surfaces."""
    h, w, ch = a.shape
    n = w * h
    if ch >= 3:
        sums = a[:, :, :3].astype(np.int64).sum(axis=(0, 1))
        mr, mg, mb = (int(s) / n for s in sums)
        return mr, mg, mb
    s = int(a[:, :, 0].astype(np.int64).sum())
    m = s / n
    return m, m, m


def _histogram_fallback(content: bytes) -> list[float]:
    """Deterministic byte-histogram feature for NON-decodable content.

    Real decode for the formats outside the PNG gate (PIL.Image.open /
    librosa.load / pyav frame sampling) belongs in `_decode`; their
    libraries are unavailable in this container, so undecodable bytes
    emit an 8-dim byte-histogram that is (a) deterministic, (b) shaped
    like a real extractor output, keeping downstream contracts
    testable.
    """
    hist = [0.0] * 8
    for b in content:
        hist[b >> 5] += 1.0
    total = max(len(content), 1)
    return [h / total for h in hist]


def _decode(content: bytes, modality: str) -> tuple[bool, list[float]]:
    """Capability-gated decode → ``(decoded, 8-dim feature)``.

    PNG bytes decode to real pixels (llm.png) and yield
    ``[width, height, channels, mean_r, mean_g, mean_b, mean_luma,
    std_luma]``; WAV bytes decode to real PCM samples (llm.wav) and
    yield ``[sample_rate, n_channels, n_frames, duration_ms, mean,
    rms, peak, zero_crossings]``. The statistics that feed analytic
    oracles (channel/sample means, rms) are exact integer sums divided
    once, so a DuckDB oracle reproduces them bit-identically.
    Everything else falls back to the byte histogram.
    """
    if content is None:
        # MEDIA_SCHEMA declares content nullable and the sibling
        # columns (n_bytes -> 0, content_hash -> None) already handle
        # it; one NULL row must yield a fallback row, not fail the
        # whole mapInPandas task
        return False, [0.0] * 8
    if content[:4] == b"RIFF" and content[8:12] == b"WAVE":
        try:
            rate, n_ch, samples = decode_wav(content)
        except WavError:
            return False, _histogram_fallback(content)
        n = len(samples)
        if n == 0:
            return True, [float(rate), float(n_ch), 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]
        total = sum(samples)
        sumsq = sum(s * s for s in samples)
        # zero crossings PER CHANNEL, summed: the interleaved sequence
        # would count L-vs-R alternations as crossings on multi-channel
        # audio (reduces to the plain definition for mono)
        zcr = sum(
            1
            for c in range(n_ch)
            for i in range(c + n_ch, n, n_ch)
            if samples[i] * samples[i - n_ch] < 0
        )
        n_frames = n // n_ch
        return True, [
            float(rate),
            float(n_ch),
            float(n_frames),
            float(n_frames * 1000 // rate),
            total / n,
            math.sqrt(sumsq / n),
            float(max(abs(s) for s in samples)),
            float(zcr),
        ]
    if content[:8] == PNG_MAGIC:
        try:
            w, h, ch, px = decode_png(content)
        except PngError:
            return False, _histogram_fallback(content)
        a = _pixel_array(px, w, h, ch)
        mr, mg, mb = _channel_means(a)
        if ch >= 3:
            luma = (
                0.299 * a[:, :, 0].astype(np.float64)
                + 0.587 * a[:, :, 1].astype(np.float64)
                + 0.114 * a[:, :, 2].astype(np.float64)
            )
        else:  # greyscale (+alpha): channel 0 is the value
            luma = a[:, :, 0].astype(np.float64)
        return True, [
            float(w),
            float(h),
            float(ch),
            mr,
            mg,
            mb,
            0.299 * mr + 0.587 * mg + 0.114 * mb,
            float(luma.std()),
        ]
    return False, _histogram_fallback(content)


def extract_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """Arrow-batched feature extraction over media rows via
    ``mapInPandas`` — the per-batch generator shape lets the executor
    stream record batches without materializing a partition of raw
    bytes in memory (critical: media partitions are size-bound, set
    ``spark.sql.files.maxPartitionBytes`` accordingly at scale)."""
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded_feats = pdf.apply(
                lambda r: _decode(r["content"], r["modality"]), axis=1
            )
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "n_bytes": pdf["content"].map(
                        lambda c: len(c) if c is not None else 0
                    ),
                    "content_hash": pdf["content"].map(
                        lambda c: hashlib.sha256(c).hexdigest() if c is not None else None
                    ),
                    "decoded": decoded_feats.map(lambda t: t[0]),
                    "feature": decoded_feats.map(lambda t: t[1]),
                }
            )
            yield out

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


FRAME_SCHEMA = (
    "media_id long, frame_idx int, ts_ms long, delay_ms long, "
    "mean_r double, mean_g double, mean_b double"
)


def extract_frames(media: DataFrame) -> DataFrame:
    """REAL frame extraction for the video modality: rows whose content
    is APNG (animated PNG, decoded by the pure-stdlib codec in
    `llm.png`) emit one row per frame — frame index, start timestamp on
    the animation timeline (cumulative delays), delay, and exact
    channel means (integer sums divided once, analytically
    oracle-able). Undecodable content emits no frame rows (filter-
    style semantics; pair with :func:`extract_features` when a
    per-media decodability flag is needed).

    Same Arrow `mapInPandas` shape as `extract_features`: decode
    parallelism = partition parallelism, frames of one media row stay
    in one task, nothing touches the driver.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                k: []
                for k in (
                    "media_id",
                    "frame_idx",
                    "ts_ms",
                    "delay_ms",
                    "mean_r",
                    "mean_g",
                    "mean_b",
                )
            }
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                if content is None:
                    continue
                try:
                    w, h, ch, frames = decode_apng(bytes(content))
                except PngError:
                    continue
                ts = 0
                for idx, (delay_ms, px) in enumerate(frames):
                    mr, mg, mb = _channel_means(_pixel_array(px, w, h, ch))
                    out["media_id"].append(media_id)
                    out["frame_idx"].append(idx)
                    out["ts_ms"].append(ts)
                    out["delay_ms"].append(delay_ms)
                    out["mean_r"].append(mr)
                    out["mean_g"].append(mg)
                    out["mean_b"].append(mb)
                    ts += delay_ms
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=FRAME_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plumbing for video rows: computes the frame
    timestamps to sample from metadata (JVM-side), leaving per-frame
    decode to the same stubbed extractor. Returns one row per
    (media_id, frame_ts_ms)."""
    return (
        media.filter(F.col("modality") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("frame_ts_ms"),
        )
    )


PHASH_SCHEMA = "media_id long, phash long, decoded boolean"


def _dhash(gray, hash_w: int = 8, hash_h: int = 8) -> int:
    """Difference hash over a grayscale array: area-resize to
    (hash_w+1, hash_h), then bit (x,y) = [cell(x+1,y) > cell(x,y)].
    Invariant to uniform brightness/contrast shifts (it compares
    neighbors, not absolute values) — the property that makes it a
    NEAR-duplicate key for re-encoded/re-exposed images."""
    h, w = gray.shape
    ys = (np.arange(hash_h + 1) * h) // hash_h
    xs = (np.arange(hash_w + 2) * w) // (hash_w + 1)
    cells = np.array(
        [
            [
                gray[ys[i] : max(ys[i + 1], ys[i] + 1),
                     xs[j] : max(xs[j + 1], xs[j] + 1)].mean()
                for j in range(hash_w + 1)
            ]
            for i in range(hash_h)
        ]
    )
    bits = 0
    for i in range(hash_h):
        for j in range(hash_w):
            bits = (bits << 1) | int(cells[i, j + 1] > cells[i, j])
    # keep within signed 64-bit for a Spark LongType column
    return bits - (1 << 64) if bits >= (1 << 63) else bits


def perceptual_hash(media: DataFrame) -> DataFrame:
    """Perceptual (difference-hash) fingerprints for image rows — the
    multimodal near-dup operator: decoded pixels → grayscale →
    9×8 area-resize → 64-bit dHash. Identical-looking images (uniform
    brightness shifts, lossless re-encodes, filter-choice differences)
    collide; structurally different images do not. Undecodable bytes
    get a NULL phash with ``decoded=false`` (they fall back to exact
    byte-hash dedup, `llm_media_dedup`).

    Scale shape: narrow mapInPandas (decode parallelism = partition
    parallelism) followed by whatever keyed op consumes the hash — a
    dedup groupBy shuffles 8-byte hashes, never pixels."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes, flags = [], [], []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                ph, ok = None, False
                if content is not None and bytes(content[:8]) == PNG_MAGIC:
                    try:
                        w, h, ch, px = decode_png(bytes(content))
                        a = _pixel_array(px, w, h, ch)
                        gray = (
                            a[:, :, :3].astype(np.float64).mean(axis=2)
                            if ch >= 3
                            else a[:, :, 0].astype(np.float64)
                        )
                        ph, ok = _dhash(gray), True
                    except PngError:
                        pass
                ids.append(media_id)
                hashes.append(ph)
                flags.append(ok)
            # phash MUST be pandas nullable Int64: with plain object/
            # None a mixed batch coerces to float64, and 64-bit hashes
            # above 2^53 silently lose low bits — observed as exposure
            # variants landing in different dedup groups whenever an
            # undecodable row shared their Arrow batch
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "phash": pd.array(hashes, dtype="Int64"),
                    "decoded": flags,
                }
            )

    return media.mapInPandas(run, schema=PHASH_SCHEMA)


def perceptual_dedup(media: DataFrame) -> DataFrame:
    """Group image rows by perceptual hash, min-media_id survivor:
    (phash, n_media, keeper). Only decoded rows participate —
    undecodable content has no perceptual identity."""
    return (
        perceptual_hash(media)
        .filter(F.col("decoded"))
        .groupBy("phash")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_media"),
            F.min("media_id").alias("keeper"),
        )
    )


def multimodal_join(docs: DataFrame, embeddings: DataFrame) -> DataFrame:
    """documents ⋈ embeddings as one multimodal row (text + vector),
    the §2.10 ``llm_multimodal_cols`` surface on the driver testdata."""
    return docs.join(
        embeddings, on=docs["doc_id"] == embeddings["vec_id"], how="inner"
    ).select(
        "doc_id",
        "lang",
        "source",
        "n_chars",
        "label",
        F.size("embedding").alias("embedding_dim"),
    )
