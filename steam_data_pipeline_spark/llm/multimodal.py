"""Multimodal column plumbing (SURVEY.md §2.10 ``llm_multimodal_cols``).

Media (image/audio/video) are opaque ``binary`` columns + a typed
metadata struct; all Spark-side mechanics — schema, partition-sized
Arrow batches, ``mapInPandas`` signatures — are real and tested. The
actual byte→pixels/samples decode is STUBBED (`_decode_stub`) because
the media libraries are not in this container; swap the stub for
PIL/av/soundfile and nothing else changes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

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
    "feature array<double>"
)


def _decode_stub(content: bytes, modality: str) -> list[float]:
    """Deterministic fake 'decode → feature vector'.

    Real decode (PIL.Image.open / librosa.load / pyav frame sampling)
    belongs here; unavailable in this container, so we emit an 8-dim
    byte-histogram feature that is (a) deterministic, (b) shaped like a
    real extractor output, keeping every downstream contract testable.
    """
    if content is None:
        raise NotImplementedError("media decode requires content bytes")
    hist = [0.0] * 8
    for b in content:
        hist[b >> 5] += 1.0
    total = max(len(content), 1)
    return [h / total for h in hist]


def extract_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """Arrow-batched feature extraction over media rows via
    ``mapInPandas`` — the per-batch generator shape lets the executor
    stream record batches without materializing a partition of raw
    bytes in memory (critical: media partitions are size-bound, set
    ``spark.sql.files.maxPartitionBytes`` accordingly at scale)."""
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
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
                    "feature": pdf.apply(
                        lambda r: _decode_stub(r["content"], r["modality"]), axis=1
                    ),
                }
            )
            yield out

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


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
