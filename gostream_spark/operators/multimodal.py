"""Multimodal column handling (SURVEY.md §2.8 L9): opaque binary
payloads + typed metadata structs, with Pandas-UDF decode plumbing.

The fixtures carry no real image/audio bytes, and this container has
no codec libraries — so the DECODE step is stubbed (a clearly-marked
NotImplementedError for real codecs, a deterministic byte-level fake
for tests), while everything Spark-side is real and load-bearing at
100 TB: the (payload BINARY, meta STRUCT) schema, partition-inherited
``mapInPandas`` execution, Arrow batch shape, and column pruning
(metadata-only queries never deserialize payload bytes).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Schema of the decoded-feature frame produced by decode_features.
FEATURE_SCHEMA = (
    "doc_id bigint, n_bytes bigint, head_checksum bigint, frames_sampled bigint"
)


def pack_payload(content: Column, lang: Column, source: Column, n_chars: Column) -> Column:
    """Pack a modality payload with its typed metadata:
    struct(payload BINARY, meta STRUCT<lang,source,n_chars,mime>)."""
    return F.struct(
        F.encode(content, "utf-8").alias("payload"),
        F.struct(
            lang.alias("lang"),
            source.alias("source"),
            n_chars.alias("n_chars"),
            F.lit("text/plain").alias("mime"),
        ).alias("meta"),
    )


def decode_image(payload: bytes) -> "object":
    """Real image decode — requires a codec library not present in
    this environment. STUB (SURVEY §2.8 L9): wire PIL/opencv here on a
    cluster image; the Spark-side plumbing (schema, mapInPandas batch
    shape) is identical."""
    raise NotImplementedError(
        "image/audio codecs are not available in this environment; "
        "decode_features uses a deterministic byte-level stand-in"
    )


def resize_image(payload: bytes, width: int, height: int) -> bytes:
    """Real image resize — STUB for the same reason as decode_image.
    On a cluster image this becomes a PIL thumbnail call inside the
    same mapInPandas worker (`decode_features`-shaped: Arrow batch in,
    binary column out, partitioning inherited)."""
    raise NotImplementedError(
        "image codecs are not available in this environment; the "
        "mapInPandas plumbing in decode_features is the real execution shape"
    )


def sample_frames(payload: bytes, every_n: int = 10) -> list[bytes]:
    """Real video frame sampling — STUB; the deterministic stand-in in
    decode_features reports the frame count a 1-per-100-bytes sampler
    would produce."""
    raise NotImplementedError(
        "video codecs are not available in this environment; see decode_features"
    )


def _fake_decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic stand-in for a codec: byte length, checksum of
    the first 4 bytes, and a fake frame-sampling count (1 frame per
    100 bytes). Exact integer math only."""
    for pdf in batches:
        payloads = pdf["payload"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": payloads.map(len).astype("int64"),
                "head_checksum": payloads.map(lambda b: int(sum(b[:4]))).astype("int64"),
                "frames_sampled": payloads.map(lambda b: len(b) // 100 + 1).astype("int64"),
            }
        )


def decode_features(packed: DataFrame) -> DataFrame:
    """Run the (stubbed) decoder over packed rows via mapInPandas:
    partition-inherited, Arrow-batched, no shuffle — the execution
    shape a real frame-sampler/feature-extractor uses at scale. Input
    needs columns (doc_id, payload)."""
    return packed.mapInPandas(_fake_decode, schema=FEATURE_SCHEMA)
