"""Multimodal column handling (SURVEY.md §2.8 L9): opaque binary
payloads + typed metadata structs, with Pandas-UDF decode plumbing.

The fixtures carry no real image/audio bytes, and this container has
no codec libraries (PIL/cv2/soundfile/librosa/av/imageio re-checked
absent each round through r16, 2026-08-17) — so the DECODE step is stubbed (a clearly-marked
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


def _arrow_decode(batches: "Iterator[object]") -> "Iterator[object]":
    """Arrow-NATIVE stand-in decoder for ``mapInArrow``: the payload
    column is processed as Arrow buffers end to end — ``binary_length``
    / ``binary_slice`` kernels plus a numpy ``reduceat`` over the raw
    data buffer for the head checksum. No pandas conversion, no
    per-row Python objects: at 100 TB of binary payloads this is the
    difference between streaming Arrow buffers through the worker and
    materializing every blob as a Python ``bytes`` (which
    ``mapInPandas`` does for binary columns)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    for batch in batches:
        payload = batch.column(batch.schema.get_field_index("payload"))
        n_bytes = pc.cast(pc.binary_length(payload), pa.int64())
        head = pc.binary_slice(payload, 0, 4).combine_chunks() if isinstance(
            payload, pa.ChunkedArray
        ) else pc.binary_slice(payload, 0, 4)
        # Sum the <=4 head bytes per row straight off the Arrow data
        # buffer: offsets give each row's [start, end) in the buffer.
        off_buf, data_buf = head.buffers()[1], head.buffers()[2]
        odt = np.int64 if pa.types.is_large_binary(head.type) else np.int32
        offsets = np.frombuffer(off_buf, dtype=odt, count=len(head) + 1).astype(
            np.int64
        )
        data = (
            np.frombuffer(data_buf, dtype=np.uint8)
            if data_buf is not None
            else np.empty(0, np.uint8)
        )
        widths = np.diff(offsets)
        sums = np.zeros(len(head), dtype=np.int64)
        nonempty = widths > 0
        if nonempty.any():
            # reduceat misbehaves on empty segments; reduce only the
            # non-empty ones and scatter back.
            starts = offsets[:-1][nonempty]
            seg = np.add.reduceat(data.astype(np.int64), starts)
            # reduceat folds from each start to the next start in
            # `starts` (or end of buffer) — since empty rows occupy no
            # buffer space, consecutive non-empty starts are exactly
            # the segment bounds we want.
            sums[nonempty] = seg
        frames = pc.add(pc.divide(n_bytes, 100), 1)
        yield pa.RecordBatch.from_arrays(
            [
                batch.column(batch.schema.get_field_index("doc_id")),
                n_bytes,
                pa.array(sums, type=pa.int64()),
                pc.cast(frames, pa.int64()),
            ],
            names=["doc_id", "n_bytes", "head_checksum", "frames_sampled"],
        )


def decode_features_arrow(packed: DataFrame) -> DataFrame:
    """Arrow-native twin of ``decode_features``: same contract, but via
    ``mapInArrow`` so binary payloads never leave Arrow memory. Input
    needs columns (doc_id, payload); partition-inherited, no shuffle."""
    return packed.mapInArrow(_arrow_decode, schema=FEATURE_SCHEMA)
