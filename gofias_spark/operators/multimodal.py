"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

Images/audio/video are carried as binary columns with a small typed metadata
struct; decode / feature-extract run as Arrow-batched ``mapInPandas`` UDFs.
The decode step itself is STUBBED (no image/audio libs in this container):
``decode_stub`` computes deterministic pseudo-features from the raw bytes so
the Spark-side plumbing — schema, batch shape, partitioning, UDF signature —
is real and tested; swap ``_fake_decode`` for a PIL/librosa call in a real
deployment.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("first_byte", T.IntegerType(), True),
        T.StructField("byte_mean", T.DoubleType(), True),
        T.StructField("feature", T.ArrayType(T.DoubleType()), True),
    ]
)


def with_binary_payload(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "content"
) -> DataFrame:
    """Wrap text as a binary payload + metadata struct — the shape a real
    multimodal table has (payload BINARY, meta STRUCT<media_type, ...>)."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("media_type"),
            F.octet_length(F.encode(F.col(text_col), "utf-8")).alias("n_bytes"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in for a real media decoder.

    A real implementation would do e.g.::

        raise NotImplementedError("install pillow: Image.open(BytesIO(b))")

    Here: fixed-length byte-histogram-ish projection (seeded by content)."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    if arr.size == 0:
        return np.zeros(dim)
    chunks = np.array_split(arr.astype(np.float64), dim)
    return np.array([c.mean() if c.size else 0.0 for c in chunks])


def decode_features(
    media: DataFrame, dim: int = 8
) -> DataFrame:
    """Arrow-batched decode + feature extraction over (doc_id, payload, meta).
    Real plumbing, stubbed decode (see module docstring)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            payloads = pdf["payload"]
            feats = [
                _fake_decode(bytes(p) if p is not None else b"", dim)
                for p in payloads
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "media_type": [m["media_type"] for m in pdf["meta"]],
                    "n_bytes": payloads.map(
                        lambda p: len(p) if p is not None else 0
                    ).astype("int64"),
                    "first_byte": payloads.map(
                        lambda p: int(p[0]) if p else None
                    ),
                    "byte_mean": [
                        float(
                            np.frombuffer(bytes(p), dtype=np.uint8).mean()
                        )
                        if p is not None and len(p)
                        else None
                        for p in payloads
                    ],
                    "feature": feats,
                }
            )

    return media.mapInPandas(fn, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("media_type", T.StringType(), True),
                    T.StructField("n_bytes", T.LongType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)


def resize_media(media: DataFrame, width: int, height: int) -> DataFrame:
    """Arrow-batched resize plumbing: payload -> fixed (width x height)
    byte grid, meta updated with the new dimensions. The resample itself is
    the STUB (np.interp over byte positions — a real deployment swaps in
    PIL `Image.resize`); the Spark-side contract (binary in/out, struct
    meta evolution, batch shape) is real and tested."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = width * height
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out_payloads = []
            for p in pdf["payload"]:
                src = np.frombuffer(
                    bytes(p) if p is not None else b"", dtype=np.uint8
                )
                if src.size == 0:
                    out_payloads.append(bytes(n))
                    continue
                pos = np.linspace(0, src.size - 1, n)
                out_payloads.append(
                    np.interp(pos, np.arange(src.size), src)
                    .astype(np.uint8)
                    .tobytes()
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "payload": out_payloads,
                    "meta": [
                        {
                            "media_type": m["media_type"],
                            "n_bytes": n,
                            "width": width,
                            "height": height,
                        }
                        for m in pdf["meta"]
                    ],
                }
            )

    return media.mapInPandas(fn, schema=RESIZED_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("first_byte", T.IntegerType(), True),
    ]
)


def sample_frames(
    media: DataFrame, frame_bytes: int = 64, stride: int = 4
) -> DataFrame:
    """Frame-sampling plumbing (1 row in -> N frame rows out): the payload
    is chunked into ``frame_bytes`` frames and every ``stride``-th frame is
    emitted with its metadata. The chunking stands in for a real video
    decoder's keyframe extraction; the row-explosion shape (mapInPandas
    yielding more rows than it receives, bounded per batch) is the real
    contract a frame pipeline needs."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids, idxs, sizes, firsts = [], [], [], []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(p) if p is not None else b""
                n_frames = (len(b) + frame_bytes - 1) // frame_bytes
                for i in range(0, n_frames, stride):
                    chunk = b[i * frame_bytes : (i + 1) * frame_bytes]
                    ids.append(int(doc_id))
                    idxs.append(i)
                    sizes.append(len(chunk))
                    firsts.append(chunk[0] if chunk else None)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "n_bytes": pd.Series(sizes, dtype="int64"),
                    "first_byte": pd.Series(firsts, dtype="object"),
                }
            )

    return media.mapInPandas(fn, schema=FRAME_SCHEMA)
