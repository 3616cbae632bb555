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
