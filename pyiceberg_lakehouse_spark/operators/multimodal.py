"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Convention: a multimodal asset is a ``binary`` column (``content``) plus a
struct of metadata (``media``: mime type, byte length, checksum). Decode /
feature-extraction runs as Arrow-batched ``mapInPandas`` — the Spark-side
plumbing (schema, batch shape, partitioning) is real and tested; the actual
image/audio decode is STUBBED (no codec libraries in this container) behind
``decode_stub``, which raises NotImplementedError unless a deterministic fake
is requested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("checksum", T.StringType()),
    ]
)


def attach_binary(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Materialize a binary payload column + metadata struct from text.

    Stands in for real image/audio bytes; the plumbing (binary type, struct
    metadata) is exactly what a decode pipeline consumes.
    """
    content = F.encode(F.col(text_col), "utf-8")
    return df.withColumn("content", content).withColumn(
        "media",
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.octet_length(content).alias("n_bytes"),
        ),
    )


def decode_stub(payload: bytes, mime: str) -> bytes:
    """Placeholder for a real decoder (PIL / libsndfile / ffmpeg).

    The container ships no codec libraries, so real decode is out of scope;
    pipelines exercise the Spark plumbing with the raw bytes instead.
    """
    if mime == "text/plain":
        return payload  # deterministic fake: identity "decode"
    raise NotImplementedError(f"no decoder available for {mime!r} in this environment")


def extract_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched feature extraction over binary payloads (mapInPandas).

    Each batch arrives as a pandas DataFrame of (id, content, mime); the
    stub 'decode' runs per batch, returning byte length + md5 checksum. This
    is the slow-path pattern (SURVEY.md §2.10 UDF surface): Arrow transfer,
    whole-batch python work, typed output schema.
    """
    src = df.select(
        F.col(id_col).alias("doc_id"), "content", F.col("media.mime").alias("mime")
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = [
                decode_stub(bytes(c), m) for c, m in zip(pdf["content"], pdf["mime"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_bytes": pd.Series([len(d) for d in decoded], dtype="int32"),
                    "checksum": [hashlib.md5(d).hexdigest() for d in decoded],
                }
            )

    return src.mapInPandas(batches, FEATURE_SCHEMA)
