"""Multimodal column convention + processing plumbing (north-star
extension).

Convention: a modality column is ``BinaryType`` payload plus a typed
metadata struct — ``struct<modality:string, mime:string, width:int,
height:int, sample_rate:int, n_frames:int>`` — so 100 TB of media
rides ordinary parquet row groups (column pruning skips payloads when
a query touches only metadata).

The decode / feature-extract steps run as Arrow-batched
``mapInPandas`` so payload bytes stream through Python workers batch
by batch (never materialized per-row on the JVM heap). Real
image/audio codecs are not in this container, so ``decode_image`` is
STUBBED: with ``fake=True`` it derives deterministic pseudo-features
from the payload bytes (so the plumbing — schema, batching,
partitioning — is fully testable); with ``fake=False`` it raises
NotImplementedError where a PIL/ffmpeg call would go.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

METADATA_SCHEMA = T.StructType(
    [
        T.StructField("modality", T.StringType(), False),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
    ]
)


def attach_payload(
    df: DataFrame, source_col: str, modality: str = "image", mime: str = "image/png"
) -> DataFrame:
    """Wrap a string column as a (payload, media_meta) multimodal pair
    — used by tests/fixtures to synthesize binary data deterministically."""
    return df.withColumn("payload", F.encode(F.col(source_col), "UTF-8")).withColumn(
        "media_meta",
        F.struct(
            F.lit(modality).alias("modality"),
            F.lit(mime).alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("int").alias("n_frames"),
        ),
    )


FEATURE_SCHEMA = "id bigint, byte_len bigint, sha256 string, feat array<double>"


def decode_image(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    fake: bool = True,
    feat_dim: int = 8,
) -> DataFrame:
    """Decode + feature-extract over multimodal payloads via
    mapInPandas (Arrow batches; map-side only — no shuffle).

    fake=True → deterministic pseudo-decode: byte length, sha256, and
    a feat vector derived from the digest bytes. fake=False → the
    place a real codec call goes.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake:
                raise NotImplementedError(
                    "real image decode requires PIL/opencv — not in this container"
                )
            out = pd.DataFrame()
            out["id"] = pdf[id_col].astype("int64")
            payloads = pdf[payload_col]
            out["byte_len"] = payloads.map(len).astype("int64")
            digests = payloads.map(lambda b: hashlib.sha256(bytes(b)).digest())
            out["sha256"] = digests.map(lambda d: d.hex())
            out["feat"] = digests.map(
                lambda d: [d[i] / 255.0 for i in range(feat_dim)]
            )
            yield out

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        batches, FEATURE_SCHEMA
    )
