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


FRAME_SCHEMA = "id bigint, frame_idx bigint, frame_sig string"


def sample_frames(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    stride: int = 2,
    fake: bool = True,
) -> DataFrame:
    """Video frame-sampling plumbing: one input row explodes to its
    sampled frame rows (the UDTF shape) via mapInPandas — map-side
    only, output row count = Σ ceil(n_frames/stride).

    fake=True derives n_frames from payload length (1 + len % 5) and
    each frame's signature as md5(payload + '#' + idx) — deterministic
    and reproducible in SQL, so the driver oracle covers the explode
    plumbing end-to-end. fake=False is where ffmpeg frame extraction
    goes.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake:
                raise NotImplementedError(
                    "real frame extraction requires ffmpeg — not in this container"
                )
            ids, idxs, sigs = [], [], []
            for i, b in zip(pdf[id_col], pdf[payload_col]):
                bb = bytes(b)
                n = 1 + len(bb) % 5
                for fi in range(0, n, stride):
                    ids.append(int(i))
                    idxs.append(fi)
                    sigs.append(
                        hashlib.md5(bb + b"#" + str(fi).encode()).hexdigest()
                    )
            yield pd.DataFrame(
                {
                    "id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "frame_sig": pd.Series(sigs, dtype="object"),
                }
            )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        batches, FRAME_SCHEMA
    )


def resize_image(
    df: DataFrame,
    width: int,
    height: int,
    payload_col: str = "payload",
    meta_col: str = "media_meta",
    fake: bool = True,
) -> DataFrame:
    """Resize plumbing: payload→payload transform + metadata update.
    fake=True replaces the payload with a deterministic digest-derived
    stand-in (so schema/lineage are real); fake=False is the PIL call
    site. Metadata width/height are updated natively — a query that
    only reads dimensions never touches payload bytes."""

    @F.pandas_udf("binary")
    def fake_resize(s: pd.Series) -> pd.Series:
        if not fake:
            raise NotImplementedError("real resize requires PIL")
        return s.map(
            lambda b: hashlib.sha256(
                bytes(b) + f"@{width}x{height}".encode()
            ).digest()
        )

    return df.withColumn(payload_col, fake_resize(F.col(payload_col))).withColumn(
        meta_col,
        F.col(meta_col).withField("width", F.lit(width)).withField(
            "height", F.lit(height)
        ),
    )


AUDIO_SCHEMA = "id bigint, duration_s double, mfcc array<double>"


def extract_audio_features(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    sample_rate: int = 16000,
    n_mfcc: int = 13,
    fake: bool = True,
) -> DataFrame:
    """Audio feature plumbing (duration + MFCC-shaped vector) via
    mapInPandas. fake=True: duration = byte_len/sample_rate and a
    digest-derived fixed-dim vector; fake=False is the librosa/
    torchaudio call site."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake:
                raise NotImplementedError("real audio decode not in container")
            out = pd.DataFrame()
            out["id"] = pdf[id_col].astype("int64")
            payloads = pdf[payload_col].map(bytes)
            out["duration_s"] = payloads.map(len) / float(sample_rate)
            out["mfcc"] = payloads.map(
                lambda b: [
                    x / 255.0
                    for x in hashlib.sha256(b).digest()[:n_mfcc]
                ]
            )
            yield out

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        batches, AUDIO_SCHEMA
    )
