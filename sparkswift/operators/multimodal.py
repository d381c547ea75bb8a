"""Multimodal column convention + processing plumbing (north-star
extension).

Convention: a modality column is ``BinaryType`` payload plus a typed
metadata struct — ``struct<modality:string, mime:string, width:int,
height:int, sample_rate:int, n_frames:int>`` — so 100 TB of media
rides ordinary parquet row groups (column pruning skips payloads when
a query touches only metadata).

The decode / feature-extract steps run as Arrow-batched
``mapInPandas`` so payload bytes stream through Python workers batch
by batch (never materialized per-row on the JVM heap).

Codec status: ``decode_image`` / ``resize_image`` decode REAL PPM
(P6) and 24-bit BMP payloads with zero dependencies (numpy header
parse + pixel reshape), and ``extract_audio_features`` decodes REAL
WAV via the stdlib ``wave`` module — all on the ``fake=False`` path.
``fake=True`` keeps the deterministic pseudo-decode (features derived
from payload digests) for plumbing tests and for payloads in formats
this container cannot decode (JPEG/PNG need PIL; video frame
extraction in ``sample_frames`` needs ffmpeg and stays
NotImplementedError under ``fake=False``). ``synth_ppm_payload`` /
``synth_wav_payload`` emit VALID PPM/WAV bytes from an id column so
the real decoders are exercised end-to-end without external media.
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave
import zlib
from typing import Iterator

import numpy as np
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


# --- real zero-dependency codecs -------------------------------------------


def _parse_ppm(b: bytes) -> np.ndarray:
    """Decode a binary PPM (P6, maxval 255) to an (h, w, 3) uint8
    array. Full header grammar: ASCII tokens separated by whitespace,
    ``#`` comments to end-of-line, ONE whitespace byte after maxval,
    then raw RGB triplets."""
    if b[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    i, vals = 2, []
    while len(vals) < 3:
        while i < len(b) and b[i : i + 1].isspace():
            i += 1
        if b[i : i + 1] == b"#":
            while i < len(b) and b[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(b) and not b[j : j + 1].isspace():
            j += 1
        vals.append(int(b[i:j]))
        i = j
    i += 1  # exactly one whitespace byte separates header from pixels
    w, h, maxval = vals
    if maxval != 255:
        raise ValueError(f"PPM maxval {maxval} unsupported (need 255)")
    return np.frombuffer(b, np.uint8, count=w * h * 3, offset=i).reshape(h, w, 3)


def _parse_bmp(b: bytes) -> np.ndarray:
    """Decode an uncompressed 24-bit BMP (BI_RGB) to (h, w, 3) uint8
    RGB. Handles the 4-byte row padding and bottom-up row order."""
    if b[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", b, 10)[0]
    w, h = struct.unpack_from("<ii", b, 18)
    bpp = struct.unpack_from("<H", b, 28)[0]
    comp = struct.unpack_from("<I", b, 30)[0]
    if bpp != 24 or comp != 0:
        raise ValueError(f"BMP bpp={bpp} compression={comp} unsupported")
    bottom_up, h = h > 0, abs(h)
    row = (w * 3 + 3) & ~3
    px = (
        np.frombuffer(b, np.uint8, count=row * h, offset=data_off)
        .reshape(h, row)[:, : w * 3]
        .reshape(h, w, 3)[..., ::-1]  # stored BGR → RGB
    )
    return px[::-1] if bottom_up else px


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_unfilter(raw: bytes, w: int, h: int, ch: int) -> np.ndarray:
    """Reverse per-scanline PNG filtering (spec §9: None/Sub/Up/
    Average/Paeth) over 8-bit samples. Pure numpy per row; ``bpp`` is
    the filter unit (one full pixel at bit depth 8)."""
    stride = w * ch
    out = np.zeros((h, stride), np.uint8)
    pos = 0
    for y in range(h):
        ft = raw[pos]
        pos += 1
        row = np.frombuffer(raw, np.uint8, count=stride, offset=pos).astype(
            np.int32
        )
        pos += stride
        prev = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        cur = np.zeros(stride, np.int32)
        if ft == 0:
            cur = row
        elif ft == 2:  # Up
            cur = (row + prev) & 0xFF
        else:  # Sub/Average/Paeth need the in-row left neighbor
            for x in range(stride):
                a = cur[x - ch] if x >= ch else 0
                b = prev[x]
                c = prev[x - ch] if x >= ch else 0
                if ft == 1:
                    pred = a
                elif ft == 3:
                    pred = (a + b) >> 1
                elif ft == 4:
                    pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                    pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                else:
                    raise ValueError(f"PNG filter type {ft} invalid")
                cur[x] = (row[x] + pred) & 0xFF
        out[y] = cur.astype(np.uint8)
    return out.reshape(h, w, ch)


def _parse_png(b: bytes) -> np.ndarray:
    """Decode an 8-bit truecolor PNG (color type 2 RGB or 6 RGBA,
    non-interlaced) to (h, w, ch) uint8 — stdlib zlib, all five
    scanline filters reversed. The honest-codec rung for the most
    common web image format; palette/16-bit/interlaced stay gated."""
    if b[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, idat, dims = len(_PNG_SIG), [], None
    while pos < len(b):
        (length,) = struct.unpack_from(">I", b, pos)
        ctype = b[pos + 4 : pos + 8]
        data = b[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8 or color not in (2, 6) or interlace:
                raise ValueError(
                    f"PNG depth={depth} color={color} interlace={interlace} "
                    "unsupported (8-bit RGB/RGBA non-interlaced only)"
                )
            dims = (w, h, 3 if color == 2 else 4)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
    if dims is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, ch = dims
    return _png_unfilter(zlib.decompress(b"".join(idat)), w, h, ch)


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(px: np.ndarray, filter_of=None) -> bytes:
    """Minimal PNG writer (8-bit RGB/RGBA, non-interlaced). The
    synth-payload + round-trip-test counterpart of :func:`_parse_png`;
    ``filter_of(y) -> 0..4`` chooses each scanline's filter so tests
    exercise every reconstruction path."""
    h, w, ch = px.shape
    color = 2 if ch == 3 else 6
    px32 = px.astype(np.int32)
    lines = []
    for y in range(h):
        row = px32[y].reshape(-1)
        prev = px32[y - 1].reshape(-1) if y else np.zeros(w * ch, np.int32)
        ft = int(filter_of(y)) if filter_of is not None else 0
        left = np.concatenate([np.zeros(ch, np.int32), row[:-ch]])
        ul = np.concatenate([np.zeros(ch, np.int32), prev[:-ch]])
        if ft == 0:
            enc = row
        elif ft == 1:
            enc = row - left
        elif ft == 2:
            enc = row - prev
        elif ft == 3:
            enc = row - ((left + prev) >> 1)
        else:
            pa = np.abs(prev - ul)
            pb = np.abs(left - ul)
            pc = np.abs(left + prev - 2 * ul)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, ul)
            )
            enc = row - pred
        lines.append(bytes([ft]) + (enc & 0xFF).astype(np.uint8).tobytes())
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"".join(lines), 6))
        + _png_chunk(b"IEND", b"")
    )


def _decode_image_bytes(b: bytes) -> np.ndarray:
    if b[:2] == b"P6":
        return _parse_ppm(b)
    if b[:2] == b"BM":
        return _parse_bmp(b)
    if b[: len(_PNG_SIG)] == _PNG_SIG:
        return _parse_png(b)
    raise ValueError(
        "undecodable image payload (real path supports PPM P6, 24-bit "
        "BMP, and 8-bit RGB/RGBA PNG; JPEG needs PIL — use fake=True "
        "for plumbing-only runs)"
    )


def _decode_wav(b: bytes) -> tuple[float, np.ndarray]:
    """Decode a WAV payload via the stdlib ``wave`` reader → (duration
    seconds, mono float64 samples in [-1, 1)). 8-bit (unsigned) and
    16-bit PCM; multi-channel folds to mono by mean."""
    with wave.open(io.BytesIO(b), "rb") as w:
        rate, nchan, sw = w.getframerate(), w.getnchannels(), w.getsampwidth()
        nf = w.getnframes()
        raw = w.readframes(nf)
    if sw == 2:
        s = np.frombuffer(raw, "<i2").astype(np.float64) / 32768.0
    elif sw == 1:
        s = (np.frombuffer(raw, np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise ValueError(f"WAV sample width {sw} unsupported")
    if nchan > 1:
        s = s.reshape(-1, nchan).mean(axis=1)
    return nf / float(rate), s


def synth_ppm_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Synthesize a VALID binary PPM (P6) payload per row from the id
    alone — constant-channel pixels r=id%256, g=7·id%256, b=13·id%256
    at width 4+id%5 × height 3+id%4 — so the real decoder's output is
    pure id arithmetic (the driver oracle re-derives it in SQL)."""

    @F.pandas_udf("binary")
    def make(ids: pd.Series) -> pd.Series:
        def one(i: int) -> bytes:
            i = int(i)
            w, h = 4 + i % 5, 3 + i % 4
            px = np.empty((h, w, 3), np.uint8)
            px[..., 0], px[..., 1], px[..., 2] = (
                i % 256, (i * 7) % 256, (i * 13) % 256,
            )
            return b"P6\n%d %d\n255\n" % (w, h) + px.tobytes()

        return ids.map(one)

    return df.withColumn("payload", make(F.col(id_col))).withColumn(
        "media_meta",
        F.struct(
            F.lit("image").alias("modality"),
            F.lit("image/x-portable-pixmap").alias("mime"),
            (4 + F.col(id_col) % 5).cast("int").alias("width"),
            (3 + F.col(id_col) % 4).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("int").alias("n_frames"),
        ),
    )


def synth_wav_payload(
    df: DataFrame, id_col: str = "doc_id", sample_rate: int = 16000
) -> DataFrame:
    """Synthesize a VALID 16-bit mono WAV payload per row: 64+id%64
    samples of constant amplitude 16·(id%1000) — duration and band
    means become exact id arithmetic for the driver oracle."""

    @F.pandas_udf("binary")
    def make(ids: pd.Series) -> pd.Series:
        def one(i: int) -> bytes:
            i = int(i)
            n, amp = 64 + i % 64, (i % 1000) * 16
            buf = io.BytesIO()
            with wave.open(buf, "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(sample_rate)
                w.writeframes(struct.pack(f"<{n}h", *([amp] * n)))
            return buf.getvalue()

        return ids.map(one)

    return df.withColumn("payload", make(F.col(id_col))).withColumn(
        "media_meta",
        F.struct(
            F.lit("audio").alias("modality"),
            F.lit("audio/wav").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(sample_rate).cast("int").alias("sample_rate"),
            (64 + F.col(id_col) % 64).cast("int").alias("n_frames"),
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
    a feat vector derived from the digest bytes. fake=False → REAL
    decode of PPM (P6) / 24-bit BMP payloads: feat = [width, height,
    mean_r, mean_g, mean_b] (channel means in 0..255), zero-padded or
    truncated to ``feat_dim``; undecodable payloads raise ValueError
    naming the supported formats.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = pd.DataFrame()
            out["id"] = pdf[id_col].astype("int64")
            payloads = pdf[payload_col]
            out["byte_len"] = payloads.map(len).astype("int64")
            digests = payloads.map(lambda b: hashlib.sha256(bytes(b)).digest())
            out["sha256"] = digests.map(lambda d: d.hex())
            if fake:
                out["feat"] = digests.map(
                    lambda d: [d[i] / 255.0 for i in range(feat_dim)]
                )
            else:
                def real_feat(b) -> list[float]:
                    px = _decode_image_bytes(bytes(b))
                    h, w = px.shape[0], px.shape[1]
                    means = px.reshape(-1, 3).mean(axis=0, dtype=np.float64)
                    f = [float(w), float(h), *(float(m) for m in means)]
                    return (f + [0.0] * feat_dim)[:feat_dim]

                out["feat"] = payloads.map(real_feat)
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
    """Resize: payload→payload transform + metadata update.
    fake=True replaces the payload with a deterministic digest-derived
    stand-in (so schema/lineage are real); fake=False REALLY resizes
    PPM/BMP payloads by nearest-neighbor (numpy index sampling) and
    re-emits a valid P6 PPM. Metadata width/height are updated
    natively — a query that only reads dimensions never touches
    payload bytes."""

    @F.pandas_udf("binary")
    def do_resize(s: pd.Series) -> pd.Series:
        if not fake:
            def one(b) -> bytes:
                px = _decode_image_bytes(bytes(b))
                src_h, src_w = px.shape[0], px.shape[1]
                ys = np.arange(height) * src_h // height
                xs = np.arange(width) * src_w // width
                out = np.ascontiguousarray(px[ys][:, xs])
                return b"P6\n%d %d\n255\n" % (width, height) + out.tobytes()

            return s.map(one)
        return s.map(
            lambda b: hashlib.sha256(
                bytes(b) + f"@{width}x{height}".encode()
            ).digest()
        )

    return df.withColumn(payload_col, do_resize(F.col(payload_col))).withColumn(
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
    """Audio features (duration + fixed-dim band vector) via
    mapInPandas. fake=True: duration = byte_len/sample_rate and a
    digest-derived vector (plumbing-only). fake=False: REAL WAV
    decode via the stdlib ``wave`` reader — duration from the frame
    count and header rate, and the vector = means of ``n_mfcc``
    consecutive time bands of the normalized mono signal (true MFCCs
    need a mel filterbank — librosa/torchaudio — but the band means
    are honest decoded-signal statistics, not digests)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = pd.DataFrame()
            out["id"] = pdf[id_col].astype("int64")
            payloads = pdf[payload_col].map(bytes)
            if fake:
                out["duration_s"] = payloads.map(len) / float(sample_rate)
                out["mfcc"] = payloads.map(
                    lambda b: [
                        x / 255.0
                        for x in hashlib.sha256(b).digest()[:n_mfcc]
                    ]
                )
            else:
                decoded = payloads.map(_decode_wav)
                out["duration_s"] = decoded.map(lambda d: d[0])
                out["mfcc"] = decoded.map(
                    lambda d: [
                        float(c.mean()) if c.size else 0.0
                        for c in np.array_split(d[1], n_mfcc)
                    ]
                )
            yield out

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        batches, AUDIO_SCHEMA
    )


def synth_png_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Synthesize a VALID 8-bit RGB PNG payload per row: gradient
    pixels ``v(c, x, y) = base_c + x + y`` with bases id%200 /
    7·id%200 / 13·id%200 at width 4+id%5 × height 3+id%4 (no mod-256
    wrap: base ≤ 199, x+y ≤ 12), scanline filter (id+y) % 5 — every
    PNG filter type is exercised across a corpus, and the channel
    means reduce to EXACT dyadic id arithmetic the SQL oracle
    re-derives: mean_c = base_c + (w−1)/2 + (h−1)/2."""

    @F.pandas_udf("binary")
    def make(ids: pd.Series) -> pd.Series:
        def one(i: int) -> bytes:
            i = int(i)
            w, h = 4 + i % 5, 3 + i % 4
            x = np.arange(w, dtype=np.int32)[None, :, None]
            y = np.arange(h, dtype=np.int32)[:, None, None]
            base = np.array(
                [i % 200, (i * 7) % 200, (i * 13) % 200], np.int32
            )[None, None, :]
            px = (base + x + y).astype(np.uint8)
            return encode_png(px, filter_of=lambda yy: (i + yy) % 5)

        return ids.map(one)

    return df.withColumn("payload", make(F.col(id_col))).withColumn(
        "media_meta",
        F.struct(
            F.lit("image").alias("modality"),
            F.lit("image/png").alias("mime"),
            (4 + F.col(id_col) % 5).cast("int").alias("width"),
            (3 + F.col(id_col) % 4).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("int").alias("n_frames"),
        ),
    )
