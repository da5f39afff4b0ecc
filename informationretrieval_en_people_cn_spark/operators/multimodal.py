"""Multimodal column plumbing: binary payloads + typed metadata.

Images/audio/video ride as opaque ``BinaryType`` columns with a typed
metadata struct; the Spark-side plumbing (schema, batch shape, Arrow
transfer, partition sizing) is real and tested.  The actual media
decode is STUBBED — the decode libs (PIL/ffmpeg/torchaudio) are not in
this container — behind :data:`DECODERS`; production swaps in real
decoders without touching the plan.

Design rule for 100 TB of media: never explode binary through a
shuffle.  Feature extraction runs ``mapInPandas`` directly on the scan
(narrow), emits small fixed-width features, and only *those* shuffle.
"""

from __future__ import annotations

import hashlib

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 16

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("payload_sha256", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
    ]
)


def _fake_decode_features(payload: bytes, kind: str) -> np.ndarray:
    """Deterministic stand-in for decode→embed: bytes → fixed-width
    feature from the sha256 digest.  Replace with a real decoder at
    deploy time; the signature (bytes, kind) -> float32[FEATURE_DIM] is
    the contract."""
    d = hashlib.sha256(kind.encode() + payload).digest()
    arr = np.frombuffer(d[: FEATURE_DIM * 2], dtype=np.uint16).astype(np.float32)
    return arr / np.float32(65535.0)


def _unimplemented(payload: bytes, kind: str) -> np.ndarray:
    raise NotImplementedError(
        "decode for compressed formats (png/jpeg/mp4) requires PIL/ffmpeg "
        "— not available in this container; register a decoder in DECODERS"
    )


# ---------------------------------------------------------------------------
# REAL decoders — stdlib-only formats (struct + numpy, no PIL/ffmpeg).
# Each returns a dict of typed header fields + content stats; the
# feature-vector adapters below project them onto the DECODERS contract.
# ---------------------------------------------------------------------------


def decode_bmp(payload: bytes) -> dict:
    """Parse an uncompressed 24-bit BI_RGB Windows bitmap (BMP).

    Real header math: BITMAPFILEHEADER (14 bytes) + BITMAPINFOHEADER
    (40 bytes), bottom-up rows padded to 4-byte boundaries — the mean
    must skip the padding bytes."""
    import struct

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (data_offset,) = struct.unpack_from("<I", payload, 10)
    (hdr_size,) = struct.unpack_from("<I", payload, 14)
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    width, height = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    (compression,) = struct.unpack_from("<I", payload, 30)
    if bpp != 24 or compression != 0:
        raise ValueError(f"only 24-bit BI_RGB supported (bpp={bpp})")
    h = abs(height)
    row_bytes = width * 3
    stride = (row_bytes + 3) & ~3
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=stride * h, offset=data_offset
    ).reshape(h, stride)[:, :row_bytes]
    return {
        "fmt": "bmp",
        "width": width,
        "height": h,
        "bit_depth": bpp,
        "channels": 3,
        "sample_rate": None,
        "duration_ms": None,
        "n_values": int(rows.size),
        "mean_val": float(int(rows.sum(dtype=np.int64)) / rows.size),
    }


def decode_ppm(payload: bytes) -> dict:
    """Parse a binary Netpbm P6 image: ASCII header (magic, width,
    height, maxval; '#' comments legal) then raw RGB bytes."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    # header tokenizer: whitespace-separated, comments run to newline
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1  # single whitespace byte after maxval, then raster
    width, height, maxval = tokens
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    pix = np.frombuffer(payload, dtype=np.uint8, count=3 * width * height,
                        offset=pos)
    return {
        "fmt": "ppm",
        "width": width,
        "height": height,
        "bit_depth": 8,
        "channels": 3,
        "sample_rate": None,
        "duration_ms": None,
        "n_values": int(pix.size),
        "mean_val": float(int(pix.sum(dtype=np.int64)) / pix.size),
    }


def decode_wav(payload: bytes) -> dict:
    """Parse a PCM RIFF/WAVE file by walking its chunk list (fmt may be
    separated from data by other chunks, e.g. LIST; chunk sizes are
    word-aligned per the RIFF spec)."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # odd chunks carry a pad byte
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt, channels, sample_rate, byte_rate, block_align, bits = fmt
    if audio_fmt != 1 or bits != 16:
        raise ValueError(f"only 16-bit PCM supported (fmt={audio_fmt})")
    samples = np.frombuffer(data, dtype="<i2")
    n_frames = len(data) // block_align
    return {
        "fmt": "wav",
        "width": None,
        "height": None,
        "bit_depth": bits,
        "channels": channels,
        "sample_rate": sample_rate,
        "duration_ms": n_frames * 1000 // sample_rate,
        "n_values": int(samples.size),
        "mean_val": float(int(samples.sum(dtype=np.int64)) / samples.size),
    }


def sniff_decode(payload: bytes) -> dict:
    """Dispatch on magic bytes — the decoder trusts the payload, never
    the metadata column."""
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:2] == b"P6":
        return decode_ppm(payload)
    if payload[:4] == b"RIFF":
        return decode_wav(payload)
    raise ValueError(f"unrecognized media magic {payload[:4]!r}")


def _header_features(payload: bytes, kind: str) -> np.ndarray:
    """DECODERS-contract adapter over the real decoders: fixed-width
    float32 feature of decoded header fields + content mean."""
    d = sniff_decode(payload)
    feat = np.zeros(FEATURE_DIM, dtype=np.float32)
    feat[:8] = [
        d["width"] or 0, d["height"] or 0, d["bit_depth"], d["channels"],
        d["sample_rate"] or 0, d["duration_ms"] or 0, d["n_values"],
        d["mean_val"],
    ]
    return feat


# per-kind fakes for compressed formats; per-mime REAL stdlib decoders
DECODERS = {"image": _fake_decode_features, "audio": _fake_decode_features,
            "video": _fake_decode_features,
            "image/bmp": _header_features, "image/x-portable-pixmap": _header_features,
            "audio/wav": _header_features,
            "_real": _unimplemented}


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table (tests/bench only).

    Payload bytes are the ASCII sha256 hexdigest of ``"{seed}:{i}"``
    repeated — deliberately SQL-derivable (DuckDB's ``sha256`` takes
    VARCHAR only), so the driver oracle can reconstruct every payload,
    its sha256, and the fake-decoder features from ``range(n)`` alone.
    """
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        payload = (
            hashlib.sha256(f"{seed}:{i}".encode()).hexdigest() * (4 + i % 5)
        ).encode()
        meta = {
            "mime": {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
            "width": 64 + i if kind != "audio" else None,
            "height": 64 + i if kind != "audio" else None,
            "duration_ms": 1000 * (i + 1) if kind != "image" else None,
        }
        rows.append((i, kind, bytearray(payload), meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _make_bmp(width: int, height: int, fill: int) -> bytes:
    """Valid 24-bit BI_RGB BMP, every pixel byte = ``fill``; row padding
    bytes are 0xAB so a decoder that fails to skip padding computes a
    wrong mean (pinned by test)."""
    import struct

    row_bytes = width * 3
    stride = (row_bytes + 3) & ~3
    raster = (bytes([fill]) * row_bytes + b"\xab" * (stride - row_bytes)) * height
    off = 14 + 40
    hdr = b"BM" + struct.pack("<IHHI", off + len(raster), 0, 0, off)
    hdr += struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                       len(raster), 2835, 2835, 0, 0)
    return hdr + raster


def _make_ppm(width: int, height: int, fill: int) -> bytes:
    """Valid binary P6 PPM with a comment line in the header (decoders
    must skip it), every sample byte = ``fill``."""
    hdr = f"P6\n# synthetic\n{width} {height}\n255\n".encode()
    return hdr + bytes([fill]) * (3 * width * height)


def _make_wav(channels: int, sample_rate: int, n_frames: int, fill: int) -> bytes:
    """Valid 16-bit PCM RIFF/WAVE, every sample = ``fill``.  A LIST
    chunk of ODD size sits between fmt and data so chunk-walking +
    RIFF word-alignment are exercised (pinned by test)."""
    import struct

    block_align = channels * 2
    data = struct.pack("<h", fill) * (n_frames * channels)
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate,
                      sample_rate * block_align, block_align, 16)
    list_body = b"INFOx"  # 5 bytes: odd, forces the pad-byte branch
    chunks = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
              + b"LIST" + struct.pack("<I", len(list_body)) + list_body + b"\x00"
              + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def synth_media_real(spark, n: int = 48, seed: int = 7) -> DataFrame:
    """Deterministic table of REAL media files (BMP / PPM / WAV built
    byte-for-byte to spec) whose decoded header fields and content
    means are closed-form functions of the row index — so a SQL oracle
    can recompute every ``decode_media`` output from ``range(n)``
    alone, with no media library on either side.

    i % 3 == 0 -> BMP   w=5+i%4 (3w%4!=0 for three of four widths ->
                        real row padding), h=3+i%3, fill=(seed*i*37)%256
    i % 3 == 1 -> PPM   w=4+i%5, h=2+i%4, fill=(seed*i*53)%256
    i % 3 == 2 -> WAV   ch=1+i%2, 8000 Hz, frames=64+i,
                        sample=(seed*i*91)%1001-500
    """
    rows = []
    for i in range(n):
        fmt = i % 3
        if fmt == 0:
            w, h = 5 + i % 4, 3 + i % 3
            payload = _make_bmp(w, h, (seed * i * 37) % 256)
            kind, mime = "image", "image/bmp"
            meta = {"mime": mime, "width": w, "height": h, "duration_ms": None}
        elif fmt == 1:
            w, h = 4 + i % 5, 2 + i % 4
            payload = _make_ppm(w, h, (seed * i * 53) % 256)
            kind, mime = "image", "image/x-portable-pixmap"
            meta = {"mime": mime, "width": w, "height": h, "duration_ms": None}
        else:
            ch, frames = 1 + i % 2, 64 + i
            payload = _make_wav(ch, 8000, frames, (seed * i * 91) % 1001 - 500)
            kind, mime = "audio", "audio/wav"
            meta = {"mime": mime, "width": None, "height": None,
                    "duration_ms": frames * 1000 // 8000}
        rows.append((i, kind, bytearray(payload), meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


DECODE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("fmt", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("bit_depth", T.IntegerType(), False),
        T.StructField("channels", T.IntegerType(), False),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("n_values", T.LongType(), False),
        T.StructField("mean_val", T.DoubleType(), False),
    ]
)


def decode_media(media: DataFrame) -> DataFrame:
    """REAL decode over the scan: magic-sniffed stdlib parsers (BMP /
    P6 PPM / 16-bit PCM WAV) emit typed header fields + content mean.
    Same 100 TB shape as :func:`extract_features` — narrow mapInPandas,
    binary never shuffles, only the small typed rows move on."""

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            recs = [sniff_decode(bytes(p)) for p in pdf["payload"]]
            out = {"media_id": pdf["media_id"].astype("int64"),
                   "fmt": [r["fmt"] for r in recs]}
            for col in ("width", "height", "bit_depth", "channels",
                        "sample_rate", "duration_ms"):
                out[col] = pd.array([r[col] for r in recs], dtype="Int32")
            out["n_values"] = pd.array([r["n_values"] for r in recs],
                                       dtype="int64")
            out["mean_val"] = pd.array([r["mean_val"] for r in recs],
                                       dtype="float64")
            yield pd.DataFrame(out)

    return media.select("media_id", "payload").mapInPandas(gen, DECODE_SCHEMA)


def extract_features(media: DataFrame, decoder_key: str | None = None) -> DataFrame:
    """mapInPandas feature extraction: binary in, small features out.

    Narrow (no shuffle touches the payload); Arrow ships binary
    batches zero-copy.  ``decoder_key`` selects from DECODERS (default:
    per-kind entry).
    """

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            feats, shas, nb = [], [], []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                fn = DECODERS[decoder_key] if decoder_key else DECODERS[kind]
                feats.append(fn(bytes(payload), kind).tolist())
                shas.append(hashlib.sha256(bytes(payload)).hexdigest())
                nb.append(len(payload))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload_sha256": shas,
                    "n_bytes": nb,
                    "feature": feats,
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(gen, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled frame
    timestamp (decode stubbed).  Shows the explode shape: metadata-only
    explode first (cheap), payload decode per sampled frame second —
    never the reverse."""
    v = media.filter(F.col("kind") == "video")
    ts = F.sequence(
        F.lit(0),
        F.greatest(F.coalesce(F.col("meta.duration_ms"), F.lit(0)) - 1, F.lit(0)),
        F.lit(every_ms),
    )
    return v.select(
        "media_id",
        F.explode(ts).alias("frame_ts_ms"),
        F.lit(None).cast(T.BinaryType()).alias("frame"),  # decode stub
    )
