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
        "real media decode requires PIL/ffmpeg — not available in this "
        "container; register a decoder in DECODERS"
    )


# swap "fake" -> a real decoder per kind in production
DECODERS = {"image": _fake_decode_features, "audio": _fake_decode_features,
            "video": _fake_decode_features, "_real": _unimplemented}


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
