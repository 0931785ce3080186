"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The container has no image/audio codecs, so the decode step is STUBBED
(deterministic fake documented below / NotImplementedError for real
codecs) — but the Spark-side plumbing is real and tested: schema,
partition-preserving mapInPandas batches, Arrow batch shapes, and the
metadata discipline a 100-TB multimodal table needs (never explode
binary blobs through a shuffle; process in place, emit features).

Pipeline shape:

    media(doc_id, media_ref, kind, payload binary, meta struct)
      -> decode_media (mapInPandas, per-batch)      [STUB]
      -> feature columns (width, height, n_frames, fingerprint)
      -> tiny feature table joins back to documents by doc_id
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = "doc_id string, media_ref string, kind string, payload binary, width int, height int"


def fake_payload(media_ref: str, w: int, h: int) -> bytes:
    """Deterministic stand-in for an encoded image: seeded bytes.
    Real codecs are out of scope in this container (no PIL/ffmpeg)."""
    seed = int(hashlib.md5(media_ref.encode()).hexdigest()[:8], 16)
    rng = np.random.RandomState(seed)
    return rng.bytes(min(w * h, 4096))


def decode_media_features(media: DataFrame) -> DataFrame:
    """Extract per-media features with one Arrow pass.

    STUB decode: a real deployment swaps `_decode_stub` for a codec
    call (PIL / torchaudio / pyav); the batch contract stays the same —
    binary in, fixed-width numeric features out, no Python object
    columns crossing batch boundaries.
    """

    def _decode_stub(payload: bytes, width: int, height: int) -> np.ndarray:
        """Deterministic fake decode: byte histogram moments stand in
        for pixel statistics.  Raises for kinds we cannot fake."""
        arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
        if len(arr) == 0:
            return np.zeros(3)
        return np.array([arr.mean(), arr.std(), float(len(arr))])

    def kernel(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            feats = np.zeros((len(pdf), 3), dtype=np.float64)
            fps = np.empty(len(pdf), dtype=object)
            for i, row in enumerate(pdf.itertuples()):
                if row.kind not in ("image", "thumb"):
                    raise NotImplementedError(
                        f"decode for kind={row.kind!r} needs a codec not present in this container"
                    )
                feats[i] = _decode_stub(row.payload, row.width, row.height)
                fps[i] = hashlib.md5(row.payload or b"").hexdigest()
            out = pdf[["doc_id", "media_ref", "kind", "width", "height"]].copy()
            out["mean_byte"] = feats[:, 0]
            out["std_byte"] = feats[:, 1]
            out["n_bytes"] = feats[:, 2].astype(np.int64)
            out["payload_md5"] = fps
            yield out

    return media.mapInPandas(
        kernel,
        "doc_id string, media_ref string, kind string, width int, height int, "
        "mean_byte double, std_byte double, n_bytes long, payload_md5 string",
    )


def media_table_from_documents(documents: DataFrame) -> DataFrame:
    """Pull media spans out of documents into the media table shape.
    JVM-side span filtering; payload synthesized deterministically via
    a vectorized UDF (stand-in for reading object storage)."""
    spans = documents.select(
        "doc_id",
        F.explode(F.expr("filter(spans, s -> s.kind = 'media')")).alias("m"),
    ).select(
        "doc_id",
        F.col("m.media_ref").alias("media_ref"),
        F.lit("thumb").alias("kind"),
        F.split(F.col("m.text"), "x").getItem(0).cast("int").alias("width"),
        F.split(F.col("m.text"), "x").getItem(1).cast("int").alias("height"),
    )

    @F.pandas_udf("binary")
    def load_payload(ref: pd.Series, w: pd.Series, h: pd.Series) -> pd.Series:
        return pd.Series(
            [fake_payload(r, int(a), int(b)) for r, a, b in zip(ref, w, h)]
        )

    return spans.withColumn("payload", load_payload("media_ref", "width", "height"))
