"""Multimodal column support: image/audio/video as opaque binary
columns with typed metadata, processed via Arrow-batched mapInPandas.

The Spark-side plumbing (schemas, batch shapes, partitioning, format
sniffing) is real and tested; the actual codec work is stubbed behind
import-guards because decode libraries (PIL/av/soundfile) are not in
this container — `fake_features=True` (default) derives deterministic
pseudo-features from the bytes so pipelines are exercisable end-to-end.
Swapping in a real decoder only changes the inside of one batch
function.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# magic-number prefixes → format label (native sniffing, no UDF)
_MAGIC = {
    "89504E47": "png",
    "FFD8FF": "jpeg",
    "47494638": "gif",
    "52494646": "riff",  # wav/avi/webp container
    "664C6143": "flac",
    "494433": "mp3",
    "3C68746D": "html",
    "3C21444F": "html",
}


def media_meta_exprs(binary_col: Column | str) -> list[Column]:
    """Typed metadata columns from an opaque binary payload: byte size
    + magic-number format sniff. Pure native expressions."""
    c = F.col(binary_col) if isinstance(binary_col, str) else binary_col
    head = F.upper(F.hex(F.substring(c, 1, 4)))
    fmt = F.lit("unknown")
    for magic, label in sorted(_MAGIC.items(), key=lambda kv: -len(kv[0])):
        fmt = F.when(head.startswith(magic), F.lit(label)).otherwise(fmt)
    fmt = F.when(c.isNull(), F.lit(None).cast("string")).otherwise(fmt)
    return [
        F.length(c).alias("media_bytes"),
        fmt.alias("media_format"),
    ]


def _fake_decode(payload: bytes | None, dim: int) -> tuple[int, int, int, list[float]]:
    """Deterministic stand-in for a real image decode: pseudo dims +
    unit-norm feature vector seeded from the content digest."""
    if not payload:
        return 0, 0, 0, [0.0] * dim
    digest = hashlib.sha256(payload).digest()
    seed = int.from_bytes(digest[:4], "big")
    rng = np.random.RandomState(seed)
    w = 64 + seed % 960
    h = 64 + (seed >> 8) % 960
    feats = rng.standard_normal(dim)
    feats = feats / max(float(np.linalg.norm(feats)), 1e-9)
    return int(w), int(h), 3, [float(x) for x in feats]


def decode_image_features(
    df: DataFrame,
    id_col: str,
    binary_col: str,
    feature_dim: int = 32,
    fake_features: bool = True,
) -> DataFrame:
    """(id, width, height, channels, features array<float>) via
    mapInPandas — one Python call per Arrow batch. With
    fake_features=False a real decoder (PIL) is required; absent in
    this container, so it raises NotImplementedError by design."""
    if not fake_features:
        try:
            import PIL.Image  # noqa: F401
        except ImportError as e:  # pragma: no cover - env-dependent
            raise NotImplementedError(
                "real image decode needs Pillow; not available in this "
                "container — use fake_features=True (deterministic stub)"
            ) from e

    out_schema = (
        f"{id_col} string, width int, height int, channels int, "
        "features array<float>"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for rid, payload in zip(pdf[id_col], pdf[binary_col]):
                w, h, c, feats = _fake_decode(
                    bytes(payload) if payload is not None else None, feature_dim
                )
                rows.append(
                    {id_col: rid, "width": w, "height": h, "channels": c,
                     "features": feats}
                )
            yield pd.DataFrame(rows)

    src = df.select(F.col(id_col).cast("string").alias(id_col), binary_col)
    return src.mapInPandas(batches, schema=out_schema)


def sample_media_frames(
    df: DataFrame,
    id_col: str,
    binary_col: str,
    n_frames: int = 4,
) -> DataFrame:
    """Video-style frame sampling stub: emits n_frames rows per media
    payload with deterministic frame offsets — exercises the 1→N
    mapInPandas fan-out shape a real frame sampler has."""
    out_schema = f"{id_col} string, frame_idx int, frame_ts double, frame_digest string"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for rid, payload in zip(pdf[id_col], pdf[binary_col]):
                if payload is None:
                    continue
                b = bytes(payload)
                dur = 1.0 + (len(b) % 600)
                for i in range(n_frames):
                    ts = dur * i / n_frames
                    d = hashlib.sha256(b + i.to_bytes(4, "big")).hexdigest()[:16]
                    rows.append(
                        {id_col: rid, "frame_idx": i, "frame_ts": round(ts, 3),
                         "frame_digest": d}
                    )
            yield pd.DataFrame(rows, columns=[id_col, "frame_idx", "frame_ts",
                                              "frame_digest"])

    src = df.select(F.col(id_col).cast("string").alias(id_col), binary_col)
    return src.mapInPandas(batches, schema=out_schema)
