"""Multimodal columns: opaque ``binary`` payloads + typed metadata.

Design for the 100 TB pipeline: media bytes live in a BinaryType column
(or out-of-line object-store keys), metadata in sibling typed columns;
decode / feature-extraction / frame-sampling run as Arrow-batched
``mapInPandas`` stages so each Python worker touches a columnar batch
of byte strings, never row-at-a-time.

The image/audio codec libraries are NOT in this container, so the
decode kernels are explicitly stubbed (``decode_images`` raises
``NotImplementedError`` unless Pillow is importable;
``fake_image_features`` is the deterministic stand-in). Everything
Spark-side — schemas, batch iteration, UDF signatures, explode shapes —
is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
import pyspark.sql.functions as F

try:  # optional codec dependency
    from PIL import Image  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False

#: magic-byte prefixes → declared format
_MAGIC = (
    (b"\x89PNG\r\n\x1a\n", "png"),
    (b"\xff\xd8\xff", "jpeg"),
    (b"RIFF", "wav"),
    (b"GIF8", "gif"),
    (b"\x00\x00\x00", "mp4"),
)


def attach_binary_metadata(df: DataFrame, binary_col: str = "payload") -> DataFrame:
    """Typed metadata columns for an opaque binary payload: byte length,
    content digest, magic-byte format sniff. Pure Catalyst expressions
    (no Python) — cheap enough to run inline at ingest."""
    b = F.col(binary_col)
    fmt = F.lit("unknown")
    for magic, name in reversed(_MAGIC):
        fmt = F.when(
            F.expr(f"substring({binary_col}, 1, {len(magic)})") == F.lit(magic),
            F.lit(name),
        ).otherwise(fmt)
    return df.withColumns(
        {
            "media_length": F.length(b).alias("media_length"),
            "media_digest": F.md5(b),
            "media_format": fmt,
        }
    )


def fake_image_features(
    df: DataFrame,
    binary_col: str = "payload",
    id_col: str = "media_id",
    dim: int = 8,
) -> DataFrame:
    """Deterministic stand-in for an image-embedding kernel: features
    derived from the content digest, as float32 in [0, 1). The
    mapInPandas shape (schema, Arrow batches, output arity) is exactly
    what a real encoder stage uses — swap the kernel, keep the plan."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for content in pdf[binary_col]:
                digest = hashlib.md5(bytes(content)).digest()
                rng = np.frombuffer((digest * ((4 * dim) // 16 + 1))[: 4 * dim], dtype=np.uint32)
                feats.append((rng % 1_000_003).astype(np.float32) / 1_000_003.0)
            yield pd.DataFrame(
                {id_col: pdf[id_col], "features": [f.tolist() for f in feats]}
            )

    return df.select(id_col, binary_col).mapInPandas(
        kernel, f"{id_col} long, features array<float>"
    )


def decode_images(df: DataFrame, binary_col: str = "payload") -> DataFrame:
    """Real image decode (width/height/mode) — requires Pillow, which
    this container does not ship. STUB: raises with guidance; the
    production kernel is ``fake_image_features``-shaped with
    ``Image.open(io.BytesIO(content))`` inside."""
    if not _HAS_PIL:
        raise NotImplementedError(
            "Pillow is not available in this environment; use "
            "fake_image_features for plumbing tests or install pillow "
            "to enable real decoding"
        )
    raise NotImplementedError("real decode kernel intentionally deferred")


def sample_frames(
    df: DataFrame,
    n_frames_col: str = "n_frames",
    every_n: int = 10,
    id_col: str = "media_id",
) -> DataFrame:
    """Video frame-sampling plan shape: one row per sampled frame index
    (0, n, 2n, …) per media item — the explode pattern a real
    frame-decoder UDTF plugs into. Frame extraction itself is the
    stubbed kernel; the sampled index stream is real."""
    return df.select(
        F.col(id_col),
        F.explode(
            F.sequence(F.lit(0), F.col(n_frames_col) - 1, F.lit(every_n))
        ).alias("frame_idx"),
    )
