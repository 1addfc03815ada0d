"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video travel as ``binary`` columns with a metadata struct
(modality, mime, width/height/duration). Decode / feature-extract / resize /
frame-sample run as Arrow-batched ``mapInPandas`` kernels — the Spark-side
contract (schema, batch shape, partitioning) is real and tested; the actual
codec call is STUBBED (``decode_stub_*``) because image/audio libraries are
not in this container. Swap ``_decode_image_bytes`` for PIL/torchvision in
production; everything around it (batching, schema evolution, partition
sizing) is unchanged.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("modality", T.StringType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
    ]
)


def attach_media(
    df: DataFrame,
    payload_col: str,
    modality: str = "image",
    mime: str = "application/octet-stream",
    out_col: str = "media",
    meta_col: str = "media_meta",
) -> DataFrame:
    """Wrap an existing binary/string column as a media payload + meta struct."""
    payload = F.col(payload_col)
    if dict(df.dtypes)[payload_col] == "string":
        payload = F.encode(payload, "UTF-8")
    return df.withColumn(out_col, payload).withColumn(
        meta_col,
        F.struct(
            F.lit(modality).alias("modality"),
            F.lit(mime).alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
        ),
    )


def _decode_image_bytes(data: bytes) -> "object":
    """Real decoder hook: uses PIL when the executor environment has it
    (guarded import — the day the cluster image gains Pillow this path goes
    live with no code change), else raises. Returns a PIL.Image."""
    try:  # executor-side guarded import: PIL is optional
        from PIL import Image  # noqa: PLC0415
    except ImportError as exc:
        raise NotImplementedError(
            "Image decoding requires PIL/opencv, not present in this environment. "
            "The Spark plumbing around this hook (mapInPandas batching, schema) is real."
        ) from exc
    import io  # noqa: PLC0415

    return Image.open(io.BytesIO(data))


def _image_features(data: bytes, n_features: int) -> list[float]:
    """Real feature extraction when PIL is present: decode, downscale to a
    fixed grid, emit normalized grayscale intensities (a deterministic,
    library-faithful stand-in for a learned encoder)."""
    img = _decode_image_bytes(data)
    side = max(1, int(n_features ** 0.5))
    small = img.convert("L").resize((side, side))
    vals = [p / 255.0 * 2.0 - 1.0 for p in small.getdata()]
    out = (vals * ((n_features // len(vals)) + 1))[:n_features]
    return [float(v) for v in out]


def _fake_features(data: bytes, n_features: int) -> list[float]:
    """Deterministic stand-in for a feature extractor: sha256-derived floats.

    Lets the full distributed pipeline (schema, batching, joins downstream)
    be exercised and asserted byte-for-byte without codecs.
    """
    out = []
    h = data or b""
    i = 0
    while len(out) < n_features:
        digest = hashlib.sha256(h + i.to_bytes(4, "little")).digest()
        for off in range(0, 32, 4):
            if len(out) >= n_features:
                break
            v = int.from_bytes(digest[off : off + 4], "little")
            out.append((v / 2**32) * 2.0 - 1.0)
        i += 1
    return out


def extract_media_features(
    df: DataFrame,
    media_col: str = "media",
    id_cols: tuple[str, ...] = ("doc_id",),
    n_features: int = 16,
    use_stub: bool = True,
    batch_note: str = "arrow",
) -> DataFrame:
    """Feature-extract each payload via Arrow-batched ``mapInPandas``.

    Output schema: id_cols + (n_bytes long, features array<float>). Batches
    arrive as pandas DataFrames (vectorized Arrow transfer — never per-row
    Python); the per-batch loop is numpy/pandas-side.
    """
    out_schema = T.StructType(
        [f for f in df.schema.fields if f.name in id_cols]
        + [
            T.StructField("n_bytes", T.LongType()),
            T.StructField("features", T.ArrayType(T.FloatType())),
        ]
    )
    cols = list(id_cols) + [media_col]

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[media_col]
            feats = [
                _fake_features(p, n_features)
                if use_stub
                else _image_features(p, n_features)
                for p in payloads
            ]
            out = pdf[list(id_cols)].copy()
            out["n_bytes"] = [len(p or b"") for p in payloads]
            out["features"] = feats
            yield out

    return df.select(*cols).mapInPandas(_extract, schema=out_schema)


def sample_frames(
    df: DataFrame,
    media_col: str = "media",
    id_cols: tuple[str, ...] = ("doc_id",),
    every_n_bytes: int = 64,
    frame_size: int = 16,
) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled "frame" (byte
    window stands in for a video frame). Pure expressions — the explode shape
    and per-frame keys are exactly what a real frame sampler produces."""
    n = F.length(F.col(media_col))
    idx = F.sequence(F.lit(0), F.greatest((n - 1) / every_n_bytes, F.lit(0)).cast("int"))
    return (
        df.select(*id_cols, F.posexplode(idx).alias("frame_idx", "_i"), F.col(media_col))
        .withColumn("frame_bytes", F.substring(F.col(media_col), F.col("_i") * every_n_bytes + 1, frame_size))
        .drop("_i", media_col)
    )
