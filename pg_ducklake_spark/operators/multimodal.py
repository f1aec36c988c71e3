"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns + typed metadata (SURVEY.md north
star). The real codecs (PIL/ffmpeg/librosa) are not in this container,
so the *decode* step is stubbed — either raising NotImplementedError or
producing a deterministic fake — while everything Spark-side is real:
schemas, Arrow-batched ``mapInPandas`` signatures, per-batch shapes,
partition behavior.

Scale notes: mapInPandas streams Arrow record batches — media bytes
never materialize as Python row objects; keep
``spark.sql.execution.arrow.maxRecordsPerBatch`` sized so batch_bytes ≈
batch_rows × avg_media_size fits executor memory. Feature extraction is
embarrassingly parallel: no shuffle at all.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), False),
        T.StructField("metadata", T.StringType(), True),  # JSON sidecar
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("byte_mean", T.DoubleType(), False),
        T.StructField("byte_entropy_proxy", T.DoubleType(), False),
        T.StructField("feature", T.ArrayType(T.DoubleType()), False),
    ]
)


def decode_image(content: bytes) -> "object":
    """Decode an image payload to a pixel array.

    Tries the real codecs at call time — PIL first, then OpenCV — so a
    cluster that has either installed decodes for real; only when both
    are genuinely absent does it raise. The container this repo is
    developed in ships neither, so tests exercise the Spark-side
    plumbing (schema, batching, partitioning) via
    :func:`extract_features`'s deterministic fake featurizer.
    """
    try:
        import io

        from PIL import Image  # type: ignore[import-not-found]

        import numpy as np

        return np.asarray(Image.open(io.BytesIO(bytes(content))))
    except ImportError:
        pass
    try:
        import cv2  # type: ignore[import-not-found]

        import numpy as np

        arr = np.frombuffer(bytes(content), dtype=np.uint8)
        img = cv2.imdecode(arr, cv2.IMREAD_UNCHANGED)
        if img is None:
            raise ValueError("cv2 could not decode image payload")
        return img
    except ImportError:
        pass
    raise NotImplementedError(
        "image decode requires PIL or opencv, neither is installed; "
        "use extract_features(fake=True) for plumbing tests"
    )


def _fake_features(content: pd.Series, dim: int) -> pd.DataFrame:
    """Deterministic fake 'decode': byte statistics + a byte-histogram
    feature vector. Stands in for pixel/spectrogram features; same
    shape/contract as a real extractor."""
    import numpy as np

    n_bytes, means, ent, feats = [], [], [], []
    for buf in content:
        arr = np.frombuffer(bytes(buf), dtype=np.uint8)
        if arr.size == 0:
            arr = np.zeros(1, dtype=np.uint8)
        hist = np.bincount(arr % dim, minlength=dim).astype("float64")
        p = hist / hist.sum()
        nz = p[p > 0]
        n_bytes.append(int(arr.size))
        means.append(float(arr.mean()))
        ent.append(float(-(nz * np.log2(nz)).sum()))
        feats.append((hist / max(float(arr.size), 1.0)).tolist())
    return pd.DataFrame(
        {
            "n_bytes": n_bytes,
            "byte_mean": means,
            "byte_entropy_proxy": ent,
            "feature": feats,
        }
    )


def extract_features(media: DataFrame, dim: int = 16, fake: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over a media table.

    ``media`` must carry MEDIA_SCHEMA columns. With ``fake=True`` the
    decode stage uses the deterministic byte-histogram stand-in; with
    ``fake=False`` it calls :func:`decode_image` (NotImplementedError
    here — the seam where a real codec plugs in).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                pdf["content"].map(decode_image)  # pragma: no cover
            out = _fake_features(pdf["content"], dim)
            out.insert(0, "media_type", pdf["media_type"].values)
            out.insert(0, "media_id", pdf["media_id"].values)
            yield out

    schema = T.StructType(
        [f for f in FEATURE_SCHEMA.fields if f.name != "feature"]
        + [T.StructField("feature", T.ArrayType(T.DoubleType()), False)]
    )
    return media.mapInPandas(run, schema=schema)


def frame_sample(media: DataFrame, every_n_bytes: int = 1024) -> DataFrame:
    """'Frame sampling' for opaque video payloads: emit one row per
    sampled offset (stand-in for per-frame decode). Pure column ops —
    no Python in the loop."""
    n = F.length("content").cast("long")
    offsets = F.expr(
        f"transform(sequence(0, greatest(CAST(length(content) AS BIGINT) - 1, 0),"
        f" {every_n_bytes}), x -> x)"
    )
    return media.select(
        "media_id",
        "media_type",
        n.alias("n_bytes"),
        F.posexplode(offsets).alias("frame_no", "byte_offset"),
    )


def resize_media(
    media: DataFrame, width: int, height: int, fake: bool = True
) -> DataFrame:
    """Resize image/video payloads to ``width×height`` — binary in,
    binary out, MEDIA_SCHEMA preserved, the JSON metadata sidecar
    updated with the new dimensions.

    STUB decode: the fake path deterministically resamples the raw
    bytes to ``width*height`` samples (evenly-spaced gather — same
    byte-budget contract as a real bilinear resize); ``fake=False`` is
    the seam where a real codec plugs in. Everything Spark-side is
    real: Arrow batching, binary round trip, metadata evolution, and
    zero shuffle (embarrassingly parallel like extract_features)."""
    import json as _json

    import numpy as np

    target = int(width) * int(height)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                pdf["content"].map(decode_image)  # pragma: no cover
            out_content, out_meta = [], []
            for buf, meta in zip(pdf["content"], pdf["metadata"]):
                arr = np.frombuffer(bytes(buf), dtype=np.uint8)
                if arr.size == 0:
                    arr = np.zeros(1, dtype=np.uint8)
                idx = np.linspace(0, arr.size - 1, target).round().astype(np.int64)
                out_content.append(arr[idx].tobytes())
                m = _json.loads(meta) if meta else {}
                m.update(
                    {"width": width, "height": height,
                     "resized_from_bytes": int(arr.size)}
                )
                out_meta.append(_json.dumps(m, sort_keys=True))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "media_type": pdf["media_type"].values,
                    "content": out_content,
                    "metadata": out_meta,
                }
            )

    return media.mapInPandas(run, schema=MEDIA_SCHEMA)
