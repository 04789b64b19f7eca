"""Multimodal column plumbing (SURVEY §2.4 X5).

Images/audio/video are opaque ``binary`` columns with typed metadata
structs. The decode step itself is STUBBED (codec libraries are not
in this container — see ``FakeCodec``): the Spark-side plumbing that
matters at 100 TB is real and tested — schema, Arrow batch shape,
``mapInPandas`` signatures, partition sizing.

100 TB notes: binary blobs dominate row size, so
``spark.sql.files.maxPartitionBytes`` controls batch memory; feature
extraction is mapInPandas (no shuffle); only extracted features (small
vectors) flow into downstream joins/aggs — never raw bytes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("blob", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("format", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                ]
            ),
        ),
    ]
)


class FakeCodec:
    """Deterministic stand-in for image/audio decode.

    Real deployments swap in PIL/ffmpeg here (see ``PilCodec``); the
    container has neither, so 'decoding' derives stable pseudo-pixels
    from the blob bytes. Everything downstream (batch shapes, schema
    contracts) is identical to the real thing.
    """

    @staticmethod
    def decode_features(blob: bytes, dim: int = 8) -> list[float]:
        if blob is None:
            raise NotImplementedError("real codec required for None blobs")
        h = hashlib.sha256(blob).digest()
        return [h[i] / 255.0 for i in range(dim)]

    @staticmethod
    def thumbnail_bytes(blob: bytes, w: int = 4, h: int = 4) -> bytes:
        d = hashlib.sha256(blob).digest()
        return bytes((d * ((w * h) // len(d) + 1))[: w * h])


class PilCodec:
    """Real image codec backed by Pillow — the swap-in for FakeCodec.

    Same interface, so ``extract_features``/``resize_thumbnails`` work
    unchanged when Pillow is installed on the executors (it is not in
    this container; ``get_codec`` falls back to FakeCodec). Features
    are a dim-length grayscale intensity profile; thumbnails are raw
    grayscale pixels — intentionally simple, the contract under test
    is the seam, not the vision model.
    """

    @staticmethod
    def decode_features(blob: bytes, dim: int = 8) -> list[float]:
        import io

        from PIL import Image

        img = Image.open(io.BytesIO(blob)).convert("L").resize((dim, 1))
        return [p / 255.0 for p in img.getdata()]

    @staticmethod
    def thumbnail_bytes(blob: bytes, w: int = 4, h: int = 4) -> bytes:
        import io

        from PIL import Image

        img = Image.open(io.BytesIO(blob)).convert("L").resize((w, h))
        return bytes(img.getdata())


def get_codec():
    """The codec seam: PilCodec when Pillow is importable, else the
    deterministic FakeCodec. Ops below take ``codec=`` for explicit
    injection (tests, ffmpeg-backed video codecs, ...)."""
    try:
        import PIL  # noqa: F401

        return PilCodec
    except ImportError:
        return FakeCodec


def extract_features(media: DataFrame, dim: int = 8, codec=None) -> DataFrame:
    """blob → feature vector via Arrow-batched mapInPandas.

    Output: (media_id, kind, features array<double>). ``codec``
    defaults to get_codec() (PilCodec if available, else FakeCodec).
    """
    codec = codec or get_codec()
    out_schema = (
        "media_id long, kind string, features array<double>"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "features": pdf["blob"].map(
                        lambda b: codec.decode_features(b, dim)
                    ),
                }
            )

    return media.mapInPandas(batches, schema=out_schema)


def resize_thumbnails(
    media: DataFrame, w: int = 4, h: int = 4, codec=None
) -> DataFrame:
    """blob → thumbnail blob, keeping metadata (codec-injectable)."""
    codec = codec or get_codec()
    out_schema = "media_id long, kind string, thumb binary, thumb_w int, thumb_h int"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "thumb": pdf["blob"].map(
                        lambda b: codec.thumbnail_bytes(b, w, h)
                    ),
                    "thumb_w": w,
                    "thumb_h": h,
                }
            )

    return media.mapInPandas(batches, schema=out_schema)


def frame_sample(media: DataFrame, every_ms: int = 1000, codec=None) -> DataFrame:
    """video blob → sampled frame rows (frame-index plumbing is real;
    pixel decode goes through the codec seam). Output one row per
    sampled frame: (media_id, frame_idx, frame binary)."""
    codec = codec or get_codec()
    out_schema = "media_id long, frame_idx int, frame binary"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {"media_id": [], "frame_idx": [], "frame": []}
            for _, r in pdf.iterrows():
                dur = r["meta"]["duration_ms"] or 0
                for i in range(max(dur // every_ms, 1)):
                    rows["media_id"].append(r["media_id"])
                    rows["frame_idx"].append(i)
                    rows["frame"].append(
                        codec.thumbnail_bytes(r["blob"] + i.to_bytes(4, "big"))
                    )
            yield pd.DataFrame(rows)

    return media.filter(F.col("kind") == "video").mapInPandas(
        batches, schema=out_schema
    )


def synth_media(spark, embeddings: DataFrame) -> DataFrame:
    """Build a deterministic media table from the embeddings fixture
    (blob = float bytes) — test fuel, no external assets needed."""
    kinds = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("vec_id") % 3 + 1).cast("int"),
    )
    blob = F.sha2(F.concat_ws(",", F.col("embedding").cast("array<string>")), 256).cast(
        "binary"
    )
    return embeddings.select(
        F.col("vec_id").alias("media_id"),
        kinds.alias("kind"),
        blob.alias("blob"),
        F.struct(
            F.lit("synthetic").alias("format"),
            F.lit(64).cast("int").alias("width"),
            F.lit(64).cast("int").alias("height"),
            (F.col("vec_id") % 5000 + 1000).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )
