"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads travel as ``binary`` columns alongside a
metadata struct; decode / feature-extract / resize / frame-sample run
as Arrow-batched Pandas iterators via ``mapInPandas``. The decode
libraries are not available in this container, so the actual pixel/PCM
decode is STUBBED (deterministic fake features) behind
``decode_stub=True`` — the Spark-side plumbing (schema, batch shape,
partitioning, UDF signature) is real and tested.

Scale notes: binary payloads dominate row size — repartition by a
content-size bucket before mapInPandas so Arrow batches stay bounded;
never groupBy/shuffle the binary column itself (carry an id, join
features back by id if needed).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("payload", T.BinaryType(), True),
    T.StructField("meta", T.StructType([
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]), True),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("n_bytes", T.LongType(), True),
    T.StructField("first_byte", T.IntegerType(), True),
    T.StructField("byte_checksum", T.LongType(), True),
    T.StructField("feature", T.ArrayType(T.FloatType()), True),
])


def documents_as_media(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Build a media-shaped frame from the documents fixture: the utf-8
    bytes of the text stand in for an opaque payload."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


def extract_features(media: DataFrame, decode_stub: bool = True, feature_dim: int = 4) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow batches).

    With ``decode_stub=True`` the "decoder" computes deterministic fake
    features from the raw bytes (length, first byte, additive checksum,
    and a fixed-dim folded-byte histogram). A real deployment swaps the
    body for PIL/librosa/ffmpeg decode — the signature, schema, and
    batch shape stay identical.
    """
    if not decode_stub:
        raise NotImplementedError(
            "real media decode requires image/audio libs not present in this "
            "container; run with decode_stub=True"
        )

    # no forced repartition here: shuffling binary payloads costs more
    # than the stub featurization saves. With a REAL decoder (10-100ms
    # per item) callers should `df.repartition(n)` first — the shuffle
    # amortizes instantly at that per-row cost.

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            n_bytes, first_byte, checksum, feats = [], [], [], []
            for raw in payloads:
                b = bytes(raw) if raw is not None else b""
                n_bytes.append(len(b))
                first_byte.append(b[0] if b else 0)
                checksum.append(sum(b) % (1 << 31))
                hist = [0.0] * feature_dim
                for i, byte in enumerate(b):
                    hist[i % feature_dim] += float(byte)
                feats.append([v / max(len(b), 1) for v in hist])
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "n_bytes": n_bytes,
                "first_byte": first_byte,
                "byte_checksum": checksum,
                "feature": feats,
            })

    return media.mapInPandas(featurize, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("payload", T.BinaryType(), True),
    T.StructField("meta", MEDIA_SCHEMA["meta"].dataType, True),
])


def resize(media: DataFrame, width: int, height: int, decode_stub: bool = True) -> DataFrame:
    """Resize plumbing via mapInPandas: same media schema out, metadata
    updated to the target dims. The stub "resampler" truncates/repeats
    payload bytes to width*height deterministically; a real deployment
    swaps the body for PIL/ffmpeg — signature, schema, and Arrow batch
    shape stay identical.
    """
    if not decode_stub:
        raise NotImplementedError(
            "real resize requires image libs not present in this container; "
            "run with decode_stub=True"
        )

    target = width * height

    def do_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            metas = []
            for raw, meta in zip(pdf["payload"], pdf["meta"]):
                b = bytes(raw) if raw is not None else b""
                out = (b * (target // max(len(b), 1) + 1))[:target] if b else b"\x00" * target
                payloads.append(out)
                m = dict(meta) if meta is not None else {}
                m["width"], m["height"] = width, height
                metas.append(m)
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "payload": payloads,
                "meta": metas,
            })

    return media.mapInPandas(do_resize, schema=RESIZED_SCHEMA)


def frame_sample(media: DataFrame, every_n_bytes: int = 64, max_frames: int = 8) -> DataFrame:
    """"Frame sampling" plumbing: emit every Nth byte-offset slice of the
    payload as a row (stand-in for video frame extraction). Native
    posexplode over a computed offsets array — no UDF."""
    offsets = F.slice(
        F.sequence(F.lit(0), F.greatest(F.length(F.col("payload")) - 1, F.lit(0)), F.lit(every_n_bytes)),
        1, max_frames,
    )
    return media.select(
        "media_id",
        F.posexplode(offsets).alias("frame_index", "byte_offset"),
    )
