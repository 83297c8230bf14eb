"""Multimodal (image/audio/video) column plumbing for training-data
pipelines.

Media is carried as an opaque `binary` column plus a typed metadata
struct — the layout a 100 TB multimodal corpus uses (payload bytes
co-located with the row, metadata queryable without touching bytes).
The decode step itself needs codec libraries that are NOT in this
container, so decode is a clearly-marked stub; everything Spark-side —
schema, partitioning, Arrow batch shape, mapInPandas signatures — is
real and tested with a deterministic fake payload generator.

Ops:
  synth_media          deterministic fake payloads (md5-seeded bytes)
                       so tests/benches have a real binary column
  media_stats          metadata + byte stats without decoding (JVM-only)
  byte_histogram       16-bucket byte histogram via mapInPandas/numpy —
                       the template for any vectorized feature extractor
  decode_image         STUB: raises NotImplementedError (no PIL/cv2
                       here); shows the exact mapInPandas contract a
                       real decoder drops into
  frame_sample_plan    computes which frame offsets a video sampler
                       would decode (pure column math — plan, not pixels)
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType, LongType, StringType, StructField, StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),       # image|audio|video
        StructField("payload", StringType(), False),    # replaced by binary below
    ]
)


def synth_media(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic fake media rows from the documents table: payload =
    unbase64-able pseudo-bytes derived from md5 chains; kind cycles
    image/audio/video; metadata struct carries (width,height,duration)."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col(id_col) % 3 + 1).cast("int"),
    )
    # 64 deterministic bytes: md5(id) || md5(id+'x') as binary
    payload = F.concat(
        F.unhex(F.md5(F.col(id_col).cast("string"))),
        F.unhex(F.md5(F.concat(F.col(id_col).cast("string"), F.lit("x")))),
        F.unhex(F.md5(F.concat(F.col(id_col).cast("string"), F.lit("y")))),
        F.unhex(F.md5(F.concat(F.col(id_col).cast("string"), F.lit("z")))),
    )
    return docs.select(
        F.col(id_col).alias("media_id"),
        kind.alias("kind"),
        payload.alias("payload"),
        F.struct(
            (F.col(id_col) % 640 + 16).cast("int").alias("width"),
            (F.col(id_col) % 480 + 16).cast("int").alias("height"),
            (F.col(id_col) % 300).cast("double").alias("duration_s"),
        ).alias("meta"),
    )


def media_stats(media: DataFrame) -> DataFrame:
    """Byte-level stats without decoding: JVM-only (length, first/last
    byte, sha) — metadata queries must never deserialize payloads."""
    return media.select(
        "media_id",
        "kind",
        F.length("payload").cast("long").alias("n_bytes"),
        # sha over the lowercase hex encoding: DuckDB's sha256 does not
        # accept BLOB, so the invariant is defined over hex(payload)
        F.sha2(F.lower(F.hex("payload")), 256).alias("payload_sha"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    )


HIST_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("histogram", ArrayType(LongType()), False),
    ]
)


def byte_histogram(media: DataFrame, n_buckets: int = 16) -> DataFrame:
    """16-bucket high-nibble byte histogram per payload via mapInPandas —
    the Arrow-batched template any real feature extractor (decode,
    resize, embed) drops into. Fully vectorized: the whole batch's
    payloads are concatenated into ONE numpy buffer and a single
    np.add.at scatter builds every row's histogram — no per-payload
    Python loop."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            payloads = list(pdf["payload"])
            lens = np.fromiter((len(p) for p in payloads), dtype=np.int64,
                               count=len(payloads))
            buf = np.frombuffer(b"".join(payloads), dtype=np.uint8)
            row_idx = np.repeat(np.arange(len(payloads)), lens)
            flat = np.zeros(len(payloads) * n_buckets, dtype=np.int64)
            # bucket = byte * n_buckets / 256 (== byte >> 4 for the
            # 16-bucket default) — stays in [0, n_buckets) for ANY
            # n_buckets, unlike a raw high-nibble which would scatter
            # into the next row's slice when n_buckets < 16
            bucket = (buf.astype(np.int64) * n_buckets) >> 8
            np.add.at(flat, row_idx * n_buckets + bucket, 1)
            hists = flat.reshape(-1, n_buckets)
            yield pd.DataFrame(
                {"media_id": pdf["media_id"].to_numpy(),
                 "histogram": hists.tolist()}
            )

    return media.select("media_id", "payload").mapInPandas(fn, HIST_SCHEMA)


def decode_image(media: DataFrame) -> DataFrame:
    """STUB — image decode needs PIL/libvips/cv2, none of which are in
    this container. The mapInPandas contract a real decoder implements:

        input batch : media_id long, payload binary
        output batch: media_id long, height int, width int,
                      pixels array<array<float>> (or a flat
                      array<float> + shape, for Arrow efficiency)

    Raises NotImplementedError at plan time so callers fail fast."""
    raise NotImplementedError(
        "image decode requires a codec library not present in this "
        "environment; see byte_histogram for the working mapInPandas "
        "template a decoder plugs into"
    )


def frame_sample_plan(media: DataFrame, fps: float = 1.0) -> DataFrame:
    """For video rows: which timestamps a frame sampler would decode
    (pure column math; the decode itself is the stubbed step). One row
    per planned frame."""
    vids = media.where(F.col("kind") == "video").select(
        "media_id", F.col("meta.duration_s").alias("dur")
    )
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest((F.col("dur") * fps).cast("long") - 1, F.lit(0)),
            )
        ).alias("frame_idx"),
    ).withColumn("sample_ts_s", F.col("frame_idx") / F.lit(fps))
