"""Multimodal column plumbing (SURVEY.md §2 Tier C: image/audio/video).

Media travel as opaque ``binary`` columns with typed metadata — the only
sane representation at 100 TB (parquet binary + column pruning means a
metadata-only query never reads the payload bytes).  Decode / resize /
feature-extraction run as Arrow-batched ``mapInPandas`` stages so payload
bytes cross into Python once per batch, not once per row.

The actual codecs (PIL / libsndfile / ffmpeg) are NOT in this container,
so the decode step is STUBBED: ``decode_image`` raises
``NotImplementedError`` unless a codec is importable, and the test/demo
path uses :func:`attach_fake_media`, which synthesizes a deterministic
16-byte header + payload whose "decoded" metadata is pure arithmetic —
making the whole pipeline (schema, batching, partitioning, UDF
signatures) real and oracle-checkable while the codec is fake.

Fake media format (deterministic from doc_id):
  bytes 0-3   magic ``FIMG``
  bytes 4-7   width  = 16 + doc_id % 64          (big-endian uint32)
  bytes 8-11  height = 16 + (doc_id * 7) % 48    (big-endian uint32)
  bytes 12-15 n_frames = 1 + doc_id % 8          (big-endian uint32)
  bytes 16-   payload = UTF-8 bytes of the doc text
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "attach_fake_media",
    "media_metadata",
    "media_byte_features",
    "decode_image",
    "sample_frames",
    "MEDIA_META_SCHEMA",
    "BYTE_FEATURES_SCHEMA",
]

_MAGIC = b"FIMG"


def attach_fake_media(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Synthesize a deterministic binary media column (see module doc).

    Pure Column expressions: header ints are big-endian via substring
    arithmetic on hex, payload is the UTF-8 text — no Python involved in
    *creating* 100 TB of test media.
    """
    def be32(col):
        # 4-byte big-endian binary of a non-negative int < 2^32
        hexed = F.lpad(F.conv(col.cast("string"), 10, 16), 8, "0")
        return F.unhex(hexed)

    ident = F.col(id_col).cast("bigint")
    width = (F.lit(16) + ident % 64).cast("int")
    height = (F.lit(16) + (ident * 7) % 48).cast("int")
    frames = (F.lit(1) + ident % 8).cast("int")
    media = F.concat(
        F.lit(_MAGIC),
        be32(width),
        be32(height),
        be32(frames),
        F.encode(F.col(text_col), "UTF-8"),
    )
    return df.withColumn("media", media).withColumn(
        "media_type", F.lit("image/fake")
    )


MEDIA_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("byte_len", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("aspect_milli", LongType()),
    ]
)


def media_metadata(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Decode media headers to typed metadata via Arrow-batched Python.

    ``mapInPandas`` keeps the payload in Arrow buffers end-to-end; each
    batch is a zero-copy pandas view.  Output schema is fixed and narrow
    so downstream pruning works.  aspect_milli = width*1000//height
    (integer, cross-engine exact).
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            media = pdf["media"]
            out = pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "media_type": pdf["media_type"],
                    "byte_len": media.map(len).astype("int64"),
                    "width": media.map(
                        lambda b: int.from_bytes(b[4:8], "big")
                    ).astype("int32"),
                    "height": media.map(
                        lambda b: int.from_bytes(b[8:12], "big")
                    ).astype("int32"),
                    "n_frames": media.map(
                        lambda b: int.from_bytes(b[12:16], "big")
                    ).astype("int32"),
                }
            )
            out["aspect_milli"] = (
                out["width"].astype("int64") * 1000 // out["height"]
            )
            yield out

    return df.select(id_col, "media", "media_type").mapInPandas(
        decode_batches, MEDIA_META_SCHEMA
    )


BYTE_FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload_len", LongType()),
        StructField("distinct_bytes", IntegerType()),
        StructField("byte_sum", LongType()),
        StructField("byte_min", IntegerType()),
        StructField("byte_max", IntegerType()),
    ]
)


def media_byte_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Feature-extract over the raw payload bytes (codec-free stage of a
    real multimodal pipeline: corruption screens, entropy filters and
    format sniffing all run on byte histograms before any decode).

    Per document: payload length, distinct byte count, byte sum and
    min/max — each from a numpy ``bincount`` over the Arrow batch; bytes
    never leave the batch as Python ints.  Integer-exact, so the whole
    stage is oracle-checkable (the fake payload is the UTF-8 text, and
    the corpus is ASCII, so DuckDB reproduces it from code points).
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            media = pdf["media"].to_numpy()
            n = len(media)
            payload_len = np.empty(n, dtype=np.int64)
            distinct = np.empty(n, dtype=np.int32)
            byte_sum = np.empty(n, dtype=np.int64)
            byte_min = np.empty(n, dtype=np.int32)
            byte_max = np.empty(n, dtype=np.int32)
            for i, m in enumerate(media):
                payload = np.frombuffer(m, dtype=np.uint8, offset=16)
                payload_len[i] = payload.size
                if payload.size:
                    counts = np.bincount(payload, minlength=256)
                    present = np.nonzero(counts)[0]
                    distinct[i] = present.size
                    byte_sum[i] = int(counts @ np.arange(256, dtype=np.int64))
                    byte_min[i] = int(present[0])
                    byte_max[i] = int(present[-1])
                else:
                    distinct[i] = 0
                    byte_sum[i] = 0
                    byte_min[i] = -1
                    byte_max[i] = -1
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64").to_numpy(),
                    "payload_len": payload_len,
                    "distinct_bytes": distinct,
                    "byte_sum": byte_sum,
                    "byte_min": byte_min,
                    "byte_max": byte_max,
                }
            )

    return df.select(id_col, "media").mapInPandas(extract, BYTE_FEATURES_SCHEMA)


def decode_image(data: bytes):
    """Decode real image bytes -> (width, height, mode).

    STUB: the container has no imaging library.  Gated behind import so
    the pipeline works the moment PIL is installed.
    """
    try:
        from PIL import Image  # type: ignore[import-not-found]
        import io
    except ImportError as exc:  # pragma: no cover - codec not in container
        raise NotImplementedError(
            "real image decode requires PIL, which is not available in "
            "this environment; use attach_fake_media for pipeline tests"
        ) from exc
    img = Image.open(io.BytesIO(data))  # pragma: no cover
    return img.width, img.height, img.mode  # pragma: no cover


def sample_frames(
    df: DataFrame, every_k: int = 2, id_col: str = "doc_id"
) -> DataFrame:
    """Frame sampling for (fake) video: one row per sampled frame index.

    Frame extraction itself is deterministic arithmetic over the header
    (a real implementation would slice the container's frame table); the
    *shape* — explode to (doc_id, frame_idx, frame_bytes) — is the real
    contract a video pipeline needs.
    """
    frames_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("frame_idx", IntegerType()),
            StructField("frame_bytes", BinaryType()),
        ]
    )

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            media = pdf["media"].to_numpy()
            ids = pdf[id_col].to_numpy(dtype="int64")
            n_arr = np.fromiter(
                (int.from_bytes(m[12:16], "big") for m in media),
                dtype=np.int64,
                count=len(media),
            )
            # explode structure computed columnar: each row contributes
            # ceil(n/k) frames; np.repeat fans out ids/payloads, a single
            # concat builds the per-frame index column
            reps = -(-n_arr // every_k)
            doc_ids = np.repeat(ids, reps)
            frame_idx = (
                np.concatenate([np.arange(0, n, every_k) for n in n_arr])
                if len(n_arr)
                else np.empty(0, dtype=np.int64)
            )
            payload_rep = np.repeat(media, reps)
            n_rep = np.repeat(n_arr, reps)
            # per-output-frame byte slice: irreducibly one bytes object per
            # frame, but built in one comprehension over the exploded
            # arrays (no per-row DataFrame iteration)
            frame_bytes = [
                p[16:][i::n] if n else b""
                for p, i, n in zip(payload_rep, frame_idx, n_rep)
            ]
            yield pd.DataFrame(
                {
                    "doc_id": doc_ids,
                    "frame_idx": frame_idx.astype("int32"),
                    "frame_bytes": frame_bytes,
                }
            )

    return df.select(id_col, "media").mapInPandas(sample, frames_schema)
