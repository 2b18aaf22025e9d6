"""Multimodal column plumbing: opaque binary media + typed metadata.

North-star extension. Design (the part that matters at 100 TB):

- Media lives in an opaque ``binary`` column next to typed metadata
  (``media_type``, byte length, content hash). Parquet stores binary
  natively; scans prune the heavy column unless a query touches it.
- Decode / feature-extract / frame-sample run as **Arrow-batched
  Python** (``mapInPandas`` / ``pandas_udf``): bytes cross the
  JVM↔Python boundary once per batch, not per row, and the work
  parallelizes per input partition with no shuffle.
- Real codec work (PIL/ffmpeg) is NOT available in this container:
  decoders for real media types are **stubbed** with
  ``NotImplementedError``; a deterministic fake decoder
  (``media_type='application/x-fake'``) exercises the full plumbing —
  schema, batching, partitioning — with verifiable output.

Metadata-only operators stay JVM-side (length/md5/prefix sniff are
built-in functions over binary) — Python is reserved for actual
byte-level decode work.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FAKE_MEDIA_TYPE = "application/x-fake"

# ---------------------------------------------------------------------------
# Media table construction (binary column + typed metadata)
# ---------------------------------------------------------------------------


def as_media_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Derive a media table from the documents table: the utf-8 bytes
    of the text stand in for image/audio payloads. In production this
    is a parquet read of (id, media binary, media_type string)."""
    return docs.select(
        "doc_id",
        F.encode(F.col(text_col), "utf-8").alias("media"),
        F.lit(FAKE_MEDIA_TYPE).alias("media_type"),
    )


def media_meta(df: DataFrame, media_col: str = "media") -> DataFrame:
    """JVM-side metadata: byte length, content md5, 4-byte magic
    prefix (hex) for format sniffing. No Python, no shuffle."""
    m = F.col(media_col)
    return df.select(
        "doc_id",
        "media_type",
        F.length(m).alias("n_bytes"),
        F.md5(m).alias("content_md5"),
        F.hex(F.expr(f"substring({media_col}, 1, 4)")).alias("magic_hex"),
    )


# ---------------------------------------------------------------------------
# Decode (mapInPandas) — stubbed real codecs + deterministic fake
# ---------------------------------------------------------------------------

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("ok", T.BooleanType()),
    ]
)


def _decode_fake(data: bytes) -> tuple[int, int, int]:
    """Deterministic fake decode: dimensions derived from the bytes.
    Stands in for an image decoder so tests can assert exact values."""
    n = len(data)
    checksum = sum(data[:64]) if n else 0
    return (n % 640 + 1, checksum % 480 + 1, 3)


def _decode_unavailable(data: bytes) -> tuple[int, int, int]:
    raise NotImplementedError(
        "real media codecs (PIL/libav) are not available in this environment; "
        "register a decoder for this media_type at deployment"
    )


DECODERS: dict[str, Callable[[bytes], tuple[int, int, int]]] = {
    FAKE_MEDIA_TYPE: _decode_fake,
    "image/png": _decode_unavailable,
    "image/jpeg": _decode_unavailable,
    "audio/wav": _decode_unavailable,
    "video/mp4": _decode_unavailable,
}


def decode_media(df: DataFrame, media_col: str = "media") -> DataFrame:
    """Decode each media payload to (width, height, channels) via the
    per-media-type decoder registry. Arrow-batched; one Python worker
    per input partition; rows with no registered decoder get ok=false
    rather than failing the job."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list[Any]] = {"doc_id": [], "width": [], "height": [], "channels": [], "ok": []}
            for doc_id, data, mtype in zip(pdf["doc_id"], pdf[media_col], pdf["media_type"]):
                decoder = DECODERS.get(mtype)
                try:
                    if decoder is None:
                        raise NotImplementedError(f"no decoder for {mtype}")
                    w, h, c = decoder(bytes(data))
                    out["width"].append(w), out["height"].append(h), out["channels"].append(c)
                    out["ok"].append(True)
                except NotImplementedError:
                    out["width"].append(0), out["height"].append(0), out["channels"].append(0)
                    out["ok"].append(False)
                out["doc_id"].append(doc_id)
            yield pd.DataFrame(out)

    return df.mapInPandas(run, DECODED_SCHEMA)


# ---------------------------------------------------------------------------
# Feature extraction (pandas_udf) — 16-bin byte histogram
# ---------------------------------------------------------------------------

N_BINS = 16


@F.pandas_udf(T.ArrayType(T.DoubleType()))
def byte_histogram(media: pd.Series) -> pd.Series:
    """L1-normalized 16-bin histogram of byte values — a deterministic
    stand-in for a learned feature extractor, with the identical Arrow
    batch shape (binary in, fixed-width float vector out)."""
    import numpy as np

    def hist(data) -> list[float]:
        arr = np.frombuffer(bytes(data), dtype=np.uint8)
        if arr.size == 0:
            return [0.0] * N_BINS
        counts = np.bincount(arr >> 4, minlength=N_BINS).astype("float64")
        return (counts / counts.sum()).tolist()

    return media.apply(hist)


@F.pandas_udf(T.ArrayType(T.LongType()))
def byte_histogram_counts(media: pd.Series) -> pd.Series:
    """Raw 16-bin byte-value counts (un-normalized twin of
    ``byte_histogram``): integer-exact, so query results can be
    value-verified against a SQL oracle."""
    import numpy as np

    def hist(data) -> list[int]:
        arr = np.frombuffer(bytes(data), dtype=np.uint8)
        return np.bincount(arr >> 4, minlength=N_BINS).tolist()

    return media.apply(hist)


# ---------------------------------------------------------------------------
# Resize (mapInPandas, binary → smaller binary)
# ---------------------------------------------------------------------------

RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes_in", T.IntegerType()),
        T.StructField("n_bytes_out", T.IntegerType()),
        T.StructField("resized_md5", T.StringType()),
    ]
)


def resize_media(df: DataFrame, factor: int = 4, media_col: str = "media") -> DataFrame:
    """Downsample payloads by keeping every ``factor``-th byte — the
    batch shape of an image/audio resample (binary in, smaller binary
    out). Output is summarized as (sizes, md5) so results stay compact
    and exactly verifiable."""
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            n_in: list[int] = []
            n_out: list[int] = []
            digests: list[str] = []
            for doc_id, data in zip(pdf["doc_id"], pdf[media_col]):
                raw = bytes(data)
                small = raw[::factor]
                ids.append(doc_id)
                n_in.append(len(raw))
                n_out.append(len(small))
                digests.append(hashlib.md5(small).hexdigest())
            yield pd.DataFrame(
                {"doc_id": ids, "n_bytes_in": n_in, "n_bytes_out": n_out, "resized_md5": digests}
            )

    return df.mapInPandas(run, RESIZED_SCHEMA)


# ---------------------------------------------------------------------------
# Frame sampling (mapInPandas, 1→N rows)
# ---------------------------------------------------------------------------

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_md5", T.StringType()),
    ]
)


def sample_frames(
    df: DataFrame, frame_size: int = 64, stride: int = 128, media_col: str = "media"
) -> DataFrame:
    """Sample fixed-size byte windows ('frames') every ``stride`` bytes
    — the row-expanding (1→N) batch shape of video frame extraction.
    Returns the md5 of each frame so results are compact + verifiable."""
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            idxs: list[int] = []
            hashes: list[str] = []
            for doc_id, data in zip(pdf["doc_id"], pdf[media_col]):
                raw = bytes(data)
                for i, start in enumerate(range(0, len(raw), stride)):
                    ids.append(doc_id)
                    idxs.append(i)
                    hashes.append(hashlib.md5(raw[start : start + frame_size]).hexdigest())
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame_md5": hashes})

    return df.mapInPandas(run, FRAME_SCHEMA)
