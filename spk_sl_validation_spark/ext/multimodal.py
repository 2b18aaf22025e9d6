"""Multimodal column plumbing: opaque binary media + typed metadata.

North-star extension. Design (the part that matters at 100 TB):

- Media lives in an opaque ``binary`` column next to typed metadata
  (``media_type``, byte length, content hash). Parquet stores binary
  natively; scans prune the heavy column unless a query touches it.
- Decode / feature-extract / frame-sample run as **Arrow-batched
  Python** (``mapInPandas`` / ``pandas_udf``): bytes cross the
  JVM↔Python boundary once per batch, not per row, and the work
  parallelizes per input partition with no shuffle.
- The one remaining stub is ``video/mp4`` FRAME decode
  (``NotImplementedError`` in the decoder registry — a real video
  decoder needs ffmpeg, absent in this container); the mp4 CONTAINER
  metadata, however, is parsed for real (:func:`parse_mp4_meta` —
  stdlib ISO BMFF box walk: dims, duration, tracks, codec fourcc). A
  deterministic fake decoder (``media_type='application/x-fake'``)
  exercises the full pixel-decode plumbing — schema, batching,
  partitioning — with verifiable output.
- **Real stdlib codecs** (no third-party deps): ``audio/wav`` (RIFF
  chunk walk + 16-bit PCM, :func:`decode_wav`), ``image/bmp``
  (BITMAPINFOHEADER + bottom-up padded pixel rows, ``_decode_bmp`` in
  the registry + :func:`bmp_pixel_stats`), ``image/png``
  (CRC-checked chunk walk, multi-IDAT ``zlib`` inflate, all five
  scanline unfilters — :func:`png_pixel_stats`), ``image/gif``
  (extension-skipping block walk + a REAL variable-width LZW codec
  both directions — :func:`gif_pixel_stats`), and ``image/jpeg``
  (baseline: general marker walk, DHT-read canonical Huffman, DC
  prediction, inverse zigzag, dequant, separable IDCT, YCbCr —
  :func:`jpeg_pixel_stats`, with a real FDCT/Huffman ENCODER for
  fixtures and lossy-roundtrip tests). All parse genuinely — fixed
  offsets are NOT assumed (WAV walks unknown chunks; BMP honors the
  pixel-array offset and 4-byte row stride; PNG concatenates split
  IDATs and skips ancillary chunks; GIF skips extension blocks and
  reassembles LZW sub-blocks; JPEG reads its Huffman tables from the
  DHT segments) — and all are hash-checked end-to-end: the registered
  queries synthesize payloads under a closed-form generation law,
  decode them back, and DuckDB recomputes the expected stats from the
  law alone (JPEG's law lives in the exact-integer DC-only subspace,
  so it is bit-exact through a lossy codec).

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


def _decode_bmp(data: bytes) -> tuple[int, int, int]:
    """Real BMP header decode (stdlib ``struct`` only): validates the
    'BM' magic and BITMAPINFOHEADER, returns (width, |height|,
    channels = biBitCount // 8). Raises ``ValueError`` on malformed
    input (decode_media surfaces that as ok=false)."""
    import struct

    if len(data) < 54 or data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    # BITMAPFILEHEADER is 14 bytes; biSize leads the info header
    bi_size = struct.unpack_from("<I", data, 14)[0]
    if bi_size < 40:
        raise ValueError(f"unsupported BMP info header size {bi_size}")
    width, height = struct.unpack_from("<ii", data, 18)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    if planes != 1 or bpp % 8 or bpp == 0:
        raise ValueError(f"unsupported BMP planes={planes} bpp={bpp}")
    if width <= 0 or height == 0:
        # height<0 is legal (top-down rows); width<=0 or height==0 is
        # a malformed header that must not surface as ok=true
        raise ValueError(f"malformed BMP dimensions {width}x{height}")
    return (width, abs(height), bpp // 8)


DECODERS: dict[str, Callable[[bytes], tuple[int, int, int]]] = {
    FAKE_MEDIA_TYPE: _decode_fake,
    "image/bmp": _decode_bmp,
    "image/png": _decode_unavailable,
    "image/jpeg": _decode_unavailable,
    "video/mp4": _decode_unavailable,
}


def decode_media(df: DataFrame, media_col: str = "media") -> DataFrame:
    """Decode each media payload to (width, height, channels) via the
    per-media-type decoder registry. Arrow-batched; one Python worker
    per input partition; rows with no registered decoder — and rows a
    real codec rejects as malformed (ValueError) — get ok=false rather
    than failing the job (at 100 TB a single corrupt payload must
    never kill the stage)."""

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
                except (NotImplementedError, ValueError, IndexError):
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

# ---------------------------------------------------------------------------
# Real stdlib codecs: WAV (RIFF chunk walk + PCM16) and BMP (padded rows)
# ---------------------------------------------------------------------------
#
# Fixture generation law (deterministic per doc_id, so a SQL oracle can
# recompute every decoded stat in closed form without parsing bytes):
#
#   WAV:  rate      = 8000 * (1 + doc_id % 3)
#         channels  = 1 + doc_id % 2
#         n_frames  = 200 + doc_id % 57
#         frame i carries `channels` copies of
#             sample(i) = ((doc_id * 7 + i * 13) % 4096) - 2048
#   BMP:  width = 1 + doc_id % 13, height = 1 + doc_id % 7, 24bpp
#         top-down row-major pixel byte k (k < w*h*3):
#             pix(k) = (doc_id + k) % 251
#
# The writers are the only code that knows the law; the decoders parse
# the binary generically (chunk walk / header offsets / row stride), so
# a parser bug shows up as a value-hash mismatch against the oracle.

WAV_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("bits_per_sample", T.IntegerType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("sum_amp", T.LongType()),
        T.StructField("sum_abs_amp", T.LongType()),
        T.StructField("wsum_amp", T.LongType()),
        T.StructField("ok", T.BooleanType()),
    ]
)


def _make_wav(doc_id: int) -> bytes:
    """Build a real RIFF/WAVE binary under the generation law — with a
    LIST chunk BEFORE data, so decoders that assume fixed offsets
    (data at byte 44) break loudly against the oracle."""
    import struct

    rate = 8000 * (1 + doc_id % 3)
    channels = 1 + doc_id % 2
    n_frames = 200 + doc_id % 57
    frames = bytearray()
    for i in range(n_frames):
        s = ((doc_id * 7 + i * 13) % 4096) - 2048
        frames += struct.pack("<h", s) * channels
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * channels * 2, channels * 2, 16)
    list_chunk = b"LIST" + struct.pack("<I", 10) + b"INFOspark "
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + list_chunk
        + b"data"
        + struct.pack("<I", len(frames))
        + bytes(frames)
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _parse_wav(data: bytes) -> tuple[int, int, int, bytes]:
    """Generic RIFF walk: returns (rate, channels, bits, pcm_bytes).
    Unknown chunks are skipped by their declared size (word-aligned,
    per the RIFF spec); missing fmt/data raises ``ValueError``."""
    import struct

    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, channels, bits, pcm = 12, None, None, None, None
    while pos + 8 <= len(data):
        cid, size = data[pos : pos + 4], struct.unpack_from("<I", data, pos + 4)[0]
        body = data[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise ValueError(f"truncated {cid!r} chunk: {len(body)} of {size} bytes")
        if cid == b"fmt ":
            if size < 16:
                raise ValueError(f"fmt chunk too short ({size} bytes)")
            audio_fmt, channels, rate = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
            if audio_fmt != 1 or bits != 16:
                raise ValueError(f"unsupported WAV fmt={audio_fmt} bits={bits}")
            if channels < 1 or rate < 1:
                # a zero here would turn into ZeroDivisionError in the
                # frame/duration math — malformed, not "unsupported"
                raise ValueError(f"malformed WAV fmt: channels={channels} rate={rate}")
        elif cid == b"data":
            pcm = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or pcm is None:
        raise ValueError("WAV missing fmt or data chunk")
    return (rate, channels, bits, pcm)


def synthesize_wav_table(docs: DataFrame) -> DataFrame:
    """(doc_id, media binary, media_type='audio/wav') — Arrow-batched
    synthesis from doc_id alone (the generation law above)."""

    @F.pandas_udf(T.BinaryType())
    def make(ids: pd.Series) -> pd.Series:
        return ids.apply(lambda d: _make_wav(int(d)))

    return docs.select(
        "doc_id", make(F.col("doc_id")).alias("media"), F.lit("audio/wav").alias("media_type")
    )


def decode_wav(df: DataFrame, media_col: str = "media") -> DataFrame:
    """Decode WAV payloads via the generic RIFF parser: format fields
    plus integer-exact PCM stats (sum, sum-of-abs, index-weighted sum
    over the interleaved stream — the weighted sum catches any
    frame-order or interleave parsing bug a plain sum would miss).
    Malformed payloads yield ok=false, zeroed stats."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list[Any]] = {f.name: [] for f in WAV_SCHEMA.fields}
            for doc_id, data in zip(pdf["doc_id"], pdf[media_col]):
                try:
                    rate, channels, bits, pcm = _parse_wav(bytes(data))
                    samples = np.frombuffer(pcm, dtype="<i2").astype("int64")
                    n_frames = samples.size // channels
                    row = (
                        rate,
                        channels,
                        bits,
                        n_frames,
                        n_frames / rate,
                        int(samples.sum()),
                        int(np.abs(samples).sum()),
                        int((np.arange(samples.size) * samples).sum()),
                        True,
                    )
                except (ValueError, IndexError):
                    # _parse_wav length-validates every chunk before
                    # unpacking, so malformed input surfaces here, never
                    # as struct.error
                    row = (0, 0, 0, 0, 0.0, 0, 0, 0, False)
                out["doc_id"].append(doc_id)
                for name, v in zip(
                    (
                        "sample_rate",
                        "channels",
                        "bits_per_sample",
                        "n_frames",
                        "duration_s",
                        "sum_amp",
                        "sum_abs_amp",
                        "wsum_amp",
                        "ok",
                    ),
                    row,
                ):
                    out[name].append(v)
            yield pd.DataFrame(out)

    return df.mapInPandas(run, WAV_SCHEMA)


BMP_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("pixel_sum", T.LongType()),
        T.StructField("pixel_wsum", T.LongType()),
        T.StructField("ok", T.BooleanType()),
    ]
)


def _make_bmp(doc_id: int) -> bytes:
    """24bpp bottom-up BMP under the generation law. Row stride pads
    to 4 bytes with 0xAB — a parser that sums padding, ignores the
    bottom-up row order, or misreads bfOffBits diverges from the
    oracle immediately."""
    import struct

    width, height = 1 + doc_id % 13, 1 + doc_id % 7
    stride = (width * 3 + 3) & ~3
    rows = []
    for y in range(height):  # semantic top-down rows
        row = bytearray()
        for x in range(width * 3):
            k = y * width * 3 + x
            row.append((doc_id + k) % 251)
        row += b"\xab" * (stride - width * 3)
        rows.append(bytes(row))
    pixel_array = b"".join(reversed(rows))  # stored bottom-up
    off_bits = 14 + 40
    header = b"BM" + struct.pack("<IHHI", off_bits + len(pixel_array), 0, 0, off_bits)
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(pixel_array), 2835, 2835, 0, 0)
    return header + info + pixel_array


def synthesize_bmp_table(docs: DataFrame) -> DataFrame:
    """(doc_id, media binary, media_type='image/bmp')."""

    @F.pandas_udf(T.BinaryType())
    def make(ids: pd.Series) -> pd.Series:
        return ids.apply(lambda d: _make_bmp(int(d)))

    return docs.select(
        "doc_id", make(F.col("doc_id")).alias("media"), F.lit("image/bmp").alias("media_type")
    )


def bmp_pixel_stats(df: DataFrame, media_col: str = "media") -> DataFrame:
    """Full BMP pixel decode: header via ``_decode_bmp``, pixel array
    re-ordered top-down with the 4-byte row stride stripped, then
    integer-exact sum and top-down-index-weighted sum (the weighted
    sum is what catches stride/row-order bugs — a plain sum is
    order-invariant). Malformed payloads yield ok=false."""
    import struct

    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list[Any]] = {f.name: [] for f in BMP_STATS_SCHEMA.fields}
            for doc_id, data in zip(pdf["doc_id"], pdf[media_col]):
                try:
                    raw = bytes(data)
                    width, height, chans = _decode_bmp(raw)
                    off = struct.unpack_from("<I", raw, 10)[0]
                    raw_height = struct.unpack_from("<i", raw, 22)[0]
                    stride = (width * chans + 3) & ~3
                    arr = np.frombuffer(raw, dtype=np.uint8, count=stride * height, offset=off)
                    grid = arr.reshape(height, stride)[:, : width * chans]
                    if raw_height > 0:  # positive biHeight = bottom-up rows
                        grid = grid[::-1]
                    flat = grid.reshape(-1).astype("int64")
                    row = (
                        width,
                        height,
                        chans,
                        int(flat.sum()),
                        int((np.arange(flat.size) * flat).sum()),
                        True,
                    )
                except (ValueError, IndexError):
                    row = (0, 0, 0, 0, 0, False)
                out["doc_id"].append(doc_id)
                for name, v in zip(
                    ("width", "height", "channels", "pixel_sum", "pixel_wsum", "ok"), row
                ):
                    out[name].append(v)
            yield pd.DataFrame(out)

    return df.mapInPandas(run, BMP_STATS_SCHEMA)


# ---------------------------------------------------------------------------
# Real stdlib codec: PNG (CRC-checked chunk walk + zlib + 5 unfilters)
# ---------------------------------------------------------------------------
#
# Fixture generation law (deterministic per doc_id — the SQL oracle
# recomputes every decoded stat in closed form, byte-blind):
#
#   width    = 1 + doc_id % 11
#   height   = 1 + doc_id % 5
#   channels = [1, 3, 4][doc_id % 3]   (gray / RGB / RGBA — PNG color
#              types 0 / 2 / 6, always 8-bit depth)
#   raw top-down row-major pixel byte k (k < w*h*channels):
#       pix(k) = (doc_id * 3 + k) % 249
#   scanline y is FILTERED with type (doc_id + y) % 5 before deflate,
#   so decoding exercises None/Sub/Up/Average/Paeth on every corpus.
#
# The writer additionally splits the deflate stream across TWO IDAT
# chunks and places a tEXt chunk before them — a decoder that assumes
# one IDAT at a fixed offset, or that feeds ancillary bytes to zlib,
# diverges from the oracle immediately. Chunk CRCs are verified, so
# fuzzed bit-flips surface as ValueError (ok=false), never as silently
# wrong pixels.

PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 6: 4}  # color type -> samples per pixel


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    """PNG Paeth predictor (RFC 2083 §6.6): nearest of left/up/upleft."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _make_png(doc_id: int) -> bytes:
    """Build a real PNG under the generation law: 8-bit gray/RGB/RGBA,
    per-row filter type cycling through all five, deflate stream split
    across two IDATs with a tEXt chunk ahead of them."""
    import struct
    import zlib

    width = 1 + doc_id % 11
    height = 1 + doc_id % 5
    color_type = [0, 2, 6][doc_id % 3]
    bpp = _PNG_CHANNELS[color_type]  # bytes per pixel at 8-bit depth
    rowlen = width * bpp

    raw = bytes((doc_id * 3 + k) % 249 for k in range(rowlen * height))
    scanlines = bytearray()
    prior = bytes(rowlen)
    for y in range(height):
        row = raw[y * rowlen : (y + 1) * rowlen]
        ftype = (doc_id + y) % 5
        filt = bytearray(rowlen)
        for x in range(rowlen):
            left = row[x - bpp] if x >= bpp else 0
            up = prior[x]
            upleft = prior[x - bpp] if x >= bpp else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = left
            elif ftype == 2:
                pred = up
            elif ftype == 3:
                pred = (left + up) // 2
            else:
                pred = _paeth(left, up, upleft)
            filt[x] = (row[x] - pred) & 0xFF
        scanlines += bytes([ftype]) + bytes(filt)
        prior = row

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    z = zlib.compress(bytes(scanlines))
    half = len(z) // 2
    return (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"tEXt", b"Comment\x00synthetic fixture")
        + _png_chunk(b"IDAT", z[:half])
        + _png_chunk(b"IDAT", z[half:])
        + _png_chunk(b"IEND", b"")
    )


def _parse_png(data: bytes) -> tuple[int, int, int, bytes]:
    """Generic PNG parse: signature, CRC-verified chunk walk, IHDR
    validation (8-bit gray/RGB/RGBA, no interlace), multi-IDAT inflate,
    per-row unfilter. Returns (width, height, channels, raw top-down
    row-major sample bytes). Raises ``ValueError`` on any malformation
    — truncation, bad CRC, bad zlib stream, wrong decompressed size —
    so corrupt corpus payloads surface as ok=false, never wrong pixels."""
    import struct
    import zlib

    if len(data) < len(PNG_SIG) + 12 or data[: len(PNG_SIG)] != PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = len(PNG_SIG)
    ihdr = None
    idat = bytearray()
    seen_iend = False
    while pos + 12 <= len(data):
        length = struct.unpack_from(">I", data, pos)[0]
        ctype = data[pos + 4 : pos + 8]
        if pos + 12 + length > len(data):  # body or trailing CRC truncated
            raise ValueError(f"truncated {ctype!r} chunk: need {length} body + 4 CRC bytes")
        body = data[pos + 8 : pos + 8 + length]
        crc = struct.unpack_from(">I", data, pos + 8 + length)[0]
        if crc != (zlib.crc32(ctype + body) & 0xFFFFFFFF):
            raise ValueError(f"CRC mismatch in {ctype!r} chunk")
        if ihdr is None and ctype != b"IHDR":
            raise ValueError("first chunk is not IHDR")
        if ctype == b"IHDR":
            if length != 13:
                raise ValueError(f"IHDR length {length} != 13")
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            seen_iend = True
            break
        pos += 12 + length
    if ihdr is None or not seen_iend:
        raise ValueError("PNG missing IHDR or IEND")
    width, height, depth, color_type, comp, filt, interlace = ihdr
    if depth != 8 or color_type not in _PNG_CHANNELS:
        raise ValueError(f"unsupported PNG depth={depth} color_type={color_type}")
    if comp != 0 or filt != 0 or interlace != 0:
        raise ValueError("unsupported PNG compression/filter/interlace method")
    if width == 0 or height == 0 or width > 1 << 24 or height > 1 << 24:
        raise ValueError(f"malformed PNG dimensions {width}x{height}")
    bpp = _PNG_CHANNELS[color_type]
    rowlen = width * bpp
    try:
        stream = zlib.decompress(bytes(idat))
    except zlib.error as exc:
        raise ValueError(f"bad PNG deflate stream: {exc}") from exc
    if len(stream) != (rowlen + 1) * height:
        raise ValueError(
            f"decompressed size {len(stream)} != {(rowlen + 1) * height} for {width}x{height}"
        )
    out = bytearray(rowlen * height)
    prior = bytes(rowlen)
    for y in range(height):
        ftype = stream[y * (rowlen + 1)]
        line = stream[y * (rowlen + 1) + 1 : (y + 1) * (rowlen + 1)]
        row = bytearray(rowlen)
        if ftype == 0:
            row[:] = line
        elif ftype == 1:  # Sub
            for x in range(rowlen):
                left = row[x - bpp] if x >= bpp else 0
                row[x] = (line[x] + left) & 0xFF
        elif ftype == 2:  # Up
            for x in range(rowlen):
                row[x] = (line[x] + prior[x]) & 0xFF
        elif ftype == 3:  # Average
            for x in range(rowlen):
                left = row[x - bpp] if x >= bpp else 0
                row[x] = (line[x] + (left + prior[x]) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(rowlen):
                left = row[x - bpp] if x >= bpp else 0
                upleft = prior[x - bpp] if x >= bpp else 0
                row[x] = (line[x] + _paeth(left, prior[x], upleft)) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype} on row {y}")
        out[y * rowlen : (y + 1) * rowlen] = row
        prior = bytes(row)
    return (width, height, bpp, bytes(out))


def _decode_png(data: bytes) -> tuple[int, int, int]:
    """Registry-shape PNG decode: full parse (CRC + inflate + unfilter
    — a payload is only 'ok' if its pixels actually decode), dims out."""
    width, height, channels, _ = _parse_png(data)
    return (width, height, channels)


DECODERS["image/png"] = _decode_png


def synthesize_png_table(docs: DataFrame) -> DataFrame:
    """(doc_id, media binary, media_type='image/png')."""

    @F.pandas_udf(T.BinaryType())
    def make(ids: pd.Series) -> pd.Series:
        return ids.apply(lambda d: _make_png(int(d)))

    return docs.select(
        "doc_id", make(F.col("doc_id")).alias("media"), F.lit("image/png").alias("media_type")
    )


def png_pixel_stats(df: DataFrame, media_col: str = "media") -> DataFrame:
    """Full PNG decode to integer-exact pixel stats (sum + top-down
    index-weighted sum over the raw sample bytes). The weighted sum is
    the order-sensitive witness: a wrong unfilter, row order, or IDAT
    concatenation produces different bytes and misses the oracle.
    Malformed payloads yield ok=false, zeroed stats."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list[Any]] = {f.name: [] for f in BMP_STATS_SCHEMA.fields}
            for doc_id, data in zip(pdf["doc_id"], pdf[media_col]):
                try:
                    width, height, chans, raw = _parse_png(bytes(data))
                    flat = np.frombuffer(raw, dtype=np.uint8).astype("int64")
                    row = (
                        width,
                        height,
                        chans,
                        int(flat.sum()),
                        int((np.arange(flat.size) * flat).sum()),
                        True,
                    )
                except (ValueError, IndexError):
                    row = (0, 0, 0, 0, 0, False)
                out["doc_id"].append(doc_id)
                for name, v in zip(
                    ("width", "height", "channels", "pixel_sum", "pixel_wsum", "ok"), row
                ):
                    out[name].append(v)
            yield pd.DataFrame(out)

    return df.mapInPandas(run, BMP_STATS_SCHEMA)


# ---------------------------------------------------------------------------
# Real stdlib codec: GIF (block walk + variable-width LZW)
# ---------------------------------------------------------------------------
#
# Fixture generation law (deterministic per doc_id — the SQL oracle
# recomputes every decoded stat in closed form, byte-blind):
#
#   width  = 1 + doc_id % 9
#   height = 1 + doc_id % 6
#   16-entry global color table; palette entry j, channel c (0=R,1=G,
#   2=B): pal(j, c) = (doc_id + j*7 + c*31) % 251
#   pixel k (top-down row-major, k < w*h): index(k) = (doc_id + k) % 16
#   decoded flat RGB byte m (m = 3k + c):
#       rgb(m) = (doc_id + ((doc_id + m//3) % 16)*7 + (m%3)*31) % 251
#
# The writer emits GIF89a with a comment extension BEFORE the image
# (a reader that assumes the image descriptor follows the screen
# descriptor directly diverges), and the pixel indices go through a
# REAL variable-width LZW compressor (dictionary growth, width
# promotion at table sizes 2^w, CLEAR + reset at 4096 — the same
# schedule the decoder mirrors), chunked into ≤255-byte sub-blocks.

GIF_MAX_CODE = 1 << 12  # the LZW table hard cap (GIF89a spec)


def _lzw_encode(indices: bytes, mcs: int) -> bytes:
    """GIF LZW compress (variable code width, LSB-first bit packing).
    Emits CLEAR up front and whenever the table reaches 4096 entries,
    EOI at the end — the exact schedule :func:`_lzw_decode` mirrors."""
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    def fresh_table() -> dict:
        return {bytes([i]): i for i in range(1 << mcs)}

    width = mcs + 1
    table = fresh_table()
    next_code = eoi + 1
    emit(clear, width)
    buf = b""
    for s in bytes(indices):
        cand = buf + bytes([s])
        if cand in table:
            buf = cand
            continue
        emit(table[buf], width)
        table[cand] = next_code
        next_code += 1
        if next_code == (1 << width) + 1 and width < 12:
            # the decoder appends one entry BEHIND the encoder (it
            # reconstructs this entry only on the NEXT code), so the
            # encoder widens one assignment later than "table full":
            # when code 2^width - 1 exists on the DECODER side.
            width += 1
        if next_code == GIF_MAX_CODE:
            emit(clear, width)
            table = fresh_table()
            next_code = eoi + 1
            width = mcs + 1
        buf = bytes([s])
    if buf:
        emit(table[buf], width)
        # The decoder appends its pending entry AFTER reading this final
        # data code; if that append fills 2^width the decoder widens
        # before reading EOI, so EOI must be emitted at the new width.
        if next_code == (1 << width) and width < 12:
            width += 1
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, mcs: int) -> bytes:
    """GIF LZW decompress (variable code width, LSB-first), the
    general decoder: CLEAR resets, KwKwK self-reference, width
    promotion when the NEXT code to assign would not fit. Raises
    ``ValueError`` on any malformation (code beyond the table, stream
    ending without EOI, mcs out of range)."""
    if not 2 <= mcs <= 8:
        raise ValueError(f"GIF LZW min code size {mcs} out of range")
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    pos = 0  # bit position
    total_bits = len(data) * 8
    out = bytearray()

    def read(width: int) -> int:
        nonlocal pos
        if pos + width > total_bits:
            raise ValueError("truncated GIF LZW stream")
        byte0 = pos // 8
        chunk = int.from_bytes(data[byte0 : byte0 + 4], "little")
        v = (chunk >> (pos % 8)) & ((1 << width) - 1)
        pos += width
        return v

    width = mcs + 1
    table: list[bytes] = [bytes([i]) for i in range(1 << mcs)] + [b"", b""]
    prev: bytes | None = None
    while True:
        code = read(width)
        if code == clear:
            table = [bytes([i]) for i in range(1 << mcs)] + [b"", b""]
            width = mcs + 1
            prev = None
            continue
        if code == eoi:
            return bytes(out)
        if code < len(table) and code not in (clear, eoi):
            entry = table[code]
        elif code == len(table) and prev is not None:  # KwKwK
            entry = prev + prev[:1]
        else:
            raise ValueError(f"GIF LZW code {code} beyond table size {len(table)}")
        out += entry
        if prev is not None and len(table) < GIF_MAX_CODE:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry


def _make_gif(doc_id: int) -> bytes:
    """GIF89a under the generation law: 16-color global table, comment
    extension ahead of the image, real LZW-compressed indices."""
    import struct

    width, height = 1 + doc_id % 9, 1 + doc_id % 6
    palette = bytes(
        (doc_id + j * 7 + c * 31) % 251 for j in range(16) for c in range(3)
    )
    indices = bytes((doc_id + k) % 16 for k in range(width * height))
    mcs = 4
    z = _lzw_encode(indices, mcs)
    sub = b"".join(
        bytes([len(z[i : i + 255])]) + z[i : i + 255] for i in range(0, len(z), 255)
    )
    return (
        b"GIF89a"
        + struct.pack("<HH", width, height)
        + bytes([0xF3, 0, 0])  # GCT present, 16 entries; bg 0; aspect 0
        + palette
        + b"\x21\xfe\x09synthetic\x00"  # comment extension
        + b"\x2c" + struct.pack("<HHHH", 0, 0, width, height) + b"\x00"
        + bytes([mcs])
        + sub
        + b"\x00\x3b"
    )


def _parse_gif(data: bytes) -> tuple[int, int, bytes, bytes]:
    """Generic GIF parse: header, logical screen descriptor, global
    color table, extension-skipping block walk, first image's
    descriptor + (local or global) palette + LZW-decoded indices.
    Returns (width, height, palette bytes, index bytes). Raises
    ``ValueError`` on malformation — truncation, missing palette,
    interlace (unsupported), bad LZW stream, index/pixel-count
    mismatch, out-of-palette indices."""
    import struct

    if len(data) < 13 or data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    sw, sh, packed, _bg, _aspect = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    gct = b""
    if packed & 0x80:
        n = 3 * (2 << (packed & 0x07))
        gct = data[pos : pos + n]
        if len(gct) != n:
            raise ValueError("truncated global color table")
        pos += n

    def sub_blocks(p: int) -> tuple[bytes, int]:
        chunks = []
        while True:
            if p >= len(data):
                raise ValueError("truncated sub-block chain")
            ln = data[p]
            p += 1
            if ln == 0:
                return b"".join(chunks), p
            if p + ln > len(data):
                raise ValueError("truncated sub-block")
            chunks.append(data[p : p + ln])
            p += ln

    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks
            if pos >= len(data):
                raise ValueError("truncated extension block")
            pos += 1
            _, pos = sub_blocks(pos)
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        if pos + 9 > len(data):
            raise ValueError("truncated image descriptor")
        _left, _top, iw, ih, ipacked = struct.unpack_from("<HHHHB", data, pos)
        pos += 9
        if ipacked & 0x40:
            raise ValueError("interlaced GIF unsupported")
        pal = gct
        if ipacked & 0x80:
            n = 3 * (2 << (ipacked & 0x07))
            pal = data[pos : pos + n]
            if len(pal) != n:
                raise ValueError("truncated local color table")
            pos += n
        if not pal:
            raise ValueError("GIF image has no color table")
        if iw == 0 or ih == 0 or iw > sw or ih > sh:
            raise ValueError(f"malformed GIF image dimensions {iw}x{ih} in {sw}x{sh}")
        if pos >= len(data):
            raise ValueError("truncated before LZW min code size")
        mcs = data[pos]
        pos += 1
        stream, pos = sub_blocks(pos)
        indices = _lzw_decode(stream, mcs)
        if len(indices) != iw * ih:
            raise ValueError(f"decoded {len(indices)} indices for {iw}x{ih} image")
        if max(indices) * 3 + 3 > len(pal):
            raise ValueError("GIF index beyond color table")
        return (iw, ih, pal, indices)
    raise ValueError("GIF contains no image block")


def _decode_gif(data: bytes) -> tuple[int, int, int]:
    """Registry-shape GIF decode: full parse (block walk + LZW — a
    payload is only 'ok' if its pixels actually decode), dims out."""
    width, height, _, _ = _parse_gif(data)
    return (width, height, 3)


DECODERS["image/gif"] = _decode_gif


def synthesize_gif_table(docs: DataFrame) -> DataFrame:
    """(doc_id, media binary, media_type='image/gif')."""

    @F.pandas_udf(T.BinaryType())
    def make(ids: pd.Series) -> pd.Series:
        return ids.apply(lambda d: _make_gif(int(d)))

    return docs.select(
        "doc_id", make(F.col("doc_id")).alias("media"), F.lit("image/gif").alias("media_type")
    )


def gif_pixel_stats(df: DataFrame, media_col: str = "media") -> DataFrame:
    """Full GIF decode to integer-exact RGB stats: indices expand
    through the color table to the flat top-down RGB byte stream; sum
    + index-weighted sum (the weighted sum catches LZW, palette, or
    row-order bugs — a plain sum cannot). Malformed payloads yield
    ok=false, zeroed stats."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list[Any]] = {f.name: [] for f in BMP_STATS_SCHEMA.fields}
            for doc_id, data in zip(pdf["doc_id"], pdf[media_col]):
                try:
                    width, height, pal, idx = _parse_gif(bytes(data))
                    palette = np.frombuffer(pal, dtype=np.uint8).reshape(-1, 3)
                    flat = palette[np.frombuffer(idx, dtype=np.uint8)].reshape(-1).astype("int64")
                    row = (
                        width,
                        height,
                        3,
                        int(flat.sum()),
                        int((np.arange(flat.size) * flat).sum()),
                        True,
                    )
                except (ValueError, IndexError):
                    row = (0, 0, 0, 0, 0, False)
                out["doc_id"].append(doc_id)
                for name, v in zip(
                    ("width", "height", "channels", "pixel_sum", "pixel_wsum", "ok"), row
                ):
                    out[name].append(v)
            yield pd.DataFrame(out)

    return df.mapInPandas(run, BMP_STATS_SCHEMA)


# ---------------------------------------------------------------------------
# Real stdlib codec: baseline JPEG (markers + canonical Huffman + IDCT)
# ---------------------------------------------------------------------------
#
# Fixture generation law (deterministic per doc_id — the SQL oracle
# recomputes every decoded stat in closed form, byte-blind):
#
#   width  = 8 * (1 + doc_id % 4)      height = 8 * (1 + doc_id % 3)
#   the image is a grid of CONSTANT 8x8 blocks; block (by, bx) has
#   gray  g(by, bx) = 2 * ((doc_id * 7 + by * 13 + bx * 31) % 128)
#   encoded as 3-component YCbCr 4:4:4 with Cb = Cr = 128.
#
# Why this law is LOSSLESS through a lossy codec (and therefore
# closed-form oracle-able): a constant block's FDCT is DC-only; with
# the flat quant step 16 and EVEN g, DC_q = (g-128)/2 is an exact
# integer, reconstruction is 16*DC_q = 8*(g-128), and the IDCT of a
# DC-only block is DC/8 = g-128 exactly; Cb=Cr=128 quantize to zero
# and convert back to R=G=B=Y with zero chroma contribution. Decoded
# pixels == source pixels, bit-exact. The DECODER is general baseline
# JPEG regardless: it parses DQT/SOF0/DHT/SOS, entropy-decodes DC+AC
# with canonical Huffman tables read from the DHT segments (not
# assumed), unstuffs 0xFF00, dequantizes all 64 coefficients through
# the inverse zigzag, and runs a real separable IDCT — the fixtures
# merely happen to exercise the exact-integer subspace. The WRITER is
# a real encoder too (FDCT + quantize + run-length/Huffman AC coding),
# used with arbitrary pixels in the lossy-roundtrip test.
#
# Huffman tables: built programmatically as valid canonical tables
# (DC: all 12 magnitude symbols at 4 bits; AC: all 162 run/size
# symbols at 9 bits — Kraft-satisfying, spec-legal) and EMITTED IN THE
# DHT SEGMENTS, so any compliant reader decodes these files; nothing
# depends on recalling Annex K's suggested tables.

_JPEG_ZIGZAG: list[tuple[int, int]] = []
for _s in range(15):
    _diag = [(y, _s - y) for y in range(max(0, _s - 7), min(_s, 7) + 1)]
    _JPEG_ZIGZAG += _diag if _s % 2 else _diag[::-1]
del _s, _diag

_JPEG_DC_SYMS = list(range(12))
_JPEG_AC_SYMS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]


def _jpeg_canonical(bits: list[int], huffval: list[int]) -> dict[int, tuple[int, int]]:
    """BITS (count of codes per length 1..16) + HUFFVAL -> symbol ->
    (code, length), canonical assignment (ITU T.81 C.2)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[huffval[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _jpeg_tables() -> tuple[list[int], list[int], list[int], list[int]]:
    """(dc_bits, dc_vals, ac_bits, ac_vals) for the writer's tables."""
    dc_bits = [0] * 16
    dc_bits[3] = len(_JPEG_DC_SYMS)  # every DC symbol at 4 bits
    ac_bits = [0] * 16
    ac_bits[8] = len(_JPEG_AC_SYMS)  # every AC symbol at 9 bits
    return dc_bits, sorted(_JPEG_DC_SYMS), ac_bits, sorted(_JPEG_AC_SYMS)


_DCT_MATRIX = None


def _dct_matrix():
    # Constant 8x8 basis — built once per process (it was measured at
    # ~5% of the whole JPEG codec path when rebuilt per encode/decode).
    global _DCT_MATRIX
    if _DCT_MATRIX is None:
        import math

        import numpy as np

        c = np.zeros((8, 8))
        for u in range(8):
            cu = (1 / math.sqrt(2)) if u == 0 else 1.0
            for x in range(8):
                c[u, x] = 0.5 * cu * math.cos((2 * x + 1) * u * math.pi / 16)
        _DCT_MATRIX = c
    return _DCT_MATRIX


#: zigzag index k -> raster flat position (yy * 8 + xx).
_JPEG_ZZ_FLAT = None


def _jpeg_zz_flat() -> list[int]:
    global _JPEG_ZZ_FLAT
    if _JPEG_ZZ_FLAT is None:
        _JPEG_ZZ_FLAT = [yy * 8 + xx for yy, xx in _JPEG_ZIGZAG]
    return _JPEG_ZZ_FLAT


class _JpegBitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, value: int, length: int) -> None:
        # Bulk append: one shift per symbol instead of one per bit
        # (the per-bit loop was the encoder's hottest line). Byte
        # stuffing and MSB-first order are unchanged — the output
        # bytes are identical.
        acc = (self.acc << length) | (value & ((1 << length) - 1))
        n = self.nbits + length
        out = self.out
        while n >= 8:
            n -= 8
            b = (acc >> n) & 0xFF
            out.append(b)
            if b == 0xFF:
                out.append(0x00)  # byte stuffing
        self.acc = acc & ((1 << n) - 1)
        self.nbits = n

    def flush(self) -> bytes:
        if self.nbits:
            self.acc <<= 8 - self.nbits
            self.acc |= (1 << (8 - self.nbits)) - 1  # pad with 1s
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.nbits = 0
        return bytes(self.out)


def _jpeg_mag(v: int) -> tuple[int, int]:
    """JPEG magnitude coding: value -> (size, size-bit code)."""
    if v == 0:
        return 0, 0
    size = abs(v).bit_length()
    code = v if v > 0 else v + (1 << size) - 1
    return size, code


def _encode_jpeg(pixels, quality_step: int = 16, scan_order: tuple = (0, 1, 2)) -> bytes:
    """Real baseline JPEG encoder: FDCT + flat-step quantization +
    run-length/canonical-Huffman entropy coding. ``pixels``: numpy
    (h, w, 3) uint8 RGB (encoded as YCbCr 4:4:4) or (h, w) uint8
    grayscale (one component); dims multiples of 8. ``scan_order``
    permutes the (Y, Cb, Cr) component order inside each MCU and in
    the SOS header — spec-legal, used to test that the decoder maps
    scan components back to SOF order (color path only)."""
    import struct

    import numpy as np

    gray = pixels.ndim == 2
    h, w = pixels.shape[:2]
    if h % 8 or w % 8:
        raise ValueError("encoder fixture contract: dims must be multiples of 8")
    if gray:
        planes = [pixels.astype(np.float64)]
    else:
        rgb = pixels.astype(np.float64)
        y = 0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]
        cb = 128.0 - 0.168736 * rgb[:, :, 0] - 0.331264 * rgb[:, :, 1] + 0.5 * rgb[:, :, 2]
        cr = 128.0 + 0.5 * rgb[:, :, 0] - 0.418688 * rgb[:, :, 1] - 0.081312 * rgb[:, :, 2]
        planes = [y, cb, cr]

    qtab = np.full((8, 8), float(quality_step))
    C = _dct_matrix()
    dc_bits, dc_vals, ac_bits, ac_vals = _jpeg_tables()
    dc_codes = _jpeg_canonical(dc_bits, dc_vals)
    ac_codes = _jpeg_canonical(ac_bits, ac_vals)

    order = (0,) if gray else tuple(scan_order)
    if sorted(order) != list(range(len(planes))):
        raise ValueError(f"scan_order must permute {tuple(range(len(planes)))}")

    # Batched FDCT + quantize + zigzag across ALL blocks of all
    # components in one numpy pass (the per-block 8x8 matmul/listcomp
    # loop was ~2/3 of encode time); the sequential entropy coder then
    # walks plain Python int lists. Same math per block, same bytes.
    nby, nbx = h // 8, w // 8
    stacked = np.stack(
        [p.reshape(nby, 8, nbx, 8).transpose(0, 2, 1, 3) for p in planes]
    ) - 128.0  # (nc, nby, nbx, 8, 8)
    coefs = C @ stacked @ C.T
    quant = np.rint(coefs / qtab).astype(np.int64).reshape(len(planes), nby * nbx, 64)
    zz_all = [comp.tolist() for comp in quant[:, :, _jpeg_zz_flat()]]

    bw = _JpegBitWriter()
    put = bw.put
    pred = [0, 0, 0]
    for bi in range(nby * nbx):
        for ci in order:
            zz = zz_all[ci][bi]
            dc = zz[0]
            size, code = _jpeg_mag(dc - pred[ci])
            pred[ci] = dc
            hc, hl = dc_codes[size]
            put(hc, hl)
            if size:
                put(code, size)
            last_nz = 0
            for i in range(63, 0, -1):
                if zz[i]:
                    last_nz = i
                    break
            run = 0
            for i in range(1, last_nz + 1):
                v = zz[i]
                if v == 0:
                    run += 1
                    continue
                while run >= 16:
                    hc, hl = ac_codes[0xF0]
                    put(hc, hl)
                    run -= 16
                size, code = _jpeg_mag(v)
                hc, hl = ac_codes[(run << 4) | size]
                put(hc, hl)
                put(code, size)
                run = 0
            if last_nz < 63:
                hc, hl = ac_codes[0x00]  # EOB
                put(hc, hl)
    entropy = bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    zz_qtab = bytes(int(qtab[yy, xx]) for yy, xx in _JPEG_ZIGZAG)
    if gray:
        dqt = seg(0xFFDB, bytes([0x00]) + zz_qtab)
        sof = seg(0xFFC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
        dht = seg(
            0xFFC4,
            bytes([0x00]) + bytes(dc_bits) + bytes(dc_vals)
            + bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals),
        )
        sos = seg(0xFFDA, bytes([1]) + bytes([1, 0x00]) + bytes([0, 63, 0]))
    else:
        dqt = seg(0xFFDB, bytes([0x00]) + zz_qtab + bytes([0x01]) + zz_qtab)
        sof = seg(
            0xFFC0,
            struct.pack(">BHHB", 8, h, w, 3)
            + bytes([1, 0x11, 0]) + bytes([2, 0x11, 1]) + bytes([3, 0x11, 1]),
        )
        dht = seg(
            0xFFC4,
            bytes([0x00]) + bytes(dc_bits) + bytes(dc_vals)
            + bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals)
            + bytes([0x01]) + bytes(dc_bits) + bytes(dc_vals)
            + bytes([0x11]) + bytes(ac_bits) + bytes(ac_vals),
        )
        comp_specs = {0: bytes([1, 0x00]), 1: bytes([2, 0x11]), 2: bytes([3, 0x11])}
        sos = seg(
            0xFFDA,
            bytes([3]) + b"".join(comp_specs[ci] for ci in order) + bytes([0, 63, 0]),
        )
    return b"\xff\xd8" + dqt + sof + dht + sos + entropy + b"\xff\xd9"


class _JpegBitReader:
    """MSB-first bit reader over the entropy-coded segment with 0xFF00
    unstuffing; any non-stuffing marker inside the stream (including
    restart markers — the writer never emits DRI) is a hard
    ``ValueError``, and exhaustion raises rather than padding."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos  # byte position
        self.acc = 0
        self.nbits = 0
        self.ended = False
        #: First terminal condition hit while pre-buffering bits for a
        #: LUT peek (truncation / EOI / stray marker). Sticky: once the
        #: stream hits its barrier no further byte is consumed, and the
        #: saved exception is raised exactly when a read actually NEEDS
        #: a bit past it — the same lazy semantics as the old per-bit
        #: reader, which only raised when the missing bit was consumed.
        self.barrier: ValueError | None = None

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("truncated JPEG entropy stream")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG marker in entropy stream")
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1
            elif nxt == 0xD9:  # EOI: the stream ended mid-read
                self.ended = True
                raise ValueError("JPEG entropy stream ended before all MCUs decoded")
            else:
                raise ValueError(f"unexpected marker 0xff{nxt:02x} in entropy stream")
        # Mask to the live bit count so the accumulator stays a small
        # int (the old reader let it grow without bound and masked on
        # extraction — same values, slower arithmetic).
        self.acc = ((self.acc & ((1 << self.nbits) - 1)) << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        return self.bits(1)

    def bits(self, n: int) -> int:
        while self.nbits < n:
            if self.barrier is not None:
                raise self.barrier
            self._fill()
        self.nbits -= n
        return (self.acc >> self.nbits) & ((1 << n) - 1)


#: DHT-content -> packed 16-bit-window LUT: entry = (symbol << 5) | code
#: length, 0 = no code matches this window prefix. Keyed on the table
#: BYTES (BITS + HUFFVAL), so every image sharing tables (the universal
#: case in a real corpus) reuses one build per worker process.
_JPEG_LUT_CACHE: dict[bytes, list[int]] = {}


def _jpeg_huff_lut(bits: bytes, vals: bytes) -> list[int]:
    key = bits + vals
    lut = _JPEG_LUT_CACHE.get(key)
    if lut is not None:
        return lut
    lut = [0] * 65536
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            # A bogus table can push code >= 2^ln; such codes were
            # unreachable in the old (length, code)-dict walk (an
            # ln-bit read is always < 2^ln), so skipping them is
            # behavior-identical.
            if code < (1 << ln):
                base = code << (16 - ln)
                span = 1 << (16 - ln)
                lut[base : base + span] = [(vals[k] << 5) | ln] * span
            code += 1
            k += 1
        code <<= 1
    if len(_JPEG_LUT_CACHE) >= 16:  # bound worker memory under DHT fuzz
        _JPEG_LUT_CACHE.clear()
    _JPEG_LUT_CACHE[key] = lut
    return lut


def _jpeg_decode_sym(reader: _JpegBitReader, lut: list[int]) -> int:
    """One canonical-Huffman symbol via a single 16-bit-window LUT
    probe (T.81 codes are <= 16 bits) — replaces the per-bit walk with
    one peek + one list index. Raises exactly where the per-bit reader
    did: the stream barrier fires only if the matched code would need
    bits past it."""
    nb = reader.nbits
    if nb < 16 and reader.barrier is None:
        while reader.nbits < 16:
            try:
                reader._fill()
            except ValueError as e:
                reader.barrier = e
                break
        nb = reader.nbits
    if nb >= 16:
        window = (reader.acc >> (nb - 16)) & 0xFFFF
    else:
        window = (reader.acc << (16 - nb)) & 0xFFFF
    entry = lut[window]
    ln = entry & 31
    if ln == 0 or ln > nb:
        if reader.barrier is not None:
            raise reader.barrier
        raise ValueError("invalid JPEG Huffman code (16 bits without a match)")
    reader.nbits = nb - ln
    return entry >> 5


def _jpeg_extend(code: int, size: int) -> int:
    if size == 0:
        return 0
    if code < (1 << (size - 1)):
        return code - (1 << size) + 1
    return code


def _parse_jpeg(data: bytes) -> tuple[int, int, int, bytes]:
    """General baseline-JPEG decode (stdlib + numpy only): marker walk
    (APPn/COM skipped), DQT (8- and 16-bit precision), SOF0 with all
    sampling factors 1x1 (4:4:4 or grayscale), DHT canonical tables
    read from the file, SOS, entropy decode (DC prediction + AC
    run-length through the inverse zigzag), dequantize, separable
    IDCT, level shift, clamp, YCbCr->RGB. Returns (width, height,
    channels, top-down row-major sample bytes). Raises ``ValueError``
    on malformation or on features outside baseline 4:4:4
    (progressive, subsampling, restart intervals, 12-bit)."""
    import struct

    import numpy as np

    if len(data) < 4 or data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qtabs: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], list[int]] = {}  # (class, id) -> window LUT
    sof = None
    comps: list[tuple[int, int]] = []  # (component id, quant table id)
    while True:
        if pos + 4 > len(data):
            raise ValueError("truncated JPEG marker segment")
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}, got 0x{data[pos]:02x}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:
            raise ValueError("JPEG ended before SOS")
        length = struct.unpack_from(">H", data, pos)[0]
        if length < 2 or pos + length > len(data):
            raise ValueError("truncated JPEG segment body")
        body = data[pos + 2 : pos + length]
        pos += length
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0x0F
                p += 1
                n = 64 * (2 if pq else 1)
                if p + n > len(body):
                    raise ValueError("truncated DQT table")
                if pq:
                    vals = list(struct.unpack_from(f">{64}H", body, p))
                else:
                    vals = list(body[p : p + 64])
                qtabs[tq] = vals
                p += n
        elif marker == 0xC0:  # SOF0 baseline
            if len(body) < 6:
                raise ValueError("truncated SOF0 header")
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if len(body) < 6 + 3 * nc:
                raise ValueError("truncated SOF0 component list")
            if prec != 8:
                raise ValueError(f"unsupported JPEG precision {prec}")
            if nc not in (1, 3):
                raise ValueError(f"unsupported JPEG component count {nc}")
            if w == 0 or h == 0:
                raise ValueError("malformed JPEG dimensions")
            comps = []
            for i in range(nc):
                cid, samp, tq = body[6 + 3 * i : 9 + 3 * i]
                if samp != 0x11:
                    raise ValueError("subsampled JPEG unsupported (4:4:4 only)")
                comps.append((cid, tq))
            sof = (w, h, nc)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"non-baseline JPEG (SOF marker 0xff{marker:02x}) unsupported")
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 0x0F
                p += 1
                if p + 16 > len(body):
                    raise ValueError("truncated DHT")
                bits = list(body[p : p + 16])
                p += 16
                nv = sum(bits)
                if p + nv > len(body):
                    raise ValueError("truncated DHT values")
                vals = bytes(body[p : p + nv])
                p += nv
                huff[(tc, th)] = _jpeg_huff_lut(bytes(bits), vals)
        elif marker == 0xDD:
            raise ValueError("JPEG restart intervals unsupported")
        elif marker == 0xDA:  # SOS
            if sof is None:
                raise ValueError("JPEG SOS before SOF0")
            if not body:
                raise ValueError("empty SOS body")
            ns = body[0]
            if len(body) < 1 + 2 * ns + 3:
                raise ValueError("truncated SOS body")
            if ns != sof[2]:
                raise ValueError("SOS component count != SOF")
            # (SOF component index, quant tq, dc table, ac table) — the SOF
            # index maps each scan component back to its declared position so
            # a spec-legal SOS that reorders components (e.g. Cr before Cb)
            # still lands each plane in Y/Cb/Cr slot order for color convert.
            scan: list[tuple[int, int, int, int]] = []
            cid_to_tq = dict(comps)
            cid_to_idx = {cid: i for i, (cid, _) in enumerate(comps)}
            seen_cids: set[int] = set()
            for i in range(ns):
                cid, tt = body[1 + 2 * i : 3 + 2 * i]
                if cid not in cid_to_tq:
                    raise ValueError(f"SOS references unknown component {cid}")
                if cid in seen_cids:
                    raise ValueError(f"SOS repeats component {cid}")
                seen_cids.add(cid)
                scan.append((cid_to_idx[cid], cid_to_tq[cid], tt >> 4, tt & 0x0F))
            if tuple(body[1 + 2 * ns : 4 + 2 * ns]) != (0, 63, 0):
                raise ValueError("non-baseline spectral selection unsupported")
            break
        elif (0xE0 <= marker <= 0xEF) or marker == 0xFE:
            continue  # APPn / COM
        else:
            raise ValueError(f"unknown JPEG marker 0xff{marker:02x}")
    w, h, nc = sof
    for _, tq, tdc, tac in scan:
        if tq not in qtabs or (0, tdc) not in huff or (1, tac) not in huff:
            raise ValueError("JPEG scan references a missing DQT/DHT table")

    C = _dct_matrix()
    zzmap = _jpeg_zz_flat()
    bw_mcus, bh_mcus = (w + 7) // 8, (h + 7) // 8
    # Entropy-decode into plain Python coefficient lists (dequantized,
    # raster order) and run ONE batched IDCT per component at the end —
    # per-block numpy allocation + 8x8 matmuls were most of decode time.
    comp_blocks: list[list[list[float]]] = [[] for _ in range(nc)]
    scan_luts = [(huff[(0, tdc)], huff[(1, tac)], qtabs[tq]) for _, tq, tdc, tac in scan]
    reader = _JpegBitReader(data, pos)
    pred = [0] * nc
    for _by in range(bh_mcus):
        for _bx in range(bw_mcus):
            for ci, (sof_idx, _tq, _tdc, _tac) in enumerate(scan):
                dc_tab, ac_tab, q = scan_luts[ci]
                cof = [0.0] * 64
                size = _jpeg_decode_sym(reader, dc_tab)
                if size > 11:
                    raise ValueError(f"invalid JPEG DC size {size}")
                diff = _jpeg_extend(reader.bits(size), size)
                pred[ci] += diff
                cof[0] = pred[ci] * q[0]
                k = 1
                while k <= 63:
                    sym = _jpeg_decode_sym(reader, ac_tab)
                    if sym == 0x00:  # EOB
                        break
                    if sym == 0xF0:  # ZRL
                        k += 16
                        continue
                    run, size = sym >> 4, sym & 0x0F
                    if size == 0 or size > 10:
                        raise ValueError(f"invalid JPEG AC symbol 0x{sym:02x}")
                    k += run
                    if k > 63:
                        raise ValueError("JPEG AC run past block end")
                    v = _jpeg_extend(reader.bits(size), size)
                    cof[zzmap[k]] = v * q[k]
                    k += 1
                comp_blocks[sof_idx].append(cof)
    planes = []
    for idx in range(nc):
        arr = np.array(comp_blocks[idx], dtype=np.float64).reshape(bh_mcus, bw_mcus, 8, 8)
        blocks = C.T @ arr @ C + 128.0
        planes.append(blocks.transpose(0, 2, 1, 3).reshape(bh_mcus * 8, bw_mcus * 8))
    out_planes = [np.clip(np.rint(p[:h, :w]), 0, 255) for p in planes]
    if nc == 1:
        return (w, h, 1, out_planes[0].astype(np.uint8).tobytes())
    y, cb, cr = out_planes
    r = np.clip(np.rint(y + 1.402 * (cr - 128.0)), 0, 255)
    g = np.clip(np.rint(y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)), 0, 255)
    b = np.clip(np.rint(y + 1.772 * (cb - 128.0)), 0, 255)
    rgb = np.stack([r, g, b], axis=-1).astype(np.uint8)
    return (w, h, 3, rgb.tobytes())


def _decode_jpeg(data: bytes) -> tuple[int, int, int]:
    """Registry-shape JPEG decode: full parse (Huffman + IDCT — a
    payload is only 'ok' if its pixels actually decode), dims out."""
    width, height, channels, _ = _parse_jpeg(data)
    return (width, height, channels)


DECODERS["image/jpeg"] = _decode_jpeg


def _make_jpeg(doc_id: int) -> bytes:
    """Baseline JPEG under the generation law (see the section comment:
    constant even-gray 8x8 blocks are bit-exact through the 16-step
    flat quantizer — lossless through a lossy codec)."""
    import numpy as np

    w, h = 8 * (1 + doc_id % 4), 8 * (1 + doc_id % 3)
    px = np.zeros((h, w, 3), dtype=np.uint8)
    for by in range(h // 8):
        for bx in range(w // 8):
            g = 2 * ((doc_id * 7 + by * 13 + bx * 31) % 128)
            px[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8, :] = g
    return _encode_jpeg(px)


def synthesize_jpeg_table(docs: DataFrame) -> DataFrame:
    """(doc_id, media binary, media_type='image/jpeg')."""

    @F.pandas_udf(T.BinaryType())
    def make(ids: pd.Series) -> pd.Series:
        return ids.apply(lambda d: _make_jpeg(int(d)))

    return docs.select(
        "doc_id", make(F.col("doc_id")).alias("media"), F.lit("image/jpeg").alias("media_type")
    )


def jpeg_pixel_stats(df: DataFrame, media_col: str = "media") -> DataFrame:
    """Full JPEG decode to integer-exact pixel stats (sum + top-down
    index-weighted sum over the decoded RGB bytes). The weighted sum is
    the order-sensitive witness: a wrong Huffman read, DC prediction,
    zigzag, or IDCT produces different bytes and misses the oracle.
    Malformed payloads yield ok=false, zeroed stats."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list[Any]] = {f.name: [] for f in BMP_STATS_SCHEMA.fields}
            for doc_id, data in zip(pdf["doc_id"], pdf[media_col]):
                try:
                    width, height, chans, raw = _parse_jpeg(bytes(data))
                    flat = np.frombuffer(raw, dtype=np.uint8).astype("int64")
                    row = (
                        width,
                        height,
                        chans,
                        int(flat.sum()),
                        int((np.arange(flat.size) * flat).sum()),
                        True,
                    )
                except (ValueError, IndexError):
                    row = (0, 0, 0, 0, 0, False)
                out["doc_id"].append(doc_id)
                for name, v in zip(
                    ("width", "height", "channels", "pixel_sum", "pixel_wsum", "ok"), row
                ):
                    out[name].append(v)
            yield pd.DataFrame(out)

    return df.mapInPandas(run, BMP_STATS_SCHEMA)


# ---------------------------------------------------------------------------
# Real stdlib parser: MP4 / ISO BMFF container METADATA (no frame decode)
# ---------------------------------------------------------------------------
#
# Frame decode genuinely needs ffmpeg (absent here) and stays the
# honest NotImplementedError in the decoder registry — but the
# container metadata a video-bearing corpus needs for filtering and
# stats (dimensions, duration, track count, codec fourcc) is a pure
# stdlib box walk over the ISO base-media file format: length-prefixed
# nested boxes, 64-bit `largesize` escape, 16.16 fixed-point track
# dims in `tkhd`, timescale/duration in `mvhd`, handler type in
# `hdlr`, sample-entry fourcc in `stsd`.
#
# Fixture generation law (deterministic per doc_id — the SQL oracle
# recomputes every parsed field in closed form, byte-blind):
#
#   width        = 16 * (1 + doc_id % 5)
#   height       = 16 * (1 + doc_id % 4)
#   duration_ms  = 500 * (1 + doc_id % 8)
#   n_tracks     = 1 + doc_id % 2          (audio 'mp4a' track when 2)
#   video_codec  = ['avc1', 'hev1', 'vp09'][doc_id % 3]
#
# The WRITER varies the container shape so the parser must genuinely
# walk, not assume offsets: mvhd timescale 600 vs 1000 (doc_id % 3),
# version-1 (64-bit) mvhd/tkhd for doc_id % 5 == 0, mdat-before-moov
# ("streaming") vs moov-first ("faststart") layout by doc_id % 2, a
# `free` box interleaved at top level, and an mdat written with the
# 64-bit largesize escape for doc_id % 4 == 0.

_MP4_VIDEO_CODECS = ("avc1", "hev1", "vp09")

#: 3x3 transformation matrix from the ISO BMFF spec's unity default:
#: 16.16 fixed-point diagonal (1, 1) with a 2.30 fixed-point 1 last.
_MP4_UNITY_MATRIX = (
    (0x00010000).to_bytes(4, "big") + b"\x00" * 8
    + b"\x00" * 4 + (0x00010000).to_bytes(4, "big") + b"\x00" * 4
    + b"\x00" * 8 + (0x40000000).to_bytes(4, "big")
)


def _box(typ: bytes, payload: bytes, largesize: bool = False) -> bytes:
    import struct

    if largesize:
        return struct.pack(">I4sQ", 1, typ, 16 + len(payload)) + payload
    return struct.pack(">I4s", 8 + len(payload), typ) + payload


def _full(version: int) -> bytes:
    return bytes([version, 0, 0, 0])


def _make_mp4(doc_id: int) -> bytes:
    import struct

    w = 16 * (1 + doc_id % 5)
    h = 16 * (1 + doc_id % 4)
    duration_ms = 500 * (1 + doc_id % 8)
    timescale = 600 if doc_id % 3 == 0 else 1000
    dur_units = timescale * duration_ms // 1000
    v1 = doc_id % 5 == 0
    codec = _MP4_VIDEO_CODECS[doc_id % 3]

    if v1:
        mvhd = _full(1) + struct.pack(">QQIQ", 1, 2, timescale, dur_units)
    else:
        mvhd = _full(0) + struct.pack(">IIII", 1, 2, timescale, dur_units)
    # rate, volume+reserved, reserved x2, matrix, predefined x6, next_track_id
    mvhd += struct.pack(">i", 0x00010000) + struct.pack(">hH", 0x0100, 0)
    mvhd += b"\x00" * 8 + _MP4_UNITY_MATRIX + b"\x00" * 24 + struct.pack(">I", 3)

    def tkhd(track_id: int, tw: int, th: int) -> bytes:
        if v1:
            head = _full(1) + struct.pack(">QQI4xQ", 1, 2, track_id, dur_units)
        else:
            head = _full(0) + struct.pack(">III4xI", 1, 2, track_id, dur_units)
        tail = (
            b"\x00" * 8
            + struct.pack(">hhhH", 0, 0, 0, 0)
            + _MP4_UNITY_MATRIX
            + struct.pack(">II", tw << 16, th << 16)
        )
        return _box(b"tkhd", head + tail)

    # --- sample tables (video track only; round-9 law extension) ---
    # n_samples    = 8 + doc_id % 5
    # stsz uniform (sample_size = 200 + doc_id % 50) when 3 | doc_id,
    #   else per-sample sizes 100 + 10*((doc_id + i) % 7)
    # stts one run when doc_id even, else two runs (3 + rest)
    # chunk offsets: n_chunks = 1 + doc_id % 3, co64 when 4 | doc_id
    n_samples = 8 + doc_id % 5
    if doc_id % 3 == 0:
        uniform = 200 + doc_id % 50
        sizes = [uniform] * n_samples
        stsz = _box(
            b"stsz", _full(0) + struct.pack(">II", uniform, n_samples)
        )
    else:
        sizes = [100 + 10 * ((doc_id + i) % 7) for i in range(n_samples)]
        stsz = _box(
            b"stsz",
            _full(0)
            + struct.pack(">II", 0, n_samples)
            + b"".join(struct.pack(">I", s) for s in sizes),
        )
    delta = max(dur_units // n_samples, 1)
    if doc_id % 2 == 0:
        stts_entries = [(n_samples, delta)]
    else:
        stts_entries = [(3, delta), (n_samples - 3, delta + 1)]
    stts = _box(
        b"stts",
        _full(0)
        + struct.pack(">I", len(stts_entries))
        + b"".join(struct.pack(">II", c, d) for c, d in stts_entries),
    )
    n_chunks = 1 + doc_id % 3
    offs = [48 + sum(sizes[: max(0, j)]) for j in range(n_chunks)]
    if doc_id % 4 == 0:
        stco = _box(
            b"co64",
            _full(0)
            + struct.pack(">I", n_chunks)
            + b"".join(struct.pack(">Q", o) for o in offs),
        )
    else:
        stco = _box(
            b"stco",
            _full(0)
            + struct.pack(">I", n_chunks)
            + b"".join(struct.pack(">I", o) for o in offs),
        )
    video_sample_boxes = stts + stsz + stco

    def trak(track_id: int, handler: bytes, entry_fourcc: bytes, tw: int, th: int) -> bytes:
        mdhd = _box(
            b"mdhd",
            (_full(1) + struct.pack(">QQIQ", 1, 2, timescale, dur_units) if v1
             else _full(0) + struct.pack(">IIII", 1, 2, timescale, dur_units))
            + struct.pack(">HH", 0x55C4, 0),
        )
        hdlr = _box(b"hdlr", _full(0) + b"\x00" * 4 + handler + b"\x00" * 12 + b"x\x00")
        # minimal sample entry: 6 reserved + data_reference_index
        entry = _box(entry_fourcc, b"\x00" * 6 + struct.pack(">H", 1))
        stsd = _box(b"stsd", _full(0) + struct.pack(">I", 1) + entry)
        stbl = _box(
            b"stbl", stsd + (video_sample_boxes if handler == b"vide" else b"")
        )
        minf = _box(b"minf", stbl)
        mdia = _box(b"mdia", mdhd + hdlr + minf)
        return _box(b"trak", tkhd(track_id, tw, th) + mdia)

    traks = trak(1, b"vide", codec.encode(), w, h)
    if doc_id % 2 == 1:
        traks += trak(2, b"soun", b"mp4a", 0, 0)
    moov = _box(b"moov", _box(b"mvhd", mvhd) + traks)
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    free = _box(b"free", b"\x00" * (doc_id % 7))
    mdat = _box(b"mdat", bytes(range(doc_id % 16)), largesize=doc_id % 4 == 0)
    if doc_id % 2 == 0:
        return ftyp + moov + free + mdat  # faststart layout
    return ftyp + free + mdat + moov  # streaming layout


def _mp4_children(data: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_end) for the boxes tiling
    data[start:end]; ValueError on any malformation (short header,
    size overrun, largesize underflow, non-tiling residue)."""
    import struct

    pos = start
    while pos < end:
        if end - pos < 8:
            raise ValueError("truncated MP4 box header")
        size = struct.unpack_from(">I", data, pos)[0]
        typ = data[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:
            if end - pos < 16:
                raise ValueError("truncated MP4 largesize header")
            size = struct.unpack_from(">Q", data, pos + 8)[0]
            body = pos + 16
            if size < 16:
                raise ValueError(f"MP4 largesize {size} under header size")
        elif size == 0:  # box extends to end of enclosing scope
            size = end - pos
        elif size < 8:
            raise ValueError(f"MP4 box size {size} under header size")
        if pos + size > end:
            raise ValueError("MP4 box overruns its container")
        yield typ, body, pos + size
        pos += size
    if pos != end:
        raise ValueError("MP4 boxes do not tile their container")


def _mp4_find(data: bytes, start: int, end: int, fourcc: bytes):
    out = [(s, e) for typ, s, e in _mp4_children(data, start, end) if typ == fourcc]
    return out


def parse_mp4_meta(data: bytes) -> tuple[int, int, int, int, str]:
    """Parse ISO BMFF container metadata: (width, height, duration_ms,
    n_tracks, video_codec). Width/height come from the first video
    track's tkhd (16.16 fixed point, fractional part must be zero for
    our integer contract — truncated toward zero like every reader);
    duration from mvhd (converted to ms via its timescale); codec is
    the first stsd sample-entry fourcc of the first video track.
    Raises ValueError on malformation: not ISO BMFF, no/duplicated
    moov, boxes that overrun or fail to tile, zero timescale, no
    video track."""
    import struct

    if len(data) < 8:
        raise ValueError("not an MP4 payload")
    tops = list(_mp4_children(data, 0, len(data)))
    if not tops or tops[0][0] != b"ftyp":
        raise ValueError("MP4 must start with ftyp")
    moovs = [(s, e) for typ, s, e in tops if typ == b"moov"]
    if len(moovs) != 1:
        raise ValueError(f"expected exactly one moov box, found {len(moovs)}")
    ms, me = moovs[0]

    mvhds = _mp4_find(data, ms, me, b"mvhd")
    if len(mvhds) != 1:
        raise ValueError("moov must carry exactly one mvhd")
    vs, ve = mvhds[0]
    if ve - vs < 1:
        raise ValueError("empty mvhd box")
    version = data[vs]
    if version == 1:
        if ve - vs < 4 + 28:
            raise ValueError("truncated mvhd v1")
        timescale, duration = struct.unpack_from(">IQ", data, vs + 4 + 16)
    elif version == 0:
        if ve - vs < 4 + 16:
            raise ValueError("truncated mvhd v0")
        timescale, duration = struct.unpack_from(">II", data, vs + 4 + 8)
    else:
        raise ValueError(f"unknown mvhd version {version}")
    if timescale == 0:
        raise ValueError("mvhd timescale is zero")
    duration_ms = duration * 1000 // timescale

    traks = _mp4_find(data, ms, me, b"trak")
    if not traks:
        raise ValueError("moov has no trak")
    width = height = -1
    codec = ""
    for ts, te in traks:
        tkhds = _mp4_find(data, ts, te, b"tkhd")
        mdias = _mp4_find(data, ts, te, b"mdia")
        if len(tkhds) != 1 or len(mdias) != 1:
            raise ValueError("trak must carry exactly one tkhd and one mdia")
        hs, he = tkhds[0]
        if he - hs < 1:
            raise ValueError("empty tkhd box")
        tkv = data[hs]
        # v0: verflags 4 + created 4 + modified 4 + id 4 + res 4 + dur 4 = 24
        # v1: verflags 4 + created 8 + modified 8 + id 4 + res 4 + dur 8 = 36
        fixed = hs + (36 if tkv == 1 else 24)
        # + reserved 8 + layer 2 + group 2 + volume 2 + reserved 2 + matrix 36
        dims_at = fixed + 8 + 8 + 36
        if dims_at + 8 > he:
            raise ValueError("truncated tkhd")
        tw_fp, th_fp = struct.unpack_from(">II", data, dims_at)
        mdia_s, mdia_e = mdias[0]
        hdlrs = []
        stsd_fourcc = ""
        for typ, s, e in _mp4_children(data, mdia_s, mdia_e):
            if typ == b"hdlr":
                if e - s < 12:
                    raise ValueError("truncated hdlr")
                hdlrs.append(data[s + 8 : s + 12])
            elif typ == b"minf":
                for st in _mp4_find(data, s, e, b"stbl"):
                    for sd in _mp4_find(data, st[0], st[1], b"stsd"):
                        ss, se = sd
                        if se - ss < 8:
                            raise ValueError("truncated stsd")
                        n_entries = struct.unpack_from(">I", data, ss + 4)[0]
                        if n_entries < 1:
                            raise ValueError("stsd with no sample entries")
                        entries = list(_mp4_children(data, ss + 8, se))
                        if len(entries) != n_entries:
                            raise ValueError("stsd entry count mismatch")
                        stsd_fourcc = entries[0][0].decode("ascii", "replace")
        if len(hdlrs) != 1:
            raise ValueError("mdia must carry exactly one hdlr")
        if hdlrs[0] == b"vide" and width < 0:
            if tw_fp & 0xFFFF or th_fp & 0xFFFF:
                raise ValueError("fractional tkhd dimensions unsupported")
            width, height = tw_fp >> 16, th_fp >> 16
            if not stsd_fourcc:
                raise ValueError("video trak without stsd sample entry")
            codec = stsd_fourcc
    if width < 0:
        raise ValueError("no video trak in moov")
    return (width, height, int(duration_ms), len(traks), codec)


def parse_mp4_samples(data: bytes) -> tuple[int, int, int, int]:
    """Parse the first video track's SAMPLE TABLES (the filtering
    metadata a video corpus needs beyond parse_mp4_meta's header
    fields): returns ``(n_samples, total_sample_bytes, n_chunks,
    avg_bitrate_bps)``.

    - ``stsz``: uniform mode (sample_size != 0 — total = size x count)
      and per-sample mode both supported;
    - ``stts``: every run's count summed and cross-checked against the
      stsz count (a mismatch is malformation, not a guess);
    - ``stco`` OR ``co64`` (32/64-bit chunk offsets) for n_chunks;
    - bitrate = total bytes x 8000 / mvhd duration_ms (floor).

    Raises ValueError on malformation (truncated tables, count
    mismatch, zero samples/chunks/duration, missing boxes) — total
    under fuzzing like the rest of the codec layer."""
    import struct

    if len(data) < 8:
        raise ValueError("not an MP4 payload")
    tops = list(_mp4_children(data, 0, len(data)))
    if not tops or tops[0][0] != b"ftyp":
        raise ValueError("MP4 must start with ftyp")
    moovs = [(s, e) for typ, s, e in tops if typ == b"moov"]
    if len(moovs) != 1:
        raise ValueError(f"expected exactly one moov box, found {len(moovs)}")
    ms, me = moovs[0]
    mvhds = _mp4_find(data, ms, me, b"mvhd")
    if len(mvhds) != 1:
        raise ValueError("moov must carry exactly one mvhd")
    vs, ve = mvhds[0]
    if ve - vs < 1:
        raise ValueError("empty mvhd box")
    version = data[vs]
    if version == 1:
        if ve - vs < 4 + 28:
            raise ValueError("truncated mvhd v1")
        timescale, duration = struct.unpack_from(">IQ", data, vs + 4 + 16)
    elif version == 0:
        if ve - vs < 4 + 16:
            raise ValueError("truncated mvhd v0")
        timescale, duration = struct.unpack_from(">II", data, vs + 4 + 8)
    else:
        raise ValueError(f"unknown mvhd version {version}")
    if timescale == 0:
        raise ValueError("mvhd timescale is zero")
    duration_ms = duration * 1000 // timescale
    if duration_ms <= 0:
        raise ValueError("zero mvhd duration")

    for ts_, te_ in _mp4_find(data, ms, me, b"trak"):
        mdias = _mp4_find(data, ts_, te_, b"mdia")
        if len(mdias) != 1:
            raise ValueError("trak must carry exactly one mdia")
        mdia_s, mdia_e = mdias[0]
        handler = None
        stbls: list[tuple[int, int]] = []
        for typ, s, e in _mp4_children(data, mdia_s, mdia_e):
            if typ == b"hdlr":
                if e - s < 12:
                    raise ValueError("truncated hdlr")
                handler = data[s + 8 : s + 12]
            elif typ == b"minf":
                stbls.extend(_mp4_find(data, s, e, b"stbl"))
        if handler != b"vide":
            continue
        if len(stbls) != 1:
            raise ValueError("video mdia must carry exactly one stbl")
        sb_s, sb_e = stbls[0]
        boxes: dict = {}
        for typ, s_, e_ in _mp4_children(data, sb_s, sb_e):
            if typ in (b"stts", b"stsz", b"stco", b"co64") and typ in boxes:
                raise ValueError(f"duplicate {typ.decode()} box in stbl")
            boxes[typ] = (s_, e_)
        for need in (b"stts", b"stsz"):
            if need not in boxes:
                raise ValueError(f"video stbl missing {need.decode()}")
        if (b"stco" in boxes) == (b"co64" in boxes):
            raise ValueError("video stbl needs exactly one of stco/co64")

        s, e = boxes[b"stsz"]
        if e - s < 12:
            raise ValueError("truncated stsz")
        sample_size, n_samples = struct.unpack_from(">II", data, s + 4)
        if n_samples < 1:
            raise ValueError("stsz with zero samples")
        if sample_size != 0:
            total_bytes = sample_size * n_samples
        else:
            if e - s < 12 + 4 * n_samples:
                raise ValueError("truncated stsz size table")
            total_bytes = sum(
                struct.unpack_from(f">{n_samples}I", data, s + 12)
            )

        s, e = boxes[b"stts"]
        if e - s < 8:
            raise ValueError("truncated stts")
        n_runs = struct.unpack_from(">I", data, s + 4)[0]
        if e - s < 8 + 8 * n_runs:
            raise ValueError("truncated stts run table")
        stts_total = sum(
            struct.unpack_from(">I", data, s + 8 + 8 * i)[0] for i in range(n_runs)
        )
        if stts_total != n_samples:
            raise ValueError(
                f"stts sample count {stts_total} != stsz count {n_samples}"
            )

        co_typ = b"stco" if b"stco" in boxes else b"co64"
        s, e = boxes[co_typ]
        if e - s < 8:
            raise ValueError(f"truncated {co_typ.decode()}")
        n_chunks = struct.unpack_from(">I", data, s + 4)[0]
        width = 4 if co_typ == b"stco" else 8
        if n_chunks < 1:
            raise ValueError("zero chunk offsets")
        if e - s < 8 + width * n_chunks:
            raise ValueError(f"truncated {co_typ.decode()} offset table")

        avg_bitrate_bps = total_bytes * 8000 // duration_ms
        return (n_samples, total_bytes, n_chunks, avg_bitrate_bps)
    raise ValueError("no video trak in moov")


MP4_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("n_tracks", T.IntegerType()),
        T.StructField("video_codec", T.StringType()),
        T.StructField("ok", T.BooleanType()),
    ]
)


def synthesize_mp4_table(docs: DataFrame) -> DataFrame:
    """(doc_id, media binary, media_type='video/mp4')."""

    @F.pandas_udf(T.BinaryType())
    def make(ids: pd.Series) -> pd.Series:
        return ids.apply(lambda d: _make_mp4(int(d)))

    return docs.select(
        "doc_id", make(F.col("doc_id")).alias("media"), F.lit("video/mp4").alias("media_type")
    )


def mp4_container_meta(df: DataFrame, media_col: str = "media") -> DataFrame:
    """ISO BMFF container metadata per payload (Arrow-batched pure
    map, zero exchanges): dimensions, duration, track count, codec
    fourcc. Malformed payloads yield ok=false, zeroed fields — a
    corrupt video in a 100 TB corpus must never kill the stage. Frame
    decode remains intentionally unavailable (needs ffmpeg); this is
    the filter/stats surface a video corpus needs before any decode."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list[Any]] = {f.name: [] for f in MP4_META_SCHEMA.fields}
            for doc_id, data in zip(pdf["doc_id"], pdf[media_col]):
                try:
                    # TypeError: bytes(None) — a NULL media column must
                    # degrade like a corrupt payload, never kill the stage
                    w, h, dur, nt, codec = parse_mp4_meta(bytes(data))
                    row = (w, h, dur, nt, codec, True)
                except (ValueError, IndexError, TypeError):
                    row = (0, 0, 0, 0, "", False)
                out["doc_id"].append(doc_id)
                for name, v in zip(
                    ("width", "height", "duration_ms", "n_tracks", "video_codec", "ok"), row
                ):
                    out[name].append(v)
            yield pd.DataFrame(out)

    return df.mapInPandas(run, MP4_META_SCHEMA)


MP4_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("total_sample_bytes", T.LongType()),
        T.StructField("n_chunks", T.IntegerType()),
        T.StructField("avg_bitrate_bps", T.LongType()),
        T.StructField("ok", T.BooleanType()),
    ]
)


def mp4_sample_stats(df: DataFrame, media_col: str = "media") -> DataFrame:
    """Per-payload video sample-table stats (Arrow-batched pure map,
    zero exchanges): sample count, total sample bytes, chunk count,
    average bitrate — the size/bitrate filters a video corpus applies
    before ever decoding a frame. Same totality contract as
    :func:`mp4_container_meta`: malformed payloads yield ok=false."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list[Any]] = {f.name: [] for f in MP4_SAMPLE_SCHEMA.fields}
            for doc_id, data in zip(pdf["doc_id"], pdf[media_col]):
                try:
                    ns, tb, nc, br = parse_mp4_samples(bytes(data))
                    row = (ns, tb, nc, br, True)
                except (ValueError, IndexError, TypeError):
                    row = (0, 0, 0, 0, False)
                out["doc_id"].append(doc_id)
                for name, v in zip(
                    ("n_samples", "total_sample_bytes", "n_chunks",
                     "avg_bitrate_bps", "ok"), row
                ):
                    out[name].append(v)
            yield pd.DataFrame(out)

    return df.mapInPandas(run, MP4_SAMPLE_SCHEMA)


# ---------------------------------------------------------------------------
# WebP container metadata (RIFF chunk walk — the same container family
# as WAV above; VP8 / VP8L / VP8X header parses from the format specs:
# RFC 9649 for the container+lossless bitstream, RFC 6386 for the
# lossy keyframe header). The second-most-common crawl image format
# after JPEG; dims/lossless/alpha are the pre-decode filter fields.
#
# Fixture law (multimodal_webp_meta's oracle replays it), v = doc_id%3:
#   v=0  simple lossy  (VP8):  w=160+doc_id%50, h=120+doc_id%40,
#                              lossless=false, alpha=false, 1 chunk
#   v=1  lossless (VP8L):      w=1+doc_id%300, h=1+doc_id%200,
#                              lossless=true, alpha=doc_id%2==1, 1 chunk
#   v=2  extended (VP8X):      canvas w=640+doc_id%100, h=480+doc_id%80,
#                              alpha flag doc_id%2, inner VP8 chunk
#                              (lossless=false) + odd-size EXIF noise
#                              chunk (word-alignment exercise), 3 chunks
# ---------------------------------------------------------------------------

WEBP_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("format", T.StringType()),
        T.StructField("lossless", T.BooleanType()),
        T.StructField("has_alpha", T.BooleanType()),
        T.StructField("n_chunks", T.IntegerType()),
        T.StructField("ok", T.BooleanType()),
    ]
)


def _vp8_chunk_body(w: int, h: int) -> bytes:
    """A VP8 lossy KEYFRAME header (RFC 6386 §9.1): 3-byte frame tag,
    the 9d 01 2a start code, then 14-bit width/height (2 scale bits
    zero), plus a little opaque payload."""
    import struct

    return (
        b"\x10\x00\x00" + b"\x9d\x01\x2a"
        + struct.pack("<HH", w & 0x3FFF, h & 0x3FFF)
        + b"\x00" * 8
    )


def _make_webp(doc_id: int) -> bytes:
    """Build a real RIFF/WEBP binary under the generation law above."""
    import struct

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")

    v = doc_id % 3
    if v == 0:
        w, h = 160 + doc_id % 50, 120 + doc_id % 40
        payload = chunk(b"VP8 ", _vp8_chunk_body(w, h))
    elif v == 1:
        w, h = 1 + doc_id % 300, 1 + doc_id % 200
        alpha = doc_id % 2 == 1
        bits = (w - 1) | ((h - 1) << 14) | (int(alpha) << 28)
        payload = chunk(b"VP8L", b"\x2f" + struct.pack("<I", bits))
    else:
        w, h = 640 + doc_id % 100, 480 + doc_id % 80
        alpha = doc_id % 2 == 1
        flags = 0x10 if alpha else 0x00
        vp8x = (
            bytes([flags]) + b"\x00\x00\x00"
            + struct.pack("<I", w - 1)[:3] + struct.pack("<I", h - 1)[:3]
        )
        payload = (
            chunk(b"VP8X", vp8x)
            + chunk(b"EXIF", b"x" * (3 + doc_id % 2 * 2))  # odd sizes too
            + chunk(b"VP8 ", _vp8_chunk_body(w, h))
        )
    return b"RIFF" + struct.pack("<I", 4 + len(payload)) + b"WEBP" + payload


def parse_webp(data: bytes) -> tuple[int, int, str, bool, bool, int]:
    """(width, height, format, lossless, has_alpha, n_chunks) from a
    WebP container: generic RIFF walk (word-aligned chunk skip, the
    same discipline as :func:`_parse_wav`), then the first of
    VP8X (extended: canvas dims + alpha flag; lossless iff a VP8L
    chunk is present) / VP8L (lossless bitstream header, alpha bit) /
    VP8 (lossy keyframe: start-code check + 14-bit dims) decides the
    metadata. Strict: truncated chunks, a bad VP8 start code, a bad
    VP8L signature byte, a nonzero VP8L version, or no image chunk at
    all raise ValueError."""
    import struct

    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a RIFF/WEBP payload")
    pos, n_chunks = 12, 0
    first: dict[str, bytes] = {}
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        size = struct.unpack_from("<I", data, pos + 4)[0]
        body = data[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise ValueError(f"truncated {cid!r} chunk: {len(body)} of {size} bytes")
        n_chunks += 1
        key = cid.decode("latin-1")
        if key in ("VP8X", "VP8L", "VP8 ") and key not in first:
            first[key] = body
        pos += 8 + size + (size & 1)
    if "VP8X" in first:
        b = first["VP8X"]
        if len(b) < 10:
            raise ValueError("VP8X chunk too short")
        w = 1 + int.from_bytes(b[4:7], "little")
        h = 1 + int.from_bytes(b[7:10], "little")
        return (w, h, "VP8X", "VP8L" in first, bool(b[0] & 0x10), n_chunks)
    if "VP8L" in first:
        b = first["VP8L"]
        if len(b) < 5 or b[0] != 0x2F:
            raise ValueError("bad VP8L signature")
        bits = struct.unpack_from("<I", b, 1)[0]
        if bits >> 29:
            raise ValueError(f"unsupported VP8L version {bits >> 29}")
        w = 1 + (bits & 0x3FFF)
        h = 1 + ((bits >> 14) & 0x3FFF)
        return (w, h, "VP8L", True, bool(bits & (1 << 28)), n_chunks)
    if "VP8 " in first:
        b = first["VP8 "]
        if len(b) < 10:
            raise ValueError("VP8 chunk too short")
        if b[3:6] != b"\x9d\x01\x2a":
            raise ValueError("bad VP8 keyframe start code")
        w, h = struct.unpack_from("<HH", b, 6)
        return (w & 0x3FFF, h & 0x3FFF, "VP8", False, False, n_chunks)
    raise ValueError("WEBP contains no image chunk")


def synthesize_webp_table(docs: DataFrame) -> DataFrame:
    """(doc_id, media binary, media_type='image/webp') — Arrow-batched
    synthesis from doc_id alone (the generation law above)."""

    @F.pandas_udf(T.BinaryType())
    def make(ids: pd.Series) -> pd.Series:
        return ids.apply(lambda d: _make_webp(int(d)))

    return docs.select(
        "doc_id", make(F.col("doc_id")).alias("media"),
        F.lit("image/webp").alias("media_type"),
    )


def webp_container_meta(df: DataFrame, media_col: str = "media") -> DataFrame:
    """WebP container metadata (Arrow-batched pure map, zero
    exchanges): dims, sub-format, lossless flag, alpha flag, chunk
    count — the pre-decode filter fields of an image corpus. Same
    totality contract as the other codecs: malformed payloads yield
    ok=false, never a stage kill."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list[Any]] = {f.name: [] for f in WEBP_META_SCHEMA.fields}
            for doc_id, data in zip(pdf["doc_id"], pdf[media_col]):
                try:
                    w, h, fmt, lossless, alpha, nc = parse_webp(bytes(data))
                    row = (w, h, fmt, lossless, alpha, nc, True)
                except (ValueError, IndexError, TypeError):
                    row = (0, 0, "", False, False, 0, False)
                out["doc_id"].append(doc_id)
                for name, v in zip(
                    ("width", "height", "format", "lossless", "has_alpha",
                     "n_chunks", "ok"), row
                ):
                    out[name].append(v)
            yield pd.DataFrame(out)

    return df.mapInPandas(run, WEBP_META_SCHEMA)


# ---------------------------------------------------------------------------
# Windowed audio features (round 10): per-window energy / zero-crossing
# stats — the silence/clipping/energy gates an audio corpus applies
# before paying for transcription. Channel 0 only (the fixture law
# replicates one sample across channels; real stereo energy gating on
# a reference channel is standard practice).
# ---------------------------------------------------------------------------

WAV_WINDOW_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("win_idx", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("sum_amp", T.LongType()),
        T.StructField("sum_sq_amp", T.LongType()),
        T.StructField("n_zero_cross", T.IntegerType()),
        T.StructField("ok", T.BooleanType()),
    ]
)


def wav_window_features(
    df: DataFrame, media_col: str = "media", win: int = 64
) -> DataFrame:
    """Per-window PCM features over channel 0: frame count, integer-
    exact amplitude sum and energy (sum of squares — int64-safe for
    16-bit samples at any window size), and the zero-crossing count
    (sign-bit changes between consecutive frames WITHIN the window;
    the window's first frame has no predecessor). Arrow-batched,
    numpy-vectorized per payload; malformed payloads yield ONE
    ok=false row (win_idx -1) — the module's totality contract."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list[Any]] = {f.name: [] for f in WAV_WINDOW_SCHEMA.fields}

            def emit(doc_id, wi, n, sa, sq, zc, ok):
                for name, v in zip(
                    ("doc_id", "win_idx", "n_frames", "sum_amp",
                     "sum_sq_amp", "n_zero_cross", "ok"),
                    (doc_id, wi, n, sa, sq, zc, ok),
                ):
                    out[name].append(v)

            for doc_id, data in zip(pdf["doc_id"], pdf[media_col]):
                try:
                    _rate, channels, _bits, pcm = _parse_wav(bytes(data))
                    mono = np.frombuffer(pcm, dtype="<i2")[::channels].astype("int64")
                except (ValueError, IndexError, TypeError):
                    emit(doc_id, -1, 0, 0, 0, 0, False)
                    continue
                nonneg = mono >= 0
                for wi in range(0, (mono.size + win - 1) // win):
                    s = mono[wi * win : (wi + 1) * win]
                    nn = nonneg[wi * win : (wi + 1) * win]
                    zc = int((nn[1:] != nn[:-1]).sum())
                    emit(
                        doc_id, wi, int(s.size), int(s.sum()),
                        int((s * s).sum()), zc, True,
                    )
            yield pd.DataFrame(out)

    return df.mapInPandas(run, WAV_WINDOW_SCHEMA)


# ---------------------------------------------------------------------------
# Perceptual image fingerprint (round 10): dHash — the near-duplicate
# key image corpora dedup on before any embedding model runs. Gradient
# hash: downscale to a 9×8 grayscale grid, one bit per horizontal
# neighbor comparison (64 bits). Downscale here is NEAREST-SAMPLE at
# integer grid indices (y = i·h//8, x = j·w//9) — deterministic and
# exactly SQL-replayable; production may swap box-average pooling via
# the same UDF without changing the plan or the bit-packing contract.
# ---------------------------------------------------------------------------

IMAGE_DHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("dhash", T.LongType()),
        T.StructField("ok", T.BooleanType()),
    ]
)


def image_dhash(df: DataFrame, media_col: str = "media") -> DataFrame:
    """dHash over decoded 24bpp BMP payloads: top-down pixel grid,
    gray = (b0+b1+b2)//3 per pixel, 9×8 nearest-sample grid, bit p =
    [gray(i,j) < gray(i,j+1)] with p = i·8+j and p=0 the MSB of a
    SIGNED big-endian int64 (both engines assemble the identical
    two's-complement value). Hamming distance between dhash values is
    then the standard near-dup metric; exact-dup grouping is a plain
    groupBy on the 8-byte key. Malformed payloads yield ok=false."""
    import struct

    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list[Any]] = {f.name: [] for f in IMAGE_DHASH_SCHEMA.fields}
            for doc_id, data in zip(pdf["doc_id"], pdf[media_col]):
                try:
                    raw = bytes(data)
                    width, height, chans = _decode_bmp(raw)
                    if chans != 3:
                        raise ValueError("dhash expects 24bpp")
                    off = struct.unpack_from("<I", raw, 10)[0]
                    raw_height = struct.unpack_from("<i", raw, 22)[0]
                    stride = (width * 3 + 3) & ~3
                    arr = np.frombuffer(
                        raw, dtype=np.uint8, count=stride * height, offset=off
                    )
                    grid = arr.reshape(height, stride)[:, : width * 3]
                    if raw_height > 0:
                        grid = grid[::-1]
                    px = grid.reshape(height, width, 3).astype("int64")
                    gray = px.sum(axis=2) // 3
                    ys = (np.arange(8) * height) // 8
                    xs = (np.arange(9) * width) // 9
                    small = gray[np.ix_(ys, xs)]
                    bits = (small[:, :8] < small[:, 1:]).astype(np.uint8)
                    packed = np.packbits(bits.reshape(-1)).tobytes()
                    dh = int.from_bytes(packed, "big", signed=True)
                    row = (width, height, dh, True)
                except (ValueError, IndexError, TypeError):
                    row = (0, 0, 0, False)
                out["doc_id"].append(doc_id)
                for name, v in zip(("width", "height", "dhash", "ok"), row):
                    out[name].append(v)
            yield pd.DataFrame(out)

    return df.mapInPandas(run, IMAGE_DHASH_SCHEMA)


def _make_bmp_variant(doc_id: int) -> bytes:
    """Near-duplicate image fixture for the dHash banding query: even
    ids carry the plain law image of their own EVEN base; odd ids
    carry the even partner's image with pixel (0,0)'s three bytes
    shifted by +100 (mod 251) — a perturbation that can flip only the
    comparison bits whose samples land on pixel (0,0), so each
    (2m, 2m+1) pair sits within a small Hamming distance by
    construction."""
    base = doc_id - (doc_id % 2)
    data = bytearray(_make_bmp(base))
    if doc_id % 2:
        width, height = 1 + base % 13, 1 + base % 7
        stride = (width * 3 + 3) & ~3
        # stored bottom-up: semantic row 0 is the LAST stored row
        off = 54 + (height - 1) * stride
        for t in range(3):
            data[off + t] = (data[off + t] + 100) % 251
    return bytes(data)


def synthesize_bmp_variant_table(docs: DataFrame) -> DataFrame:
    """(doc_id, media binary) under the near-duplicate-pair law."""

    @F.pandas_udf(T.BinaryType())
    def make(ids: pd.Series) -> pd.Series:
        return ids.apply(lambda d: _make_bmp_variant(int(d)))

    return docs.select("doc_id", make(F.col("doc_id")).alias("media"))


def _make_bmp_group(doc_id: int) -> bytes:
    """Duplicate-GROUP image fixture (higher-entropy than the tiny
    stats-law images, whose dHashes collide so densely that group
    structure degenerates into a few mega-components): 16..31 ×
    16..23 images under pix(k) = (base·3 + k·7) % 247, odd ids again
    perturbing pixel (0,0) of their even partner — so components are
    (almost always) exactly the constructed pairs."""
    import struct

    base = doc_id - (doc_id % 2)
    width, height = 16 + base % 16, 16 + base % 8
    stride = (width * 3 + 3) & ~3
    rows = []
    for y in range(height):
        row = bytearray()
        for x in range(width * 3):
            k = y * width * 3 + x
            row.append((base * 3 + k * 7) % 247)
        row += b"\xab" * (stride - width * 3)
        rows.append(bytes(row))
    if doc_id % 2:
        r0 = bytearray(rows[0])
        for t in range(3):
            r0[t] = (r0[t] + 100) % 247
        rows[0] = bytes(r0)
    pixel_array = b"".join(reversed(rows))
    off_bits = 14 + 40
    header = b"BM" + struct.pack("<IHHI", off_bits + len(pixel_array), 0, 0, off_bits)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(pixel_array), 2835, 2835, 0, 0
    )
    return header + info + pixel_array


def synthesize_bmp_group_table(docs: DataFrame) -> DataFrame:
    """(doc_id, media binary) under the duplicate-group law."""

    @F.pandas_udf(T.BinaryType())
    def make(ids: pd.Series) -> pd.Series:
        return ids.apply(lambda d: _make_bmp_group(int(d)))

    return docs.select("doc_id", make(F.col("doc_id")).alias("media"))


# ---------------------------------------------------------------------------
# Real stdlib codec: PDF (xref walk + object parser + FlateDecode +
# content-stream text extraction) — round 11. application/pdf is the
# second-most-common document type in a real crawl corpus; the engine
# extracts its text the same way the other codecs work: a writer that
# builds REAL files under a deterministic generation law, a total
# parser that never crashes on malformed bytes, and a SQL oracle that
# recomputes the expected text in closed form, byte-blind.
#
# Fixture generation law (deterministic per doc_id):
#
#   n_pages = 1 + doc_id % 3
#   page p (0-based) has n_words = 3 + (doc_id + p) % 5
#   word i on page p:  base = (doc_id*7 + p*31 + i*13) % 97
#                      word = 'w' || base, wrapped in literal
#                      parentheses when (doc_id + p + i) % 7 == 0
#                      (exercises \( \) escaping in PDF strings)
#   page text  = words joined by ' '
#   doc text   = page texts joined by '\n'
#
# Writer structure variation (all under the same text law):
#   - content streams FlateDecode-compressed when doc_id % 2 == 0,
#     raw (no /Filter) otherwise;
#   - stream /Length written as an INDIRECT reference when
#     doc_id % 3 == 0 (a resolver that assumes a literal int breaks);
#   - odd pages show text via TJ arrays (strings + kern numbers),
#     even pages via one Tj per word — identical extracted text;
#   - /Contents is an ARRAY of two stream refs when doc_id % 5 == 0
#     (streams concatenate per the PDF content model).
# ---------------------------------------------------------------------------

PDF_TEXT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_pages", T.IntegerType()),
        T.StructField("n_chars", T.IntegerType()),
        T.StructField("text", T.StringType()),
        T.StructField("ok", T.BooleanType()),
    ]
)


def _pdf_word(doc_id: int, p: int, i: int) -> str:
    base = (doc_id * 7 + p * 31 + i * 13) % 97
    w = f"w{base}"
    if (doc_id + p + i) % 7 == 0:
        w = f"({w})"
    return w


def _pdf_page_words(doc_id: int, p: int) -> list[str]:
    n_words = 3 + (doc_id + p) % 5
    return [_pdf_word(doc_id, p, i) for i in range(n_words)]


def _pdf_escape(s: str) -> bytes:
    out = []
    for ch in s:
        if ch in "\\()":
            out.append("\\" + ch)
        else:
            out.append(ch)
    return "".join(out).encode("latin-1")


def _pdf_content_ops(doc_id: int, p: int, words: list[str]) -> bytes:
    """One BT/ET block; odd pages use a TJ array (strings + kern
    numbers), even pages one Tj per word with separate space shows."""
    shows: list[bytes] = []
    if p % 2 == 1:
        elems: list[bytes] = []
        for i, w in enumerate(words):
            if i:
                elems.append(b"-250 ( ) -250 ")
            elems.append(b"(" + _pdf_escape(w) + b") ")
        shows.append(b"[" + b"".join(elems) + b"] TJ\n")
    else:
        for i, w in enumerate(words):
            if i:
                shows.append(b"( ) Tj\n")
            shows.append(b"(" + _pdf_escape(w) + b") Tj\n")
    return b"BT\n/F1 12 Tf\n72 720 Td\n" + b"".join(shows) + b"ET\n"


def _make_pdf(doc_id: int) -> bytes:
    """Build a real multi-object PDF (header, numbered objects, xref
    table with correct byte offsets, trailer, startxref) under the
    generation law above."""
    import zlib

    n_pages = 1 + doc_id % 3
    flate = doc_id % 2 == 0
    indirect_len = doc_id % 3 == 0
    split_contents = doc_id % 5 == 0

    # object numbering: 1=Catalog, 2=Pages, 3=Font, then per page:
    # Page obj, 1-2 content stream objs, optional Length objs appended
    objects: dict[int, bytes] = {}
    next_obj = 4
    page_objs: list[int] = []
    extra: list[tuple[int, bytes]] = []  # deferred Length objects

    def make_stream_obj(body: bytes) -> int:
        nonlocal next_obj
        data = zlib.compress(body) if flate else body
        filt = b"/Filter /FlateDecode " if flate else b""
        num = next_obj
        next_obj += 1
        if indirect_len:
            len_obj = next_obj
            next_obj += 1
            extra.append((len_obj, str(len(data)).encode() + b"\n"))
            length = f"{len_obj} 0 R".encode()
        else:
            length = str(len(data)).encode()
        objects[num] = (
            b"<< " + filt + b"/Length " + length + b" >>\nstream\n"
            + data
            + b"\nendstream\n"
        )
        return num

    for p in range(n_pages):
        words = _pdf_page_words(doc_id, p)
        ops = _pdf_content_ops(doc_id, p, words)
        if split_contents and len(words) > 1:
            # two content streams; PDF concatenates them with an
            # implied separator, so split at an operator boundary
            mid = ops.find(b" Tj\n")
            mid = mid + 4 if mid != -1 else len(ops)
            if p % 2 == 1:  # TJ page: split before BT instead
                s1, s2 = b"", ops
            else:
                s1, s2 = ops[:mid], ops[mid:]
            c1 = make_stream_obj(s1)
            c2 = make_stream_obj(s2)
            contents = f"[{c1} 0 R {c2} 0 R]".encode()
        else:
            c1 = make_stream_obj(ops)
            contents = f"{c1} 0 R".encode()
        pnum = next_obj
        next_obj += 1
        objects[pnum] = (
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 3 0 R >> >> /Contents "
            + contents
            + b" >>\n"
        )
        page_objs.append(pnum)

    for num, body in extra:
        objects[num] = body

    objects[1] = b"<< /Type /Catalog /Pages 2 0 R >>\n"
    kids = b"[" + b" ".join(f"{n} 0 R".encode() for n in page_objs) + b"]"
    objects[2] = (
        b"<< /Type /Pages /Kids " + kids + b" /Count "
        + str(n_pages).encode() + b" >>\n"
    )
    objects[3] = (
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\n"
    )

    buf = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict[int, int] = {}
    for num in sorted(objects):
        offsets[num] = len(buf)
        buf += f"{num} 0 obj\n".encode() + objects[num] + b"endobj\n"
    xref_at = len(buf)
    n_objs = max(objects) + 1
    buf += f"xref\n0 {n_objs}\n".encode()
    buf += b"0000000000 65535 f \n"
    for num in range(1, n_objs):
        buf += f"{offsets[num]:010d} 00000 n \n".encode()
    buf += (
        b"trailer\n<< /Size " + str(n_objs).encode()
        + b" /Root 1 0 R >>\nstartxref\n" + str(xref_at).encode()
        + b"\n%%EOF\n"
    )
    return bytes(buf)


class _PdfLexer:
    """Recursive-descent reader over raw PDF bytes: names, numbers,
    strings (with escapes), arrays, dicts, indirect references."""

    WS = b"\x00\t\n\x0c\r "
    DELIM = b"()<>[]{}/%"

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos

    def _skip_ws(self) -> None:
        d, n = self.data, len(self.data)
        while self.pos < n:
            c = self.data[self.pos]
            if c in self.WS:
                self.pos += 1
            elif c == 0x25:  # % comment to EOL
                while self.pos < n and d[self.pos] not in b"\r\n":
                    self.pos += 1
            else:
                return

    def read_token(self) -> bytes:
        self._skip_ws()
        d, n = self.data, len(self.data)
        if self.pos >= n:
            raise ValueError("unexpected end of PDF data")
        c = d[self.pos]
        if c == 0x3C and self.pos + 1 < n and d[self.pos + 1] == 0x3C:
            self.pos += 2
            return b"<<"
        if c == 0x3E and self.pos + 1 < n and d[self.pos + 1] == 0x3E:
            self.pos += 2
            return b">>"
        if c in b"[]()":
            self.pos += 1
            return bytes([c])
        if c == 0x2F:  # name
            start = self.pos
            self.pos += 1
            while self.pos < n and d[self.pos] not in self.WS + self.DELIM:
                self.pos += 1
            return d[start : self.pos]
        start = self.pos
        while self.pos < n and d[self.pos] not in self.WS + self.DELIM:
            self.pos += 1
        if self.pos == start:
            raise ValueError(f"bad PDF token at {self.pos}")
        return d[start : self.pos]

    def read_string(self) -> bytes:
        """Literal string body after '(' — full escape set + balanced
        nested parens per PDF 32000-1 §7.3.4.2."""
        d, n = self.data, len(self.data)
        out = bytearray()
        depth = 1
        esc = {0x6E: b"\n", 0x72: b"\r", 0x74: b"\t", 0x62: b"\b",
               0x66: b"\f", 0x28: b"(", 0x29: b")", 0x5C: b"\\"}
        while True:
            if self.pos >= n:
                raise ValueError("unterminated PDF string")
            c = d[self.pos]
            self.pos += 1
            if c == 0x5C:  # backslash
                if self.pos >= n:
                    raise ValueError("dangling escape in PDF string")
                e = d[self.pos]
                self.pos += 1
                if e in esc:
                    out += esc[e]
                elif 0x30 <= e <= 0x37:  # 1-3 octal digits
                    val = e - 0x30
                    for _ in range(2):
                        if self.pos < n and 0x30 <= d[self.pos] <= 0x37:
                            val = val * 8 + (d[self.pos] - 0x30)
                            self.pos += 1
                    out.append(val & 0xFF)
                elif e in b"\r\n":  # line continuation
                    if e == 0x0D and self.pos < n and d[self.pos] == 0x0A:
                        self.pos += 1
                else:
                    out.append(e)  # unknown escape: literal char
            elif c == 0x28:
                depth += 1
                out.append(c)
            elif c == 0x29:
                depth -= 1
                if depth == 0:
                    return bytes(out)
                out.append(c)
            else:
                out.append(c)

    def read_object(self):
        tok = self.read_token()
        return self._object_from(tok)

    def _object_from(self, tok: bytes):
        if tok == b"<<":
            d: dict[bytes, Any] = {}
            while True:
                k = self.read_token()
                if k == b">>":
                    return d
                if not k.startswith(b"/"):
                    raise ValueError(f"dict key is not a name: {k!r}")
                d[k] = self.read_object()
        if tok == b"[":
            arr = []
            while True:
                self._skip_ws()
                if self.pos < len(self.data) and self.data[self.pos] == 0x5D:
                    self.pos += 1
                    return arr
                arr.append(self.read_object())
        if tok == b"(":
            return self.read_string()
        if tok.startswith(b"/"):
            return tok
        if tok in (b"true", b"false"):
            return tok == b"true"
        if tok == b"null":
            return None
        # number or indirect reference "N G R"
        try:
            num = int(tok)
        except ValueError:
            try:
                return float(tok)
            except ValueError as exc:
                raise ValueError(f"bad PDF object token {tok!r}") from exc
        save = self.pos
        try:
            t2 = self.read_token()
            if t2.isdigit():
                t3 = self.read_token()
                if t3 == b"R":
                    return ("ref", num, int(t2))
            self.pos = save
        except ValueError:
            self.pos = save
        return num


def _parse_pdf(data: bytes) -> tuple[int, list[str]]:
    """Parse a PDF via the REAL access path — startxref → xref table →
    trailer /Root → catalog → pages tree → per-page /Contents (single
    ref or array), /Length possibly indirect, FlateDecode or raw —
    then extract text from the content streams (Tj, TJ, ' and "
    shows, concatenated in stream order; pages joined by newline).
    Raises ValueError on any malformation so corrupt payloads surface
    as ok=false, never wrong text."""
    import zlib

    if not data.startswith(b"%PDF-"):
        raise ValueError("not a PDF payload")
    tail = data[-256:]
    sx = tail.rfind(b"startxref")
    if sx == -1:
        raise ValueError("no startxref")
    lex = _PdfLexer(tail, sx + len(b"startxref"))
    xref_at = lex.read_token()
    if not xref_at.isdigit():
        raise ValueError("bad startxref offset")
    xref_at = int(xref_at)
    if xref_at >= len(data):
        raise ValueError("startxref beyond EOF")

    lex = _PdfLexer(data, xref_at)
    if lex.read_token() != b"xref":
        raise ValueError("xref table not at startxref offset")
    offsets: dict[int, int] = {}
    while True:
        lex._skip_ws()
        save = lex.pos
        tok = lex.read_token()
        if tok == b"trailer":
            break
        if not tok.isdigit():
            raise ValueError(f"bad xref subsection header {tok!r}")
        start = int(tok)
        count = lex.read_token()
        if not count.isdigit():
            raise ValueError("bad xref subsection count")
        for k in range(int(count)):
            off = lex.read_token()
            gen = lex.read_token()
            kind = lex.read_token()
            if kind not in (b"n", b"f"):
                raise ValueError(f"bad xref entry kind {kind!r}")
            if kind == b"n":
                offsets[start + k] = int(off)
        del save
    if lex.read_token() != b"<<":
        raise ValueError("trailer dict missing")
    trailer = lex._object_from(b"<<")
    root = trailer.get(b"/Root")
    if not (isinstance(root, tuple) and root[0] == "ref"):
        raise ValueError("trailer /Root missing")

    def load(ref) -> tuple[Any, _PdfLexer]:
        if not (isinstance(ref, tuple) and ref[0] == "ref"):
            return ref, None
        num = ref[1]
        if num not in offsets:
            raise ValueError(f"object {num} not in xref")
        lx = _PdfLexer(data, offsets[num])
        onum = lx.read_token()
        ogen = lx.read_token()
        if not (onum.isdigit() and int(onum) == num and ogen.isdigit()):
            raise ValueError(f"object header mismatch for {num}")
        if lx.read_token() != b"obj":
            raise ValueError(f"missing obj keyword for {num}")
        return lx.read_object(), lx

    def resolve(v):
        if isinstance(v, tuple) and v[0] == "ref":
            return load(v)[0]
        return v

    def load_stream(ref) -> bytes:
        obj, lx = load(ref)
        if not isinstance(obj, dict):
            raise ValueError("content object is not a stream dict")
        lx._skip_ws()
        if lx.read_token() != b"stream":
            raise ValueError("stream keyword missing")
        # exactly CRLF or LF after 'stream'
        if lx.data[lx.pos : lx.pos + 2] == b"\r\n":
            lx.pos += 2
        elif lx.data[lx.pos : lx.pos + 1] == b"\n":
            lx.pos += 1
        length = resolve(obj.get(b"/Length"))
        if not isinstance(length, int) or length < 0:
            raise ValueError("bad stream /Length")
        raw = lx.data[lx.pos : lx.pos + length]
        if len(raw) != length:
            raise ValueError("stream truncated")
        filt = obj.get(b"/Filter")
        if filt is None:
            return raw
        if filt == b"/FlateDecode" or filt == [b"/FlateDecode"]:
            try:
                return zlib.decompress(raw)
            except zlib.error as exc:
                raise ValueError(f"bad FlateDecode stream: {exc}") from exc
        raise ValueError(f"unsupported stream filter {filt!r}")

    def page_refs(node_ref, depth: int = 0) -> list:
        if depth > 32:
            raise ValueError("pages tree too deep")
        node = resolve(node_ref)
        if not isinstance(node, dict):
            raise ValueError("pages node is not a dict")
        t = node.get(b"/Type")
        if t == b"/Page":
            return [node]
        if t == b"/Pages":
            kids = resolve(node.get(b"/Kids"))
            if not isinstance(kids, list):
                raise ValueError("/Pages without /Kids array")
            out = []
            for k in kids:
                out.extend(page_refs(k, depth + 1))
            return out
        raise ValueError(f"unexpected pages-tree node type {t!r}")

    def extract_ops_text(stream: bytes) -> str:
        lx = _PdfLexer(stream, 0)
        shows: list[str] = []
        stack: list[Any] = []
        n = len(stream)
        while True:
            lx._skip_ws()
            if lx.pos >= n:
                break
            c = stream[lx.pos]
            if c == 0x28:
                lx.pos += 1
                stack.append(lx.read_string())
                continue
            if c == 0x5B:
                lx.pos += 1
                stack.append(lx._object_from(b"["))
                continue
            tok = lx.read_token()
            if tok in (b"Tj", b"'", b'"'):
                if stack and isinstance(stack[-1], bytes):
                    shows.append(stack[-1].decode("latin-1"))
                stack.clear()
            elif tok == b"TJ":
                if stack and isinstance(stack[-1], list):
                    for el in stack[-1]:
                        if isinstance(el, bytes):
                            shows.append(el.decode("latin-1"))
                stack.clear()
            elif tok.startswith(b"/") or tok.replace(b".", b"").replace(
                b"-", b""
            ).isdigit():
                stack.append(tok)
            else:
                stack.clear()  # any other operator consumes operands
        return "".join(shows)

    catalog = resolve(root)
    if not isinstance(catalog, dict) or catalog.get(b"/Type") != b"/Catalog":
        raise ValueError("root is not a catalog")
    pages = page_refs(catalog.get(b"/Pages"))
    texts: list[str] = []
    for page in pages:
        contents = page.get(b"/Contents")
        refs = resolve(contents) if isinstance(contents, list) else contents
        if isinstance(contents, tuple):
            maybe = resolve(contents)
            # /Contents may be a ref to an array of refs
            refs = maybe if isinstance(maybe, list) else [contents]
        elif isinstance(refs, list):
            pass
        else:
            raise ValueError("page /Contents missing")
        body = b"\n".join(load_stream(r) for r in refs)
        texts.append(extract_ops_text(body))
    return len(pages), texts


def synthesize_pdf_table(docs: DataFrame) -> DataFrame:
    """(doc_id, media binary, media_type='application/pdf')."""

    @F.pandas_udf(T.BinaryType())
    def make(ids: pd.Series) -> pd.Series:
        return ids.apply(lambda d: _make_pdf(int(d)))

    return docs.select(
        "doc_id", make(F.col("doc_id")).alias("media"),
        F.lit("application/pdf").alias("media_type"),
    )


def pdf_extract_text(df: DataFrame, media_col: str = "media") -> DataFrame:
    """PDF text extraction (Arrow-batched pure map, zero exchanges):
    page count, char count, the extracted text (pages joined by
    newline). Total: malformed payloads yield ok=false, empty text."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list[Any]] = {f.name: [] for f in PDF_TEXT_SCHEMA.fields}
            for doc_id, data in zip(pdf["doc_id"], pdf[media_col]):
                try:
                    n_pages, texts = _parse_pdf(bytes(data))
                    text = "\n".join(texts)
                    row = (n_pages, len(text), text, True)
                except (ValueError, IndexError, TypeError, RecursionError):
                    row = (0, 0, "", False)
                out["doc_id"].append(doc_id)
                for name, v in zip(("n_pages", "n_chars", "text", "ok"), row):
                    out[name].append(v)
            yield pd.DataFrame(out)

    return df.mapInPandas(run, PDF_TEXT_SCHEMA)


# ---------------------------------------------------------------------------
# Audio fingerprint near-dup (round 11): the image-dHash idea on the
# time-energy grid. Channel-0 PCM is cut into 65 equal nearest-sample
# segments (same integer boundary law as the dHash pixel grid:
# segment t covers [t*n//65, (t+1)*n//65)); e(t) = integer-exact
# sum of squared samples; bit p (0..63) = [e(p) < e(p+1)], packed
# big-endian into a SIGNED int64 with p=0 the MSB — byte-identical
# packing to image_dhash, so the fingerprint feeds the same generic
# hamming_near_dup_pairs/_edges banding. Loudness-profile deltas are
# what survive re-encoding; a localized edit flips only the bits
# whose segments cover it.
# ---------------------------------------------------------------------------

AUDIO_FP_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("afp", T.LongType()),
        T.StructField("ok", T.BooleanType()),
    ]
)

AUDIO_FP_SEGMENTS = 65  # 64 neighbor comparisons


def audio_fingerprint(df: DataFrame, media_col: str = "media") -> DataFrame:
    """64-bit audio fingerprint over the real RIFF/WAVE parse (Arrow-
    batched numpy map, zero exchanges). Requires n_frames >=
    AUDIO_FP_SEGMENTS so every segment is non-empty; shorter or
    malformed payloads yield ok=false."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list[Any]] = {f.name: [] for f in AUDIO_FP_SCHEMA.fields}
            for doc_id, data in zip(pdf["doc_id"], pdf[media_col]):
                try:
                    rate, channels, bits, pcm = _parse_wav(bytes(data))
                    samples = np.frombuffer(pcm, dtype="<i2")
                    ch0 = samples[::channels].astype("int64")
                    n = ch0.size
                    if n < AUDIO_FP_SEGMENTS:
                        raise ValueError("too short for fingerprint")
                    starts = (np.arange(AUDIO_FP_SEGMENTS) * n) // AUDIO_FP_SEGMENTS
                    e = np.add.reduceat(ch0 * ch0, starts)
                    fp_bits = (e[:-1] < e[1:]).astype(np.uint8)
                    packed = np.packbits(fp_bits).tobytes()
                    afp = int.from_bytes(packed, "big", signed=True)
                    row = (n, afp, True)
                except (ValueError, IndexError, TypeError):
                    row = (0, 0, False)
                out["doc_id"].append(doc_id)
                for name, v in zip(("n_frames", "afp", "ok"), row):
                    out[name].append(v)
            yield pd.DataFrame(out)

    return df.mapInPandas(run, AUDIO_FP_SCHEMA)


def _make_wav_variant(doc_id: int) -> bytes:
    """Near-duplicate audio fixture for the banded Hamming query: even
    ids carry the plain law clip of their own EVEN base; odd ids carry
    the even partner's clip with frame 0 (all channels) replaced by
    s'(0) = ((base*7 + 500) % 4096) - 2048 — a perturbation confined
    to segment 0, so it can flip only fingerprint bit 0 and each
    (2m, 2m+1) pair sits within Hamming distance 1 by construction."""
    import struct

    base = doc_id - (doc_id % 2)
    data = bytearray(_make_wav(base))
    if doc_id % 2:
        channels = 1 + base % 2
        s0 = ((base * 7 + 500) % 4096) - 2048
        # layout is fixed by _make_wav: RIFF(12) + fmt(8+16) +
        # LIST(8+10) + data header(8) = 62
        assert data[54:58] == b"data"
        for c in range(channels):
            struct.pack_into("<h", data, 62 + 2 * c, s0)
    return bytes(data)


def synthesize_wav_variant_table(docs: DataFrame) -> DataFrame:
    """(doc_id, media binary) under the near-duplicate-pair law."""

    @F.pandas_udf(T.BinaryType())
    def make(ids: pd.Series) -> pd.Series:
        return ids.apply(lambda d: _make_wav_variant(int(d)))

    return docs.select("doc_id", make(F.col("doc_id")).alias("media"))
