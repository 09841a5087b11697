"""Multimodal column plumbing (SURVEY.md §2.12 X5).

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata structs. The container has no media libraries, so the decode
step is a clearly-marked stub (deterministic fake or
NotImplementedError), while everything Spark-side — schema, Arrow
batch shape, ``mapInPandas`` signature, partitioning — is real and
tested.

At 100 TB the pattern is: binary column + metadata struct in parquet,
``mapInPandas`` over Arrow batches for decode/feature-extract (one
Python worker per partition, zero shuffle), explicit
``repartition`` only when payload-size skew demands it.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# schema of the decoded-metadata records produced by decode_metadata
DECODED_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("byte_len", T.LongType()),
    T.StructField("fake_width", T.IntegerType()),
    T.StructField("fake_height", T.IntegerType()),
    T.StructField("content_sha256", T.StringType()),
])

REAL_DECODERS_AVAILABLE = False  # no PIL/ffmpeg in this container


def to_binary_payload(text_col: Column) -> Column:
    """Treat the document text as an opaque binary payload — the same
    plumbing a real image/audio bytes column uses."""
    return F.encode(text_col, "UTF-8")


def binary_meta(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Typed metadata over a binary column, all JVM-side: byte length,
    content hash, leading-bytes hex preview."""
    payload = to_binary_payload(F.col(text_col))
    return df.select(
        F.col(id_col),
        F.octet_length(payload).alias("byte_len"),
        F.lower(F.sha2(payload, 256)).alias("content_sha256"),
        F.lower(F.hex(F.substring(payload, 1, 8))).alias("head_hex"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int]:
    """Deterministic stand-in for an image decode: derive fake
    dimensions from the first payload bytes. Replace with a real
    decoder (PIL/av) where available."""
    if not payload:
        return 0, 0
    w = 32 + payload[0] % 32
    h = 32 + (payload[1] if len(payload) > 1 else 0) % 32
    return w, h


def decode_metadata(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """mapInPandas decode pipeline: Arrow batches in, typed metadata
    records out. The decode itself is stubbed (_fake_decode /
    NotImplementedError for real media), but the batch shape, schema
    and partition behavior are the production path."""
    import hashlib

    if not REAL_DECODERS_AVAILABLE:
        decode = _fake_decode
    else:  # pragma: no cover
        raise NotImplementedError("real media decoders not available in this container")

    src = df.select(F.col(id_col).alias("doc_id"),
                    to_binary_payload(F.col(text_col)).alias("payload"))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            dims = [decode(bytes(p)) for p in payloads]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "byte_len": [len(bytes(p)) for p in payloads],
                "fake_width": [d[0] for d in dims],
                "fake_height": [d[1] for d in dims],
                "content_sha256": [hashlib.sha256(bytes(p)).hexdigest() for p in payloads],
            })

    return src.mapInPandas(batches, DECODED_SCHEMA)


FRAME_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("frame_off", T.IntegerType()),
    T.StructField("frame_sha256", T.StringType()),
])


def frame_sample(df: DataFrame, text_col: str, id_col: str,
                 frame_chars: int = 64, stride: int = 4) -> DataFrame:
    """Video-shaped frame sampling over an opaque payload: the
    payload is treated as a sequence of fixed-size frames and every
    ``stride``-th frame is emitted as its own ROW (the explode shape
    a real video pipeline produces — one input row fans out to many
    sampled-frame rows). Real frame boundaries come from the
    container format; the fixed-window stand-in keeps the plumbing —
    Arrow batch fan-out, per-frame hashing, explode cardinality —
    identical and deterministic. Windows are codepoint-based (not
    byte-based) so every engine slices identically on multi-byte
    text; the hash is over the window's UTF-8 bytes.

    mapInPandas (one Python worker pass, zero shuffle); at 100 TB
    payload-size skew is handled by repartitioning on byte_len ranges
    BEFORE the fan-out, never after."""
    import hashlib

    src = df.select(F.col(id_col).alias("doc_id"),
                    F.col(text_col).alias("payload"))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"doc_id": [], "frame_idx": [], "frame_off": [],
                   "frame_sha256": []}
            for doc_id, s in zip(pdf["doc_id"], pdf["payload"]):
                n_frames = (len(s) + frame_chars - 1) // frame_chars
                for i in range(0, n_frames, stride):
                    off = i * frame_chars
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["frame_off"].append(off)
                    out["frame_sha256"].append(hashlib.sha256(
                        s[off:off + frame_chars].encode("utf-8")).hexdigest())
            yield pd.DataFrame(out)

    return src.mapInPandas(batches, FRAME_SCHEMA)


WINDOW_SCHEMA = ("doc_id bigint, win_idx int, win_off int, "
                 "win_chars int, win_md5 string")


def audio_windows(df: DataFrame, text_col: str, id_col: str,
                  win_chars: int = 96, hop_chars: int = 48) -> DataFrame:
    """Audio-shaped OVERLAPPING window slicing over an opaque
    payload: windows of ``win_chars`` every ``hop_chars`` (hop <
    window = the STFT/feature-frame layout, where every sample
    belongs to ~win/hop windows — a different fan-out shape from
    frame_sample's disjoint strided frames). The trailing partial
    window is kept, as real feature pipelines do. Same honesty rule
    as the decoder stub: real window boundaries come from the codec;
    the fixed-hop stand-in keeps the plumbing — Arrow batch fan-out,
    per-window hashing, overlap cardinality — identical and
    deterministic, codepoint-based so every engine slices alike.

    mapInPandas, zero shuffle; payload-size skew handled by
    range-repartitioning on length BEFORE the fan-out."""
    import hashlib

    src = df.select(F.col(id_col).alias("doc_id"),
                    F.col(text_col).alias("payload"))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"doc_id": [], "win_idx": [], "win_off": [],
                   "win_chars": [], "win_md5": []}
            for doc_id, s in zip(pdf["doc_id"], pdf["payload"]):
                for i, off in enumerate(range(0, len(s), hop_chars)):
                    w = s[off:off + win_chars]
                    out["doc_id"].append(doc_id)
                    out["win_idx"].append(i)
                    out["win_off"].append(off)
                    out["win_chars"].append(len(w))
                    out["win_md5"].append(
                        hashlib.md5(w.encode("utf-8")).hexdigest())
            yield pd.DataFrame(out)

    return src.mapInPandas(batches, WINDOW_SCHEMA)


TILE_SCHEMA = ("doc_id bigint, tile_row int, tile_col int, "
               "tile_off int, tile_chars int, tile_md5 string")


def image_tiles(df: DataFrame, text_col: str, id_col: str,
                img_width: int = 32, tile: int = 8) -> DataFrame:
    """Image-shaped 2-D TILE grid over an opaque payload — the
    vision-transformer patch layout: the payload is interpreted as
    row-major scanlines of ``img_width`` and cut into tile x tile
    patches addressed by (tile_row, tile_col), each tile hashing its
    (possibly ragged-edge) pixels. 2-D addressing is the one fan-out
    shape the 1-D frame/window tiers don't exercise: a tile's bytes
    are NON-contiguous in the payload (one strip per scanline), so
    the slicing loop walks ``tile`` strips per patch. Same honesty
    rule as the decoder stub: real layouts come from the codec; the
    row-major stand-in keeps the plumbing deterministic and
    oracle-reproducible. mapInPandas, zero shuffle."""
    import hashlib

    src = df.select(F.col(id_col).alias("doc_id"),
                    F.col(text_col).alias("payload"))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"doc_id": [], "tile_row": [], "tile_col": [],
                   "tile_off": [], "tile_chars": [], "tile_md5": []}
            for doc_id, s in zip(pdf["doc_id"], pdf["payload"]):
                n_rows = (len(s) + img_width - 1) // img_width
                for tr in range((n_rows + tile - 1) // tile):
                    for tc in range((img_width + tile - 1) // tile):
                        pieces = []
                        for r in range(tr * tile,
                                       min((tr + 1) * tile, n_rows)):
                            start = r * img_width + tc * tile
                            end = min(r * img_width + min(
                                (tc + 1) * tile, img_width), len(s))
                            if start < len(s):
                                pieces.append(s[start:end])
                        patch = "".join(pieces)
                        if not patch:
                            continue
                        out["doc_id"].append(doc_id)
                        out["tile_row"].append(tr)
                        out["tile_col"].append(tc)
                        out["tile_off"].append(
                            tr * tile * img_width + tc * tile)
                        out["tile_chars"].append(len(patch))
                        out["tile_md5"].append(hashlib.md5(
                            patch.encode("utf-8")).hexdigest())
            yield pd.DataFrame(out)

    return src.mapInPandas(batches, TILE_SCHEMA)


RESIZE_SCHEMA = ("doc_id bigint, orig_chars int, resized_chars int, "
                 "resized_md5 string")


def resize_stub(df: DataFrame, text_col: str, id_col: str,
                img_width: int = 32, factor: int = 2) -> DataFrame:
    """Image RESIZE plumbing (the brief's decode / feature-extract /
    resize / frame-sample enumeration): nearest-neighbor downsample
    by ``factor`` over the row-major scanline stand-in — keep every
    ``factor``-th character of every ``factor``-th scanline, hash the
    result. Real resampling needs the decoded pixel grid (see
    decode_metadata's honest stub); the arithmetic here — stride
    indexing over a 2-D layout flattened row-major — is exactly what
    the real kernel does, deterministic and oracle-reproducible.
    mapInPandas, zero shuffle."""
    import hashlib

    src = df.select(F.col(id_col).alias("doc_id"),
                    F.col(text_col).alias("payload"))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"doc_id": [], "orig_chars": [], "resized_chars": [],
                   "resized_md5": []}
            for doc_id, s in zip(pdf["doc_id"], pdf["payload"]):
                n_rows = (len(s) + img_width - 1) // img_width
                kept = []
                for r in range(0, n_rows, factor):
                    for c in range(0, img_width, factor):
                        idx = r * img_width + c
                        if idx < len(s):
                            kept.append(s[idx])
                small = "".join(kept)
                out["doc_id"].append(doc_id)
                out["orig_chars"].append(len(s))
                out["resized_chars"].append(len(small))
                out["resized_md5"].append(
                    hashlib.md5(small.encode("utf-8")).hexdigest())
            yield pd.DataFrame(out)

    return src.mapInPandas(batches, RESIZE_SCHEMA)
