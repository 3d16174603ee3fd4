"""Multimodal column plumbing: binary payloads + typed metadata (extension).

Design: image/audio/video payloads are opaque ``binary`` columns with a typed
metadata struct alongside (modality, byte size, content hash, decoded
dimensions). The Spark-side plumbing — schema, partitioning, Arrow batch
shape through ``mapInPandas`` — is real and tested, and so is the image
decode path: :func:`parse_image_header` reads dimensions/format from the
actual PNG/JPEG/GIF byte structure (pure stdlib, public formats), and
:func:`decode_png_gray` fully decodes 8-bit non-interlaced grayscale PNGs
(zlib inflate + all five scanline filters) for pixel-level features. Codec
families that genuinely need external libraries (JPEG entropy decode, audio,
video) surface as NULL features with the header metadata still real.

At 100 TB, payloads dominate IO: keep them in their own parquet column so
metadata-only queries never read them (parquet column pruning), partition by
modality/date, and size ``spark.sql.files.maxPartitionBytes`` to a few
payloads per task. Feature extraction is ``mapInPandas`` (streamed Arrow
batches, bounded memory) — one pass, no shuffle.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MODALITIES = ["image", "audio", "video"]

#: Output schema of :func:`extract_features` (metadata + fake feature vector).
FEATURE_SCHEMA = (
    "doc_id bigint, modality string, n_bytes int, content_hash string, "
    "width int, height int, n_frames int, feature array<float>"
)


def to_blob_table(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Build a multimodal table from a text corpus: payload = utf-8 bytes.

    Stands in for real media ingestion; the schema (binary payload + typed
    metadata columns) is the contract downstream operators rely on.
    """
    blob = F.col(text_col).cast("binary")
    return df.select(
        F.col(id_col),
        F.element_at(
            F.array(*[F.lit(m) for m in MODALITIES]), (F.col(id_col) % 3 + 1).cast("int")
        ).alias("modality"),
        blob.alias("payload"),
        F.octet_length(blob).alias("n_bytes"),
        F.md5(blob).alias("content_hash"),
    )


def blob_metadata(blobs: DataFrame) -> DataFrame:
    """Metadata-only projection + deterministic pseudo-dimensions.

    Never touches ``payload`` (parquet column pruning keeps the scan tiny) —
    dimensions are derived from the content hash nibbles.
    """
    nib = lambda i: F.ascii(F.substring("content_hash", i, 1))  # noqa: E731
    return blobs.select(
        "doc_id",
        "modality",
        "n_bytes",
        "content_hash",
        (64 + (nib(1) % 16) * 8).alias("width"),
        (64 + (nib(2) % 16) * 8).alias("height"),
        (F.floor(F.col("n_bytes") / 100) + 1).cast("int").alias("n_frames"),
    )


# ---------------------------------------------------------------------------
# Real image decode (pure stdlib — public PNG/JPEG/GIF byte formats)
# ---------------------------------------------------------------------------


def parse_image_header(payload: bytes) -> tuple[str | None, int | None, int | None]:
    """``(format, width, height)`` from the actual image byte structure.

    - PNG: 8-byte signature, then the IHDR chunk — width/height are the two
      big-endian u32 at offsets 16/20 (PNG spec §11.2.2).
    - JPEG: SOI then a marker walk; dimensions live in the first SOFn frame
      header (C0–CF excluding DHT/DAC/RSTn markers C4/C8/CC) as big-endian
      u16 height, width (JPEG/JFIF spec B.2.2). Marker-length walking skips
      APPn/quant/huffman segments of any size.
    - GIF: ``GIF87a``/``GIF89a`` signature, logical-screen width/height as
      little-endian u16 at offsets 6/8.

    Returns ``(None, None, None)`` for unrecognized/truncated payloads —
    a corrupt blob must not fail the whole Arrow batch at scale.
    """
    b = bytes(payload)
    try:
        if b[:8] == b"\x89PNG\r\n\x1a\n" and b[12:16] == b"IHDR":
            w, h = struct.unpack(">II", b[16:24])
            return "png", w, h
        if b[:2] == b"\xff\xd8":  # JPEG SOI
            i = 2
            while i + 9 <= len(b):
                if b[i] != 0xFF:
                    i += 1
                    continue
                marker = b[i + 1]
                if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                    i += 2  # standalone markers carry no length
                    continue
                seg_len = struct.unpack(">H", b[i + 2 : i + 4])[0]
                if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                    h, w = struct.unpack(">HH", b[i + 5 : i + 9])
                    return "jpeg", w, h
                i += 2 + seg_len
            return "jpeg", None, None
        if b[:6] in (b"GIF87a", b"GIF89a"):
            w, h = struct.unpack("<HH", b[6:10])
            return "gif", w, h
    except (struct.error, IndexError):
        pass
    return None, None, None


def decode_png_gray(payload: bytes) -> "np.ndarray | None":
    """Full decode of an 8-bit non-interlaced grayscale PNG → 2-D uint8
    array, pure stdlib: walk chunks, inflate the concatenated IDAT stream,
    undo the per-scanline filter (all five types 0–4, PNG spec §9).

    Returns ``None`` for anything else (color/interlaced/16-bit PNGs would
    need only the same loop with a wider pixel stride; JPEG entropy decode
    genuinely needs a codec library and stays out of scope) — and for any
    CORRUPT payload: a valid signature with a truncated IHDR or bit-flipped
    IDAT must degrade to ``None``, never raise, because one bad blob would
    otherwise fail the whole Arrow batch and Spark task (the same contract
    :func:`parse_image_header` honors).
    """
    b = bytes(payload)
    if b[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    try:
        return _decode_png_gray_strict(b)
    except (zlib.error, struct.error, IndexError, ValueError):
        return None


def _decode_png_gray_strict(b: bytes) -> "np.ndarray | None":
    i, width, height, idat = 8, None, None, []
    while i + 8 <= len(b):
        (length,) = struct.unpack(">I", b[i : i + 4])
        typ = b[i + 4 : i + 8]
        data = b[i + 8 : i + 8 + length]
        if typ == b"IHDR":
            width, height, bit_depth, color_type, _, _, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if bit_depth != 8 or color_type != 0 or interlace != 0:
                return None
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
        i += 12 + length  # len + type + data + crc
    if width is None or not idat:
        return None
    raw = zlib.decompress(b"".join(idat))
    stride = width + 1  # one filter byte per scanline
    if len(raw) != stride * height:
        return None
    out = np.empty((height, width), dtype=np.uint8)
    prev = np.zeros(width, dtype=np.int32)
    for y in range(height):
        row = raw[y * stride : (y + 1) * stride]
        ftype, line = row[0], np.frombuffer(row, dtype=np.uint8, offset=1).astype(np.int32)
        if ftype == 0:  # None
            cur = line
        elif ftype == 2:  # Up
            cur = (line + prev) % 256
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth need a left-scan
            cur = np.empty(width, dtype=np.int32)
            left = 0
            for x in range(width):
                up = int(prev[x])
                if ftype == 1:
                    pred = left
                elif ftype == 3:
                    pred = (left + up) // 2
                else:  # Paeth
                    ul = int(prev[x - 1]) if x else 0
                    p = left + up - ul
                    pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                    pred = left if pa <= pb and pa <= pc else up if pb <= pc else ul
                left = (int(line[x]) + pred) % 256
                cur[x] = left
        else:
            return None
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out


def synthesize_image_blobs(
    df: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic REAL image payloads from an id column, via
    ``mapInPandas`` (the ingestion stand-in for x48's decode oracle).

    Even ids → a fully valid 8-bit grayscale PNG (signature, IHDR/IDAT/IEND
    with correct CRCs, zlib-compressed filter-0 scanlines, constant pixel
    value ``id % 251``); odd ids → a JPEG marker stream (SOI, JFIF APP0,
    SOF0 carrying the dimensions, EOI — header-complete; no entropy data,
    which dimension parsers never read). Dimensions are pure id arithmetic
    so an SQL oracle can recompute them: ``w = 16 + id % 48``,
    ``h = 16 + (id / 48) % 48``.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for did in pdf[id_col]:
                did = int(did)
                w, h = 16 + did % 48, 16 + (did // 48) % 48
                if did % 2 == 0:
                    payloads.append(_png_gray_const(w, h, did % 251))
                else:
                    payloads.append(_jpeg_header_stream(w, h))
            yield pd.DataFrame({id_col: pdf[id_col], "payload": payloads})

    return df.select(id_col).mapInPandas(gen, schema=f"{id_col} bigint, payload binary")


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def _png_gray_const(width: int, height: int, value: int) -> bytes:
    """Valid 8-bit grayscale PNG, every pixel = ``value`` (filter type 0)."""
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = (b"\x00" + bytes([value]) * width) * height
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def _jpeg_header_stream(width: int, height: int) -> bytes:
    """Structurally valid JPEG marker stream up to SOF0 (no entropy data)."""
    app0 = (
        b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
        + struct.pack(">HH", 1, 1) + b"\x00\x00"
    )
    sof0 = (
        b"\xff\xc0" + struct.pack(">H", 11) + b"\x08"
        + struct.pack(">HH", height, width) + b"\x01\x01\x11\x00"
    )
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


#: Output schema of :func:`decode_image_metadata`.
DECODE_SCHEMA = (
    "doc_id bigint, format string, width int, height int, "
    "px_mean double, px_min int, px_max int"
)


def decode_image_metadata(blobs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Real decode over binary payloads: format + dimensions from the byte
    structure for PNG/JPEG/GIF, plus pixel statistics where the full decode
    path applies (grayscale PNG). One ``mapInPandas`` pass, no shuffle;
    unrecognized payloads yield NULL metadata instead of failing the batch.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            fmts, ws, hs, means, mins, maxs = [], [], [], [], [], []
            for payload in pdf["payload"]:
                fmt, w, h = parse_image_header(payload)
                fmts.append(fmt), ws.append(w), hs.append(h)
                px = decode_png_gray(payload) if fmt == "png" else None
                if px is None:
                    means.append(None), mins.append(None), maxs.append(None)
                else:
                    means.append(float(px.mean()))
                    mins.append(int(px.min())), maxs.append(int(px.max()))
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "format": fmts,
                    "width": pd.array(ws, dtype="Int32"),
                    "height": pd.array(hs, dtype="Int32"),
                    "px_mean": pd.array(means, dtype="float64"),
                    "px_min": pd.array(mins, dtype="Int32"),
                    "px_max": pd.array(maxs, dtype="Int32"),
                }
            )

    return blobs.mapInPandas(decode, schema=DECODE_SCHEMA)


def extract_features(
    blobs: DataFrame, feature_dim: int = 8, real_decode: bool = False
) -> DataFrame:
    """Decode payloads and emit per-item features via ``mapInPandas``.

    ``real_decode=False`` (the x12 oracle shape) derives deterministic
    features from the payload digest. ``real_decode=True`` parses the actual
    image bytes: width/height from the PNG/JPEG/GIF header, pixel-stat
    features (mean, std, min, max, … padded) from the full grayscale-PNG
    decode, NULL feature for codec families needing external libraries.
    Batch shape: streams Arrow batches, never materializes the partition.
    """
    if real_decode:

        def real_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                ws, hs, frames, feats = [], [], [], []
                for payload in pdf["payload"]:
                    fmt, w, h = parse_image_header(payload)
                    ws.append(w), hs.append(h), frames.append(1 if fmt else None)
                    px = decode_png_gray(payload) if fmt == "png" else None
                    if px is None:
                        feats.append(None)
                    else:
                        base = [
                            px.mean() / 255.0,
                            px.std() / 255.0,
                            px.min() / 255.0,
                            px.max() / 255.0,
                        ]
                        feats.append(
                            [round(float(v), 6) for v in base[:feature_dim]]
                            + [0.0] * max(0, feature_dim - len(base))
                        )
                yield pd.DataFrame(
                    {
                        "doc_id": pdf["doc_id"],
                        "modality": pdf["modality"],
                        "n_bytes": pdf["n_bytes"],
                        "content_hash": pdf["content_hash"],
                        "width": pd.array(ws, dtype="Int32"),
                        "height": pd.array(hs, dtype="Int32"),
                        "n_frames": pd.array(frames, dtype="Int32"),
                        "feature": feats,
                    }
                )

        return blobs.mapInPandas(real_batches, schema=FEATURE_SCHEMA)

    def feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, dims = [], []
            for payload in pdf["payload"]:
                digest = hashlib.sha256(bytes(payload)).digest()
                feats.append(
                    [round(b / 255.0, 6) for b in digest[:feature_dim]]
                )
                dims.append((64 + digest[0] % 16 * 8, 64 + digest[1] % 16 * 8))
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": pdf["modality"],
                    "n_bytes": pdf["n_bytes"],
                    "content_hash": pdf["content_hash"],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "n_frames": (pdf["n_bytes"] // 100 + 1).astype("int32"),
                    "feature": feats,
                }
            )
            yield out

    return blobs.mapInPandas(feature_batches, schema=FEATURE_SCHEMA)
