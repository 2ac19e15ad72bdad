"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` columns plus a typed metadata
struct; the heavy per-item work (decode, resize, feature extraction,
frame sampling) runs as Arrow-batched ``mapInPandas`` stages so a 100
TB corpus streams through executors batch-by-batch with no
driver-side involvement and no row-at-a-time Python overhead.

The actual codec layer (PIL/ffmpeg/torchaudio) is NOT available in
this environment, so the decode kernels are stubbed behind
``_HAVE_CODECS`` with a deterministic fake that exercises the real
plumbing: schema contracts, batch iteration, partition-preserving
flow. Swap ``_fake_decode_meta`` for a real decoder and nothing else
changes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # real codecs are not in this image; gate behind import-try
    import PIL.Image  # type: ignore  # noqa: F401

    _HAVE_CODECS = True
except ImportError:
    _HAVE_CODECS = False

#: Schema of the decoded-media metadata struct.
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("sha256", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("format", T.StringType(), True),
    ]
)


def attach_binary_payload(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Synthesize an opaque binary media column from a text column.

    Stands in for reading real image bytes; gives every fixture row a
    deterministic ``payload: binary`` to drive the pipeline with.
    """
    return df.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
    )


def _fake_decode_meta(media_id: int, payload: bytes) -> dict:
    """Deterministic stand-in for an image decoder.

    Derives plausible (width, height, format) from the payload hash so
    tests are stable. A real deployment replaces only this function.
    """
    digest = hashlib.sha256(payload or b"").hexdigest()
    h = int(digest[:8], 16)
    return {
        "media_id": media_id,
        "n_bytes": len(payload or b""),
        "sha256": digest,
        "width": 64 + (h % 1920),
        "height": 64 + ((h >> 8) % 1080),
        "format": ["jpeg", "png", "webp"][h % 3],
    }


def decode_media_meta(df: DataFrame, payload_col: str = "payload", id_col: str = "media_id") -> DataFrame:
    """Decode stage: binary -> metadata struct columns via mapInPandas.

    Batch contract: each Arrow batch arrives as a pandas DataFrame;
    we emit one row per input row. With real codecs this is where
    PIL/ffmpeg runs; the fake keeps the identical dataflow.

    The real-codec branch is gated HERE, at plan-build time: if codecs
    are importable but no real decoder has been wired in, the plan
    refuses to build immediately instead of detonating inside the
    Arrow iterator halfway through a 100 TB scan (round-2 verdict).
    Swap-in point: replace ``_fake_decode_meta`` with a real decoder
    and delete the guard below.
    """
    if _HAVE_CODECS:
        raise NotImplementedError(
            "media codecs are importable in this environment, but no real "
            "decoder is wired into decode_media_meta; replace "
            "_fake_decode_meta (operators/multimodal.py) with a codec-backed "
            "implementation before building this plan"
        )

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                _fake_decode_meta(mid, payload)
                for mid, payload in zip(pdf[id_col], pdf[payload_col])
            ]
            yield pd.DataFrame(rows)

    return df.mapInPandas(_decode, schema=MEDIA_META_SCHEMA)


# --------------------------- real container formats (round 11)
# The decode layer stops being 100% stub here: WAV, BMP and PPM are
# simple enough containers that a correct header parser needs only
# struct.unpack — no PIL/ffmpeg. The fixture SYNTHESIZES spec-valid
# files (real RIFF chunk layout, real BITMAPINFOHEADER, real P6
# header) and the parse stage reads metadata back OUT OF THE BYTES;
# the registered oracle recomputes the expected fields from the ids
# alone, so any misread offset/endianness/padding rule breaks the
# value hash. Formats beyond these three still hit the explicit
# guard in decode_media_meta.


def synthesize_media_file(media_id: int) -> bytes:
    """A spec-valid media file for this id: WAV (PCM, RIFF chunks),
    BMP (BITMAPFILEHEADER + BITMAPINFOHEADER, 24bpp, 4-byte row
    padding) or P6 PPM, rotating by ``media_id % 3``. All geometry
    derives from the id so the oracle can restate it in SQL."""
    import struct

    fmt = media_id % 3
    if fmt == 0:  # WAV: 16-bit PCM
        channels = 1 + (media_id % 2)
        sample_rate = 8000 * (1 + media_id % 5)
        n_samples = 100 + (media_id % 900)
        block_align = channels * 2
        data = bytes(n_samples * block_align)
        hdr = (
            b"RIFF"
            + struct.pack("<I", 36 + len(data))
            + b"WAVE"
            + b"fmt "
            + struct.pack(
                "<IHHIIHH",
                16, 1, channels, sample_rate,
                sample_rate * block_align, block_align, 16,
            )
            + b"data"
            + struct.pack("<I", len(data))
        )
        return hdr + data
    if fmt == 1:  # BMP: 24bpp bottom-up
        width = 1 + (media_id % 64)
        height = 1 + (media_id % 48)
        row = (width * 3 + 3) // 4 * 4  # rows pad to 4 bytes
        data = bytes(row * height)
        hdr = (
            b"BM"
            + struct.pack("<IHHI", 54 + len(data), 0, 0, 54)
            + struct.pack(
                "<IiiHHIIiiII",
                40, width, height, 1, 24, 0, len(data), 2835, 2835, 0, 0,
            )
        )
        return hdr + data
    # PPM: P6, ascii header then raw RGB
    width = 1 + (media_id % 32)
    height = 1 + (media_id % 24)
    return f"P6\n{width} {height}\n255\n".encode() + bytes(width * height * 3)


def parse_media_header(payload: bytes) -> dict:
    """Parse REAL container headers out of raw bytes: RIFF/WAVE chunk
    walk (fmt + data chunks located by iteration, not fixed offsets —
    files with extra chunks parse correctly), BITMAPINFOHEADER
    (signed height: negative means top-down, dimensions reported as
    magnitudes), and the P6 ascii header (whitespace per spec).
    Unknown magic -> format 'unknown' with null fields, never a
    throw (a 100 TB scan must quarantine, not die)."""
    import struct

    out = {
        "format": "unknown",
        "width": None,
        "height": None,
        "channels": None,
        "sample_rate": None,
        "n_samples": None,
    }
    if payload is None:
        return out
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        out["format"] = "wav"
        pos, block_align = 12, None
        while pos + 8 <= len(payload):
            cid = payload[pos : pos + 4]
            (csize,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
            body = payload[pos + 8 : pos + 8 + csize]
            if cid == b"fmt " and csize >= 16:
                (_af, ch, sr, _br, ba, _bits) = struct.unpack("<HHIIHH", body[:16])
                out["channels"], out["sample_rate"] = ch, sr
                block_align = ba
            elif cid == b"data" and block_align:
                out["n_samples"] = csize // block_align
            pos += 8 + csize + (csize % 2)  # RIFF chunks pad to even
        return out
    if payload[:2] == b"BM" and len(payload) >= 26:
        out["format"] = "bmp"
        w, h = struct.unpack("<ii", payload[18:26])
        out["width"], out["height"] = abs(w), abs(h)
        return out
    if payload[:2] == b"P6":
        out["format"] = "ppm"
        fields, pos = [], 2
        while len(fields) < 3 and pos < len(payload):
            while pos < len(payload) and payload[pos : pos + 1].isspace():
                pos += 1
            if payload[pos : pos + 1] == b"#":  # comment line
                while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                    pos += 1
                continue
            start = pos
            while pos < len(payload) and not payload[pos : pos + 1].isspace():
                pos += 1
            fields.append(int(payload[start:pos]))
        if len(fields) == 3:
            out["width"], out["height"] = fields[0], fields[1]
        return out
    return out


#: Schema of the real-parse metadata output.
MEDIA_PARSE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("format", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_samples", T.IntegerType(), True),
        T.StructField("n_bytes", T.IntegerType(), True),
    ]
)


def synthesize_media_files(df: DataFrame, id_col: str = "media_id") -> DataFrame:
    """(id) -> (id, payload: binary) with REAL container bytes, Arrow
    batched. In production this stage is the object-store fetch; here
    it manufactures the fixture the parse stage must survive."""

    def _synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype("int64"),
                    "payload": [
                        synthesize_media_file(int(m)) for m in pdf[id_col]
                    ],
                }
            )

    return df.mapInPandas(
        _synth, schema="media_id long, payload binary"
    )


def parse_media_headers(
    df: DataFrame, payload_col: str = "payload", id_col: str = "media_id"
) -> DataFrame:
    """binary -> parsed metadata via mapInPandas over the REAL parser.
    One output row per input row; unknown formats degrade to null
    fields rather than failing the batch."""

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                r = parse_media_header(payload)
                r["media_id"] = int(mid)
                r["n_bytes"] = len(payload or b"")
                rows.append(r)
            yield pd.DataFrame(rows, columns=[f.name for f in MEDIA_PARSE_SCHEMA])

    return df.mapInPandas(_parse, schema=MEDIA_PARSE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_n: int = 10, payload_col: str = "payload", id_col: str = "media_id") -> DataFrame:
    """Frame-sampling stage shape: one input video -> N frame rows.

    The fake emits ``len(payload) // (100 * every_n) + 1`` pseudo
    frames per item; a real build calls the demuxer here. Demonstrates
    the 1:N mapInPandas fan-out contract (output rows != input rows).
    """
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("frame_sha", T.StringType(), True),
        ]
    )

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[dict] = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                payload = payload or b""
                n_frames = len(payload) // (100 * every_n) + 1
                for i in range(n_frames):
                    chunk = payload[i * 100 * every_n : (i + 1) * 100 * every_n]
                    out.append(
                        {
                            "media_id": mid,
                            "frame_idx": i,
                            "frame_sha": hashlib.sha256(chunk).hexdigest(),
                        }
                    )
            yield pd.DataFrame(out, columns=["media_id", "frame_idx", "frame_sha"])

    return df.mapInPandas(_sample, schema=out_schema)
