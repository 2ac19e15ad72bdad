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
