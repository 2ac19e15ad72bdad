"""Multimodal plumbing tests: binary columns, Arrow-batched decode,
1:N frame fan-out (stub codec — the dataflow is the subject)."""

from __future__ import annotations

import hashlib

from gcd_etl_spark.operators import multimodal as M
from gcd_etl_spark.sources.catalog import read_table


def test_payload_roundtrip(spark, sf_smoke):
    docs = read_table(spark, sf_smoke, "documents")
    payloads = M.attach_binary_payload(docs)
    row = payloads.join(docs, payloads.media_id == docs.doc_id).select("payload", "text").first()
    assert bytes(row["payload"]).decode("utf-8") == row["text"]


def test_decode_meta_contract(spark, sf_smoke):
    docs = read_table(spark, sf_smoke, "documents")
    out = M.decode_media_meta(M.attach_binary_payload(docs))
    assert [f.name for f in out.schema.fields] == [
        "media_id", "n_bytes", "sha256", "width", "height", "format",
    ]
    rows = out.collect()
    assert len(rows) == docs.count()  # 1:1 decode
    r = rows[0]
    assert r["n_bytes"] > 0 and len(r["sha256"]) == 64
    assert 64 <= r["width"] < 64 + 1920 and r["format"] in ("jpeg", "png", "webp")


def test_decode_meta_deterministic(spark):
    df = spark.createDataFrame([(1, "hello world")], schema="doc_id long, text string")
    out = M.decode_media_meta(M.attach_binary_payload(df)).first()
    expected = hashlib.sha256(b"hello world").hexdigest()
    assert out["sha256"] == expected


def test_frame_sample_fanout(spark, sf_smoke):
    docs = read_table(spark, sf_smoke, "documents").limit(50)
    payloads = M.attach_binary_payload(docs)
    frames = M.frame_sample_plan(payloads, every_n=2)
    rows = frames.collect()
    assert len(rows) > 50  # 1:N fan-out actually fans out
    by_media = {}
    for r in rows:
        by_media.setdefault(r["media_id"], []).append(r["frame_idx"])
    for idxs in by_media.values():
        assert sorted(idxs) == list(range(len(idxs)))  # dense frame indices
