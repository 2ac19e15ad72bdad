"""Semantic tests for the round-5 curation/lakehouse/multimodal
operators (quality_repetition_ngrams, scan_zonemap_prune,
mm_image_tiles) beyond the differential gate in test_parity.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_repetition_counts_match_python_model(spark):
    """Recompute the duplicate-trigram-slot count driver-side for
    every doc at sf0.001."""
    from gcd_etl_spark.plans.quality import quality_repetition_ngrams
    from gcd_etl_spark.sources.catalog import read_table

    import re

    got = {r["doc_id"]: r for r in quality_repetition_ngrams(spark, SF_SMOKE).collect()}
    docs = read_table(spark, SF_SMOKE, "documents").select("doc_id", "text").collect()
    for d in docs:
        toks = [t for t in re.split(r"[^a-z0-9]+", d["text"].lower()) if t]
        if len(toks) < 3:
            assert d["doc_id"] not in got
            continue
        tris = [" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)]
        row = got[d["doc_id"]]
        assert row["n_tokens"] == len(toks)
        assert row["n_trigrams"] == len(tris)
        assert row["n_dup_slots"] == len(tris) - len(set(tris))
        assert row["dup_ppm"] == row["n_dup_slots"] * 1_000_000 // len(tris)


def test_zonemap_pruning_is_sound_and_complete(spark):
    """A pruned file must contain zero matching rows, and the
    surviving files' matches must total the full-scan answer."""
    from gcd_etl_spark.plans.lakehouse import (
        ZM_HI_CENTS,
        ZM_LO_CENTS,
        scan_zonemap_prune,
    )
    from gcd_etl_spark.sources.catalog import read_table

    rows = scan_zonemap_prune(spark, SF_SMOKE).collect()
    for r in rows:
        assert r["min_cents"] <= r["max_cents"]
        if r["pruned"]:
            assert r["n_matching"] == 0  # skipping never loses rows
    full = (
        read_table(spark, SF_SMOKE, "orders")
        .where(
            F.round(F.col("o_totalprice") * 100)
            .cast("long")
            .between(ZM_LO_CENTS, ZM_HI_CENTS)
        )
        .count()
    )
    assert sum(r["n_matching"] for r in rows) == full
    assert sum(r["n_rows"] for r in rows) == read_table(spark, SF_SMOKE, "orders").count()


def test_tiles_cover_each_image_exactly(spark):
    """Tile geometry: non-overlapping, clipped at edges, and the
    tile areas of each image sum to exactly width*height."""
    from gcd_etl_spark.operators import multimodal as M
    from gcd_etl_spark.plans.multimodal import TILE, mm_image_tiles
    from gcd_etl_spark.sources.catalog import read_table

    tiles = mm_image_tiles(spark, SF_SMOKE)
    docs = read_table(spark, SF_SMOKE, "documents")
    meta = {
        r["media_id"]: (r["width"], r["height"])
        for r in M.decode_media_meta(M.attach_binary_payload(docs))
        .select("media_id", "width", "height")
        .collect()
    }
    per_img: dict[int, int] = {}
    for t in tiles.collect():
        w, h = meta[t["media_id"]]
        assert 1 <= t["tile_w"] <= TILE and 1 <= t["tile_h"] <= TILE
        assert t["x0"] + t["tile_w"] <= w and t["y0"] + t["tile_h"] <= h
        assert t["x0"] % TILE == 0 and t["y0"] % TILE == 0
        per_img[t["media_id"]] = per_img.get(t["media_id"], 0) + t["tile_w"] * t["tile_h"]
    for mid, area in per_img.items():
        w, h = meta[mid]
        assert area == w * h, mid
    assert set(per_img) == set(meta)


def test_audio_frames_tile_the_sample_axis(spark):
    """Frames cover [0, n_samples) with AUDIO_HOP stride; the last
    frame is clipped; every media id appears."""
    from gcd_etl_spark.plans.multimodal import AUDIO_HOP, AUDIO_WIN, mm_audio_frames
    from gcd_etl_spark.sources.catalog import read_table

    rows = mm_audio_frames(spark, SF_SMOKE).collect()
    n_bytes = {
        r["doc_id"]: len(r["text"].encode())
        for r in read_table(spark, SF_SMOKE, "documents").select("doc_id", "text").collect()
    }
    per: dict[int, list] = {}
    for r in rows:
        per.setdefault(r["media_id"], []).append(r)
    assert set(per) == set(n_bytes)
    for mid, frames in per.items():
        n_samples = n_bytes[mid] * 256
        frames.sort(key=lambda r: r["frame_idx"])
        want = (
            (n_samples - AUDIO_WIN) // AUDIO_HOP + 1 if n_samples >= AUDIO_WIN else 1
        )
        assert len(frames) == want
        for f in frames:
            assert f["start_sample"] == f["frame_idx"] * AUDIO_HOP
            assert f["end_sample"] == min(f["start_sample"] + AUDIO_WIN, n_samples)
            assert f["sample_rate"] in (8000, 16000, 24000)
        # maximality: no further FULL window fits after the last frame
        # (standard framing drops a sub-hop tail; it never emits a
        # window that would start past n_samples - WIN)
        if n_samples >= AUDIO_WIN:
            assert frames[-1]["start_sample"] + AUDIO_HOP > n_samples - AUDIO_WIN
            assert frames[-1]["start_sample"] <= n_samples - AUDIO_WIN
