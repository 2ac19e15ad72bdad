"""32x candidate-pair study for the SRP occupancy cap (round 11).

Extends the round-11 SRP-rule addendum (BASELINE.md): at the 32x
amplified embeddings (64,000 vectors, study_amplified_audit's
deterministic per-(copy, dim) md5 shift) the FIXED 6-bit width
measured 76.6M distinct delta-vs-corpus candidate pairs and the
scaled rule's bits(64000)=10 measured 18.1M — a 4.2x cut where
uniform occupancy predicts 16x, because the vectors cluster in sign
space and heavy buckets dominate sum(occ_delta x occ_corpus). This
script measures the missing half: the RELATIVE occupancy cap
(dedup_semantic_srp_capped's SRP_CAP_FACTOR x ceil(n / 2^bits),
re-hash heavy buckets with SRP_CAP_SPLIT_BITS extra hyperplanes of
the same family) applied at both widths, so BASELINE.md can record
whether bit-width + heavy-hitter splitting together restore the
near-uniform candidate budget.

Pure NumPy replication of the exact plan arithmetic (same md5 sign
family, same 1e6 fixed-point quantization, same relative cap) —
candidate COUNTS only, no verify stage; wall-clock for the verify is
proportional to these counts, which is the point.

Usage: python scripts/study_srp_cap_32x.py [sf_dir] [k] [config-filter]
Writes a markdown table to stdout (rows print as they complete, so
killed runs keep partial evidence); paste into BASELINE.md. The
optional third arg substring-filters config labels (e.g. "scaled")
so a long config can be re-run without repeating the cheap ones.
"""

from __future__ import annotations

import hashlib
import math
import os
import sys

import numpy as np
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gcd_etl_spark.plans.dedup import (  # noqa: E402
    DELTA_MOD,
    SRP_BITS,
    SRP_CAP_FACTOR,
    SRP_CAP_SPLIT_BITS,
    SRP_SCALED_TABLES,
    SRP_TABLES,
    _srp_scaled_bits,
    _srp_signs,
)


def amplified_embeddings(sf_dir: str, k: int) -> tuple[np.ndarray, np.ndarray]:
    """(vec_id, float32 matrix) after study_amplified_audit's
    amplification: copy i shifts vec_id by i * span10(max_id) and
    every dimension j by md5-derived uniform(-4, 4) per (copy, dim),
    computed in float64 then cast to float32 — the same value path
    as the Spark expression."""
    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    vid = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
    emb = np.asarray(t["embedding"].to_pylist(), dtype=np.float32)
    span = 10 ** (len(str(int(vid.max()))) + 1)
    ids, mats = [vid], [emb]
    for i in range(1, k):
        shift = np.asarray(
            [
                int(hashlib.md5(f"{i}:{j}".encode()).hexdigest()[:4], 16)
                / 65535.0
                * 8.0
                - 4.0
                for j in range(emb.shape[1])
            ],
            dtype=np.float64,
        )
        ids.append(vid + i * span)
        mats.append((emb.astype(np.float64) + shift).astype(np.float32))
    return np.concatenate(ids), np.vstack(mats)


def delta_corpus_candidates(
    vid: np.ndarray, qv: np.ndarray, bits: int, n_tables: int, cap: int | None
) -> tuple[int, int]:
    """(distinct delta-vs-corpus candidate pairs, buckets split).

    cap=None reproduces the uncapped keying; otherwise a corpus-side
    (t, low-bits bucket) with occupancy > cap keys on the full
    (bits + SRP_CAP_SPLIT_BITS)-bit bucket — the plan's probe-both
    convention collapses to "heavy buckets require all wide bits to
    match", which is what is counted here."""
    wide_bits = bits + (SRP_CAP_SPLIT_BITS if cap is not None else 0)
    base = 1 << bits
    is_delta = vid % DELTA_MOD == 0
    pair_sets: list[np.ndarray] = []
    n_split = 0
    for tab in range(n_tables):
        signs = np.asarray(
            [_srp_signs(tab, j) for j in range(wide_bits)], dtype=np.int64
        ).T
        wide = ((qv @ signs) >= 0) @ (1 << np.arange(wide_bits, dtype=np.int64))
        bk = wide & (base - 1)
        if cap is None:
            key = bk
        else:
            occ = np.bincount(bk[~is_delta], minlength=base)
            heavy = occ[bk] > cap
            n_split += int((occ > cap).sum())
            key = np.where(heavy, wide + base, bk)
        order = np.argsort(key, kind="stable")
        ks, ds, vs = key[order], is_delta[order], vid[order]
        bounds = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1], True])
        chunks = []
        for s, e in zip(bounds[:-1], bounds[1:]):
            dl, co = vs[s:e][ds[s:e]], vs[s:e][~ds[s:e]]
            if len(dl) and len(co):
                chunks.append(
                    (dl.astype(np.int64)[:, None] * (1 << 32)
                     + co.astype(np.int64)[None, :]).ravel()
                )
        if chunks:
            pair_sets.append(np.unique(np.concatenate(chunks)))
    if not pair_sets:
        return 0, n_split
    return int(np.unique(np.concatenate(pair_sets)).size), n_split


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    only = sys.argv[3] if len(sys.argv) > 3 else ""
    vid, emb = amplified_embeddings(sf_dir, k)
    qv = np.floor(emb.astype(np.float64) * 1_000_000 + 0.5).astype(np.int64)
    n = len(vid)
    n_corpus = int((vid % DELTA_MOD != 0).sum())
    sbits = _srp_scaled_bits(n)
    # Scaled rows hold tables at the ANCHOR's 8 to isolate the width
    # and cap effects — the same control as the round-11 addendum
    # measurement. The recall-preserving table count at this width
    # (SRP_SCALED_TABLES[sbits], 230 at bits=12) is an artifact of
    # the fixture's LOW 0.40 accept bar (p^bits collapses); at a
    # production 0.9+ near-dup bar T stays single-digit, and
    # enumerating 230 tables' candidates measures the bar, not the
    # keying.
    stables = SRP_TABLES
    print(
        f"n={n} (corpus {n_corpus}), scaled bits={sbits}, tables held at "
        f"{stables} (recall-preserving T at this width/bar would be "
        f"{SRP_SCALED_TABLES[sbits]})\n"
    )
    print("| config | bits | tables | cap | split buckets | candidate pairs |")
    print("|---|---|---|---|---|---|")
    for label, bits, tabs, capped in [
        ("fixed width (anchor)", SRP_BITS, SRP_TABLES, False),
        ("fixed width + cap", SRP_BITS, SRP_TABLES, True),
        ("scaled width", sbits, stables, False),
        ("scaled width + cap", sbits, stables, True),
    ]:
        if only and only not in label:
            continue
        cap = (
            SRP_CAP_FACTOR * math.ceil(n_corpus / (1 << bits)) if capped else None
        )
        pairs, nsplit = delta_corpus_candidates(vid, qv, bits, tabs, cap)
        print(
            f"| {label} | {bits} | {tabs} | {cap if cap else '—'} "
            f"| {nsplit if capped else '—'} | {pairs:,} |"
        )


if __name__ == "__main__":
    main()
