"""Amplified-scale plan-shape audit (round-7 verdict item 5, round-8
item 4): run the most expensive registered queries at 1x/4x/8x the
sf0.1 inputs and record (a) wall-clock scaling exponent, (b) physical
plan shape at both ends — Exchange count, broadcast->SMJ flips,
whole-stage-codegen span count, AQE skew splits — so anything
super-linear or shape-shifting at scale is caught with a measurement,
not a guess.

Methodology: each input table the audit targets read is amplified by
writing k key-shifted copies to scratch parquet (one scratch dir per
k, shared by every query needing that table; untouched tables are
symlinked). Key shifts keep copies DISJOINT — the graph queries get k
disconnected subgraphs, the events stream gets k disjoint user
populations — so the intended workload scales linearly and any
super-linear wall growth is the PLAN's doing. Embedding vectors get a
large per-copy first-component shift so copies are not near-duplicates
(identical vectors would inflate candidate pairs by C(k,2) per vector
and make the workload itself quadratic); document texts get a per-copy
suffix token, which leaves them near-duplicates across copies —
deliberate: the dedup-clustering stress then includes components that
SPAN copies (bigger components, the hard case for star contraction).

gcd_snapshot_bucketed is audited separately by
scripts/study_bucketed_sweep.py (BASELINE.md round 8: fixed bucket
count is a parallelism cap; re-stage buckets as data grows).

Usage: python scripts/study_amplified_audit.py [sf_dir] [amps...]
           [--per-query] [--tier=lifecycle] [--json=PATH] [--runs=N]
Writes a markdown table to stdout; paste into BASELINE.md.

STANDING MODE (round-12 verdict item 5 — "make scale regressions as
mechanical as the bench floors"): ``--tier=lifecycle --json=PATH``
restricts the audit to the bench LIFECYCLE tier (bench.py's exact
name list) and emits ONE machine-readable JSON artifact:
per-query walls at each amp, the scaling exponent, plan-shape
features at both ends, and a ``flagged`` list of queries whose
exponent exceeds its recorded ceiling (EXP_CEILINGS — default 1.35 =
linear + noise margin; documented workload-superlinear rows carry
explicit higher ceilings with the reason inline). The round record
commits the artifact as AMPLIFIED_r{N}.json; a non-empty ``flagged``
is the audit failing, same semantics as the bench floor trigger.
``--runs=N`` forces one UNTIMED warmup + min-of-N at EVERY amp
(standing mode wants the steady-state probe at 8x too, not a first
run that folds one-time index staging into the wall — or a second
run paying that staging's GC aftermath).
"""

from __future__ import annotations

import json
import math
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from gcd_etl_spark.plans import QUERIES
from gcd_etl_spark.session import get_spark

#: query -> tables to amplify (everything else symlinks to base).
TARGETS = {
    "graph_link_prediction_capped": ["lineitem"],
    "graph_link_prediction_abscap": ["lineitem"],
    "entity_clusters": ["customer"],
    "entity_clusters_star": ["customer"],
    # dedup_clusters deliberately absent: it is the documented
    # all-pairs EXACT anchor, quadratic by construction — re-measuring
    # a known exponent costs ~20 min and informs nothing (its
    # sub-quadratic production twins are the LSH family and
    # dedup_keep_canonical, which IS audited via its components).
    "ml_naive_bayes_confusion": ["documents"],
    "dedup_semantic_srp_scaled": ["embeddings"],
    # dedup_semantic_srp_capped deliberately absent: like the fixed-
    # width anchor it wraps, its AGGREGATE candidate count is
    # ~n^2/2^bits by construction (the cap clips the heavy TAIL, the
    # width rule fixes the average) — an amplified wall audit would
    # re-measure the anchor's known exponent. Its scale evidence is
    # candidate-count based instead: scripts/study_srp_cap_32x.py
    # measures all four (width x cap) configs at 32x.
    "sim_ann_ivfsq8_recall": ["embeddings"],
    # since r10 this name is TRUE product quantization (trained coarse
    # cells + residual codebooks + ADC) — audit it separately from SQ8
    "sim_ann_ivfpq_recall": ["embeddings"],
    "stream_sessions_timeout": ["events"],
    # round-9 registrants whose scale posture is a claim until
    # measured (the suffix-token document amplification makes copies
    # near-duplicates ACROSS copies — deliberate stress for the
    # LSH/verify/components stages; crossdoc gram sharing also grows
    # with k, so expect these superlinear IN WORKLOAD and read the
    # plan-shape columns, not just the exponent)
    "dedup_keep_canonical": ["documents"],
    "dedup_crossdoc_spans": ["documents"],
    "dedup_span_excision": ["documents"],
    "pack_concat_split": ["documents"],
    "stream_dedup_against_corpus": ["documents"],
    # round-10 registrants: the incremental gram-DF path (delta probe
    # of the persisted index — expect ~flat in the probe, index build
    # is the amortized cost) and the zero-shuffle bucket compaction
    "dedup_crossdoc_delta": ["documents"],
    "dedup_index_compaction": ["documents"],
    "dedup_gram_index_update_cycle": ["documents"],
    "dedup_gram_index_merge": ["documents"],
    "sim_ann_ivfpq_index_append": ["embeddings"],
    "dedup_semantic_delta_vs_corpus": ["embeddings"],
    "stream_semantic_dedup_gate": ["embeddings"],
    # round-10 second wave: loader/analysis plans over documents.
    # sim_bitext_margin deliberately absent: like dedup_clusters it is
    # the guarded exact-scoring anchor (quadratic by construction,
    # refuses >10M pairs — 8x embeddings exceeds the guard by design);
    # its scale path is the IVF shortlist. The shortlist/persisted
    # forms are also absent: unlike the sim_ann_* recall queries
    # (whose exact denominator runs over a FIXED query set), their
    # in-plan recall gate re-runs the anchor over ALL sources, so an
    # amplified audit would measure the gate's quadratic denominator,
    # not the production candidate path (which shuffles only on the
    # cell key).
    "corpus_shuffle_shards": ["documents"],
    "quality_bigram_nll": ["documents"],
    "sample_temperature_mix": ["documents"],
    "stat_zipf_fit": ["documents"],
    "stat_heaps_fit": ["documents"],
    "corpus_shuffle_shards_write": ["documents"],
    "quality_bigram_nll_delta": ["documents"],
    "stream_quality_gate": ["documents"],
    "sample_negatives_hash": ["documents"],
    # round 11: the real container parse (two Arrow hops; expect
    # ~linear in docs with flat per-row cost — any superlinearity
    # would mean batch-boundary pathology in mapInPandas)
    "mm_decode_real_headers": ["documents"],
    # round 11: decontamination (bench side DISTINCT+broadcast, train
    # side doc-keyed aggs — suffix-token amplification grows the
    # benchmark gram set linearly too, so read plan shape, not just
    # exponent), the zero-shuffle split, and the curriculum staging
    # (score-keyed agg + tiny window + broadcast back)
    "corpus_curriculum_order": ["documents"],
    "mm_resize_letterbox": ["documents"],
    # round 11 (third session): DSIR importance resampling — anchor
    # (trains in-plan: expect ~linear in docs, model artifact fixed
    # at <= 512 rows) and the delta probe (frozen persisted model:
    # expect the probe ~flat like the other delta families)
    "corpus_dsir_weights": ["documents"],
    "corpus_dsir_delta": ["documents"],
    "stream_dsir_gate": ["documents"],
    # round 12: the CAPPED semantic lifecycle (the production default
    # — expect the delta probe to stay far under the uncapped
    # anchor's exp-1.35 wall; the 32x candidate-count study is
    # scripts/study_srp_cap_32x.py, this row adds the wall-clock view
    # of the registered composition itself)
    "dedup_semantic_delta_vs_corpus_capped": ["embeddings"],
    "stream_semantic_dedup_gate_capped": ["embeddings"],
    # round 12: the scale-runnable bitext gate (sampled anchor is
    # O(sample x |B|) — expect ~linear; its shortlist/persisted
    # siblings stay absent for the documented in-plan-anchor reason)
    "sim_bitext_margin_mined": ["embeddings"],
    # round 12: PNG/JPEG header decode (same two-Arrow-hop shape as
    # mm_decode_real_headers — expect ~linear, flat per-row cost)
    "mm_decode_real_headers_png_jpeg": ["documents"],
    # round 13: GIF/WebP header decode (same shape; GIF synthesis
    # includes a real LZW bit-packing loop per row — still flat
    # per-row cost, the frames are <=384 px by construction)
    "mm_decode_real_headers_gif_webp": ["documents"],
    # round 13 (standing lifecycle runner): the three bench-LIFECYCLE
    # rows the ad-hoc audits never covered — the MinHash-band delta
    # probe, the band-index APPEND cycle, and the PQ persisted probe
    # (same fixed-query-set denominator as the recall row, so the
    # amplified wall measures the probe path, not an in-plan anchor).
    "dedup_delta_vs_corpus": ["documents"],
    "dedup_index_append_cycle": ["documents"],
    "sim_ann_ivfpq_persisted": ["embeddings"],
}

#: Mechanical exponent gate for the STANDING lifecycle audit: wall
#: exponent (log(w_hi/w_lo)/log(hi/lo), min-of-N walls) above the
#: ceiling -> the query lands in the JSON's ``flagged`` list. Default
#: ceiling 1.35 = linear workload + measurement margin (the bench
#: floor-trigger analog). Rows whose AMPLIFIED WORKLOAD is documented
#: superlinear (suffix-token amplification makes document copies
#: near-duplicates ACROSS copies, so cross-copy gram/band sharing
#: grows with k — see the TARGETS comments) carry explicit ceilings:
#: for them the gate still catches a plan-shape regression (their
#: recorded exps sit well under these), it just doesn't re-litigate
#: the fixture's geometry every round.
EXP_CEILING_DEFAULT = 1.35
#: Absolute slack on the gate: a row is flagged only when its high-amp
#: wall exceeds w_lo * (hi/lo)^ceiling by MORE than this many seconds
#: (bench FLOOR_MIN_BASE_SEC's analog — a 0.5 s probe "doubling" at 8x
#: is scheduler/JVM noise, not a plan regression; real superlinearity
#: on tier-sized rows clears 1 s immediately).
EXP_EXCESS_SLACK_S = 1.0
EXP_CEILINGS = {
    # cross-copy near-dup components span copies by construction
    "dedup_keep_canonical": 1.8,
    "dedup_crossdoc_spans": 1.8,
    "dedup_span_excision": 1.8,
    "dedup_crossdoc_delta": 1.8,
    "stream_dedup_against_corpus": 1.8,
    "dedup_delta_vs_corpus": 1.8,
    "dedup_index_append_cycle": 1.8,
}

ALL_TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

#: key columns to shift per amplified copy, per table. Shifts are
#: multiples of a power of 10 above the column span so id arithmetic
#: (% residues) inside plans keeps behaving like the base data.
_SHIFT_COLS = {
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "customer": ["c_custkey"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "events": ["event_id", "user_id"],
}


def _span10(v: int) -> int:
    """Smallest power of 10 strictly above v (keeps % residues)."""
    return 10 ** (len(str(max(int(v), 1))) + 1)


def amplify_table(spark, base_path: str, table: str, k: int, out_path: str) -> None:
    df = spark.read.parquet(base_path)
    if k == 1:
        df.write.mode("overwrite").parquet(out_path)
        return
    cols = _SHIFT_COLS[table]
    spans = {
        c: _span10(df.agg(F.max(F.col(c))).collect()[0][0] or 1) for c in cols
    }
    parts = []
    for i in range(k):
        part = df
        for c in cols:
            part = part.withColumn(c, F.col(c) + F.lit(i * spans[c]))
        if table == "embeddings" and i > 0:
            # Per-copy shift in EVERY dimension (deterministic md5-
            # derived +/-4.0 per (copy, dim)) so copies are spread in
            # all directions. The first revision shifted only
            # component 0 — all copies then lay on a LINE, and every
            # SRP hyperplane with small weight on dim 0 saw all k
            # copies collide into the same buckets: candidate pairs
            # grew ~k^2 and dedup_semantic_srp_scaled measured exp
            # 1.68 that was the FIXTURE's geometry, not the plan's.
            part = part.withColumn(
                "embedding",
                F.transform(
                    "embedding",
                    lambda v, j: (
                        v
                        + (
                            F.conv(
                                F.substring(
                                    F.md5(
                                        F.concat_ws(
                                            ":", F.lit(str(i)), j.cast("string")
                                        )
                                    ),
                                    1,
                                    4,
                                ),
                                16,
                                10,
                            ).cast("double")
                            / F.lit(65535.0)
                            * F.lit(8.0)
                            - F.lit(4.0)
                        )
                    ).cast("float"),
                ),
            )
        if table == "documents" and i > 0:
            part = part.withColumn("text", F.concat(F.col("text"), F.lit(f" amp{i}")))
        if table == "customer" and i > 0:
            # entity resolution matches on NAME (edit distance <= 1),
            # not id — identical names across copies would make the
            # intended workload quadratic (C(k,2) cross-copy pairs per
            # name). A per-copy 4-char suffix differing in 3 positions
            # keeps within-copy distances intact (shared suffix) and
            # puts cross-copy pairs at distance >= 3: disjoint.
            part = part.withColumn(
                "c_name", F.concat(F.col("c_name"), F.lit(f" q{str(i) * 3}"))
            )
        parts.append(part)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.write.mode("overwrite").parquet(out_path)


def stage_dir(spark, sf_dir: str, k: int, scratch_root: str) -> str:
    """Scratch sf-dir with amplified copies of the audited tables and
    symlinks for the rest. Idempotent per (sf, k) — the sf tag is part
    of the dir name AND every reused amplified table is row-count
    verified against k x base. (The first round-9 audit run was
    invalidated by exactly this: a k{k}-only dir name let a stale
    sf0.01-staged 1x dir satisfy an sf0.1 audit, so the "1x -> 4x"
    step was really 40x and every exponent came out inflated.)"""
    need = sorted({t for ts in TARGETS.values() for t in ts})
    sftag = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
    d = os.path.join(scratch_root, f"amp_audit_{sftag}_k{k}")
    os.makedirs(d, exist_ok=True)
    for t in ALL_TABLES:
        src = os.path.join(sf_dir, f"{t}.parquet")
        dst = os.path.join(d, f"{t}.parquet")
        if t in need:
            if not os.path.exists(os.path.join(dst, "_SUCCESS")):
                amplify_table(spark, src, t, k, dst)
            n_base = spark.read.parquet(src).count()
            n_amp = spark.read.parquet(dst).count()
            if n_amp != k * n_base:
                raise AssertionError(
                    f"staged {dst} has {n_amp} rows, want {k}x{n_base}"
                )
        elif not os.path.exists(dst):
            os.symlink(src, dst)
    return d


def write_artifact(
    json_path: str,
    sf_dir: str,
    amps: list[int],
    runs,
    tier: str,
    records: dict,
    failed: dict,
) -> dict:
    """The ONE artifact writer (parent merge and child frag share it —
    a field added to one cannot silently diverge the other)."""
    out = {
        "sf_dir": sf_dir, "amps": amps, "runs": runs, "tier": tier,
        "queries": records, "failed": failed,
        "flagged": sorted(
            n for n, rec in records.items() if is_flagged(rec, amps)
        ),
    }
    with open(json_path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    return out


def is_flagged(rec: dict, amps: list[int]) -> bool:
    """Mechanical gate: exponent over ceiling AND wall excess over the
    absolute slack (see EXP_EXCESS_SLACK_S)."""
    lo, hi = amps[0], amps[-1]
    w_lo = rec["walls"][str(lo)]
    w_hi = rec["walls"][str(hi)]
    expected_hi = w_lo * (hi / lo) ** rec["ceiling"]
    return rec["exp"] > rec["ceiling"] and (
        w_hi - expected_hi > EXP_EXCESS_SLACK_S
    )


_PLAN_MARKS = (
    ("exchanges", "Exchange"),
    ("bhj", "BroadcastHashJoin"),
    ("smj", "SortMergeJoin"),
    ("skew", "isSkew=true"),
    ("aqeread", "AQEShuffleRead"),
)


def plan_features(df) -> dict[str, int]:
    s = df._jdf.queryExecution().executedPlan().toString()
    out = {k: s.count(m) for k, m in _PLAN_MARKS}
    # executedPlan toString renders codegen spans as "*(n) Op" line
    # prefixes — count DISTINCT span ids, not prefixed lines.
    out["wsc"] = len(set(re.findall(r"\*\((\d+)\)", s)))
    return out


def run_one(
    spark, name: str, d: str, runs: int, warmup: bool = False
) -> tuple[float, dict, list[float]]:
    """min wall + plan features + all timed walls. ``warmup`` runs one
    UNTIMED execution first — standing mode needs it: one-time index
    staging (Lloyd/PQ training, bucketed writes) lands in run 1 and
    its JVM aftermath (GC of the collected training set) measurably
    bleeds into run 2, so min-of-2 alone reported a 4x-inflated 1x
    wall for the persisted-index rows (observed: ivfpq_recall 32.8 s
    min-of-2-with-staging vs 7.3 s steady state on the same dir)."""
    q = QUERIES[name]
    if warmup:
        q.build(spark, d).write.format("noop").mode("overwrite").save()
    best, feats, walls = float("inf"), {}, []
    for _ in range(runs):
        t0 = time.perf_counter()
        df = q.build(spark, d)
        df.write.format("noop").mode("overwrite").save()
        walls.append(round(time.perf_counter() - t0, 2))
        best = min(best, walls[-1])
        try:
            feats = plan_features(df)
        except Exception:  # noqa: BLE001 — streaming results have no plan
            feats = {}
    return best, feats, walls


def main() -> None:
    argv = sys.argv[1:]
    per_query = "--per-query" in argv
    if per_query:
        argv.remove("--per-query")
    tier, json_path, forced_runs = "all", None, None
    passthrough = []
    for a in list(argv):
        if a.startswith("--tier="):
            tier = a.split("=", 1)[1]
            argv.remove(a)
            passthrough.append(a)
        elif a.startswith("--json="):
            json_path = a.split("=", 1)[1]
            argv.remove(a)
        elif a.startswith("--runs="):
            forced_runs = int(a.split("=", 1)[1])
            argv.remove(a)
            passthrough.append(a)
    if tier not in ("all", "lifecycle"):
        print(f"unknown --tier={tier}; use all|lifecycle", file=sys.stderr)
        sys.exit(2)
    if tier == "lifecycle":
        # the bench tier's exact name list: the standing audit and the
        # bench floor gate cover the same surface by construction.
        from bench import LIFECYCLE

        missing = [n for n in LIFECYCLE if n not in TARGETS]
        if missing:  # fail loud: a tier addition must extend TARGETS
            raise RuntimeError(f"LIFECYCLE rows without audit targets: {missing}")
        for k in [t for t in TARGETS if t not in LIFECYCLE]:
            del TARGETS[k]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.1"
    amps = [int(a) for a in argv[1:]] or [1, 4, 8]
    if per_query and not os.environ.get("GCD_AUDIT_ONLY"):
        # One fresh JVM per query: the shared-JVM form let block-
        # manager/GC state from earlier queries inflate later walls
        # (measured: capped linkpred 189 s shared vs 72.6 s fresh on
        # identical inputs). Staging happens in the first child and is
        # reused (row-count-verified) by the rest.
        import subprocess

        frag_dir = f"{json_path}.frags" if json_path else None
        if frag_dir:
            # Clear stale fragments: a previous run's frag (possibly
            # at different amps) must not be merged as this run's data
            # when a child fails before writing its own (round-13
            # review finding — a stale [1,4] frag under a [1,8] merge
            # KeyErrors the whole audit at the final step).
            import shutil

            shutil.rmtree(frag_dir, ignore_errors=True)
            os.makedirs(frag_dir)
        failed = {}
        for name in TARGETS:
            # 32 local threads share ONE heap here; a cluster gives
            # every executor its own. Default the audit JVM to 32g so
            # an 8x fixture measures the PLAN, not local-heap
            # endurance (the capped-linkpred 8x wedge aggregate OOMs
            # a shared 8g heap) — still overridable from outside.
            env = dict(os.environ, GCD_AUDIT_ONLY=name)
            env.setdefault("SPARK_GRAFT_DRIVER_MEM", "32g")
            child = [sys.executable, os.path.abspath(__file__), sf_dir]
            child += [str(a) for a in amps] + passthrough
            if frag_dir:
                child.append(f"--json={os.path.join(frag_dir, name + '.json')}")
            r = subprocess.run(child, env=env)
            if r.returncode != 0:
                print(f"| {name} | FAILED (rc={r.returncode}) |", flush=True)
                failed[name] = r.returncode
        if json_path:
            records: dict = {}
            for name in TARGETS:
                frag = os.path.join(frag_dir, name + ".json")
                if os.path.exists(frag):
                    with open(frag) as fh:
                        records.update(json.load(fh)["queries"])
            merged = write_artifact(
                json_path, sf_dir, amps, forced_runs or "2@lo/1@hi",
                tier, records, failed,
            )
            print(f"wrote {json_path}; flagged={merged['flagged']}; "
                  f"failed={sorted(failed)}", file=sys.stderr, flush=True)
            if failed or merged["flagged"]:
                # the gate FAILING must reach exit status — a consumer
                # keying on rc (bench --tier=amplified, CI) must not
                # see success for an audit that lost rows or flagged
                # a superlinear query (round-13 review finding)
                sys.exit(1)
        return
    only = os.environ.get("GCD_AUDIT_ONLY")
    if only:  # re-measure a subset (comma-separated) without re-running all
        keep = set(only.split(","))
        for k in [t for t in TARGETS if t not in keep]:
            del TARGETS[k]
    spark = get_spark("amp_audit")
    scratch = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "spark-warehouse",
    )
    dirs = {k: stage_dir(spark, sf_dir, k, scratch) for k in amps}
    print(f"| query | " + " | ".join(f"{k}x" for k in amps)
          + " | exp | plan 1x -> max (exch/bhj/smj/wsc/skew) |")
    print("|---|" + "---|" * (len(amps) + 2))
    records = {}
    for name in TARGETS:
        walls, flo, fhi, all_walls = {}, {}, {}, {}
        for k in amps:
            runs = forced_runs or (2 if k == amps[0] else 1)
            print(f"## running {name} @ {k}x", file=sys.stderr, flush=True)
            walls[k], feats, all_walls[k] = run_one(
                spark, name, dirs[k], runs, warmup=forced_runs is not None
            )
            if k == amps[0]:
                flo = feats
            fhi = feats
        lo, hi = amps[0], amps[-1]
        exp = (
            math.log(walls[hi] / walls[lo]) / math.log(hi / lo)
            if walls[lo] > 0 else float("nan")
        )
        def fs(f):
            return (f"{f.get('exchanges','-')}/{f.get('bhj','-')}/"
                    f"{f.get('smj','-')}/{f.get('wsc','-')}/{f.get('skew','-')}"
                    if f else "n/a")
        print(f"| {name} | "
              + " | ".join(f"{walls[k]:.1f}" for k in amps)
              + f" | {exp:.2f} | {fs(flo)} -> {fs(fhi)} |", flush=True)
        records[name] = {
            "walls": {str(k): round(walls[k], 2) for k in amps},
            "walls_all": {str(k): all_walls[k] for k in amps},
            "exp": round(exp, 3),
            "ceiling": EXP_CEILINGS.get(name, EXP_CEILING_DEFAULT),
            "plan_lo": flo, "plan_hi": fhi,
        }
    if json_path:
        write_artifact(
            json_path, sf_dir, amps, forced_runs or "2@lo/1@hi",
            tier, records, {},
        )
    spark.stop()


if __name__ == "__main__":
    main()
