"""Snapshot diff: classify rows across two snapshot partitions.

The reference's output is an append-only series of full nightly
snapshots (``snapshot=YYYYMMDD`` partitions — reference
Main.java:99-100); the question its consumers ask next is "what
changed since yesterday". This operator answers it relationally:
full-outer join the two snapshots on the business key and classify
every key as added / removed / changed / unchanged.

Scale posture: each side is reduced to (key, fingerprint) BEFORE the
join — the shuffle carries a few dozen bytes per row regardless of
row width (the flagship's 89 columns never move). The fingerprint is
xxhash64 over the canonicalized compare columns; a hash collision
could misreport a changed row as unchanged with probability ~2^-64
per key — the standard CDC trade; pass the columns themselves as
``compare_cols`` and audit flagged keys if that ever matters. If the
snapshot partitions are bucketed by the key the join is
exchange-free (see sources/sinks.write_bucketed_table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Null placeholder that cannot collide with a real stringified value.
_NULL_TOKEN = "\x00<null>\x00"


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Per-key change classification between two snapshot DataFrames.

    Returns one row per key present in either side:
    ``(*key_cols, change_type)`` with change_type in
    {'added', 'removed', 'changed', 'unchanged'} (relative old -> new).
    """
    if compare_cols is None:
        compare_cols = [c for c in new.columns if c not in key_cols]

    def fingerprint(df: DataFrame, alias: str) -> DataFrame:
        canon = [F.coalesce(F.col(c).cast("string"), F.lit(_NULL_TOKEN)) for c in compare_cols]
        return df.select(*key_cols, F.xxhash64(*canon).alias(alias))

    o = fingerprint(old, "_h_old")
    n = fingerprint(new, "_h_new")
    joined = o.join(n, on=key_cols, how="full_outer")
    return joined.select(
        *key_cols,
        F.when(F.col("_h_old").isNull(), "added")
        .when(F.col("_h_new").isNull(), "removed")
        .when(F.col("_h_old") != F.col("_h_new"), "changed")
        .otherwise("unchanged")
        .alias("change_type"),
    )


def apply_cdc(
    old: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
) -> DataFrame:
    """MERGE: apply a change feed to a snapshot, producing the next
    snapshot — upserts ('added'/'changed' rows carry the new payload)
    and deletes ('removed'), the write side of the ``snapshot_diff``
    round trip: ``apply_cdc(old, diff_with_payload) == new``.

    ``changes`` has the same payload columns as ``old`` plus
    ``change_type``; payload values are ignored for 'removed'.

    Plan shape (MERGE without a transaction log): one left_anti join
    keyed on the business key drops old rows that were changed or
    removed, then the surviving rows union the upsert payloads. Both
    legs shuffle only on the key; with key-bucketed snapshot
    partitions the anti join is exchange-free. At 100 TB this is the
    standard periodic-compaction pattern: full snapshots stay
    immutable (the reference's append-only ``snapshot=`` contract),
    and the merge materializes the next partition.
    """
    payload = [c for c in old.columns]
    upserts = changes.where(F.col("change_type").isin("added", "changed")).select(*payload)
    touched = changes.where(
        F.col("change_type").isin("changed", "removed")
    ).select(*key_cols)
    kept = old.join(touched, on=key_cols, how="left_anti")
    return kept.unionByName(upserts)
