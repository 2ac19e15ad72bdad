"""Fuzzy (approximate-string) join via deletion-neighborhood
blocking — the SymSpell pattern distributed.

Entity resolution for a curation pipeline: matching dirty source
names/titles/ids against a canonical table without the O(n*m)
cross-join a naive ``levenshtein(a, b) <= d`` predicate plans
(Catalyst cannot turn an arbitrary distance predicate into an
equi-join).

The trick: two strings within edit distance 1 always share a member
of each other's deletion neighborhood {s} ∪ {s minus one char}.
Generating the neighborhood (len+1 variants per row) and equi-joining
on the variant turns the fuzzy match into an ordinary hash-shuffle
join keyed on short strings; candidates are then VERIFIED with the
exact Levenshtein metric (integer — engine-independent). Fan-out is
bounded by string length, so the shuffle is O(n * len) rows — the
same sub-quadratic posture as the MinHash band join
(operators/dedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: SymSpell radius this blocking is sound for (one deletion each way
#: covers substitution/insert/delete at distance 1).
MAX_DISTANCE = 1


def _with_variants(df: DataFrame, id_col: str, s_col: str, side: str) -> DataFrame:
    """Explode each row into its deletion neighborhood: the string
    itself plus every single-character deletion."""
    variants = F.expr(
        f"array_union(array({s_col}), "
        f"transform(sequence(1, length({s_col})), "
        f"i -> concat(substr({s_col}, 1, i - 1), substr({s_col}, i + 1))))"
    )
    return df.select(
        F.col(id_col).alias(f"{side}_id"),
        F.col(s_col).alias(f"{side}_s"),
        F.explode(variants).alias("variant"),
    )


def symspell_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str = "id",
    left_str: str = "s",
    right_id: str = "id",
    right_str: str = "s",
) -> DataFrame:
    """All (left, right) pairs with Levenshtein distance <= 1, as
    (l_id, r_id, dist). Blocking join on deletion variants, exact
    verify on the distinct candidate pairs (so the metric runs once
    per pair, not once per shared variant).

    PRECONDITION: ids must be UNIQUE per side (one string per id).
    The candidate stream is deduped on the narrow (l_id, r_id) key
    and strings re-attach by id-equi joins — an input carrying k
    strings under one id would multiply the re-attached pairs k-fold
    and could pair strings that never shared a deletion variant. All
    in-repo callers key by primary id; callers with duplicate keys
    must pre-dedup (or re-key) their input."""
    lv = _with_variants(left, left_id, left_str, "l")
    rv = _with_variants(right, right_id, right_str, "r")
    # Dedup the candidate stream on the NARROW (l_id, r_id) key — a
    # duplicate clique of k strings sharing ~len variants emits
    # len*k² pre-distinct hits, and carrying both strings through
    # that shuffle multiplies its width ~4x for no reason. Strings
    # re-attach to the ~k² DISTINCT pairs by key-equi joins against
    # the n-row inputs (AQE broadcasts them when small), and the
    # exact metric still runs once per pair.
    candidates = lv.join(rv, "variant").select("l_id", "r_id").distinct()
    paired = candidates.join(
        left.select(F.col(left_id).alias("l_id"), F.col(left_str).alias("l_s")), "l_id"
    ).join(
        right.select(F.col(right_id).alias("r_id"), F.col(right_str).alias("r_s")),
        "r_id",
    )
    dist = F.levenshtein("l_s", "r_s")
    return paired.where(dist <= MAX_DISTANCE).select(
        "l_id", "r_id", dist.alias("dist")
    )
