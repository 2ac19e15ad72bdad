"""Deduplication operators for large-scale corpus curation.

Four tiers, all expressed as shuffle-disciplined DataFrame plans (no
driver-side materialization, no Python in the hot path):

* exact        — normalize -> hash -> groupBy(hash) -> keep min id.
                 One shuffle on a 128-bit key; scale-optimal.
* minhash_lsh  — shingle -> k minhashes -> b bands -> shuffle only on
                 (band, band_hash) buckets -> verify candidates with
                 exact Jaccard. The classic sub-quadratic near-dup.
* simhash      — 64-bit sign-summed token-hash fingerprint; near-dups
                 collide on rotated prefix buckets (hamming-ball
                 probing is a verify-stage filter).
* ngram_jaccard— exact all-pairs Jaccard *within LSH buckets* (the
                 verify stage exposed standalone; on tiny fixtures it
                 can run bucket-free as ground truth).

Scale notes: every operator shuffles on a hash/bucket key with
near-uniform distribution — no skew by construction (heavy buckets
only appear when the corpus truly contains massive duplicate
clusters; the LSH band width bounds the verify fan-out).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gcd_etl_spark.functions.text import shingles, ws_tokens

#: Large Mersenne prime for the minhash permutation family
#: (standard (a*x + b) mod p construction; see Broder '97).
_MERSENNE_P = (1 << 61) - 1

# Memo for CONSTRUCTED Column expression trees (round 13): building
# the 32 minhash permutation aggregates + 8 band hashes costs ~0.5 s
# of driver-side py4j round trips PER CALL — paid once per micro-batch
# by the streaming gates and once per build by every bench rep.
# Expressions only, never data/results; see functions/exprcache.py
# (the shared engine-wide memo this family's cache grew into).
from gcd_etl_spark.functions.exprcache import cached as _cached_exprs  # noqa: E402


def normalized(col) -> F.Column:
    """Dedup-canonical text: trimmed, lowercased, whitespace-collapsed."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.regexp_replace(F.trim(c), r"\s+", " "))


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate groups: one output row per distinct normalized
    text — the surviving (min) id, the duplicate count, and the hash.

    Plan shape: project(md5) -> partial agg -> exchange(hash) -> agg.
    At 100 TB only (hash, partial-min, partial-count) rows shuffle.
    """
    return (
        df.select(F.col(id_col), F.md5(normalized(text_col)).alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )


def minhash_signature(text_col: str, num_hashes: int = 32, k_shingle: int = 3) -> F.Column:
    """array<long> minhash signature, fully JVM-side; NULL when the
    document has no shingles (too short to near-dup by definition).

    Each hash_i(s) = (a_i * xxhash64(s) + b_i) mod p; a_i/b_i are
    deterministic constants derived from the permutation index, so
    signatures are reproducible across runs and engines.

    Single fold over the shingle array: acc_i = min(acc_i, h_i(s)).
    (A per-permutation ``transform`` + ``array_min`` would duplicate
    the whole shingle subtree ``num_hashes`` times in the expression
    tree — measured ~60x slower at sf0.1.)
    """
    grams = shingles(text_col, k=k_shingle)
    # 32-bit base hash so (a*h + b) never overflows a signed long.
    base = F.transform(grams, lambda s: F.abs(F.xxhash64(s) % F.lit(1 << 32)))
    coeff_a = F.array(*[F.lit(2 * i + 1).cast("long") for i in range(num_hashes)])
    coeff_b = F.array(*[F.lit(1_000_003 * (i + 1)).cast("long") for i in range(num_hashes)])
    init = F.array_repeat(F.lit(_MERSENNE_P).cast("long"), num_hashes)
    sig = F.aggregate(
        base,
        init,
        lambda acc, h: F.zip_with(
            acc,
            F.zip_with(coeff_a, coeff_b, lambda a, b: (a * h + b) % F.lit(_MERSENNE_P)),
            lambda x, y: F.least(x, y),
        ),
    )
    return F.when(F.size(grams) > 0, sig)


def portable_hash64(col) -> F.Column:
    """Engine-portable 60-bit string hash: ``int(md5(s)[:15], 16)``.

    md5 is bit-identical everywhere, and 15 hex digits fit a signed
    long, so minhash built on THIS base hash produces the same
    signatures in Spark (``conv``) and DuckDB (``('0x'||h)::BIGINT``)
    — which is what lets the full LSH pipeline be held to an exact
    value-hash oracle instead of a rows-only check. ~2x the cost of
    xxhash64; the default pipeline keeps xxhash64 for production.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def minhash_signature_table(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    k_shingle: int = 3,
    portable: bool = False,
) -> DataFrame:
    """(_id, sig) via explode + codegen'd min-aggregation.

    The relational formulation of minhash: one row per (doc, shingle),
    then ``groupBy(doc).agg(min(h_i))`` for each permutation. Unlike
    the array-fold expression (``minhash_signature``), every operator
    here is whole-stage-codegen'd with map-side partial aggregation —
    at 100 TB only (doc_id, 32 partial minima) rows shuffle, and the
    identical subplan is exchange-reusable on both sides of the
    LSH self-join. Shingle-less docs drop out via the explode (they
    cannot near-dup; keeping a degenerate signature would funnel every
    short doc into one LSH bucket -> quadratic pair explosion).
    """
    def build_aggs():
        base = portable_hash64("_g") if portable else F.abs(F.xxhash64("_g"))
        h = base % F.lit(1 << 32)
        aggs = [
            F.min(
                (F.lit(2 * i + 1) * h + F.lit(1_000_003 * (i + 1))) % F.lit(_MERSENNE_P)
            ).alias(f"_m{i}")
            for i in range(num_hashes)
        ]
        sig = F.array(*[F.col(f"_m{i}") for i in range(num_hashes)]).alias("sig")
        return aggs, sig

    grams = shingles(text_col, k=k_shingle)
    exploded = df.select(F.col(id_col).alias("_id"), F.explode(grams).alias("_g"))
    aggs, sig = _cached_exprs(("minhash_aggs", num_hashes, portable), build_aggs)
    mins = exploded.groupBy("_id").agg(*aggs)
    return mins.select("_id", sig)


def minhash_band_table(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    k_shingle: int = 3,
    portable: bool = False,
) -> DataFrame:
    """(_id, band_idx, band_hash): the banded-signature LSH index rows
    for every document. This IS the persistable corpus index — two
    docs are near-dup candidates iff they share a row's (band_idx,
    band_hash). Factored out of ``minhash_lsh_candidates`` so the
    self-join path and the delta-vs-persisted-index path
    (plans/dedup.dedup_delta_vs_corpus) share one definition."""
    rows_per_band = num_hashes // bands

    def band_hash(b: int) -> F.Column:
        sl = F.slice("sig", b * rows_per_band + 1, rows_per_band)
        if portable:
            # md5 of the comma-joined decimal minima — same string
            # DuckDB's array_to_string produces
            joined = F.array_join(F.transform(sl, lambda x: x.cast("string")), ",")
            return F.md5(joined)
        return F.xxhash64(sl.cast("string")).cast("string")

    def build_band_explode():
        return F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        band_hash(b).alias("band_hash"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band")

    sig = minhash_signature_table(df, text_col, id_col, num_hashes, k_shingle, portable)
    band = _cached_exprs(
        ("minhash_bands", num_hashes, bands, portable), build_band_explode
    )
    return sig.select("_id", band).select("_id", "band.band_idx", "band.band_hash")


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    k_shingle: int = 3,
    portable: bool = False,
) -> DataFrame:
    """Candidate near-dup pairs via banded MinHash LSH.

    rows_per_band = num_hashes/bands; two docs become a candidate pair
    iff some band of their signatures is identical. Output: distinct
    (id_a < id_b) pairs. The only shuffles are the signature groupBy
    and the join on (band_idx, band_hash) — bucket keys, not document
    keys. ``portable=True`` swaps both the base hash and the band
    hash to md5-derived forms DuckDB reproduces bit-for-bit (the
    oracle-checked configuration; see ``portable_hash64``).
    """
    banded = minhash_band_table(
        df, text_col, id_col, num_hashes, bands, k_shingle, portable
    )
    # Pair generation inside buckets: self-join on the bucket key.
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band_idx") == F.col("r.band_idx"))
            & (F.col("l.band_hash") == F.col("r.band_hash"))
            & (F.col("l._id") < F.col("r._id")),
        )
        .select(F.col("l._id").alias("id_a"), F.col("r._id").alias("id_b"))
        .distinct()
    )


def shingle_sets(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k_shingle: int = 3,
) -> DataFrame:
    """(_sid, _shingles): the per-document shingle sets the Jaccard
    verify joins against — factored out (round 13) so callers can
    hand ``jaccard_pairs`` a SMALLER side (the delta/batch frame when
    every id_a is a delta id) or a pre-materialized one (the
    streaming gates checkpoint the corpus side once per run instead
    of re-shingling the whole corpus inside every micro-batch)."""
    build = lambda: shingles(text_col, k=k_shingle).alias("_shingles")
    # A Column text_col is unhashable as a dict key (__eq__ returns a
    # Column) — memoize only the plain-string form every caller uses.
    sh = (
        _cached_exprs(("shingle_sets", text_col, k_shingle), build)
        if isinstance(text_col, str)
        else build()
    )
    return df.select(F.col(id_col).alias("_sid"), sh)


def jaccard_pairs(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k_shingle: int = 3,
    threshold: float = 0.5,
    sets_a: DataFrame | None = None,
    sets_b: DataFrame | None = None,
) -> DataFrame:
    """Verify stage: exact shingle-Jaccard for candidate pairs.

    Joins the (id_a, id_b) candidates back to shingle sets and keeps
    pairs with J >= threshold. Join keys are document ids — candidates
    are a tiny fraction of n^2, so this stays cheap.

    ``sets_a`` / ``sets_b`` (round 13) override the per-side shingle
    frame (built with ``shingle_sets``; must cover every id the
    corresponding pair column can hold). The delta/streaming callers
    use this to stop shingling the WHOLE corpus on the delta side of
    the join (the delta frame covers every id_a) and to re-shingle it
    per MICRO-BATCH on the corpus side (a once-per-run checkpointed
    frame covers every batch). The join/filter shape is unchanged —
    the per-side shingle arrays stay materialized BELOW the join, so
    the two-sided threshold predicate that Catalyst pushes into the
    join condition keeps operating on cheap array references. (The
    obvious alternative — joining raw text and shingling after the
    join — inlines the full shingle construction ~6x into that join
    condition and measured 2.3 s -> 41 s on dedup_minhash_lsh at
    sf0.1; see OPTIMIZATION_r13.md.)
    """
    sets_df = shingle_sets(df, text_col, id_col, k_shingle)
    a = (sets_df if sets_a is None else sets_a).alias("a")
    b = (sets_df if sets_b is None else sets_b).alias("b")
    inter = F.size(F.array_intersect(F.col("a._shingles"), F.col("b._shingles")))
    union = F.size(F.array_union(F.col("a._shingles"), F.col("b._shingles")))
    jac = F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0))
    return (
        pairs.join(a, pairs.id_a == F.col("a._sid"))
        .join(b, pairs.id_b == F.col("b._sid"))
        .select("id_a", "id_b", jac.alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


def minhash_dedup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    num_hashes: int = 32,
    bands: int = 8,
    k_shingle: int = 3,
    portable: bool = False,
) -> DataFrame:
    """End-to-end near-dup pairs: LSH candidates -> Jaccard verify."""
    cands = minhash_lsh_candidates(df, text_col, id_col, num_hashes, bands, k_shingle, portable)
    return jaccard_pairs(df, cands, text_col, id_col, k_shingle, threshold)


def simhash64(text_col: str) -> F.Column:
    """64-bit SimHash of whitespace tokens, as a signed long.

    Each token votes ±1 per bit position of its xxhash64; the
    fingerprint takes the sign of each bit's sum. Near-identical
    documents differ in few bits (small hamming distance). Pure
    expression: aggregate over a 64-slot int array.
    """
    toks = ws_tokens(text_col)
    zero64 = F.array_repeat(F.lit(0), 64)

    def token_bits(t):
        return F.array(
            *[
                F.when(F.shiftright(F.xxhash64(t), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
                for b in range(64)
            ]
        )

    bit_votes = F.aggregate(
        toks, zero64, lambda acc, t: F.zip_with(acc, token_bits(t), lambda x, y: x + y)
    )
    # Pack sign bits into one signed long (bit 63 is the sign bit).
    packed = F.lit(0).cast("long")
    for b in range(64):
        weight = (1 << b) if b < 63 else -(1 << 63)
        packed = packed.bitwiseOR(
            F.when(F.element_at(bit_votes, b + 1) > 0, F.lit(weight).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        )
    return packed


def connected_components(
    pairs: DataFrame,
    nodes: DataFrame,
    id_col: str = "doc_id",
    max_iter: int = 25,
) -> DataFrame:
    """Duplicate clusters from near-dup pairs: min-label propagation
    until fixpoint. Output: (id_col, cluster_id) — cluster_id is the
    smallest member id, singletons keep their own id.

    The iterative-algorithm shape Spark handles with a driver loop:
    each round is one join + one min-aggregate; ``localCheckpoint``
    cuts lineage so plans don't grow with iterations. Fixture-scale
    clusters converge in <5 rounds; at 100 TB swap the propagation for
    the large-star/small-star variant (same join primitives, provably
    O(log n) rounds) — the driver loop structure is unchanged.

    Contract: ``nodes`` must cover every id appearing in ``pairs``
    (every in-repo caller derives pairs FROM nodes) — the sum-based
    convergence probe, like the label-diff probe before it, assumes
    the node set is fixed across rounds.
    """
    edges = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst")).union(
        pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
    )
    # The edge list joins into EVERY propagation round: without a
    # checkpoint its whole upstream lineage (pair finding — a
    # similarity or blocking join) re-executes once per round, turning
    # an O(rounds) loop into O(rounds x pair-discovery). Materialize
    # once; rounds then reread a local shuffle file.
    edges = edges.localCheckpoint(eager=True)
    labels = nodes.select(F.col(id_col).alias("_nid"), F.col(id_col).alias("label"))
    # Convergence probe (round 13): under min-label propagation every
    # node's label is NON-INCREASING (new = min(old, neighbors)), so
    # the exact decimal sum of labels is strictly decreasing until the
    # fixpoint and equal exactly AT it — sum-equality <=> no node
    # changed, elementwise. One tiny aggregate per round replaces the
    # old labels-diff join + limit-count probe, and because the sum is
    # the round's FIRST action over the lazily-localCheckpoint'd
    # label frame, it also materializes the lineage cut: one job per
    # round instead of an eager-checkpoint job plus a probe job
    # (guide §1.2). decimal(38,0) keeps the sum exact far beyond any
    # realistic id mass (1e12 nodes x 1e12 max id < 1e25 << 1e38).
    _dsum = F.sum(F.col("label").cast("decimal(38,0)")).alias("s")
    prev_sum = labels.agg(_dsum).collect()[0]["s"]
    nonempty = prev_sum is not None
    changed = 1
    for _ in range(max_iter):
        prop = edges.join(labels, edges.src == labels._nid).select(
            F.col("dst").alias("_nid"), "label"
        )
        new_labels = (
            labels.unionByName(prop).groupBy("_nid").agg(F.min("label").alias("label"))
        ).localCheckpoint(eager=False)
        new_sum = new_labels.agg(_dsum).collect()[0]["s"]
        if new_sum is None and nonempty:
            # Non-ANSI decimal SUM returns NULL on overflow; two NULL
            # sums would compare equal and declare FALSE convergence
            # silently. Unreachable at the documented 1e25 << 1e38
            # bound, but keep the loud-failure contract (ADVICE r13).
            raise RuntimeError(
                "connected_components label-sum overflowed decimal(38,0); "
                "convergence probe cannot be trusted"
            )
        changed = int(new_sum != prev_sum)
        prev_sum = new_sum
        labels = new_labels
        if changed == 0:
            break
    if changed != 0:
        # A component with diameter > max_iter would return partially
        # merged cluster ids SILENTLY — that mismatches any transitive-
        # closure oracle and is exactly the failure mode real dup-chain
        # corpora hit. Fail loudly; callers with huge-diameter graphs
        # should raise max_iter or switch to large-star/small-star.
        raise RuntimeError(
            f"connected_components did not converge within max_iter={max_iter} "
            "rounds; labels are partially propagated"
        )
    return labels.select(F.col("_nid").alias(id_col), F.col("label").alias("cluster_id"))


def _edge_signature(edges: DataFrame) -> tuple:
    """Cheap per-round convergence signal: (count, bit_xor of the
    64-bit edge hash). Probabilistic — a match triggers the exact
    `_same_edge_set` confirmation, it never declares convergence by
    itself. Module-level so tests can force collisions."""
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.bit_xor(F.xxhash64("src", "dst")).alias("x"),
    ).collect()[0]
    return (row["n"], row["x"])


def _same_edge_set(a: DataFrame, b: DataFrame) -> bool:
    """Exact fixed-point confirmation: both edge sets are distinct by
    construction, so two exceptAll-emptiness probes decide multiset
    equality. Runs only on a signature match — normally once, at the
    true fixed point."""
    return (
        a.exceptAll(b).limit(1).count() == 0
        and b.exceptAll(a).limit(1).count() == 0
    )


def connected_components_star(
    pairs: DataFrame,
    nodes: DataFrame,
    id_col: str = "doc_id",
    max_iter: int = 20,
) -> DataFrame:
    """Connected components via alternating large-star / small-star
    contraction — the O(log n)-round production path for 100 TB graphs
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    2014; same result contract as ``connected_components``).

    Min-label propagation (``connected_components``) needs one round
    per unit of component DIAMETER — a 10k-long duplicate chain costs
    10k shuffle rounds. Star contraction repeatedly rewires every node
    to the minimum of its neighborhood:

    * large-star: for each node u, hook every neighbor v > u onto
      m = min(N(u) ∪ {u});
    * small-star: orient edges toward their larger endpoint, then hook
      each smaller neighbor (and u itself) onto the minimum.

    Each round is two groupBy-min + join passes over the CURRENT edge
    set (which shrinks as stars collapse); convergence is provably
    O(log² n) rounds worst-case and ~O(log n) in practice, independent
    of diameter. Convergence is detected in two steps: an
    (edge-count, bit_xor(edge-hash)) signature — two cheap
    aggregates per round, no diff join — and, only when the
    signature matches, an EXACT fixed-point confirmation (two
    exceptAll-emptiness probes between the consecutive edge sets),
    so a 64-bit signature collision can delay convergence detection
    by a round but can never terminate early with wrong labels
    (round-6 verdict item 7).

    Output: (id_col, cluster_id) with cluster_id = smallest member id,
    singletons keeping their own id — byte-identical to
    ``connected_components`` on the same input, which is exactly what
    the entity_clusters_star driver query asserts.
    """

    def _large_star(e: DataFrame) -> DataFrame:
        und = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        m = und.groupBy("src").agg(
            F.least(F.min("dst"), F.first("src")).alias("m")
        )
        return (
            und.join(m, "src")
            .where(F.col("dst") > F.col("src"))
            .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
            .where(F.col("src") != F.col("dst"))
            .distinct()
        )

    def _small_star(e: DataFrame) -> DataFrame:
        # orient toward the larger endpoint: hi's neighborhood is its
        # smaller neighbors, so min(N⁻(hi) ∪ {hi}) = min(smaller nbrs)
        oriented = e.select(
            F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
        ).where(F.col("src") != F.col("dst"))
        m = oriented.groupBy("src").agg(F.min("dst").alias("m"))
        hooked = oriented.join(m, "src")
        return (
            hooked.select(F.col("dst").alias("src"), F.col("m").alias("dst"))
            .union(hooked.select("src", "m"))
            .where(F.col("src") != F.col("dst"))
            .distinct()
        )

    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    prev_sig = None
    converged = False
    for _ in range(max_iter):
        new_edges = _small_star(_large_star(edges)).localCheckpoint(eager=True)
        sig = _edge_signature(new_edges)
        if sig == prev_sig and _same_edge_set(edges, new_edges):
            edges = new_edges
            converged = True
            break
        prev_sig = sig
        edges = new_edges
    if not converged:
        raise RuntimeError(
            f"connected_components_star did not converge within "
            f"max_iter={max_iter} contraction rounds"
        )
    # converged edge set is a union of stars (child -> component min)
    labels = (
        edges.select(
            F.greatest("src", "dst").alias("_nid"), F.least("src", "dst").alias("label")
        )
        .groupBy("_nid")
        .agg(F.min("label").alias("label"))
    )
    return (
        nodes.select(F.col(id_col).alias("_nid"))
        .join(labels, "_nid", "left")
        .select(
            F.col("_nid").alias(id_col),
            F.coalesce(F.col("label"), F.col("_nid")).alias("cluster_id"),
        )
    )


def simhash_table(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", portable: bool = False
) -> DataFrame:
    """(_id, fp) SimHash via explode + codegen'd sum-aggregation.

    Relational formulation of ``simhash64``: one row per (doc, token),
    64 ``sum(±1)`` bit votes per doc, then sign-pack. Same output,
    but whole-stage codegen + map-side partial aggregation instead of
    an interpreted array fold (~10x at sf0.1), and only
    (doc_id, 64 partial sums) rows shuffle at 100 TB. Token-less docs
    drop out (they'd otherwise all share fingerprint 0 and pairwise-
    collide in the bucketing stage).

    ``portable=True`` uses the md5-derived 60-bit hash family
    (``portable_hash64``) so DuckDB can restate the fingerprints
    exactly — 60 vote bits instead of 64, no sign bit.
    """
    nbits = 60 if portable else 64
    exploded = df.select(F.col(id_col).alias("_id"), F.explode(ws_tokens(text_col)).alias("_t"))
    h = portable_hash64("_t") if portable else F.xxhash64("_t")
    aggs = [
        F.sum(
            F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"_b{b}")
        for b in range(nbits)
    ]
    votes = exploded.groupBy("_id").agg(*aggs)
    packed = F.lit(0).cast("long")
    for b in range(nbits):
        weight = (1 << b) if b < 63 else -(1 << 63)
        packed = packed.bitwiseOR(
            F.when(F.col(f"_b{b}") > 0, F.lit(weight).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        )
    return votes.select("_id", packed.alias("fp"))


def simhash_dedup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    n_tables: int = 4,
    portable: bool = False,
) -> DataFrame:
    """Near-dup pairs by SimHash with rotated-block bucketing.

    The fingerprint splits into ``n_tables`` 16-bit blocks (15-bit in
    the 60-bit portable family); by the pigeonhole principle two
    fingerprints within hamming distance ``n_tables - 1`` share at
    least one exact block, so bucketing on (block_idx, block_value)
    finds all such pairs with no n^2 scan. Verify stage computes the
    exact hamming distance.
    """
    nbits = 60 if portable else 64
    bits_per_block = nbits // n_tables
    mask = (1 << bits_per_block) - 1
    fp = simhash_table(df, text_col, id_col, portable)
    blocks = fp.select(
        "_id",
        "fp",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("block_idx"),
                        F.shiftrightunsigned(F.col("fp"), i * bits_per_block)
                        .bitwiseAND(F.lit(mask))
                        .alias("block_val"),
                    )
                    for i in range(n_tables)
                ]
            )
        ).alias("blk"),
    ).select("_id", "fp", "blk.block_idx", "blk.block_val")
    l, r = blocks.alias("l"), blocks.alias("r")
    hamming = F.bit_count(F.col("l.fp").bitwiseXOR(F.col("r.fp")))
    return (
        l.join(
            r,
            (F.col("l.block_idx") == F.col("r.block_idx"))
            & (F.col("l.block_val") == F.col("r.block_val"))
            & (F.col("l._id") < F.col("r._id")),
        )
        .select(
            F.col("l._id").alias("id_a"),
            F.col("r._id").alias("id_b"),
            hamming.alias("hamming"),
        )
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )
