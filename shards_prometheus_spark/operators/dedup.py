"""Deduplication operators (Tier C, north-star — SURVEY.md §2c #18-19).

Four families over the `documents` table:

- exact: content-hash groupBy (the 100 TB form of dropDuplicates: hash
  once, shuffle the hash, keep min id per group);
- MinHash + LSH banding: unigram-set minhash signatures → banded
  bucket join → candidate pairs → exact Jaccard verify;
- SimHash: sign-aggregated bit signature, pairs within a Hamming ball;
- n-gram Jaccard: 3-token shingles, pair overlap via shingle join.

All hashing is portable affine arithmetic over rank-based token ids
(see tierc_common) so the DuckDB oracle checks values bit-for-bit.
Scale notes: every pairwise stage is preceded by a blocking stage
(band bucket, Hamming-ball on 16-bit sigs, shared-shingle join) — the
quadratic explosion never touches the full corpus; skewed buckets are
AQE-split.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shards_prometheus_spark.model import dround, load_table
from shards_prometheus_spark.operators.tierc_common import (
    HASH_P,
    TOKENS_CTE,
    _memo_persist,
    doc_token_ids,
    doc_token_sets,
    memo_count,
    memo_value,
    pair_jaccard,
)

# --- MinHash parameters (single source of truth for Spark AND oracle) ---
NUM_HASHES = 16
BAND_ROWS = 4  # 4 bands × 4 rows
BAND_MOD = 40_009
_BAND_W = [1, BAND_MOD, BAND_MOD**2, BAND_MOD**3]
MINHASH_PARAMS = [
    (i, 1_000_003 * i + 12_289, 786_433 * i + 40_961, i // BAND_ROWS, _BAND_W[i % BAND_ROWS])
    for i in range(NUM_HASHES)
]
NEAR_DUP_JACCARD = 0.9
#: Signature rows per band-join task (see dedup_near): the self-join
#: emits ~10³ pairs per signature row on this corpus shape, so 2 k
#: sig rows/task ≈ 2 M pairs/task — small enough that the in-task
#: pair enumeration + partial-distinct hash stays out of GC trouble,
#: large enough that task-scheduling overhead is noise.
SIGS_PER_JOIN_TASK = 2_000
#: Broadcast the band-join build side while the signature relation is
#: at most this many rows (~50 MB at 24 B/row — comfortable for any
#: executor). Beyond it (billions of docs) the self-join shuffles at
#: the same data-driven width instead.
BROADCAST_SIGS_LIMIT = 2_000_000


def _knob(env: str, default: int) -> int:
    """Module default, overridable per-process via env — exists so a
    test can FORCE the beyond-broadcast branch at small SF (the branch
    the 100 TB story rests on must be executable, not just reasoned
    about) and a rehearsal can pin either regime."""
    return int(os.environ.get(env, default))

# --- SimHash parameters ---
SIMHASH_BITS = 16
SIMHASH_PARAMS = [(j, 7_907 * j + 104_729, 9_973 * j + 224_737, 1 << j) for j in range(SIMHASH_BITS)]
SIMHASH_MAX_HAMMING = 2

# --- n-gram shingle parameters ---
NGRAM_N = 3
NGRAM_JACCARD = 0.05
#: Document-frequency cap: shingles appearing in more than this many
#: docs (boilerplate headers, templates) are excluded from CANDIDATE
#: GENERATION — one hot shingle would otherwise produce a quadratic
#: candidate blowup at corpus scale, while carrying no dedup signal.
#: Verification still intersects the FULL shingle sets, so reported
#: jaccard values are exact; only pairs whose every shared shingle is
#: ubiquitous are (deliberately) not candidates. The oracle applies
#: the identical cap.
NGRAM_DF_CAP = 100


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: md5 content hash → keep min doc_id per group."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.md5(F.col("text").cast("binary")).alias("text_md5"), "doc_id")
        .groupBy("text_md5")
        .agg(
            F.min("doc_id").cast("long").alias("keep_id"),
            F.count(F.lit(1)).cast("long").alias("n_copies"),
        )
    )


def _minhash_sigs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, band, band_hash) — banded minhash signature (persisted:
    both sides of the band join and any downstream probe reuse it)."""

    def build() -> DataFrame:
        # All NUM_HASHES permutation minima as aggregate COLUMNS of a
        # single groupBy(doc_id) pass — the naive layout (explode the
        # (doc, token) relation × NUM_HASHES params, then aggregate)
        # shuffles 16× the rows for identical math; at 100 TB that
        # factor is the difference between one corpus-sized shuffle
        # and sixteen. Bands then fold column-wise and posexplode
        # only the 4-row-per-doc band relation.
        dset = doc_token_sets(spark, sf_dir)
        mins = dset.groupBy("doc_id").agg(
            *[
                F.min(
                    (F.lit(a) * F.col("token_id") + F.lit(b))
                    % F.lit(HASH_P)
                ).alias(f"m{i}")
                for i, a, b, _band, _w in MINHASH_PARAMS
            ]
        )
        n_bands = NUM_HASHES // BAND_ROWS
        band_exprs = []
        for band in range(n_bands):
            parts = [
                (F.col(f"m{band * BAND_ROWS + r}") % F.lit(BAND_MOD))
                * F.lit(_BAND_W[r])
                for r in range(BAND_ROWS)
            ]
            total = parts[0]
            for p in parts[1:]:
                total = total + p
            band_exprs.append(total)
        return mins.select(
            "doc_id",
            F.posexplode(F.array(*band_exprs)).alias("band", "band_hash"),
        )

    return _memo_persist(spark, sf_dir, "minhash_sigs", build)


#: Bitmask fast path applies while token ids fit a 64-bit set.
MASK_VOCAB_LIMIT = 62

#: Multi-word bitmask path (r16): vocabularies past one word but small
#: enough that a per-doc ARRAY<BIGINT> fingerprint stays a few hundred
#: bytes — intersection is a handful of AND+bit_count word ops, still
#: O(1)-ish per pair with no explode. 4096 bits = 64 words = 512 B/doc;
#: past this (real Heaps-law corpora) the token-set join is the scale
#: path. The sf1 rehearsal corpus (vocab 310 → 5 words) sat in the
#: token-join regime before this: a 227 M-row candidate burst went
#: through a pair-keyed DISTINCT exchange plus two array-attach joins
#: and an array_intersect per pair (74 s) — the words path verifies
#: the burst redundantly row-locally and shuffles survivors only.
MASK_VOCAB_WORDS_LIMIT = 4096


def _mask_words_jaccard(
    candidates: DataFrame, dset: DataFrame, sf_dir: str, vocab_size: int
) -> DataFrame:
    """Exact Jaccard via multi-word set fingerprints: per document one
    ARRAY<BIGINT> of ⌈(vocab+1)/64⌉ words plus the set size;
    intersection = Σ_w bit_count(a[w] & b[w]). Same exact semantics as
    pair_jaccard / _mask_jaccard; same never-hinted-broadcast policy
    as the single-word mask relation (AQE broadcasts while it fits,
    shuffled-hash on doc ids past that)."""
    spark = dset.sparkSession
    nwords = vocab_size // 64 + 1

    def build() -> DataFrame:
        word_cols = [
            F.expr(
                f"bit_or(IF(token_id div 64 = {w}, "
                "shiftleft(1L, cast(token_id % 64 AS int)), 0L))"
            ).alias(f"_w{w}")
            for w in range(nwords)
        ]
        return dset.groupBy("doc_id").agg(
            *word_cols, F.count(F.lit(1)).cast("long").alias("n")
        ).select(
            "doc_id",
            F.array(*[F.col(f"_w{w}") for w in range(nwords)]).alias(
                "mask"
            ),
            "n",
        )

    masks = _memo_persist(spark, sf_dir, f"token_masks_w{nwords}", build)
    ma = masks.select(
        F.col("doc_id").alias("doc_a"),
        F.col("mask").alias("mask_a"),
        F.col("n").alias("na"),
    )
    mb = masks.select(
        F.col("doc_id").alias("doc_b"),
        F.col("mask").alias("mask_b"),
        F.col("n").alias("nb"),
    )
    inter = F.expr(
        "aggregate(zip_with(mask_a, mask_b, (x, y) -> bit_count(x & y)), "
        "0L, (acc, v) -> acc + v)"
    )
    return (
        candidates.join(ma, "doc_a")
        .join(mb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (inter / (F.col("na") + F.col("nb") - inter)).alias(
                "jaccard_raw"
            ),
        )
    )


def _mask_jaccard(
    candidates: DataFrame, dset: DataFrame, sf_dir: str
) -> DataFrame:
    """Exact Jaccard via 64-bit set fingerprints.

    When the dictionary fits in 63 bits (dictionary-encoded corpora,
    category/tag sets), each document's token set is one BIGINT and
    intersection is bit_count(a & b) — candidate verification becomes
    O(#pairs) with no explode, vs the token-join's O(#pairs × set size).
    Same exact semantics as pair_jaccard. The per-document mask
    relation is memo-persisted (steady-state verify reps were
    re-running its aggregate every call).

    The mask relation is one row PER DOCUMENT, so it is never hinted
    broadcast: the joins key on doc ids (high-cardinality, skew-free),
    and AQE picks broadcast at runtime only when the relation actually
    fits — at corpus scale these degrade gracefully to shuffled hash
    joins on evenly-distributed keys.
    """
    spark = dset.sparkSession
    masks = _memo_persist(
        spark,
        sf_dir,
        "token_masks",
        lambda: dset.groupBy("doc_id").agg(
            F.expr("bit_or(shiftleft(1L, cast(token_id as int)))").alias(
                "mask"
            )
        ),
    )
    ma = masks.select(F.col("doc_id").alias("doc_a"), F.col("mask").alias("mask_a"))
    mb = masks.select(F.col("doc_id").alias("doc_b"), F.col("mask").alias("mask_b"))
    inter = F.bit_count(F.expr("mask_a & mask_b"))
    union = (
        F.bit_count(F.col("mask_a")) + F.bit_count(F.col("mask_b")) - inter
    )
    return (
        candidates.join(ma, "doc_a")
        .join(mb, "doc_b")
        .select(
            "doc_a", "doc_b", (inter / union).alias("jaccard_raw")
        )
    )


def dedup_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH candidates verified by exact unigram Jaccard ≥ 0.9.

    Verification strategy is adaptive: bitmask fingerprints when the
    vocabulary fits 64 bits, token-set join otherwise — identical
    output either way.
    """
    sigs = _minhash_sigs(spark, sf_dir)
    # Width of the band self-join must track CORPUS size, not the
    # exchange's byte size: the signature relation is small (600 k
    # rows ≈ 12 MB at the sf3 rehearsal) but the join's per-bucket n²
    # expansion emits ~10³ pairs per signature row. The r6 plan let
    # Spark choose — at sf1.0 the build side fit the 10 MB broadcast
    # threshold (burst spread over the probe's ~30 parent partitions);
    # at sf3.0 it crossed the threshold and fell to a shuffled join
    # whose width AQE coalesced BY INPUT BYTES to 11 partitions of
    # ~50 M pairs each — that broadcast-cliff discontinuity, not the
    # funnel, was the flagged 8×-at-3×-data decade (BENCH_sf3).
    #
    # Fix, both regimes data-driven off one cheap count of the
    # persisted sigs: while the signature relation is broadcastable,
    # broadcast the build side and ROUND-ROBIN repartition the probe
    # to ~SIGS_PER_JOIN_TASK rows/task — a hot LSH bucket's probe rows
    # then spread across MANY tasks, so the n² burst parallelizes
    # uniformly (better than any band-hash layout, which pins a
    # bucket's whole burst to one task). Past broadcastability
    # (billions of docs — the true 100 TB regime) fall back to a
    # hash-partitioned self-join at the same data-driven width; AQE
    # skew-join splitting handles residual hot buckets there.
    n_sigs = memo_count(spark, sf_dir, "minhash_sigs", sigs)
    par = spark.sparkContext.defaultParallelism
    per_task = _knob("SPARK_GRAFT_SIGS_PER_JOIN_TASK", SIGS_PER_JOIN_TASK)
    bcast_limit = _knob(
        "SPARK_GRAFT_BROADCAST_SIGS_LIMIT", BROADCAST_SIGS_LIMIT
    )
    n_parts = max(par, n_sigs // per_task)
    b = sigs.select(
        F.col("doc_id").alias("doc_b"), "band", "band_hash"
    )
    if n_sigs <= bcast_limit:
        # the probe repartition is load-bearing at EVERY scale: the
        # persisted sigs relation may sit in 1-2 cache partitions
        # (AQE right-sizes cached plans by bytes), so without it the
        # broadcast join's n² burst would run 1-wide
        a = sigs.repartition(n_parts).select(
            F.col("doc_id").alias("doc_a"), "band", "band_hash"
        )
        b = F.broadcast(b)
    else:
        rep = sigs.repartition(n_parts, "band", "band_hash")
        a = rep.select(
            F.col("doc_id").alias("doc_a"), "band", "band_hash"
        )
        # shuffle_hash pins the intended physical shape: both sides
        # are already hash-partitioned on the join keys at n_parts, so
        # the SHJ reuses those exchanges (no sort, no extra shuffle) —
        # and the hint keeps AQE from re-broadcasting in the forced-
        # fallback test at small SF, where the relation is tiny
        b = rep.select(
            F.col("doc_id").alias("doc_b"), "band", "band_hash"
        ).hint("shuffle_hash")
    candidates = (
        a.join(b, ["band", "band_hash"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
    )
    dset = doc_token_sets(spark, sf_dir)
    # memoized: the strategy probe is one job over the persisted token
    # relation, but it ran on EVERY invocation (steady-state reps paid
    # a job for a constant of the immutable dir)
    vocab_size = memo_value(
        spark,
        sf_dir,
        "vocab_size",
        lambda: dset.agg(F.max("token_id")).first()[0] or 0,
    )
    if vocab_size <= MASK_VOCAB_LIMIT:
        # Mask verification is O(1) row-local work behind broadcast
        # joins, so band-collision duplicates (≤ n_bands per pair) are
        # cheapest verified REDUNDANTLY and deduped AFTER the ≥0.9
        # threshold cut: the one pair-keyed exchange then shuffles only
        # surviving near-dup rows instead of the full candidate burst
        # (guide §2.3 — aggregate/filter before you shuffle; the
        # duplicate verify is three bit-ops per extra copy). Duplicate
        # copies produce bit-identical jaccard values, so the distinct
        # over the rounded output is exactly the per-pair relation.
        verified = _mask_jaccard(candidates, dset, sf_dir)
        return (
            verified.filter(F.col("jaccard_raw") >= NEAR_DUP_JACCARD)
            .select(
                "doc_a", "doc_b", F.round("jaccard_raw", 4).alias("jaccard")
            )
            .distinct()
        )
    if vocab_size <= MASK_VOCAB_WORDS_LIMIT:
        # multi-word fingerprints: same redundant-verify-then-distinct
        # shape as the single-word branch (a few AND+bit_count word
        # ops per extra band-collision copy; the pair exchange carries
        # survivors only — guide §2.3)
        verified = _mask_words_jaccard(candidates, dset, sf_dir, vocab_size)
        return (
            verified.filter(F.col("jaccard_raw") >= NEAR_DUP_JACCARD)
            .select(
                "doc_a", "doc_b", F.round("jaccard_raw", 4).alias("jaccard")
            )
            .distinct()
        )
    # Token-join verification is O(set size) per pair and its explode
    # must not inherit the band-bucket task layout (a hot LSH bucket
    # would land its whole n² burst in ONE verify task — the GC-bound
    # 5× rep spread), so here the distinct stays BEFORE verification:
    # the pair-keyed exchange both dedups band collisions and
    # re-partitions the burst uniformly.
    verified = pair_jaccard(candidates.distinct(), dset)
    return verified.filter(F.col("jaccard_raw") >= NEAR_DUP_JACCARD).select(
        "doc_a", "doc_b", F.round("jaccard_raw", 4).alias("jaccard")
    )


def _simhash_sigs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, sig) — 16-bit sign-aggregated signature per document
    (persisted: classes, both expansion sides and the within-class
    self-join all re-reference it)."""

    def build() -> DataFrame:
        # All SIMHASH_BITS sign-sums as aggregate COLUMNS of one
        # groupBy(doc_id) pass (same 16×-fewer-shuffled-rows rewrite
        # as _minhash_sigs: the params crossJoin exploded the
        # (doc, token) relation per bit for identical math), then the
        # signature folds column-wise — no second aggregation.
        dset = doc_token_sets(spark, sf_dir)

        def contrib(a: int, b: int):
            bit = (
                (F.lit(a) * F.col("token_id") + F.lit(b)) % F.lit(HASH_P)
            ) % 2
            return F.when(bit == 1, F.lit(1)).otherwise(F.lit(-1))

        sums = dset.groupBy("doc_id").agg(
            *[
                F.sum(contrib(a, b)).alias(f"s{j}")
                for j, a, b, _w in SIMHASH_PARAMS
            ]
        )
        sig = None
        for j, _a, _b, w in SIMHASH_PARAMS:
            term = F.when(F.col(f"s{j}") > 0, F.lit(w)).otherwise(F.lit(0))
            sig = term if sig is None else sig + term
        assert sig is not None
        return sums.select("doc_id", sig.cast("long").alias("sig"))

    return _memo_persist(spark, sf_dir, "simhash_sigs", build)


#: Pigeonhole chunking of the 16-bit signature: a pair within Hamming
#: distance ≤ 2 differs in ≤ 2 of the 3 chunks, so it matches exactly
#: on ≥ 1 chunk — each chunk-equality join is a complete candidate
#: generator and their union has full recall (classic SimHash blocking).
_SIMHASH_CHUNKS = [(0, 6), (6, 5), (11, 5)]

#: Pair-generation rows one task absorbs cheaply (~1 s of codegen
#: row construction); the expansion spreads only past 2× this.
_PAIRS_PER_GEN_TASK = 10_000_000


def _close_pairs_py(sig_values: "list[int]") -> "list[tuple[int, int, int]]":
    """(sig_a, sig_b, hamming) pairs within Hamming distance ≤ 2 over
    the DISTINCT-signature class values, computed driver-side: the
    class space is ≤ 2^16 values at ANY corpus size (model-sized, the
    same bounded-driver-state idiom as the k-means model), and
    enumerating each signature's ≤ 1+16+120 Hamming-≤2 neighbors
    against a set is exact and bounded — where the old pigeonhole
    chunk self-joins spent 3 exchanges + a distinct per query
    (guide §2.4: those shuffles carried no corpus data at all)."""
    masks = [1 << i for i in range(SIMHASH_BITS)]
    masks += [
        (1 << i) | (1 << j)
        for i in range(SIMHASH_BITS)
        for j in range(i + 1, SIMHASH_BITS)
    ]
    sigset = set(sig_values)
    pairs = []
    for s in sigset:
        for m in masks:
            t = s ^ m
            if t > s and t in sigset:
                pairs.append((s, t, m.bit_count()))
    pairs.sort()
    return pairs


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash-16 pairs within Hamming distance ≤ 2.

    Scale shape: docs collapse to distinct-signature classes (≤ 2^16
    values however large the corpus), candidate class pairs come from
    pigeonhole chunk joins — never an all-pairs product over docs — and
    qualifying class pairs expand back to doc pairs (the output itself).

    OUTPUT-CONTRACT caveat: pair enumeration grows with class size
    squared (625 M pairs at sf1.0 = half the full 50 k-doc pair
    matrix, BENCH_sf1.json). The linear-output primary answer for a
    100 TB run is `dedup_simhash_classes` (doc → representative);
    keep this query for pair-level inspection at small scale.
    """
    sigs = _simhash_sigs(spark, sf_dir)
    cls_rows = memo_value(
        spark,
        sf_dir,
        "simhash_classes",
        lambda: sigs.groupBy("sig")
        .agg(F.count(F.lit(1)).alias("cnt"), F.min("doc_id").alias("min_doc"))
        .collect(),
    )
    close_rows = _close_pairs_py([r["sig"] for r in cls_rows])
    close = spark.createDataFrame(
        close_rows or [(0, 0, 0)],
        "sig_a long, sig_b long, hamming long",
    )
    if not close_rows:
        close = close.filter(F.lit(False))
    # Expand qualifying class pairs to doc pairs. Classes are disjoint,
    # so each unordered doc pair appears exactly once; least/greatest
    # restores the doc_a < doc_b contract.
    #
    # Only the CLASS relation (≤2^16 rows at any corpus size) is ever
    # broadcast — never a per-document relation. The doc sides join on
    # `sig`, whose live value space can be tiny (extreme skew if used
    # as a raw shuffle key), so the doc×doc joins are SALTED: one side
    # carries salt = doc_id % S, the other replicates each row S times,
    # turning every hot sig key into S evenly-sized (sig, salt) keys.
    # The expansion shuffles only doc-sized relations and parallelizes
    # across salt partitions — no corpus-sized broadcast anywhere.
    salt_n = max(2, min(spark.sparkContext.defaultParallelism, 16))
    salts = F.array(*[F.lit(i) for i in range(salt_n)])
    # The expansion joins OUTPUT ~pairs rows from doc-sized inputs —
    # a generator join. Under the broadcast plan the stream side's
    # partitioning is whatever the persisted sigs cache kept (AQE
    # coalesces the persist by its INPUT bytes, ~1-2 partitions at
    # sf1), so the 625 M-row generation serialized on 1-2 cores
    # (r16 rehearsal: 35 s at sf1, 2× the r10 recording). When the
    # expected pair count — exact driver arithmetic over the memoized
    # class counts — dwarfs per-task generation throughput, round-
    # robin repartition the exploded side: one tiny exchange of the
    # doc-sized relation buys generation parallelism no AQE size
    # heuristic can infer (output ≫ input — §2.5 input-layout skew).
    # Below the threshold (every bench SF) the plan is unchanged —
    # the same both-ways gate as parallelism_floor.
    cnts = {r["sig"]: r["cnt"] for r in cls_rows}
    exp_pairs = sum(c * (c - 1) // 2 for c in cnts.values()) + sum(
        cnts[a] * cnts[b] for a, b, _h in close_rows
    )
    par = spark.sparkContext.defaultParallelism
    gen_par = (
        min(max(par, exp_pairs // _PAIRS_PER_GEN_TASK), 4 * par)
        if exp_pairs > 2 * _PAIRS_PER_GEN_TASK
        else None
    )

    def _spread(df: DataFrame) -> DataFrame:
        return df.repartition(gen_par) if gen_par else df

    # cross-class pairs: (da from class sig_a) × (db from class sig_b)
    left = _spread(
        sigs.select(F.col("sig").alias("sig_a"), F.col("doc_id").alias("da"))
        .join(F.broadcast(close), "sig_a")
        .withColumn("salt", F.explode(salts))
    )
    right = sigs.select(
        F.col("sig").alias("sig_b"),
        F.col("doc_id").alias("db"),
        F.pmod("doc_id", F.lit(salt_n)).alias("salt"),
    )
    cross = left.join(right, ["sig_b", "salt"]).select(
        F.least("da", "db").alias("doc_a"),
        F.greatest("da", "db").alias("doc_b"),
        "hamming",
    )
    # within-class pairs (hamming 0): salted self-join on sig
    rep = _spread(
        sigs.select("sig", F.col("doc_id").alias("da"))
        .withColumn("salt", F.explode(salts))
    )
    sal = sigs.select(
        "sig",
        F.col("doc_id").alias("db"),
        F.pmod("doc_id", F.lit(salt_n)).alias("salt"),
    )
    within = (
        rep.join(sal, ["sig", "salt"])
        .filter(F.col("da") < F.col("db"))
        .select(
            F.col("da").alias("doc_a"),
            F.col("db").alias("doc_b"),
            F.lit(0).cast("long").alias("hamming"),
        )
    )
    return cross.unionByName(within)


def dedup_simhash_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash dedup, the PRIMARY scale answer: doc → representative
    (min doc_id of its Hamming-≤2 connected signature component) —
    LINEAR output in corpus size, unlike `dedup_simhash`'s pair
    enumeration (pair count grows with class size squared: 625 M pairs
    at sf1.0, half the full pair matrix). A 100 TB dedup run wants
    survivors, not 10^12 pair rows.

    Scale shape: the iterative min-label component propagation runs
    entirely on the CLASS graph (≤ 2^16 signature nodes however large
    the corpus — the loop's working set is independent of data size);
    docs touch exactly one hash aggregate (per-sig count / min id) and
    one broadcast join (sig → representative). Same propagation +
    localCheckpoint discipline as `dedup_clusters`; the oracle states
    the identical fixpoint as a recursive transitive closure.

    Output: (doc_id, representative_id, is_keeper) for every doc whose
    component holds ≥ 2 docs (including same-signature exact-sig dups).
    """
    sigs = _simhash_sigs(spark, sf_dir)
    # The component fixpoint runs DRIVER-side over the collected class
    # relation — ≤ 2^16 nodes at any corpus size, so union-find here is
    # the same model-sized-driver-state idiom as the k-means model
    # collect. The old iterative min-label propagation spent ~3 Spark
    # jobs per round (join + convergence probe + localCheckpoint) on a
    # graph that never holds corpus data; docs still touch exactly one
    # distributed aggregate (per-sig count/min id, memoized) and one
    # broadcast join (sig → representative), unchanged.
    cls_rows = memo_value(
        spark,
        sf_dir,
        "simhash_classes",
        lambda: sigs.groupBy("sig")
        .agg(F.count(F.lit(1)).alias("cnt"), F.min("doc_id").alias("min_doc"))
        .collect(),
    )
    parent: dict[int, int] = {r["sig"]: r["sig"] for r in cls_rows}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for sa, sb, _h in _close_pairs_py(list(parent)):
        ra, rb = find(sa), find(sb)
        if ra != rb:
            # min-label union: the smaller root stays the root, same
            # fixpoint as the propagation loop (label = min reachable)
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    comp_docs: dict[int, int] = {}
    comp_rep: dict[int, int] = {}
    for r in cls_rows:
        c = find(r["sig"])
        comp_docs[c] = comp_docs.get(c, 0) + r["cnt"]
        m = comp_rep.get(c)
        comp_rep[c] = r["min_doc"] if m is None else min(m, r["min_doc"])
    lookup_rows = [
        (r["sig"], comp_rep[find(r["sig"])])
        for r in cls_rows
        if comp_docs[find(r["sig"])] >= 2
    ]
    lookup = spark.createDataFrame(
        lookup_rows or [(0, 0)], "sig long, rep long"
    )
    if not lookup_rows:
        lookup = lookup.filter(F.lit(False))
    return sigs.join(F.broadcast(lookup), "sig").select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("rep").cast("long").alias("representative_id"),
        (F.col("doc_id") == F.col("rep")).cast("long").alias("is_keeper"),
    )


def _shingle_lineage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, shingle) distinct — 3-token shingles as id triples.

    Unpersisted lineage: the single persisted shingle relation is
    `_shingles_flagged` (this lineage replays at most twice while
    building it, over the already-persisted token-id relation)."""
    from pyspark.sql import Window

    ids = doc_token_ids(spark, sf_dir)
    w = Window.partitionBy("doc_id").orderBy("pos")
    t1 = F.lead("token_id", 1).over(w)
    t2 = F.lead("token_id", 2).over(w)
    return (
        ids.withColumn("t1", t1)
        .withColumn("t2", t2)
        .filter(F.col("t2").isNotNull())
        .select(
            "doc_id",
            F.concat_ws(
                "-",
                F.col("token_id").cast("string"),
                F.col("t1").cast("string"),
                F.col("t2").cast("string"),
            ).alias("shingle"),
        )
        .distinct()
    )


def _shingles_flagged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, shingle, is_hot) — the shingle relation with the
    DF-cap classification materialized ONCE (persisted). The hot list
    (df > NGRAM_DF_CAP) is tiny by construction, so the classifying
    join is a broadcast; downstream consumers (candidate grouping, hot
    intersection, sizes, contamination, repetition stats) filter this
    ONE persisted relation — there is no separately-persisted unflagged
    shingle relation (it was corpus-sized memory spent twice)."""

    def build() -> DataFrame:
        sh = _shingle_lineage(spark, sf_dir)
        hot = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > NGRAM_DF_CAP)
            .select("shingle", F.lit(True).alias("_hot"))
        )
        return sh.join(F.broadcast(hot), "shingle", "left").select(
            "doc_id",
            "shingle",
            F.coalesce(F.col("_hot"), F.lit(False)).alias("is_hot"),
        )

    return _memo_persist(spark, sf_dir, "shingles_flagged", build)


def _shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, shingle) view over the one persisted flagged relation."""
    return _shingles_flagged(spark, sf_dir).select("doc_id", "shingle")


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-gram shingle Jaccard over pairs sharing ≥1 RARE shingle.

    Two stages: candidates come from the equi-join restricted to
    shingles with document frequency ≤ NGRAM_DF_CAP (the hot-shingle
    exclusion that keeps the join sub-quadratic on boilerplate-heavy
    corpora); the exact intersection is then computed over the FULL
    shingle sets of candidate pairs only. Rare-shingle overlap falls
    straight out of the candidate join; hot-shingle overlap is an
    array_intersect over the candidates' per-doc hot-shingle arrays
    (bounded per doc by the doc's own shingle count) — no second
    shingle-level shuffle join.
    """
    sh = _shingles_flagged(spark, sf_dir)
    # Rare-shingle co-occurrence WITHOUT a self-join: group each rare
    # shingle's (sorted, ≤ NGRAM_DF_CAP) doc list in one shuffle, then
    # expand ordered pairs JVM-side with nested `transform` — at most
    # CAP·(CAP-1)/2 pairs per shingle, no skew possible by the DF cap.
    # (The old ra⋈rb equi-join shuffled the rare relation twice and
    # materialized the same pairs through a join instead.)
    pair_expand = F.expr(
        "flatten(transform(docs, (x, i) -> "
        "transform(slice(docs, i + 2, size(docs)), "
        "y -> struct(x AS doc_a, y AS doc_b))))"
    )
    # the per-shingle sorted doc lists are memo-persisted (pure
    # restatement of the flagged relation; steady-state reps re-ran
    # the shingle-keyed exchange every call) — the per-rep work starts
    # at the bounded pair expansion
    rare_docs = _memo_persist(
        spark,
        sf_dir,
        "rare_shingle_docs",
        lambda: sh.filter(~F.col("is_hot"))
        .groupBy("shingle")
        .agg(F.sort_array(F.collect_set("doc_id")).alias("docs")),
    )
    rare_inter = (
        rare_docs.select(F.explode(pair_expand).alias("p"))
        .select("p.doc_a", "p.doc_b")
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("long").alias("rare_i"))
    )
    # Per-doc stats in ONE pass over the persisted relation: total
    # shingle count (for the union denominator) + the hot-shingle
    # array (for the candidate-only hot intersection); memo-persisted —
    # steady-state reps re-ran this doc-keyed aggregate every call.
    stats = _memo_persist(
        spark,
        sf_dir,
        "shingle_stats",
        lambda: sh.groupBy("doc_id").agg(
            F.count(F.lit(1)).cast("long").alias("n_shingles"),
            F.sort_array(
                F.collect_list(F.when(F.col("is_hot"), F.col("shingle")))
            ).alias("hot_set"),
        ),
    )
    sa = stats.select(
        F.col("doc_id").alias("doc_a"),
        F.col("n_shingles").alias("na"),
        F.col("hot_set").alias("hot_a"),
    )
    sb = stats.select(
        F.col("doc_id").alias("doc_b"),
        F.col("n_shingles").alias("nb"),
        F.col("hot_set").alias("hot_b"),
    )
    inter = (
        F.col("rare_i")
        + F.size(F.array_intersect(F.col("hot_a"), F.col("hot_b")))
    ).cast("long")
    jac = inter / (F.col("na") + F.col("nb") - inter)
    return (
        rare_inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(jac >= NGRAM_JACCARD)
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
    )


#: Cap for the min-label propagation loop (graph diameter bound; dup
#: graphs are near-cliques so convergence is 2-3 rounds in practice).
MAX_CC_ITERS = 15


def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate clustering: connected components over the near-dup
    pair graph, keep-one selection per cluster.

    The step after LSH in a real dedup pipeline: pairs → components →
    one canonical doc per component. Iterative min-label propagation
    (each round: label := min(label, neighbors' labels)), a driver loop
    of distributed joins that converges in diameter rounds — the
    engine's one deliberately iterative algorithm. The DuckDB oracle
    states the same fixpoint as a recursive transitive closure.

    Each round ends in ``localCheckpoint`` — without it the logical
    plan nests the whole previous round per iteration and grows
    exponentially (plan-string generation alone OOMs the driver by
    round ~10). On a multi-node cluster prefer ``spark.sparkContext
    .setCheckpointDir`` + ``.checkpoint()`` so a lost executor can't
    invalidate truncated lineage; the algorithm is otherwise unchanged.

    Output: (doc_id, cluster_id, is_keeper) for every doc that has at
    least one near-duplicate; cluster_id = min doc_id in component.
    """
    # Memoized (not per-call .persist()): a per-call persist leaked a
    # fresh 27 M-row edge set + 54 M-row adjacency into storage on
    # EVERY invocation — at the sf3 rehearsal, 4 invocations (prime +
    # 3 reps) accumulated ~320 M cached rows, and the resulting
    # eviction made one rep rebuild the whole near-dup funnel
    # (BENCH_sf3 spread 16.5–308 s for identical work). The memo keyed
    # on (app, sf_dir) makes repeat invocations reuse one copy;
    # clear_caches() releases it like every Tier C relation.
    edges = _memo_persist(
        spark,
        sf_dir,
        "near_edges",
        lambda: dedup_near(spark, sf_dir).select("doc_a", "doc_b"),
    )
    # undirected adjacency
    adj = _memo_persist(
        spark,
        sf_dir,
        "near_adj",
        lambda: edges.unionByName(
            edges.select(
                F.col("doc_b").alias("doc_a"),
                F.col("doc_a").alias("doc_b"),
            )
        ),
    )
    labels = (
        adj.select(F.col("doc_a").alias("doc_id"))
        .distinct()
        .withColumn("label", F.col("doc_id"))
        .localCheckpoint()
    )
    for _ in range(MAX_CC_ITERS):
        neigh_min = (
            adj.join(
                labels.select(
                    F.col("doc_id").alias("doc_b"),
                    F.col("label").alias("nbr_label"),
                ),
                "doc_b",
            )
            .groupBy("doc_a")
            .agg(F.min("nbr_label").alias("min_nbr"))
        )
        # carry old_label through the checkpoint so convergence is read
        # off the materialized step instead of a second join
        step = (
            labels.join(
                neigh_min.select(
                    F.col("doc_a").alias("doc_id"), "min_nbr"
                ),
                "doc_id",
                "left",
            )
            .select(
                "doc_id",
                F.col("label").alias("old_label"),
                F.least(
                    "label", F.coalesce("min_nbr", F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint()
        )
        changed = (
            step.filter(F.col("label") != F.col("old_label"))
            .limit(1)
            .count()
        )
        labels = step.select("doc_id", "label")
        if changed == 0:
            break
    return labels.select(
        "doc_id",
        F.col("label").alias("cluster_id"),
        (F.col("doc_id") == F.col("label")).cast("long").alias("is_keeper"),
    )


def _params_values(params, cols) -> str:
    rows = ", ".join("(" + ", ".join(str(v) for v in row) + ")" for row in params)
    return f"({', '.join(cols)}) AS (VALUES {rows})"


_MINHASH_SQL = (
    f"{TOKENS_CTE}, hp{_params_values(MINHASH_PARAMS, ['i', 'a', 'b', 'band', 'w'])}, "
    "minh AS (SELECT doc_id, i, band, w, "
    f"MIN((a * token_id + b) % {HASH_P}) AS min_h "
    "FROM dset, hp GROUP BY doc_id, i, band, w), "
    "sigs AS (SELECT doc_id, band, "
    f"SUM((min_h % {BAND_MOD}) * w) AS band_hash FROM minh GROUP BY doc_id, band), "
    "cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b "
    "FROM sigs a JOIN sigs b ON a.band = b.band AND a.band_hash = b.band_hash "
    "AND a.doc_id < b.doc_id), "
    "sz AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS set_size FROM dset GROUP BY doc_id), "
    "inter AS (SELECT c.doc_a, c.doc_b, CAST(COUNT(*) AS BIGINT) AS inter "
    "FROM cand c JOIN dset ta ON ta.doc_id = c.doc_a "
    "JOIN dset tb ON tb.doc_id = c.doc_b AND tb.token_id = ta.token_id "
    "GROUP BY c.doc_a, c.doc_b)"
)

_SHINGLE_SQL = (
    f"{TOKENS_CTE}, sh AS (SELECT DISTINCT doc_id, "
    "CAST(token_id AS VARCHAR) || '-' || CAST(t1 AS VARCHAR) || '-' || "
    "CAST(t2 AS VARCHAR) AS shingle FROM ("
    "SELECT doc_id, token_id, "
    "LEAD(token_id, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS t1, "
    "LEAD(token_id, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS t2 "
    "FROM dtok) WHERE t2 IS NOT NULL), "
    "sz AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles FROM sh GROUP BY doc_id), "
    "rare AS (SELECT * FROM sh WHERE shingle NOT IN ("
    "SELECT shingle FROM sh GROUP BY shingle "
    f"HAVING COUNT(*) > {NGRAM_DF_CAP})), "
    "cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b "
    "FROM rare a JOIN rare b "
    "ON a.shingle = b.shingle AND a.doc_id < b.doc_id), "
    "inter AS (SELECT c.doc_a, c.doc_b, CAST(COUNT(*) AS BIGINT) AS inter "
    "FROM cand c JOIN sh a ON a.doc_id = c.doc_a "
    "JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle "
    "GROUP BY c.doc_a, c.doc_b)"
)

QUERIES = {
    "dedup_exact": dedup_exact,
    "dedup_near": dedup_near,
    "dedup_simhash": dedup_simhash,
    "dedup_simhash_classes": dedup_simhash_classes,
    "dedup_ngram_jaccard": dedup_ngram_jaccard,
    "dedup_clusters": dedup_clusters,
}

#: SimHash signature relation as an oracle CTE suffix (shared by the
#: pair and class queries).
_SIMHASH_SIGS_SQL = (
    f"{TOKENS_CTE}, hp{_params_values(SIMHASH_PARAMS, ['j', 'a', 'b', 'w'])}, "
    "bits AS (SELECT doc_id, j, w, "
    f"SUM(CASE WHEN ((a * token_id + b) % {HASH_P}) % 2 = 1 THEN 1 ELSE -1 END) AS s "
    "FROM dset, hp GROUP BY doc_id, j, w), "
    "sigs AS (SELECT doc_id, CAST(SUM(CASE WHEN s > 0 THEN w ELSE 0 END) AS BIGINT) AS sig "
    "FROM bits GROUP BY doc_id)"
)

#: dedup_near's pair relation as an oracle CTE suffix (jaccard ≥ 0.9).
_ND_PAIRS_SQL = (
    ", nd AS (SELECT i.doc_a, i.doc_b FROM inter i "
    "JOIN sz sa ON sa.doc_id = i.doc_a JOIN sz sb ON sb.doc_id = i.doc_b "
    "WHERE i.inter * 1.0 / (sa.set_size + sb.set_size - i.inter) >= "
    f"{NEAR_DUP_JACCARD}), "
    "und AS (SELECT doc_a AS a, doc_b AS b FROM nd "
    "UNION ALL SELECT doc_b, doc_a FROM nd), "
    "reach AS (SELECT a, b FROM und "
    "UNION SELECT r.a, u.b FROM reach r JOIN und u ON u.a = r.b) "
)

ORACLES = {
    "dedup_exact": (
        "SELECT md5(text) AS text_md5, CAST(MIN(doc_id) AS BIGINT) AS keep_id, "
        "CAST(COUNT(*) AS BIGINT) AS n_copies FROM documents GROUP BY md5(text)"
    ),
    "dedup_near": (
        f"{_MINHASH_SQL} "
        "SELECT i.doc_a, i.doc_b, "
        f"{dround('i.inter * 1.0 / (sa.set_size + sb.set_size - i.inter)', 4)} AS jaccard "
        "FROM inter i JOIN sz sa ON sa.doc_id = i.doc_a "
        "JOIN sz sb ON sb.doc_id = i.doc_b "
        f"WHERE i.inter * 1.0 / (sa.set_size + sb.set_size - i.inter) >= {NEAR_DUP_JACCARD}"
    ),
    "dedup_simhash": (
        f"{_SIMHASH_SIGS_SQL} "
        "SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, "
        "CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS hamming "
        "FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id "
        f"WHERE bit_count(xor(a.sig, b.sig)) <= {SIMHASH_MAX_HAMMING}"
    ),
    # component fixpoint over the ≤2^16-node SIGNATURE graph as a
    # recursive transitive closure; docs then inherit their class
    # component's representative (min doc_id)
    "dedup_simhash_classes": (
        (
            f"{_SIMHASH_SIGS_SQL}, "
            "cls AS (SELECT sig, CAST(COUNT(*) AS BIGINT) AS cnt, "
            "MIN(doc_id) AS min_doc FROM sigs GROUP BY sig), "
            "e AS (SELECT a.sig AS sa, b.sig AS sb FROM cls a JOIN cls b "
            "ON a.sig < b.sig "
            f"AND bit_count(xor(a.sig, b.sig)) <= {SIMHASH_MAX_HAMMING}), "
            "und AS (SELECT sa AS a, sb AS b FROM e "
            "UNION ALL SELECT sb, sa FROM e), "
            "reach AS (SELECT a, b FROM und "
            "UNION SELECT r.a, u.b FROM reach r JOIN und u ON u.a = r.b), "
            "comp AS (SELECT c.sig, "
            "LEAST(c.sig, COALESCE(MIN(r.b), c.sig)) AS comp "
            "FROM cls c LEFT JOIN reach r ON r.a = c.sig GROUP BY c.sig), "
            "stats AS (SELECT cm.comp, SUM(c.cnt) AS n_docs, "
            "MIN(c.min_doc) AS rep FROM comp cm "
            "JOIN cls c ON c.sig = cm.sig GROUP BY cm.comp) "
            "SELECT CAST(s.doc_id AS BIGINT) AS doc_id, "
            "CAST(st.rep AS BIGINT) AS representative_id, "
            "CAST(CASE WHEN s.doc_id = st.rep THEN 1 ELSE 0 END AS BIGINT) "
            "AS is_keeper "
            "FROM sigs s JOIN comp cm ON cm.sig = s.sig "
            "JOIN stats st ON st.comp = cm.comp WHERE st.n_docs >= 2"
        ).replace("WITH ", "WITH RECURSIVE ", 1)
    ),
    # recursive transitive closure states the same fixpoint the Spark
    # min-label propagation loop converges to
    "dedup_clusters": (
        _MINHASH_SQL.replace("WITH ", "WITH RECURSIVE ", 1)
        + _ND_PAIRS_SQL
        + "SELECT a AS doc_id, "
        "CAST(LEAST(a, MIN(b)) AS BIGINT) AS cluster_id, "
        "CAST(CASE WHEN LEAST(a, MIN(b)) = a THEN 1 ELSE 0 END AS BIGINT) "
        "AS is_keeper FROM reach GROUP BY a"
    ),
    "dedup_ngram_jaccard": (
        f"{_SHINGLE_SQL} "
        "SELECT i.doc_a, i.doc_b, "
        f"{dround('i.inter * 1.0 / (sa.n_shingles + sb.n_shingles - i.inter)', 4)} AS jaccard "
        "FROM inter i JOIN sz sa ON sa.doc_id = i.doc_a "
        "JOIN sz sb ON sb.doc_id = i.doc_b "
        f"WHERE i.inter * 1.0 / (sa.n_shingles + sb.n_shingles - i.inter) >= {NGRAM_JACCARD}"
    ),
}
