"""Shared plumbing for Tier C (LLM-data-pipeline) operators.

Portability contract: every hash used by dedup/similarity operators is
*arithmetic over portable integers* — token ids assigned by rank over
the sorted vocabulary, then affine hashes mod a prime — never an
engine-native hash function (Spark xxhash64 and DuckDB hash() disagree
by construction). This keeps each operator bit-checkable against the
DuckDB oracle while remaining pure JVM-side column arithmetic in Spark
(no Python UDFs anywhere).

Scale notes: the vocabulary relation is tiny relative to the corpus
(Heaps' law) and broadcast-joins onto the exploded token stream; for a
100 TB corpus you'd persist the vocab dictionary once and reuse it
across runs. The global ROW_NUMBER used for ids is over the *distinct
vocabulary*, not the corpus.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from shards_prometheus_spark.model import load_table

#: Modulus for affine token hashes (Mersenne prime 2^31-1).
HASH_P = 2_147_483_647

#: Memoized persisted token relations, keyed by (appId, sf_dir, kind).
#: The tokenize → vocab-rank → join lineage feeds every dedup stage
#: (signatures, strategy probe, both sides of the verify join); without
#: persistence Spark recomputes it once per consumer. At cluster scale
#: this is the "persist the vocab dictionary once" note below made real.
#:
#: Bounded: insertion-ordered LRU capped at _CACHE_MAX entries; evicted
#: relations are unpersisted immediately. Storage is MEMORY_AND_DISK so
#: a relation larger than executor memory spills instead of evicting
#: other blocks (at 100 TB these are corpus-sized — disk spill is the
#: correct failure mode, silent recompute is not).
_TOKEN_CACHE: dict[tuple[str, str, str], DataFrame] = {}

#: Relation kinds per sf_dir: the token lineage (ids, sets, minhash /
#: simhash signatures, shingles_flagged, near-dup edges + adjacency,
#: token masks), the embedding lineage (kmeans dims, LSH buckets, IVF
#: assignment) and three registry-sized exposition relations (snapshot,
#: classic payload, OpenMetrics payload — memoized here so a
#: long-running exposer's per-scrape rebuilds stop accumulating
#: unreleased persists); 20 leaves headroom for one sf_dir plus
#: stragglers from a previous one.
_CACHE_MAX = 20


#: Memoized model-sized DRIVER VALUES per (app, sf_dir, kind): row
#: counts (memo_count — e.g. the signature count that sizes
#: dedup_near's band-join width), bounded collected Row lists
#: (memo_value — e.g. the ≤2^16-row simhash class list) and pinned
#: scalars (the PromQL t_max) — one job per key instead of one per
#: query call. Everything here must be bounded regardless of corpus
#: size; corpus-sized state belongs in _TOKEN_CACHE.
_COUNT_CACHE: dict[tuple[str, str, str], Any] = {}


def memo_count(spark: SparkSession, sf_dir: str, kind: str, df: DataFrame) -> int:
    key = (spark.sparkContext.applicationId, sf_dir, kind)
    n = _COUNT_CACHE.get(key)
    if n is None:
        n = df.count()
        _COUNT_CACHE[key] = n
    return n


def memo_value(spark: SparkSession, sf_dir: str, kind: str, compute):
    """Memoized model-sized driver value per (app, sf_dir, kind) —
    same store and release discipline as memo_count (clear_caches),
    for collected relations that are BOUNDED regardless of corpus size
    (e.g. the ≤2^16-row simhash class list)."""
    key = (spark.sparkContext.applicationId, sf_dir, kind)
    if key not in _COUNT_CACHE:
        _COUNT_CACHE[key] = compute()
    return _COUNT_CACHE[key]


def _memo_persist(spark: SparkSession, sf_dir: str, kind: str, build) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir, kind)
    df = _TOKEN_CACHE.get(key)
    if df is not None:
        _TOKEN_CACHE[key] = _TOKEN_CACHE.pop(key)  # refresh LRU position
        return df
    df = build().persist(StorageLevel.MEMORY_AND_DISK)
    _TOKEN_CACHE[key] = df
    while len(_TOKEN_CACHE) > _CACHE_MAX:
        evicted = _TOKEN_CACHE.pop(next(iter(_TOKEN_CACHE)))
        try:
            evicted.unpersist()
        except Exception:
            pass
    return df


def clear_caches(spark: SparkSession | None = None) -> int:
    """Unpersist and drop every memoized Tier C relation.

    Call between query families (bench.py does) or at session teardown
    so a long-lived driver doesn't accumulate corpus-sized persisted
    relations indefinitely. Returns the number of relations released.
    """
    from shards_prometheus_spark import model

    n = 0
    for df in _TOKEN_CACHE.values():
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass
    _TOKEN_CACHE.clear()
    _COUNT_CACHE.clear()
    # lazy plan memos (no pinned data, but released on the same signal
    # so rewrite-a-dir-in-place keeps its one escape hatch)
    model._PLAN_CACHE.clear()
    # cached label_str rendering Columns hold py4j refs into the
    # active gateway — release them here too so a stopped-and-
    # restarted JVM gateway in one process cannot serve dead refs
    from shards_prometheus_spark.functions import labelset

    labelset._LABEL_STR_CACHE.clear()
    return n


def doc_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, pos, token): lowercased whitespace tokens, pos 0-based."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.posexplode(F.split(F.lower("text"), " ")).alias("pos", "token"),
    ).filter(F.col("token") != "")


def vocab(tokens: DataFrame) -> DataFrame:
    """(token, token_id): rank over the sorted distinct vocabulary.

    The global dense rank is SHARDED (same sharded-prefix-sum shape as
    pipeline.pack_chunks): tokens range-shard by their 2-char prefix —
    order-preserving, so every token in shard p sorts before every
    token in shard q > p — each shard ranks internally in parallel, and
    the exclusive prefix sum over the tiny per-shard counts relation
    (≤ charset² rows, whatever the corpus size) broadcasts back. Ids
    are identical to a single global ROW_NUMBER (the oracle's form) but
    no window ever sees the whole vocabulary in one partition — at
    10⁸-10⁹ distinct tokens (100 TB web corpus) the per-shard windows
    stay ~10⁵-10⁶ rows.
    """
    distinct = tokens.select("token").distinct().withColumn(
        "shard", F.substring("token", 1, 2)
    )
    intra_w = Window.partitionBy("shard").orderBy("token")
    shard_counts = distinct.groupBy("shard").agg(
        F.count(F.lit(1)).alias("shard_n")
    )
    offset_w = Window.orderBy("shard").rowsBetween(
        Window.unboundedPreceding, -1
    )
    shard_offsets = shard_counts.select(
        "shard",
        F.coalesce(F.sum("shard_n").over(offset_w), F.lit(0)).alias(
            "shard_off"
        ),
    )
    return (
        distinct.withColumn("intra", F.row_number().over(intra_w))
        .join(F.broadcast(shard_offsets), "shard")
        .select(
            "token",
            (F.col("shard_off") + F.col("intra")).cast("long").alias(
                "token_id"
            ),
        )
    )


def doc_token_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, pos, token_id) — token stream joined to the vocab.

    Persisted per (session, sf_dir): consumed by shingling, fingerprints
    and set-building, each of which would otherwise replay the tokenize
    + vocab-window + join lineage.
    """

    def build() -> DataFrame:
        toks = doc_tokens(spark, sf_dir)
        return toks.join(F.broadcast(vocab(toks)), "token").select(
            "doc_id", "pos", "token_id"
        )

    return _memo_persist(spark, sf_dir, "ids", build)


def doc_token_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, token_id) distinct — the unigram set per document."""
    return _memo_persist(
        spark,
        sf_dir,
        "sets",
        lambda: doc_token_ids(spark, sf_dir)
        .select("doc_id", "token_id")
        .distinct(),
    )


#: DuckDB CTE mirror of the above (prefix for Tier C oracle SQL).
TOKENS_CTE = (
    "WITH tok AS (SELECT doc_id, gs - 1 AS pos, token FROM ("
    "SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token, "
    "generate_subscripts(string_split(lower(text), ' '), 1) AS gs "
    "FROM documents) WHERE token <> ''), "
    "vocab AS (SELECT token, CAST(ROW_NUMBER() OVER (ORDER BY token) AS BIGINT) "
    "AS token_id FROM (SELECT DISTINCT token FROM tok)), "
    "dtok AS (SELECT t.doc_id, t.pos, v.token_id FROM tok t "
    "JOIN vocab v USING (token)), "
    "dset AS (SELECT DISTINCT doc_id, token_id FROM dtok)"
)


def pair_jaccard(
    candidates: DataFrame, token_sets: DataFrame
) -> DataFrame:
    """Jaccard over unigram sets for candidate (doc_a, doc_b) pairs.

    Only candidate pairs are scored — the LSH/banding stage upstream is
    what keeps this sub-quadratic at corpus scale.

    Shape: each side's token set rides as ONE sorted array column per
    document and the intersection is a codegen `array_intersect` per
    pair — two hash joins over #pairs rows. The earlier exploded form
    (join on (doc, token_id), then a pair-keyed count aggregate)
    shuffled #pairs × set_size narrow rows TWICE; the sf1.0 rehearsal
    measured it 31× at 10× data (9.15 M pairs × ~10² tokens ≈ 2×10⁹
    aggregate rows through 32 partitions). Arrays keep the shuffled
    row count at #pairs + #docs, which is what scales to a 100 TB
    corpus where the candidate volume, not the token stream, should
    bound verify cost.
    """
    # token ids are dense vocabulary ranks (< 2^31 for any corpus
    # whose vocab fits an int), so the array rides as INT not LONG —
    # the candidate-side array payload is the verify shuffle's binding
    # cost (two ~set_size arrays per candidate pair; 9.15 M pairs at
    # sf1.0), and halving its bytes halves the GC/shuffle pressure
    # that dominates that stage's wall-time variance.
    arrs = token_sets.groupBy("doc_id").agg(
        F.sort_array(
            F.collect_set(F.col("token_id").cast("int"))
        ).alias("toks"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    aa = arrs.select(
        F.col("doc_id").alias("doc_a"),
        F.col("toks").alias("ta"),
        F.col("n").alias("na"),
    )
    bb = arrs.select(
        F.col("doc_id").alias("doc_b"),
        F.col("toks").alias("tb"),
        F.col("n").alias("nb"),
    )
    inter = F.size(F.array_intersect("ta", "tb")).cast("long")
    return (
        candidates.join(aa, "doc_a")
        .join(bb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (inter / (F.col("na") + F.col("nb") - inter)).alias(
                "jaccard_raw"
            ),
        )
    )
