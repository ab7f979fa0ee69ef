"""Training-data pipeline operators (Tier C, north-star).

The ops a pretraining data pipeline runs AFTER cleaning/dedup, over
`documents`:

- `pack_chunks`: concat-and-chunk sequence packing — concatenate the
  corpus token stream in doc_id order and cut fixed-size context
  windows; per-chunk doc/token occupancy. The global prefix sum is
  computed the scalable way: range-sharded intra-shard window + a
  broadcast-size shard-offset relation, never a single-partition window
  over the corpus.
- `split_assign`: deterministic train/val/test assignment by a portable
  affine hash of doc_id (pure int64 arithmetic — identical in any
  engine, stable across runs/cluster sizes).
- `contamination_ngram`: benchmark-contamination check — fraction of a
  document's 3-gram shingles that appear in a held-out benchmark set
  (here: `doc_id % 97 == 0`), the standard eval-leakage screen.
- `repetition_stats`: within-document repetition (Gopher-style
  quality signals): duplicate-shingle ratio and top-token fraction.

Everything is expression-only over the shared token/shingle relations
of `tierc_common` / `dedup` (whole-stage codegen; no Python UDFs).
The reference repo has no analog surface (its four shards are metric
taps, prometheus.cpp:309-314); these extend the engine per the
north-star (BASELINE.json: LLM-data-pipeline operators at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from shards_prometheus_spark.model import dround, load_table
from shards_prometheus_spark.operators.dedup import _SHINGLE_SQL, _shingles
from shards_prometheus_spark.operators.tierc_common import (
    HASH_P,
    TOKENS_CTE,
    doc_token_ids,
)

#: Context window for concat-and-chunk packing.
CHUNK_TOKENS = 512
#: doc_id range per packing shard. floor(doc_id / SPAN) is monotone in
#: doc_id, so shard boundaries respect the global concat order; at
#: cluster scale pick SPAN from range statistics so each shard holds
#: O(10^5) docs and the shard-offset relation stays broadcast-size.
PACK_SHARD_SPAN = 64
#: Affine split hash (LCG multiplier/increment), mod 1000 buckets.
SPLIT_A = 1_103_515_245
SPLIT_B = 12_345
SPLIT_MOD = 1_000
TRAIN_LT = 900  # buckets [0,900) → train
VAL_LT = 950  # [900,950) → val; [950,1000) → test
#: Benchmark membership: doc_id % BENCH_MOD == 0 plays the eval set.
BENCH_MOD = 97
#: Contamination flag threshold on the shared-shingle fraction.
CONTAM_THRESHOLD = 0.2


def _doc_ntokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        doc_token_ids(spark, sf_dir)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_tokens"))
    )


def pack_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk packing: per context-window chunk, how many
    documents contribute and how many tokens it holds (last chunk may
    be partial; docs straddle boundaries — the standard pretraining
    packing, not next-fit binning).

    Scale shape: the exclusive prefix sum over the corpus is sharded —
    an intra-shard window partitioned by `floor(doc_id / SPAN)` plus an
    exclusive cumsum over the tiny per-shard totals relation, which is
    broadcast back. No single-partition window ever sees the corpus.
    """
    per_doc = _doc_ntokens(spark, sf_dir).withColumn(
        "shard", F.floor(F.col("doc_id") / PACK_SHARD_SPAN)
    )
    intra_w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    shard_totals = per_doc.groupBy("shard").agg(
        F.sum("n_tokens").alias("shard_n")
    )
    offset_w = Window.orderBy("shard").rowsBetween(
        Window.unboundedPreceding, -1
    )
    shard_offsets = shard_totals.select(
        "shard",
        F.coalesce(F.sum("shard_n").over(offset_w), F.lit(0)).alias(
            "shard_off"
        ),
    )
    placed = (
        per_doc.withColumn(
            "intra", F.coalesce(F.sum("n_tokens").over(intra_w), F.lit(0))
        )
        .join(F.broadcast(shard_offsets), "shard")
        .select(
            "doc_id",
            "n_tokens",
            (F.col("shard_off") + F.col("intra")).alias("start"),
        )
    )
    first = F.floor(F.col("start") / CHUNK_TOKENS)
    last = F.floor((F.col("start") + F.col("n_tokens") - 1) / CHUNK_TOKENS)
    spans = placed.select(
        "start",
        "n_tokens",
        F.explode(F.sequence(first, last)).alias("chunk_id"),
    )
    lo = F.greatest(F.col("start"), F.col("chunk_id") * CHUNK_TOKENS)
    hi = F.least(
        F.col("start") + F.col("n_tokens"),
        (F.col("chunk_id") + 1) * CHUNK_TOKENS,
    )
    return spans.groupBy("chunk_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(hi - lo).cast("long").alias("n_tokens"),
    )


def split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split: bucket = affine hash of
    doc_id mod 1000; 90/5/5. Pure int64 arithmetic — reproducible on
    any engine and invariant to partitioning, unlike rand(seed)."""
    from shards_prometheus_spark.model import load_table

    docs = load_table(spark, sf_dir, "documents")
    bucket = (F.col("doc_id") * SPLIT_A + SPLIT_B) % SPLIT_MOD
    return docs.select(
        "doc_id",
        bucket.cast("long").alias("bucket"),
        F.when(bucket < TRAIN_LT, F.lit("train"))
        .when(bucket < VAL_LT, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )


def contamination_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-leakage screen: per corpus doc, the fraction of its 3-gram
    shingles that occur in the benchmark set (`doc_id % 97 == 0`).

    The benchmark shingle relation is small by construction (the eval
    set is a sliver of the corpus) → left-semi join against it stays a
    broadcast at scale; the corpus side never shuffles on shingle."""
    sh = _shingles(spark, sf_dir)
    is_bench = F.col("doc_id") % BENCH_MOD == 0
    bench_shingles = sh.filter(is_bench).select("shingle").distinct()
    corpus = sh.filter(~is_bench)
    shared = (
        corpus.join(F.broadcast(bench_shingles), "shingle", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
    )
    sizes = corpus.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_shingles")
    )
    ratio = F.col("n_shared") / F.col("n_shingles")
    return (
        sizes.join(shared, "doc_id", "left")
        .withColumn("n_shared", F.coalesce("n_shared", F.lit(0)))
        .select(
            "doc_id",
            "n_shingles",
            "n_shared",
            F.round(ratio, 4).alias("contam_ratio"),
            (ratio >= CONTAM_THRESHOLD).cast("long").alias("contaminated"),
        )
    )


def repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-doc repetition signals (Gopher-style quality rules):
    duplicate 3-gram ratio (1 − distinct/total shingles) and the
    fraction of tokens taken by the single most frequent token. Docs
    shorter than 3 tokens are out of scope (no shingles)."""
    ids = doc_token_ids(spark, sf_dir)
    tok_counts = ids.groupBy("doc_id", "token_id").agg(
        F.count(F.lit(1)).alias("c")
    )
    per_doc = tok_counts.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.max("c").cast("long").alias("top_c"),
    )
    distinct_sh = (
        _shingles(spark, sf_dir)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_distinct_sh"))
    )
    total_sh = F.col("n_tokens") - 2
    return (
        per_doc.filter(F.col("n_tokens") >= 3)
        .join(distinct_sh, "doc_id")
        .select(
            "doc_id",
            "n_tokens",
            F.round(
                F.lit(1.0) - F.col("n_distinct_sh") / total_sh, 4
            ).alias("dup_shingle_ratio"),
            F.round(F.col("top_c") / F.col("n_tokens"), 4).alias(
                "top_token_ratio"
            ),
        )
    )


#: corpus_filter_chain thresholds (stage predicates).
FILTER_MIN_CHARS = 100
FILTER_LANG = "en"
FILTER_QUALITY_MIN = 0.25
#: Dedup key for the funnel's final stage: first-k-token prefix (a
#: boilerplate-prefix collapse; exact-text dedup is `dedup_exact`).
FILTER_PREFIX_TOKENS = 3


def corpus_filter_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data filter funnel: the survival count after each stage
    of the standard pretraining cleanup chain —

      00_all → 10_length (n_chars ≥ 100) → 20_lang (lang = 'en')
      → 30_quality (quality ≥ 0.25) → 40_dedup (min doc_id per
      3-token-prefix group among quality survivors)

    computed in ONE pass: every document gets cumulative stage flags as
    column expressions, the dedup survivor flag comes from a single
    keep-min join on the prefix key, and the funnel is one global
    aggregate unpivoted with `stack`. No per-stage re-scan of the
    corpus — at 100 TB this is one scan + one prefix-keyed shuffle,
    versus the naive five materialized intermediate corpora.
    """
    from shards_prometheus_spark.operators.text import text_quality_score

    docs = load_table(spark, sf_dir, "documents")
    q = text_quality_score(spark, sf_dir).select("doc_id", "quality")
    toks = F.filter(F.split(F.lower("text"), " "), lambda t: t != "")
    prefix = F.array_join(
        F.slice(toks, 1, FILTER_PREFIX_TOKENS), " "
    ).alias("pfx")
    f_len = F.col("n_chars") >= FILTER_MIN_CHARS
    f_lang = f_len & (F.col("lang") == FILTER_LANG)
    f_q = f_lang & (F.col("quality") >= FILTER_QUALITY_MIN)
    flagged = docs.join(q, "doc_id").select(
        "doc_id",
        prefix,
        f_len.alias("f_len"),
        f_lang.alias("f_lang"),
        f_q.alias("f_q"),
    )
    keep = (
        flagged.filter("f_q")
        .groupBy("pfx")
        .agg(F.min("doc_id").alias("keep_id"))
    )
    surv = flagged.join(keep, "pfx", "left").withColumn(
        "f_dedup", F.col("f_q") & (F.col("doc_id") == F.col("keep_id"))
    )
    agg = surv.agg(
        F.count(F.lit(1)).cast("long").alias("n_all"),
        F.sum(F.col("f_len").cast("long")).cast("long").alias("n_len"),
        F.sum(F.col("f_lang").cast("long")).cast("long").alias("n_lang"),
        F.sum(F.col("f_q").cast("long")).cast("long").alias("n_q"),
        F.sum(F.col("f_dedup").cast("long")).cast("long").alias("n_dedup"),
    )
    return agg.selectExpr(
        "stack(5, '00_all', n_all, '10_length', n_len, "
        "'20_lang', n_lang, '30_quality', n_q, '40_dedup', n_dedup) "
        "AS (stage, n_docs)"
    )


#: quota_sample: per-(lang, source) deterministic cap.
QUOTA_K = 3
QS_A = 48_271  # MINSTD multiplier — portable affine sampling hash
QS_B = 11
#: Salt fan-out for the two-phase top-k (phase 1 ranks within
#: (stratum, doc_id % SALT) shards so no window ever sorts a whole
#: stratum; phase 2 ranks the ≤ SALT·K survivors).
QUOTA_SALT = 16


def quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified quota sampling: keep the QUOTA_K
    documents with the smallest affine sampling hash per (lang, source)
    stratum — the per-domain/per-language cap every corpus-balancing
    recipe needs, reproducible across runs and engines (no rand()).

    Scale shape: a stratum can hold billions of docs, so the top-k is
    two-phase — rank inside (stratum, salt) shards (bounded windows),
    keep ≤ K per shard, then rank the ≤ SALT·K survivors per stratum.
    Identical output to a single global window (exact top-k), but no
    stratum-sized sort partition ever exists.
    """
    docs = load_table(spark, sf_dir, "documents")
    h = ((F.col("doc_id") * QS_A + QS_B) % HASH_P).alias("h")
    salted = docs.select(
        "doc_id", "lang", "source", h,
        (F.col("doc_id") % QUOTA_SALT).alias("salt"),
    )
    w1 = Window.partitionBy("lang", "source", "salt").orderBy(
        "h", "doc_id"
    )
    phase1 = salted.withColumn("r1", F.row_number().over(w1)).filter(
        F.col("r1") <= QUOTA_K
    )
    w2 = Window.partitionBy("lang", "source").orderBy("h", "doc_id")
    return (
        phase1.withColumn("sample_rank", F.row_number().over(w2).cast("long"))
        .filter(F.col("sample_rank") <= QUOTA_K)
        .select("doc_id", "lang", "source", "sample_rank")
    )


#: Mixture temperature for domain reweighting (DoReMi-style smoothing:
#: τ < 1 upweights small domains relative to proportional sampling).
MIX_TAU = 0.7
#: Training-order shards for the deterministic global shuffle.
SHUFFLE_SHARDS = 8
SHUF_A = 69_621  # portable affine permutation hash (distinct from the
SHUF_B = 113     # split/quota constants so the streams decorrelate)


def domain_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture sampling weights: per (lang, source) domain,
    token count → temperature-scaled weight w_i ∝ n_i^τ (normalized).
    The knob every multi-domain pretraining recipe tunes (DoReMi-style
    smoothing with a fixed τ; τ=1 recovers proportional sampling).

    One corpus scan, no explode: per-doc token counts are a pure
    `size(filter(split(...)))` expression, aggregated map-side into the
    domain-sized relation; the normalizer is a post-agg window over
    ~dozens of domain rows (vector-sized, PLANS.md 1-part convention).
    """
    docs = load_table(spark, sf_dir, "documents")
    n_tok = F.size(
        F.filter(F.split(F.lower("text"), " "), lambda t: t != "")
    ).cast("long")
    per_domain = docs.groupBy("lang", "source").agg(
        F.sum(n_tok).alias("n_tokens")
    )
    scaled = F.pow(F.col("n_tokens").cast("double"), F.lit(MIX_TAU))
    total = F.sum(scaled).over(Window.partitionBy())
    return per_domain.select(
        "lang",
        "source",
        "n_tokens",
        F.round(scaled / total, 6).alias("weight"),
    )


def global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle for training order: a portable
    affine permutation hash assigns every document a shard and a dense
    within-shard position — the reproducible "shuffled corpus" layout
    a data loader reads shard-by-shard. Identical output on any engine
    or cluster size (pure int64 arithmetic, no rand()).

    Scale shape: the only window is per-shard (corpus/SHUFFLE_SHARDS
    rows); at 100 TB raise SHUFFLE_SHARDS so each shard's row_number
    partition stays executor-sized — shard count does not change any
    document's hash, only the modulus that buckets it.
    """
    docs = load_table(spark, sf_dir, "documents")
    h = (F.col("doc_id") * SHUF_A + SHUF_B) % HASH_P
    w = Window.partitionBy("shard").orderBy("h")
    return (
        docs.select("doc_id", h.alias("h"))
        .withColumn("shard", (F.col("h") % SHUFFLE_SHARDS).cast("long"))
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .select("doc_id", "shard", "pos")
    )


QUERIES = {
    "pack_chunks": pack_chunks,
    "split_assign": split_assign,
    "contamination_ngram": contamination_ngram,
    "repetition_stats": repetition_stats,
    "corpus_filter_chain": corpus_filter_chain,
    "quota_sample": quota_sample,
    "domain_mix_weights": domain_mix_weights,
    "global_shuffle": global_shuffle,
}

ORACLES = {
    # the oracle states the same prefix sum unsharded — equality proves
    # the sharded decomposition lossless
    "pack_chunks": (
        f"{TOKENS_CTE}, nd AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) "
        "AS n FROM dtok GROUP BY doc_id), "
        "off AS (SELECT doc_id, n, CAST(COALESCE(SUM(n) OVER ("
        "ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING"
        "), 0) AS BIGINT) AS start FROM nd), "
        "spans AS (SELECT start, n, unnest(generate_series("
        f"start // {CHUNK_TOKENS}, (start + n - 1) // {CHUNK_TOKENS})) "
        "AS chunk_id FROM off) "
        "SELECT CAST(chunk_id AS BIGINT) AS chunk_id, "
        "CAST(COUNT(*) AS BIGINT) AS n_docs, "
        f"CAST(SUM(LEAST(start + n, (chunk_id + 1) * {CHUNK_TOKENS}) - "
        f"GREATEST(start, chunk_id * {CHUNK_TOKENS})) AS BIGINT) AS n_tokens "
        "FROM spans GROUP BY chunk_id"
    ),
    "split_assign": (
        "SELECT doc_id, "
        f"CAST((doc_id * {SPLIT_A} + {SPLIT_B}) % {SPLIT_MOD} AS BIGINT) "
        "AS bucket, "
        f"CASE WHEN (doc_id * {SPLIT_A} + {SPLIT_B}) % {SPLIT_MOD} < "
        f"{TRAIN_LT} THEN 'train' "
        f"WHEN (doc_id * {SPLIT_A} + {SPLIT_B}) % {SPLIT_MOD} < {VAL_LT} "
        "THEN 'val' ELSE 'test' END AS split FROM documents"
    ),
    "contamination_ngram": (
        f"{_SHINGLE_SQL}, "
        f"bsh AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % {BENCH_MOD} = 0), "
        f"corpus AS (SELECT * FROM sh WHERE doc_id % {BENCH_MOD} <> 0), "
        "shared AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared "
        "FROM corpus WHERE shingle IN (SELECT shingle FROM bsh) "
        "GROUP BY doc_id), "
        "csz AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles "
        "FROM corpus GROUP BY doc_id) "
        "SELECT c.doc_id, c.n_shingles, "
        "COALESCE(s.n_shared, 0) AS n_shared, "
        f"{dround('COALESCE(s.n_shared, 0) * 1.0 / c.n_shingles', 4)} "
        "AS contam_ratio, "
        "CAST(COALESCE(s.n_shared, 0) * 1.0 / c.n_shingles >= "
        f"{CONTAM_THRESHOLD} AS BIGINT) AS contaminated "
        "FROM csz c LEFT JOIN shared s USING (doc_id)"
    ),
    "repetition_stats": (
        f"{_SHINGLE_SQL}, "
        "pd AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens, "
        "CAST(MAX(c) AS BIGINT) AS top_c FROM ("
        "SELECT doc_id, token_id, COUNT(*) AS c FROM dtok "
        "GROUP BY doc_id, token_id) GROUP BY doc_id), "
        "dsh AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_distinct_sh "
        "FROM sh GROUP BY doc_id) "
        "SELECT p.doc_id, p.n_tokens, "
        f"{dround('1.0 - d.n_distinct_sh * 1.0 / (p.n_tokens - 2)', 4)} "
        "AS dup_shingle_ratio, "
        f"{dround('p.top_c * 1.0 / p.n_tokens', 4)} AS top_token_ratio "
        "FROM pd p JOIN dsh d USING (doc_id) WHERE p.n_tokens >= 3"
    ),
    "corpus_filter_chain": None,  # built below (needs text's stats CTE)
    "quota_sample": (
        "SELECT doc_id, lang, source, CAST(rk AS BIGINT) AS sample_rank "
        "FROM (SELECT doc_id, lang, source, ROW_NUMBER() OVER ("
        "PARTITION BY lang, source "
        f"ORDER BY (doc_id * {QS_A} + {QS_B}) % {HASH_P}, doc_id) AS rk "
        f"FROM documents) WHERE rk <= {QUOTA_K}"
    ),
}


def _filter_chain_oracle() -> str:
    from shards_prometheus_spark.operators.text import (
        _DOC_STATS_SQL,
        QUALITY_EXPR_SQL,
    )

    return (
        f"{_DOC_STATS_SQL}, "
        f"q AS (SELECT doc_id, {dround(QUALITY_EXPR_SQL, 4)} AS quality "
        "FROM stats), "
        "f AS (SELECT d.doc_id, "
        "array_to_string(list_filter(string_split(lower(d.text), ' '), "
        f"t -> t <> '')[1:{FILTER_PREFIX_TOKENS}], ' ') AS pfx, "
        f"(d.n_chars >= {FILTER_MIN_CHARS}) AS f_len, "
        f"(d.n_chars >= {FILTER_MIN_CHARS} AND d.lang = '{FILTER_LANG}') "
        "AS f_lang, "
        f"(d.n_chars >= {FILTER_MIN_CHARS} AND d.lang = '{FILTER_LANG}' "
        f"AND q.quality >= {FILTER_QUALITY_MIN}) AS f_q "
        "FROM documents d JOIN q USING (doc_id)), "
        "k AS (SELECT pfx, MIN(doc_id) AS keep_id FROM f WHERE f_q "
        "GROUP BY pfx) "
        "SELECT '00_all' AS stage, CAST(COUNT(*) AS BIGINT) AS n_docs FROM f "
        "UNION ALL SELECT '10_length', CAST(COALESCE(SUM(CASE WHEN f_len "
        "THEN 1 ELSE 0 END), 0) AS BIGINT) FROM f "
        "UNION ALL SELECT '20_lang', CAST(COALESCE(SUM(CASE WHEN f_lang "
        "THEN 1 ELSE 0 END), 0) AS BIGINT) FROM f "
        "UNION ALL SELECT '30_quality', CAST(COALESCE(SUM(CASE WHEN f_q "
        "THEN 1 ELSE 0 END), 0) AS BIGINT) FROM f "
        "UNION ALL SELECT '40_dedup', CAST(COUNT(*) AS BIGINT) FROM f "
        "JOIN k USING (pfx) WHERE f.f_q AND f.doc_id = k.keep_id"
    )


ORACLES["corpus_filter_chain"] = _filter_chain_oracle()

ORACLES["domain_mix_weights"] = (
    "WITH d AS (SELECT lang, source, CAST(SUM(length(list_filter("
    "string_split(lower(text), ' '), x -> x <> ''))) AS BIGINT) "
    "AS n_tokens FROM documents GROUP BY 1, 2) "
    "SELECT lang, source, n_tokens, "
    + dround(
        f"POWER(n_tokens, {MIX_TAU}) "
        f"/ SUM(POWER(n_tokens, {MIX_TAU})) OVER ()",
        6,
    )
    + " AS weight FROM d"
)

ORACLES["global_shuffle"] = (
    f"WITH h AS (SELECT doc_id, (doc_id * {SHUF_A} + {SHUF_B}) "
    f"% {HASH_P} AS h FROM documents) "
    "SELECT doc_id, CAST(h % "
    f"{SHUFFLE_SHARDS} AS BIGINT) AS shard, "
    "CAST(ROW_NUMBER() OVER (PARTITION BY h % "
    f"{SHUFFLE_SHARDS} ORDER BY h) AS BIGINT) AS pos FROM h"
)
