"""Similarity search over embeddings (Tier C, north-star — SURVEY.md §2c #20).

Two paths over `embeddings(vec_id, embedding ARRAY<FLOAT>, label)`:

- ``similarity_topk``: brute-force cosine top-k — the exactness
  baseline. The dot product is a JVM-side higher-order expression
  (zip_with + aggregate), NOT a Python UDF; one broadcast of the query
  vector, one scan, one small top-k.
- ``similarity_lsh``: random-hyperplane LSH — the 100 TB path. Sign
  bits against 8 deterministic hyperplanes form a bucket key; only the
  query's bucket is scored. Hyperplane coefficients are portable affine
  arithmetic (same numbers in the oracle), not engine RNG.
- ``dedup_embedding_cosine``: embedding near-dup pairs above a cosine
  threshold among LSH-bucket mates — the bucket self-join is the
  blocking stage (oracle applies the identical blocking), so no
  quadratic all-pairs stage exists at any scale.

Parity: products of float32 values are exact in double, so both engines
differ only in summation order (~1e-16 relative) — ROUND(…,4) outputs
and a rounded-then-ranked ordering make results identical.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from shards_prometheus_spark.model import dround, load_table

QUERY_VEC_ID = 0
TOP_K = 10
COSINE_DUP_THRESHOLD = 0.40

NUM_PLANES = 8
PLANE_MOD = 1_009
PLANE_SHIFT = PLANE_MOD // 2  # center coefficients on ~0
LSH_PARAMS = [(j, 7_907 * j + 104_729, 9_973 * j + 224_737, 1 << j) for j in range(NUM_PLANES)]

#: IVF coarse quantizer: a real build k-means-trains these; here the
#: centroid set is a deterministic sample of the corpus (fixed vec_ids)
#: so the DuckDB oracle sees the identical quantizer.
IVF_CENTROID_IDS = [1, 2, 3, 4]
IVF_NPROBE = 2


def _dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, d, v) — dim-exploded embeddings, values as double."""
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id", F.posexplode("embedding").alias("d", "v_f")
    ).select("vec_id", "d", F.col("v_f").cast("double").alias("v"))


def _norms(dims: DataFrame) -> DataFrame:
    return dims.groupBy("vec_id").agg(
        F.sqrt(F.sum(F.col("v") * F.col("v"))).alias("nrm")
    )


def _dot_expr(a: str, b: str) -> Column:
    """JVM-side dot product of two array<float> columns in double."""
    prods = F.zip_with(
        F.col(a), F.col(b), lambda x, y: x.cast("double") * y.cast("double")
    )
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def _norm_expr(col: str) -> Column:
    sq = F.aggregate(
        F.transform(F.col(col), lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return F.sqrt(sq)


def similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 against the query vector (vec_id=0)."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("embedding").alias("q_emb")
    )
    cos = (_dot_expr("embedding", "q_emb") / (
        _norm_expr("embedding") * _norm_expr("q_emb")
    )).alias("cos_raw")
    scored = (
        emb.filter(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(q))
        .select("vec_id", cos)
        .select("vec_id", F.round("cos_raw", 6).alias("cos6"))
    )
    w = Window.orderBy(F.desc("cos6"), F.asc("vec_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= TOP_K)
        .select("vec_id", F.round("cos6", 4).alias("cosine"), "rk")
    )


def _buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, bucket) — 8-bit random-hyperplane signature.

    Plane coefficient for (plane j, dim d):
    ((a_j·(d+1) + b_j) mod 1009) − 504 — portable integer arithmetic.
    Memo-persisted: every LSH query references it twice (query bucket +
    candidate side), and recall eval re-probes it.
    """
    from shards_prometheus_spark.operators.tierc_common import _memo_persist

    def build() -> DataFrame:
        params = spark.createDataFrame(
            LSH_PARAMS, "j int, a long, b long, w long"
        )
        dims = _dims(spark, sf_dir)
        coef = (
            (F.col("a") * (F.col("d") + 1) + F.col("b")) % F.lit(PLANE_MOD)
            - F.lit(PLANE_SHIFT)
        ).cast("double")
        return (
            dims.crossJoin(F.broadcast(params))
            .groupBy("vec_id", "j", "w")
            .agg(F.sum(F.col("v") * coef).alias("proj"))
            .groupBy("vec_id")
            .agg(
                F.sum(
                    F.when(F.col("proj") > 0, F.col("w")).otherwise(F.lit(0))
                )
                .cast("long")
                .alias("bucket")
            )
        )

    return _memo_persist(spark, sf_dir, "lsh_buckets", build)


def similarity_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k within the query's LSH bucket — the sub-linear scale path."""
    buckets = _buckets(spark, sf_dir)
    qb = buckets.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("bucket").alias("q_bucket")
    )
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("embedding").alias("q_emb")
    )
    cand = (
        buckets.crossJoin(F.broadcast(qb))
        .filter(
            (F.col("bucket") == F.col("q_bucket"))
            & (F.col("vec_id") != QUERY_VEC_ID)
        )
        .select("vec_id")
    )
    cos = (_dot_expr("embedding", "q_emb") / (
        _norm_expr("embedding") * _norm_expr("q_emb")
    )).alias("cos_raw")
    scored = (
        emb.join(cand, "vec_id")
        .crossJoin(F.broadcast(q))
        .select("vec_id", cos)
        .select("vec_id", F.round("cos_raw", 6).alias("cos6"))
    )
    w = Window.orderBy(F.desc("cos6"), F.asc("vec_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= TOP_K)
        .select("vec_id", F.round("cos6", 4).alias("cosine"), "rk")
    )


def _ivf_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, cent_id, rk) — cosine rank of each centroid per vector.

    The centroid table is tiny and broadcast; assignment is one scan of
    the corpus with a JVM-side dot product per (vector, centroid) — the
    inverted-file build step. At 100 TB the cell id becomes the
    partition/bucket key the file is physically clustered by.
    Memo-persisted: IVF queries reference it twice (cells + the query's
    probe set) and semantic dedup blocks on it.
    """
    from shards_prometheus_spark.operators.tierc_common import _memo_persist

    def build() -> DataFrame:
        emb = load_table(spark, sf_dir, "embeddings")
        cents = emb.filter(F.col("vec_id").isin(IVF_CENTROID_IDS)).select(
            F.col("vec_id").alias("cent_id"),
            F.col("embedding").alias("cent_emb"),
        )
        cos = _dot_expr("embedding", "cent_emb") / (
            _norm_expr("embedding") * _norm_expr("cent_emb")
        )
        scored = emb.crossJoin(F.broadcast(cents)).select(
            "vec_id", "cent_id", F.round(cos, 6).alias("c6")
        )
        w = Window.partitionBy("vec_id").orderBy(
            F.desc("c6"), F.asc("cent_id")
        )
        return scored.withColumn("rk", F.row_number().over(w))

    return _memo_persist(spark, sf_dir, "ivf_assign", build)


def similarity_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: search only the nprobe=2 cells nearest the query.

    Inverted-file flavor of `similarity_lsh`: vectors are bucketed by
    nearest coarse centroid; the query probes its IVF_NPROBE nearest
    cells and brute-force-scores just those candidates.
    """
    assign = _ivf_assign(spark, sf_dir)
    cells = assign.filter(F.col("rk") == 1).select(
        "vec_id", F.col("cent_id").alias("cell")
    )
    qcells = (
        assign.filter(
            (F.col("vec_id") == QUERY_VEC_ID) & (F.col("rk") <= IVF_NPROBE)
        )
        .select(F.col("cent_id").alias("cell"))
    )
    cand = (
        cells.join(F.broadcast(qcells), "cell")
        .filter(F.col("vec_id") != QUERY_VEC_ID)
        .select("vec_id")
    )
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("embedding").alias("q_emb")
    )
    cos = (_dot_expr("embedding", "q_emb") / (
        _norm_expr("embedding") * _norm_expr("q_emb")
    )).alias("cos_raw")
    scored = (
        emb.join(cand, "vec_id")
        .crossJoin(F.broadcast(q))
        .select("vec_id", cos)
        .select("vec_id", F.round("cos_raw", 6).alias("cos6"))
    )
    w = Window.orderBy(F.desc("cos6"), F.asc("vec_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= TOP_K)
        .select("vec_id", F.round("cos6", 4).alias("cosine"), "rk")
    )


def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs: cosine ≥ 0.40 among LSH-bucket mates.

    LSH-BLOCKED, never all-pairs: candidate pairs come from the
    random-hyperplane bucket self-join (the same `_buckets` blocking
    `similarity_knn_graph` uses — pair count bounded by bucket
    occupancy, corpus/2^planes per bucket in expectation), then each
    candidate is scored with the JVM-side array dot product. No
    dim-keyed pair shuffle (a `d`-keyed join has ≤ embedding-dim
    distinct keys — extreme skew by construction) and no quadratic
    stage; the oracle applies the identical bucket blocking, so
    reported pairs match exactly.
    """
    buckets = _buckets(spark, sf_dir)
    cand = (
        buckets.alias("x")
        .join(buckets.alias("y"), "bucket")
        .filter(F.col("x.vec_id") < F.col("y.vec_id"))
        .select(
            F.col("x.vec_id").alias("vec_a"), F.col("y.vec_id").alias("vec_b")
        )
    )
    emb = load_table(spark, sf_dir, "embeddings")
    ea = emb.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("e_a"))
    eb = emb.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("e_b"))
    cos = _dot_expr("e_a", "e_b") / (_norm_expr("e_a") * _norm_expr("e_b"))
    return (
        cand.join(ea, "vec_a")
        .join(eb, "vec_b")
        .select("vec_a", "vec_b", F.round(cos, 6).alias("cos6"))
        .filter(F.col("cos6") >= COSINE_DUP_THRESHOLD)
        .select("vec_a", "vec_b", F.round("cos6", 4).alias("cosine"))
    )


def similarity_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch kNN-graph build (k=1): each vector's nearest neighbor
    among its LSH-bucket mates — the all-vectors ANN-graph step a
    dedup/cluster pipeline runs, as a bucketed SELF-join (vs. the
    query-vs-corpus shape of `similarity_lsh`). Pair count is bounded
    by bucket occupancy (corpus/2^planes per bucket in expectation),
    never all-pairs; vectors alone in their bucket have no edge (at
    scale you'd multi-probe neighboring buckets to close that gap).
    Output: (vec_id, nn_id, cosine)."""
    buckets = _buckets(spark, sf_dir)
    cand = (
        buckets.alias("x")
        .join(buckets.alias("y"), "bucket")
        .filter(F.col("x.vec_id") != F.col("y.vec_id"))
        .select(
            F.col("x.vec_id").alias("va"), F.col("y.vec_id").alias("vb")
        )
    )
    emb = load_table(spark, sf_dir, "embeddings")
    ea = emb.select(F.col("vec_id").alias("va"), F.col("embedding").alias("e_a"))
    eb = emb.select(F.col("vec_id").alias("vb"), F.col("embedding").alias("e_b"))
    cos = (_dot_expr("e_a", "e_b") / (
        _norm_expr("e_a") * _norm_expr("e_b")
    ))
    scored = (
        cand.join(ea, "va")
        .join(eb, "vb")
        .select("va", "vb", F.round(cos, 6).alias("cos6"))
    )
    w = Window.partitionBy("va").orderBy(F.desc("cos6"), F.asc("vb"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            F.col("va").alias("vec_id"),
            F.col("vb").alias("nn_id"),
            F.round("cos6", 4).alias("cosine"),
        )
    )


def embedding_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding analytics: mean-pooled centroid norm and
    cohesion (mean cosine of members to their centroid) — the
    class-separation report an embedding-quality pipeline runs after
    labeling. Two aggregations over the dim-exploded relation plus a
    broadcast of the (n_labels·dim) centroid table; centroids pinned
    to 6 dp so both engines score against identical vectors."""
    emb = load_table(spark, sf_dir, "embeddings")
    dims = _dims(spark, sf_dir).join(
        emb.select("vec_id", "label"), "vec_id"
    )
    cents = (
        dims.groupBy("label", "d")
        .agg(F.round(F.avg("v"), 6).alias("c"))
    )
    cnorm = cents.groupBy("label").agg(
        F.sqrt(F.sum(F.col("c") * F.col("c"))).alias("cnrm")
    )
    vnorm = dims.groupBy("vec_id", "label").agg(
        F.sqrt(F.sum(F.col("v") * F.col("v"))).alias("vnrm")
    )
    dots = (
        dims.join(F.broadcast(cents), ["label", "d"])
        .groupBy("vec_id", "label")
        .agg(F.sum(F.col("v") * F.col("c")).alias("dot"))
    )
    cos = (
        dots.join(vnorm, ["vec_id", "label"])
        .join(F.broadcast(cnorm), "label")
        .select(
            "label",
            F.round(F.col("dot") / (F.col("vnrm") * F.col("cnrm")), 6)
            .alias("cos6"),
        )
    )
    agg = cos.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n_vecs"),
        F.round(F.avg("cos6"), 4).alias("cohesion"),
    )
    return agg.join(
        cnorm.select("label", F.round("cnrm", 4).alias("centroid_norm")),
        "label",
    )


#: Cosine threshold for semantic (embedding-space) duplicates.
SEMDEDUP_THRESHOLD = 0.40


def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-shaped semantic dedup: cluster the corpus with the IVF
    coarse quantizer, then WITHIN each cell drop every vector that has
    a higher-priority (smaller vec_id) cell-mate above the cosine
    threshold — the cluster-then-screen recipe of semantic dedup at
    scale (pairwise work bounded by cell occupancy, never corpus²).

    Output per vector: its cell, how many smaller-id in-cell semantic
    dups it has, and the keep flag (kept iff none). Deterministic
    min-id survivorship, so the oracle can mirror it exactly.

    Scale note: parallelism of the pair stage is bounded by cell count
    — here the demo quantizer's 4 cells; a production run trains
    k ≈ √N cells (similarity_kmeans is the trainer), which keeps cell
    occupancy ~√N and the within-cell pair work ~N total.
    """
    cells = (
        _ivf_assign(spark, sf_dir)
        .filter(F.col("rk") == 1)
        .select("vec_id", F.col("cent_id").alias("cell"))
    )
    cand = (
        cells.alias("x")
        .join(cells.alias("y"), "cell")
        .filter(F.col("x.vec_id") < F.col("y.vec_id"))
        .select(
            F.col("x.vec_id").alias("va"), F.col("y.vec_id").alias("vb")
        )
    )
    emb = load_table(spark, sf_dir, "embeddings")
    ea = emb.select(F.col("vec_id").alias("va"), F.col("embedding").alias("e_a"))
    eb = emb.select(F.col("vec_id").alias("vb"), F.col("embedding").alias("e_b"))
    cos = _dot_expr("e_a", "e_b") / (_norm_expr("e_a") * _norm_expr("e_b"))
    drops = (
        cand.join(ea, "va")
        .join(eb, "vb")
        .select("vb", F.round(cos, 6).alias("cos6"))
        .filter(F.col("cos6") >= SEMDEDUP_THRESHOLD)
        .groupBy("vb")
        .agg(F.count(F.lit(1)).cast("long").alias("n_dups"))
    )
    return (
        cells.join(drops, cells.vec_id == drops.vb, "left")
        .select(
            "vec_id",
            "cell",
            F.coalesce("n_dups", F.lit(0)).cast("long").alias("n_dups"),
            (F.coalesce("n_dups", F.lit(0)) == 0).cast("long").alias("keep"),
        )
    )


def ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-quality evaluation: recall@k of each ANN path (LSH
    buckets, IVF probe) against the brute-force exact top-k — the
    measurement loop that tunes nprobe/planes before anyone trusts an
    approximate index on the full corpus. One row per method.

    All three retrievals are tiny (k rows); the eval is semi-join
    counts, so the expensive part is exactly the underlying searches.
    """
    exact = similarity_topk(spark, sf_dir).select("vec_id")
    parts = []
    for method, fn in (("lsh", similarity_lsh), ("ivf", similarity_ivf)):
        approx = fn(spark, sf_dir).select("vec_id")
        hits = approx.join(exact, "vec_id", "left_semi")
        stats = (
            approx.agg(F.count(F.lit(1)).cast("long").alias("n_retrieved"))
            .crossJoin(hits.agg(F.count(F.lit(1)).cast("long").alias("n_hits")))
        )
        parts.append(
            stats.select(
                F.lit(method).alias("method"),
                "n_retrieved",
                "n_hits",
                F.round(F.col("n_hits") / F.lit(TOP_K), 4).alias("recall_at_k"),
            )
        )
    return parts[0].unionByName(parts[1])


#: Lloyd iterations for the IVF quantizer training (fixed + unrolled in
#: the oracle).
KMEANS_ITERS = 3


def similarity_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train the IVF coarse quantizer: k-means (Lloyd) over the corpus,
    k = 4, init = the deterministic seed vectors the untrained IVF uses
    (IVF_CENTROID_IDS), 3 iterations — the "real build" step the
    `similarity_ivf` docstring defers to.

    Distributed shape per iteration: assignment is a broadcast join of
    the (k·dim)-row centroid model against the dim-exploded corpus +
    one aggregation; the update aggregates members per (centroid, dim).
    The model is collected to the driver between iterations (k·dim rows
    — model-sized, not corpus-sized: the MLlib idiom). Every
    accumulation-order-dependent float (dist², means) is pinned to 6 dp
    in BOTH engines so assignment decisions are identical; ties break
    on cent_id. Output: per final centroid, member count and norm.
    """
    from shards_prometheus_spark.operators.tierc_common import _memo_persist

    # hash-partitioned by vec_id ONCE into the memoized persist: every
    # iteration's per-vector aggregate then runs exchange-free on the
    # cached partitioning (3 shuffles of the exploded corpus → 1; at
    # cluster scale this is the persisted feature-table layout)
    dims = _memo_persist(
        spark,
        sf_dir,
        "kmeans_dims",
        lambda: _dims(spark, sf_dir).repartition("vec_id"),
    )
    cent_ids = sorted(IVF_CENTROID_IDS)
    k = len(cent_ids)
    # Initial model collected once (k·dim rows — model-sized). The loop
    # then keeps the model DRIVER-side between iterations (the MLlib
    # idiom the old code already used) but ships it back as a WIDE
    # per-dimension relation (d, c0..ck-1): assignment becomes ONE
    # broadcast join + ONE hash aggregate per iteration with the argmin
    # folded into the same aggregate row (a least()/when() chain over k
    # columns, ties to the smallest cent_id — exactly the old window's
    # orderBy(dist2, cent_id) pick), where the tall layout needed a
    # (vec_id, cent_id) aggregate PLUS a window repartitioned by vec_id
    # (guide §2.4: two exchanges and a sort removed per iteration).
    init = (
        dims.filter(F.col("vec_id").isin(cent_ids))
        .select(
            F.col("vec_id").alias("cent_id"), "d", F.round("v", 6).alias("c")
        )
        .collect()
    )
    model = {(r["cent_id"], r["d"]): r["c"] for r in init}
    members: dict[int, int] = {}
    for _ in range(KMEANS_ITERS):
        dvals = sorted({d for (_c, d) in model})
        # posexplode yields contiguous 0-based dims, which the 1-based
        # element_at below relies on
        assert dvals == list(range(len(dvals)))
        # a centroid that lost every member in the previous iteration
        # has no rows in `model` — drop it from the live list exactly
        # as the old cents/counts relations implicitly did (otherwise
        # model[(c, d)] raises KeyError); it stays dropped for the
        # remaining iterations, matching the relational fixpoint
        live = [c for c in cent_ids if (c, dvals[0]) in model]
        k = len(live)
        # the model ships back as LITERAL per-centroid coefficient
        # arrays indexed by d — the k·dim model is driver state, so
        # even the broadcast join of the wide relation is unnecessary
        # (one more exchangeless stage per iteration)
        cexpr = [
            F.element_at(
                F.array(
                    *[F.lit(model[(c, d)]) for d in dvals]
                ),
                F.col("d") + 1,
            )
            for c in live
        ]
        # per-centroid dist² as k accumulator columns of one aggregate;
        # round(…, 6) pins the accumulation exactly like the tall form
        dists = [
            F.round(
                F.sum((F.col("v") - cexpr[i]) * (F.col("v") - cexpr[i])),
                6,
            ).alias(f"d{i}")
            for i in range(k)
        ]
        # assignment + update fused into ONE pass: the per-vector
        # aggregate carries the (d, v) pairs through as an array, the
        # argmin picks the centroid in the same row, and the explode
        # feeds the (cent_id, d) mean directly — no assignment join,
        # no second scan (guide §2.4/§2.3: the old shape shuffled the
        # corpus for the assignment agg, again for the window, and a
        # third time for the update join; this shape pays exactly one
        # exchange per iteration, on the k·dim partial aggregate).
        # Member counts ride the same aggregate, so one distributed
        # action per iteration yields model AND counts.
        sums = dims.groupBy("vec_id").agg(
            *dists, F.collect_list(F.struct("d", "v")).alias("_dv")
        )
        best = F.least(*[F.col(f"d{i}") for i in range(k)])
        pick = F.when(F.col("d0") == best, F.lit(live[0]))
        for i in range(1, k):
            pick = pick.when(F.col(f"d{i}") == best, F.lit(live[i]))
        model_rows = (
            sums.select(
                pick.cast("long").alias("cent_id"),
                F.explode("_dv").alias("e"),
            )
            .groupBy("cent_id", F.col("e.d").alias("d"))
            .agg(
                F.round(F.avg("e.v"), 6).alias("c"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        )
        model = {(r["cent_id"], r["d"]): r["c"] for r in model_rows}
        d0 = min(r["d"] for r in model_rows)
        members = {
            r["cent_id"]: r["n"] for r in model_rows if r["d"] == d0
        }
    cents = spark.createDataFrame(
        [(c, d, v) for (c, d), v in model.items()],
        "cent_id long, d int, c double",
    )
    counts = spark.createDataFrame(
        sorted(members.items()), "cent_id long, n_members long"
    )
    norms = cents.groupBy("cent_id").agg(
        F.round(F.sqrt(F.sum(F.col("c") * F.col("c"))), 4).alias(
            "centroid_norm"
        )
    )
    return counts.join(norms, "cent_id")


_DIMS_CTE = (
    "WITH dims AS (SELECT vec_id, gs - 1 AS d, CAST(v AS DOUBLE) AS v FROM ("
    "SELECT vec_id, unnest(embedding) AS v, "
    "generate_subscripts(embedding, 1) AS gs FROM embeddings)), "
    "nrm AS (SELECT vec_id, sqrt(SUM(v * v)) AS nrm FROM dims GROUP BY vec_id)"
)


def _kmeans_oracle_sql() -> str:
    """Unrolled Lloyd iterations as chained CTEs, same 6-dp pinning."""
    from shards_prometheus_spark.model import dround

    ids = ", ".join(str(i) for i in IVF_CENTROID_IDS)
    parts = [
        "WITH e AS (SELECT vec_id, gs - 1 AS d, CAST(v AS DOUBLE) AS v "
        "FROM (SELECT vec_id, unnest(embedding) AS v, "
        "generate_subscripts(embedding, 1) AS gs FROM embeddings)), "
        f"c0 AS (SELECT vec_id AS cent_id, d, {dround('v', 6)} AS c "
        f"FROM e WHERE vec_id IN ({ids}))"
    ]
    for i in range(1, KMEANS_ITERS + 1):
        d2 = dround("SUM((e.v - c.c) * (e.v - c.c))", 6)
        parts.append(
            f", d{i} AS (SELECT e.vec_id, c.cent_id, {d2} AS dist2 "
            f"FROM e JOIN c{i - 1} c ON e.d = c.d "
            "GROUP BY e.vec_id, c.cent_id), "
            f"a{i} AS (SELECT vec_id, cent_id FROM ("
            "SELECT vec_id, cent_id, ROW_NUMBER() OVER ("
            "PARTITION BY vec_id ORDER BY dist2, cent_id) AS rk "
            f"FROM d{i}) WHERE rk = 1), "
            f"c{i} AS (SELECT a.cent_id, e.d, {dround('AVG(e.v)', 6)} AS c "
            f"FROM a{i} a JOIN e ON e.vec_id = a.vec_id "
            "GROUP BY a.cent_id, e.d)"
        )
    last = KMEANS_ITERS
    parts.append(
        " SELECT n.cent_id, n.n_members, m.centroid_norm FROM "
        f"(SELECT cent_id, CAST(COUNT(*) AS BIGINT) AS n_members FROM a{last} "
        "GROUP BY cent_id) n JOIN "
        f"(SELECT cent_id, {dround('SQRT(SUM(c * c))', 4)} AS centroid_norm "
        f"FROM c{last} GROUP BY cent_id) m ON n.cent_id = m.cent_id"
    )
    return "".join(parts)

_COS_TO_QUERY = (
    f"{_DIMS_CTE}, qd AS (SELECT d, v FROM dims WHERE vec_id = {QUERY_VEC_ID}), "
    "qn AS (SELECT nrm FROM nrm WHERE vec_id = " f"{QUERY_VEC_ID}), "
    "dots AS (SELECT dims.vec_id, SUM(dims.v * qd.v) AS dot FROM dims "
    f"JOIN qd ON qd.d = dims.d WHERE dims.vec_id <> {QUERY_VEC_ID} "
    "GROUP BY dims.vec_id), "
    "scored AS (SELECT d.vec_id, ROUND(d.dot / (n.nrm * q.nrm), 6) AS cos6 "
    "FROM dots d JOIN nrm n ON n.vec_id = d.vec_id, qn q)"
)

_LSH_VALUES = ", ".join(f"({j}, {a}, {b}, {w})" for j, a, b, w in LSH_PARAMS)

_IVF_IDS = ", ".join(str(i) for i in IVF_CENTROID_IDS)

#: IVF oracle: same CTE spine as LSH — assign each vector to its
#: nearest (by 6dp-rounded cosine) sampled centroid, probe the query's
#: IVF_NPROBE nearest cells, brute-force only those members.
_IVF_SQL = (
    f"{_COS_TO_QUERY}, "
    "cd AS (SELECT d.vec_id, c.vec_id AS cent_id, SUM(d.v * c.v) AS dot "
    f"FROM dims d JOIN dims c ON c.d = d.d AND c.vec_id IN ({_IVF_IDS}) "
    "GROUP BY d.vec_id, c.vec_id), "
    "cc AS (SELECT cd.vec_id, cd.cent_id, "
    "ROUND(cd.dot / (n1.nrm * n2.nrm), 6) AS c6 FROM cd "
    "JOIN nrm n1 ON n1.vec_id = cd.vec_id "
    "JOIN nrm n2 ON n2.vec_id = cd.cent_id), "
    "arank AS (SELECT vec_id, cent_id, ROW_NUMBER() OVER "
    "(PARTITION BY vec_id ORDER BY c6 DESC, cent_id ASC) AS ark FROM cc), "
    "cells AS (SELECT vec_id, cent_id AS cell FROM arank WHERE ark = 1), "
    f"qc AS (SELECT cent_id AS cell FROM arank WHERE vec_id = {QUERY_VEC_ID} "
    f"AND ark <= {IVF_NPROBE}), "
    "cand AS (SELECT s.vec_id, s.cos6 FROM scored s "
    "JOIN cells ON cells.vec_id = s.vec_id JOIN qc ON qc.cell = cells.cell) "
    "SELECT vec_id, ROUND(cos6, 4) AS cosine, CAST(rk AS BIGINT) AS rk FROM ("
    "SELECT vec_id, cos6, ROW_NUMBER() OVER (ORDER BY cos6 DESC, vec_id ASC) "
    f"AS rk FROM cand) WHERE rk <= {TOP_K}"
)

#: power-iteration count for the top principal component (static —
#: the loop unrolls into ONE declarative plan, no driver collect)
PCA_ITERS = 3


def embedding_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal component of the embedding cloud by power
    iteration — dimensionality-reduction's first step, entirely in
    DataFrame ops.

    Shape: ONE corpus pass emits each row's d² outer-product entries
    JVM-side (nested `transform` + flatten + explode — map-side
    combined, so the shuffle carries d² rows per partition, never the
    corpus), giving the Gram matrix; the covariance and the
    PCA_ITERS matrix-vector products then run on (d², d)-sized
    relations with broadcast vectors. Deterministic: fixed iteration
    count, all-ones init, and a continuous pipeline (no discrete
    decisions) — cross-engine fp noise stays ~1e-10, absorbed by the
    4dp output rounding.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    outer = emb.select(
        F.explode(
            F.flatten(
                F.transform(
                    "embedding",
                    lambda x, i: F.transform(
                        "embedding",
                        lambda y, j: F.struct(
                            i.alias("i"),
                            j.alias("j"),
                            (x.cast("double") * y.cast("double")).alias(
                                "p"
                            ),
                        ),
                    ),
                )
            )
        ).alias("e")
    ).select("e.i", "e.j", "e.p")
    gram = outer.groupBy("i", "j").agg(F.sum("p").alias("s"))
    means = _dims(spark, sf_dir).groupBy("d").agg(
        F.avg("v").alias("m"), F.count(F.lit(1)).alias("n")
    )
    mi = means.select(
        F.col("d").alias("i"), F.col("m").alias("mi"), "n"
    )
    mj = means.select(F.col("d").alias("j"), F.col("m").alias("mj"))
    cov = (
        gram.join(F.broadcast(mi), "i")
        .join(F.broadcast(mj), "j")
        .select(
            "i",
            "j",
            (F.col("s") / F.col("n") - F.col("mi") * F.col("mj")).alias(
                "c"
            ),
        )
    )
    v = means.select("d", F.lit(1.0).alias("vv"))
    for _ in range(PCA_ITERS):
        u = (
            cov.join(
                F.broadcast(v.select(F.col("d").alias("j"), "vv")), "j"
            )
            .groupBy("i")
            .agg(F.sum(F.col("c") * F.col("vv")).alias("u"))
        )
        nrm = u.agg(
            F.sqrt(F.sum(F.col("u") * F.col("u"))).alias("nm")
        )
        v = u.join(F.broadcast(nrm)).select(
            F.col("i").alias("d"),
            (F.col("u") / F.col("nm")).alias("vv"),
        )
    return v.select(
        F.col("d").cast("long").alias("dim"),
        F.round("vv", 4).alias("loading"),
    )


QUERIES = {
    "similarity_topk": similarity_topk,
    "similarity_lsh": similarity_lsh,
    "similarity_ivf": similarity_ivf,
    "similarity_kmeans": similarity_kmeans,
    "similarity_knn_graph": similarity_knn_graph,
    "embedding_label_centroids": embedding_label_centroids,
    "embedding_pca_power": embedding_pca_power,
    "dedup_embedding_cosine": dedup_embedding_cosine,
    "dedup_semantic": dedup_semantic,
    "ann_recall_eval": ann_recall_eval,
}

ORACLES = {
    "similarity_ivf": _IVF_SQL,
    "similarity_kmeans": _kmeans_oracle_sql(),
    "similarity_knn_graph": (
        f"{_DIMS_CTE}, hp(j, a, b, w) AS (VALUES {_LSH_VALUES}), "
        "proj AS (SELECT dims.vec_id, hp.j, hp.w, "
        f"SUM(dims.v * (((hp.a * (dims.d + 1) + hp.b) % {PLANE_MOD}) "
        f"- {PLANE_SHIFT})) AS proj "
        "FROM dims, hp GROUP BY dims.vec_id, hp.j, hp.w), "
        "bkt AS (SELECT vec_id, CAST(SUM(CASE WHEN proj > 0 THEN w "
        "ELSE 0 END) AS BIGINT) AS bucket FROM proj GROUP BY vec_id), "
        "cand AS (SELECT x.vec_id AS va, y.vec_id AS vb FROM bkt x "
        "JOIN bkt y ON x.bucket = y.bucket AND x.vec_id <> y.vec_id), "
        "dots AS (SELECT c.va, c.vb, SUM(da.v * db.v) AS dot "
        "FROM cand c JOIN dims da ON da.vec_id = c.va "
        "JOIN dims db ON db.vec_id = c.vb AND db.d = da.d "
        "GROUP BY c.va, c.vb), "
        "cos AS (SELECT d.va, d.vb, ROUND(d.dot / (na.nrm * nb.nrm), 6) "
        "AS cos6 FROM dots d JOIN nrm na ON na.vec_id = d.va "
        "JOIN nrm nb ON nb.vec_id = d.vb) "
        "SELECT va AS vec_id, vb AS nn_id, ROUND(cos6, 4) AS cosine "
        "FROM (SELECT va, vb, cos6, ROW_NUMBER() OVER ("
        "PARTITION BY va ORDER BY cos6 DESC, vb ASC) AS rk FROM cos) "
        "WHERE rk = 1"
    ),
    "embedding_pca_power": (
        f"{_DIMS_CTE}, "
        "m AS (SELECT d, AVG(v) AS m, COUNT(*) AS n FROM dims "
        "GROUP BY d), "
        "g AS (SELECT a.d AS i, b.d AS j, SUM(a.v * b.v) AS s "
        "FROM dims a JOIN dims b USING (vec_id) GROUP BY 1, 2), "
        "c AS (SELECT g.i, g.j, g.s / mi.n - mi.m * mj.m AS c "
        "FROM g JOIN m mi ON mi.d = g.i JOIN m mj ON mj.d = g.j), "
        "v0 AS (SELECT d, CAST(1.0 AS DOUBLE) AS vv FROM m), "
        "u1 AS (SELECT c.i AS d, SUM(c.c * v0.vv) AS u FROM c "
        "JOIN v0 ON v0.d = c.j GROUP BY 1), "
        "v1 AS (SELECT d, u / (SELECT sqrt(SUM(u * u)) FROM u1) AS vv "
        "FROM u1), "
        "u2 AS (SELECT c.i AS d, SUM(c.c * v1.vv) AS u FROM c "
        "JOIN v1 ON v1.d = c.j GROUP BY 1), "
        "v2 AS (SELECT d, u / (SELECT sqrt(SUM(u * u)) FROM u2) AS vv "
        "FROM u2), "
        "u3 AS (SELECT c.i AS d, SUM(c.c * v2.vv) AS u FROM c "
        "JOIN v2 ON v2.d = c.j GROUP BY 1), "
        "v3 AS (SELECT d, u / (SELECT sqrt(SUM(u * u)) FROM u3) AS vv "
        "FROM u3) "
        "SELECT CAST(d AS BIGINT) AS dim, "
        + dround("vv", 4)
        + " AS loading FROM v3"
    ),
    "embedding_label_centroids": (
        f"{_DIMS_CTE}, ld AS (SELECT d.vec_id, e.label, d.d, d.v "
        "FROM dims d JOIN embeddings e ON e.vec_id = d.vec_id), "
        "cents AS (SELECT label, d, "
        + dround("AVG(v)", 6)
        + " AS c FROM ld GROUP BY label, d), "
        "cn AS (SELECT label, SQRT(SUM(c * c)) AS cnrm FROM cents "
        "GROUP BY label), "
        "vn AS (SELECT vec_id, label, SQRT(SUM(v * v)) AS vnrm FROM ld "
        "GROUP BY vec_id, label), "
        "dots AS (SELECT l.vec_id, l.label, SUM(l.v * c.c) AS dot "
        "FROM ld l JOIN cents c ON c.label = l.label AND c.d = l.d "
        "GROUP BY l.vec_id, l.label), "
        "cos AS (SELECT d.label, "
        + dround("d.dot / (v.vnrm * c.cnrm)", 6)
        + " AS cos6 FROM dots d "
        "JOIN vn v ON v.vec_id = d.vec_id AND v.label = d.label "
        "JOIN cn c ON c.label = d.label) "
        "SELECT a.label, a.n_vecs, a.cohesion, "
        + dround("cn.cnrm", 4)
        + " AS centroid_norm FROM ("
        "SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs, "
        + dround("AVG(cos6)", 4)
        + " AS cohesion FROM cos GROUP BY label) a "
        "JOIN cn ON cn.label = a.label"
    ),
    "similarity_topk": (
        f"{_COS_TO_QUERY} "
        "SELECT vec_id, ROUND(cos6, 4) AS cosine, CAST(rk AS BIGINT) AS rk FROM ("
        "SELECT vec_id, cos6, ROW_NUMBER() OVER "
        "(ORDER BY cos6 DESC, vec_id ASC) AS rk FROM scored) "
        f"WHERE rk <= {TOP_K}"
    ),
    "similarity_lsh": (
        f"{_COS_TO_QUERY}, hp(j, a, b, w) AS (VALUES {_LSH_VALUES}), "
        "proj AS (SELECT dims.vec_id, hp.j, hp.w, "
        f"SUM(dims.v * (((hp.a * (dims.d + 1) + hp.b) % {PLANE_MOD}) - {PLANE_SHIFT})) AS proj "
        "FROM dims, hp GROUP BY dims.vec_id, hp.j, hp.w), "
        "bkt AS (SELECT vec_id, CAST(SUM(CASE WHEN proj > 0 THEN w ELSE 0 END) AS BIGINT) "
        "AS bucket FROM proj GROUP BY vec_id), "
        f"qb AS (SELECT bucket FROM bkt WHERE vec_id = {QUERY_VEC_ID}), "
        "cand AS (SELECT s.vec_id, s.cos6 FROM scored s JOIN bkt ON bkt.vec_id = s.vec_id, qb "
        "WHERE bkt.bucket = qb.bucket) "
        "SELECT vec_id, ROUND(cos6, 4) AS cosine, CAST(rk AS BIGINT) AS rk FROM ("
        "SELECT vec_id, cos6, ROW_NUMBER() OVER (ORDER BY cos6 DESC, vec_id ASC) AS rk "
        f"FROM cand) WHERE rk <= {TOP_K}"
    ),
    "dedup_embedding_cosine": (
        f"{_DIMS_CTE}, hp(j, a, b, w) AS (VALUES {_LSH_VALUES}), "
        "proj AS (SELECT dims.vec_id, hp.j, hp.w, "
        f"SUM(dims.v * (((hp.a * (dims.d + 1) + hp.b) % {PLANE_MOD}) "
        f"- {PLANE_SHIFT})) AS proj "
        "FROM dims, hp GROUP BY dims.vec_id, hp.j, hp.w), "
        "bkt AS (SELECT vec_id, CAST(SUM(CASE WHEN proj > 0 THEN w "
        "ELSE 0 END) AS BIGINT) AS bucket FROM proj GROUP BY vec_id), "
        "cand AS (SELECT x.vec_id AS vec_a, y.vec_id AS vec_b FROM bkt x "
        "JOIN bkt y ON x.bucket = y.bucket AND x.vec_id < y.vec_id), "
        "dots AS (SELECT c.vec_a, c.vec_b, SUM(da.v * db.v) AS dot "
        "FROM cand c JOIN dims da ON da.vec_id = c.vec_a "
        "JOIN dims db ON db.vec_id = c.vec_b AND db.d = da.d "
        "GROUP BY c.vec_a, c.vec_b), "
        "cos AS (SELECT d.vec_a, d.vec_b, "
        "ROUND(d.dot / (na.nrm * nb.nrm), 6) AS cos6 "
        "FROM dots d JOIN nrm na ON na.vec_id = d.vec_a "
        "JOIN nrm nb ON nb.vec_id = d.vec_b) "
        "SELECT vec_a, vec_b, ROUND(cos6, 4) AS cosine FROM cos "
        f"WHERE cos6 >= {COSINE_DUP_THRESHOLD}"
    ),
    # dedup_semantic: the IVF cell-assignment spine of _IVF_SQL, then
    # within-cell smaller-id duplicate counting.
    "dedup_semantic": (
        f"{_DIMS_CTE}, "
        "cd AS (SELECT d.vec_id, c.vec_id AS cent_id, SUM(d.v * c.v) AS dot "
        f"FROM dims d JOIN dims c ON c.d = d.d AND c.vec_id IN ({_IVF_IDS}) "
        "GROUP BY d.vec_id, c.vec_id), "
        "cc AS (SELECT cd.vec_id, cd.cent_id, "
        "ROUND(cd.dot / (n1.nrm * n2.nrm), 6) AS c6 FROM cd "
        "JOIN nrm n1 ON n1.vec_id = cd.vec_id "
        "JOIN nrm n2 ON n2.vec_id = cd.cent_id), "
        "cells AS (SELECT vec_id, cent_id AS cell FROM ("
        "SELECT vec_id, cent_id, ROW_NUMBER() OVER "
        "(PARTITION BY vec_id ORDER BY c6 DESC, cent_id ASC) AS ark FROM cc) "
        "WHERE ark = 1), "
        "cand AS (SELECT x.vec_id AS va, y.vec_id AS vb FROM cells x "
        "JOIN cells y ON x.cell = y.cell AND x.vec_id < y.vec_id), "
        "dots AS (SELECT c.va, c.vb, SUM(da.v * db.v) AS dot "
        "FROM cand c JOIN dims da ON da.vec_id = c.va "
        "JOIN dims db ON db.vec_id = c.vb AND db.d = da.d "
        "GROUP BY c.va, c.vb), "
        "drops AS (SELECT vb, CAST(COUNT(*) AS BIGINT) AS n_dups FROM ("
        "SELECT d.vb, ROUND(d.dot / (na.nrm * nb.nrm), 6) AS cos6 "
        "FROM dots d JOIN nrm na ON na.vec_id = d.va "
        "JOIN nrm nb ON nb.vec_id = d.vb) "
        f"WHERE cos6 >= {SEMDEDUP_THRESHOLD} GROUP BY vb) "
        "SELECT c.vec_id, c.cell, COALESCE(dr.n_dups, 0) AS n_dups, "
        "CAST(COALESCE(dr.n_dups, 0) = 0 AS BIGINT) AS keep "
        "FROM cells c LEFT JOIN drops dr ON dr.vb = c.vec_id"
    ),
}


def _recall_block(method: str, approx_sql: str) -> str:
    topk_sql = ORACLES["similarity_topk"]
    hits = (
        f"(SELECT COUNT(*) FROM ({approx_sql}) a WHERE a.vec_id IN "
        f"(SELECT vec_id FROM ({topk_sql})))"
    )
    return (
        f"SELECT '{method}' AS method, "
        f"CAST((SELECT COUNT(*) FROM ({approx_sql})) AS BIGINT) "
        "AS n_retrieved, "
        f"CAST({hits} AS BIGINT) AS n_hits, "
        f"{dround(f'{hits} * 1.0 / {TOP_K}', 4)} AS recall_at_k"
    )


ORACLES["ann_recall_eval"] = (
    _recall_block("lsh", ORACLES["similarity_lsh"])
    + " UNION ALL "
    + _recall_block("ivf", ORACLES["similarity_ivf"])
)
