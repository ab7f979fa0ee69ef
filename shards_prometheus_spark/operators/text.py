"""Text-analysis operators (Tier C, north-star — SURVEY.md §2c #21).

Training-data-pipeline text primitives over `documents`:

- token counting: whitespace tokens AND a BPE-ish regex tokenizer
  (letters / digits / single non-space symbol) — both JVM-side regex;
- token frequency: global top-k with deterministic tie-breaks;
- language-ID: stopword-ratio heuristic (an n-gram/wordlist scoring
  shape; the corpus is synthetic so the heuristic is the point, not
  accuracy);
- quality scoring: length/stopword/word-shape mixture in [0,1];
- fingerprinting: position-weighted rolling hash over portable token
  ids (content-defined, engine-independent).

Everything is expression-only (no UDFs): split/explode/regexp —
whole-stage codegen keeps these at scan speed, which is what matters
when the corpus is 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from shards_prometheus_spark.model import dround, load_table
from shards_prometheus_spark.operators.tierc_common import (
    TOKENS_CTE,
    doc_token_ids,
    doc_tokens,
)

TOP_TOKENS_K = 20
STOPWORDS = ["the", "a"]
EN_RATIO_THRESHOLD = 0.05
BPE_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9 ]"
FP_MOD = 1_000_000_007


def text_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global token frequency, top-20 (count desc, token asc)."""
    counts = (
        doc_tokens(spark, sf_dir)
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    w = Window.orderBy(F.desc("n"), F.asc("token"))
    return (
        counts.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= TOP_TOKENS_K)
    )


def _doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = doc_tokens(spark, sf_dir)
    is_stop = F.col("token").isin(STOPWORDS).cast("long")
    return toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.sum(is_stop).cast("long").alias("n_stop"),
        F.sum(F.length("token")).cast("long").alias("total_len"),
    )


def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-ratio language heuristic: 'en' vs 'other'."""
    stats = _doc_stats(spark, sf_dir)
    ratio = F.col("n_stop") / F.col("n_tokens")
    return stats.select(
        "doc_id",
        F.round(ratio, 4).alias("en_ratio"),
        F.when(ratio >= EN_RATIO_THRESHOLD, F.lit("en"))
        .otherwise(F.lit("other"))
        .alias("pred_lang"),
    )


#: Character-trigram profile for English (top corpus-independent
#: trigrams; a real build learns per-language profiles from labeled
#: text — the relation shape is identical).
EN_TRIGRAMS = ["the", "ing", "and", "ent", "ion", "her", "for", "tha"]
NGRAM_LANG_THRESHOLD = 0.01


def text_language_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID by character-n-gram profile: the fraction of a
    document's char trigrams that hit the language profile (the
    n-gram-profile method of Cavnar-Trenkle-style classifiers, profile
    broadcast). Complements the stopword-ratio heuristic
    (`text_language_id`) with the brief's literal n-gram form."""
    docs = load_table(spark, sf_dir, "documents")
    # length >= 3 guard: sequence(1, 0) would DESCEND in Spark
    tri = docs.filter(F.length("text") >= 3).select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, length(lower(text)) - 2), "
                "i -> substring(lower(text), i, 3))"
            )
        ).alias("tri"),
    )
    profile = spark.createDataFrame(
        [(t,) for t in EN_TRIGRAMS], "tri string"
    )
    hits = (
        tri.join(F.broadcast(profile), "tri", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_hits"))
    )
    totals = tri.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_trigrams")
    )
    ratio = F.col("n_hits") / F.col("n_trigrams")
    return (
        totals.join(hits, "doc_id", "left")
        .withColumn("n_hits", F.coalesce("n_hits", F.lit(0)))
        .select(
            "doc_id",
            "n_trigrams",
            "n_hits",
            F.round(ratio, 4).alias("hit_ratio"),
            F.when(ratio >= NGRAM_LANG_THRESHOLD, F.lit("en"))
            .otherwise(F.lit("other"))
            .alias("pred_lang"),
        )
    )


def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality in [0,1]: stopword ratio + length + word-shape mixture."""
    stats = _doc_stats(spark, sf_dir)
    stop_ratio = F.col("n_stop") / F.col("n_tokens")
    avg_len = F.col("total_len") / F.col("n_tokens")
    score = (
        F.lit(0.5) * stop_ratio
        + F.lit(0.3) * F.least(F.col("n_tokens") / F.lit(100.0), F.lit(1.0))
        + F.lit(0.2) * F.least(avg_len / F.lit(10.0), F.lit(1.0))
    )
    return stats.select(
        "doc_id",
        "n_tokens",
        F.round(avg_len, 4).alias("avg_token_len"),
        F.round(stop_ratio, 4).alias("stop_ratio"),
        F.round(score, 4).alias("quality"),
    )


#: PII patterns, shared LITERALLY with the oracle and restricted to
#: syntax Java regex and DuckDB's RE2 interpret identically (ASCII
#: classes, bounded repeats, \b word boundaries)
PII_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PII_IPV4_RE = (
    "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
)


def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction — the scrub pass every pretraining pipeline runs
    before packing (emails → `<EMAIL>`, IPv4 → `<IP>`), as pure
    codegen regexp expressions: `regexp_count` per class for audit
    counts plus a global `regexp_replace` chain for the scrubbed
    text, one scan, no shuffle, no UDF — at 100 TB this runs at
    parquet-scan speed and composes in front of `pack_chunks`.

    The synthetic corpus carries no organic PII, so (the exemplar-
    fixture pattern) each document is decorated with one
    deterministic email + IPv4 derived from its doc_id before
    scrubbing — the counts are provably nonzero and the redaction is
    exercised on every row; the decoration is shared verbatim with
    the DuckDB oracle."""
    docs = load_table(spark, sf_dir, "documents")
    decorated = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com from 10."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit("."),
        (F.col("doc_id") % 100).cast("string"),
        F.lit(".7"),
    )
    base = docs.select("doc_id", decorated.alias("txt"))
    scrub = F.regexp_replace(
        F.regexp_replace("txt", PII_EMAIL_RE, "<EMAIL>"),
        PII_IPV4_RE,
        "<IP>",
    )
    return base.select(
        "doc_id",
        F.regexp_count("txt", F.lit(PII_EMAIL_RE))
        .cast("long")
        .alias("n_emails"),
        F.regexp_count("txt", F.lit(PII_IPV4_RE))
        .cast("long")
        .alias("n_ipv4"),
        scrub.alias("scrubbed"),
        F.length(scrub).cast("long").alias("n_chars_scrubbed"),
    )


def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-weighted rolling hash: Σ token_id·((pos mod 31)+1) mod P."""
    ids = doc_token_ids(spark, sf_dir)
    term = F.col("token_id") * ((F.col("pos") % 31) + 1)
    return ids.groupBy("doc_id").agg(
        (F.sum(term) % FP_MOD).cast("long").alias("fingerprint")
    )


def unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality scoring, unigram-LM form: per document the
    mean token log-probability under the corpus unigram distribution
    (ln(count(t)/N)) and the implied perplexity — the cheapest member
    of the perplexity-filter family every pretraining pipeline runs
    (a real build swaps in an n-gram or small-LM scorer; the relational
    shape — corpus stats relation joined back onto the token stream —
    is identical).

    Scale shape: the unigram-count relation is vocab-sized and
    broadcast-joins onto the exploded token stream; the corpus total is
    a one-row broadcast cross join. One scan + one map-side join; no
    corpus-keyed shuffle beyond the per-doc aggregate.

    Perplexity derives from the ALREADY-ROUNDED mean (identical double
    in both engines) so exp() amplification cannot split the hash.
    """
    ids = doc_token_ids(spark, sf_dir)
    counts = ids.groupBy("token_id").agg(
        F.count(F.lit(1)).cast("long").alias("tc")
    )
    total = counts.agg(F.sum("tc").cast("long").alias("n_total"))
    lp = (
        ids.join(F.broadcast(counts), "token_id")
        .join(F.broadcast(total))
        .select("doc_id", F.log(F.col("tc") / F.col("n_total")).alias("l"))
    )
    avg = F.round(F.avg("l"), 4)
    return (
        lp.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            avg.alias("avg_logprob"),
        )
        .withColumn("ppl", F.round(F.exp(-F.col("avg_logprob")), 2))
    )


def token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace vs BPE-ish regex token counts per document."""
    docs = load_table(spark, sf_dir, "documents")
    lowered = F.lower("text")
    return docs.select(
        "doc_id",
        F.size(F.filter(F.split(lowered, " "), lambda t: t != "")
               ).cast("long").alias("n_tokens_ws"),
        F.size(F.regexp_extract_all(lowered, F.lit(BPE_PATTERN), 0))
        .cast("long")
        .alias("n_tokens_bpe"),
    )


_STOP_IN = ", ".join(f"'{s}'" for s in STOPWORDS)
_DOC_STATS_SQL = (
    f"{TOKENS_CTE}, stats AS (SELECT doc_id, "
    "CAST(COUNT(*) AS BIGINT) AS n_tokens, "
    f"CAST(SUM(CASE WHEN token IN ({_STOP_IN}) THEN 1 ELSE 0 END) AS BIGINT) AS n_stop, "
    "CAST(SUM(length(token)) AS BIGINT) AS total_len "
    "FROM tok GROUP BY doc_id)"
)

#: The quality mixture as raw SQL over a `stats` row — shared with the
#: corpus_filter_chain oracle so both engines threshold the same value.
QUALITY_EXPR_SQL = (
    "0.5 * (n_stop * 1.0 / n_tokens) + 0.3 * LEAST(n_tokens / 100.0, 1.0) "
    "+ 0.2 * LEAST((total_len * 1.0 / n_tokens) / 10.0, 1.0)"
)

QUERIES = {
    "text_token_counts": text_token_counts,
    "text_language_id": text_language_id,
    "text_language_ngram": text_language_ngram,
    "text_quality_score": text_quality_score,
    "text_fingerprint": text_fingerprint,
    "text_pii_scrub": text_pii_scrub,
    "token_count_bpe": token_count_bpe,
    "unigram_logprob": unigram_logprob,
}

#: the oracle's twin of text_pii_scrub's decoration + scrub chain
_PII_DECOR_SQL = (
    "text || ' contact user' || CAST(doc_id AS VARCHAR) "
    "|| '@example.com from 10.' || CAST(doc_id % 256 AS VARCHAR) "
    "|| '.' || CAST(doc_id % 100 AS VARCHAR) || '.7'"
)
_PII_SCRUB_SQL = (
    f"regexp_replace(regexp_replace(txt, '{PII_EMAIL_RE}', "
    f"'<EMAIL>', 'g'), '{PII_IPV4_RE}', '<IP>', 'g')"
)

ORACLES = {
    "text_token_counts": (
        f"{TOKENS_CTE}, counts AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS n "
        "FROM tok GROUP BY token) "
        "SELECT token, n, CAST(rk AS BIGINT) AS rk FROM ("
        "SELECT token, n, ROW_NUMBER() OVER (ORDER BY n DESC, token ASC) AS rk "
        f"FROM counts) WHERE rk <= {TOP_TOKENS_K}"
    ),
    "text_language_ngram": (
        "WITH tri AS (SELECT doc_id, substring(lower(text), i, 3) AS tri "
        "FROM documents CROSS JOIN LATERAL ("
        "SELECT unnest(generate_series(1, length(text) - 2)) AS i) "
        "WHERE length(text) >= 3), "
        "tot AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_trigrams "
        "FROM tri GROUP BY doc_id), "
        "hits AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits "
        "FROM tri WHERE tri IN ("
        + ", ".join(f"'{t}'" for t in EN_TRIGRAMS)
        + ") GROUP BY doc_id) "
        "SELECT t.doc_id, t.n_trigrams, COALESCE(h.n_hits, 0) AS n_hits, "
        + dround("COALESCE(h.n_hits, 0) * 1.0 / t.n_trigrams", 4)
        + " AS hit_ratio, "
        "CASE WHEN COALESCE(h.n_hits, 0) * 1.0 / t.n_trigrams >= "
        f"{NGRAM_LANG_THRESHOLD} THEN 'en' ELSE 'other' END AS pred_lang "
        "FROM tot t LEFT JOIN hits h USING (doc_id)"
    ),
    "text_language_id": (
        f"{_DOC_STATS_SQL} "
        f"SELECT doc_id, {dround('n_stop * 1.0 / n_tokens', 4)} AS en_ratio, "
        f"CASE WHEN n_stop * 1.0 / n_tokens >= {EN_RATIO_THRESHOLD} "
        "THEN 'en' ELSE 'other' END AS pred_lang FROM stats"
    ),
    "text_quality_score": (
        f"{_DOC_STATS_SQL} "
        "SELECT doc_id, n_tokens, "
        f"{dround('total_len * 1.0 / n_tokens', 4)} AS avg_token_len, "
        f"{dround('n_stop * 1.0 / n_tokens', 4)} AS stop_ratio, "
        f"{dround(QUALITY_EXPR_SQL, 4)} AS quality "
        "FROM stats"
    ),
    "text_fingerprint": (
        f"{TOKENS_CTE} "
        "SELECT doc_id, CAST(SUM(token_id * ((pos % 31) + 1)) "
        f"% {FP_MOD} AS BIGINT) AS fingerprint FROM dtok GROUP BY doc_id"
    ),
    "text_pii_scrub": (
        f"WITH d AS (SELECT doc_id, {_PII_DECOR_SQL} AS txt "
        "FROM documents), "
        "s AS (SELECT doc_id, "
        f"CAST(len(regexp_extract_all(txt, '{PII_EMAIL_RE}')) AS BIGINT) "
        "AS n_emails, "
        f"CAST(len(regexp_extract_all(txt, '{PII_IPV4_RE}')) AS BIGINT) "
        "AS n_ipv4, "
        f"{_PII_SCRUB_SQL} AS scrubbed FROM d) "
        "SELECT doc_id, n_emails, n_ipv4, scrubbed, "
        "CAST(length(scrubbed) AS BIGINT) AS n_chars_scrubbed FROM s"
    ),
    "token_count_bpe": (
        "SELECT doc_id, "
        "CAST(len(list_filter(string_split(lower(text), ' '), t -> t <> '')) "
        "AS BIGINT) AS n_tokens_ws, "
        f"CAST(len(regexp_extract_all(lower(text), '{BPE_PATTERN}')) AS BIGINT) "
        "AS n_tokens_bpe FROM documents"
    ),
    "unigram_logprob": (
        f"{TOKENS_CTE}, tc AS (SELECT token_id, "
        "CAST(COUNT(*) AS BIGINT) AS c FROM dtok GROUP BY token_id), "
        "tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n_total FROM tc), "
        "lp AS (SELECT d.doc_id, ln(t.c * 1.0 / (SELECT n_total FROM tot)) "
        "AS l FROM dtok d JOIN tc t USING (token_id)), "
        "per_doc AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens, "
        f"{dround('AVG(l)', 4)} AS avg_logprob FROM lp GROUP BY doc_id) "
        "SELECT doc_id, n_tokens, avg_logprob, "
        f"{dround('exp(-avg_logprob)', 2)} AS ppl FROM per_doc"
    ),
}
