"""Deduplication operators over the documents corpus
(SURVEY.md §2.8 L1–L3) — exact, content-hash, and near-duplicate.

Scale design (100 TB of text):

* L1/L2 never shuffle the text itself where avoidable — L2 groups on
  sha2(text) so only 32-byte digests cross the wire; this is the
  canonical web-scale exact-dedup shape.
* L3a (signature near-dup) reduces each document to a deterministic
  signature (sorted token set / fixed prefix) and groups on it — one
  shuffle of small keys, no pairwise comparison.
* L3b (MinHash LSH) is the probabilistic path: shingle →
  CountVectorizer → MinHashLSH banding, approxSimilarityJoin only
  compares within-bucket candidates, so cost is O(candidates), not
  O(n²).  Seeded; approximate → rows-only driver check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from update_database_by_wind_spark.registry import query
from update_database_by_wind_spark.sources import load

# --- L1: exact dedup (keep-canonical) -------------------------------------

_L1_ORACLE = """
WITH ranked AS (
  SELECT doc_id, lang, text,
         ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) AS rn
  FROM documents
)
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_canonical,
       CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_removed
FROM ranked
GROUP BY lang
"""


@query("l1_exact_dedup", oracle=_L1_ORACLE, tags=("dedup",))
def l1_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L1: exact full-text dedup, keep-canonical (lowest doc_id wins) —
    row_number over the text key rather than dropDuplicates so the
    survivor is deterministic under any partitioning."""
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    w = Window.partitionBy("text").orderBy("doc_id")
    ranked = docs.withColumn("rn", F.row_number().over(w))
    return ranked.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.when(F.col("rn") == 1, 1).otherwise(0)).cast("long").alias(
            "n_canonical"
        ),
        F.sum(F.when(F.col("rn") > 1, 1).otherwise(0)).cast("long").alias(
            "n_removed"
        ),
    )


# --- L2: content-hash dedup -------------------------------------------------

_L2_ORACLE = """
WITH hashed AS (
  SELECT source, sha256(text) AS h FROM documents
)
SELECT source,
       COUNT(*) AS n_docs,
       CAST(COUNT(DISTINCT h) AS BIGINT) AS n_unique,
       COUNT(*) - CAST(COUNT(DISTINCT h) AS BIGINT) AS n_dups
FROM hashed
GROUP BY source
"""


@query("l2_hash_dedup", oracle=_L2_ORACLE, tags=("dedup",))
def l2_hash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2: content-hash dedup — the 100 TB shape: only sha-256 digests
    shuffle, never the document bodies."""
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select("source", F.sha2("text", 256).alias("h"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("h").alias("n_unique"),
            (F.count("*") - F.countDistinct("h")).alias("n_dups"),
        )
    )


# --- L3a: near-dup via deterministic signatures ------------------------------

_L3A_ORACLE = """
WITH sigs AS (
  SELECT doc_id,
         md5(substring(text, 1, 60)) AS prefix_sig,
         md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))
           AS tokenset_sig
  FROM documents
),
prefix_clusters AS (
  SELECT prefix_sig, COUNT(*) AS sz FROM sigs GROUP BY prefix_sig
),
tokenset_clusters AS (
  SELECT tokenset_sig, COUNT(*) AS sz FROM sigs GROUP BY tokenset_sig
)
SELECT 'prefix60' AS method,
       CAST(COUNT(*) AS BIGINT) AS n_clusters,
       CAST(SUM(CASE WHEN sz > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_multi,
       CAST(SUM(CASE WHEN sz > 1 THEN sz ELSE 0 END) AS BIGINT) AS n_near_dup_docs,
       CAST(MAX(sz) AS BIGINT) AS max_cluster
FROM prefix_clusters
UNION ALL
SELECT 'tokenset' AS method,
       CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CASE WHEN sz > 1 THEN 1 ELSE 0 END) AS BIGINT),
       CAST(SUM(CASE WHEN sz > 1 THEN sz ELSE 0 END) AS BIGINT),
       CAST(MAX(sz) AS BIGINT)
FROM tokenset_clusters
"""


@query("l3a_near_dup_signatures", oracle=_L3A_ORACLE, tags=("dedup", "neardup"))
def l3a_near_dup_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3a: deterministic near-dup signatures — 60-char-prefix clusters
    (FIXTURES.md: shared-prefix clusters are the planted near-dups) and
    sorted-token-set signatures (order-insensitive content identity).
    Signature group-by = one small-key shuffle; no pairwise compare."""
    docs = load(spark, sf_dir, "documents")
    sigs = docs.select(
        F.md5(F.substring("text", 1, 60)).alias("prefix_sig"),
        F.md5(
            F.concat_ws(
                " ", F.array_sort(F.array_distinct(F.split(F.col("text"), " ")))
            )
        ).alias("tokenset_sig"),
    )

    def cluster_stats(col: str, method: str) -> DataFrame:
        return (
            sigs.groupBy(col)
            .agg(F.count("*").alias("sz"))
            .agg(
                F.count("*").alias("n_clusters"),
                F.sum(F.when(F.col("sz") > 1, 1).otherwise(0))
                .cast("long")
                .alias("n_multi"),
                F.sum(F.when(F.col("sz") > 1, F.col("sz")).otherwise(0))
                .cast("long")
                .alias("n_near_dup_docs"),
                F.max("sz").alias("max_cluster"),
            )
            .select(
                F.lit(method).alias("method"),
                "n_clusters",
                "n_multi",
                "n_near_dup_docs",
                "max_cluster",
            )
        )

    return cluster_stats("prefix_sig", "prefix60").unionByName(
        cluster_stats("tokenset_sig", "tokenset")
    )


# --- L3b: MinHash LSH near-dup (approximate, rows-only) -----------------------


@query("l3b_minhash_lsh_pairs", oracle=None, tags=("dedup", "neardup", "ml"))
def l3b_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3b: MinHash-LSH near-duplicate pairs — shingle(5-gram chars) →
    CountVectorizer(binary) → MinHashLSH(seeded) → approxSimilarityJoin
    at Jaccard distance ≤ 0.5.  Candidate comparisons happen only
    within LSH buckets, the O(n²)-avoiding scale path.  Approximate →
    rows-only driver check; determinism via fixed seed and canonical
    (a < b) pair ordering."""
    from pyspark.ml.feature import CountVectorizer, MinHashLSH, RegexTokenizer

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    # character 5-gram shingles via built-ins (no python UDF)
    shingled = docs.select(
        "doc_id",
        F.expr(
            "transform(sequence(1, greatest(length(text) - 4, 1)),"
            " i -> substring(text, i, 5))"
        ).alias("shingles"),
    )
    cv = CountVectorizer(
        inputCol="shingles", outputCol="features", binary=True, vocabSize=1 << 18
    )
    model = cv.fit(shingled)
    feats = model.transform(shingled)
    lsh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=8, seed=42)
    lsh_model = lsh.fit(feats)
    pairs = lsh_model.approxSimilarityJoin(feats, feats, 0.5, distCol="jaccard_dist")
    return (
        pairs.select(
            F.col("datasetA.doc_id").alias("doc_a"),
            F.col("datasetB.doc_id").alias("doc_b"),
            F.round("jaccard_dist", 4).alias("jaccard_dist"),
        )
        .filter(F.col("doc_a") < F.col("doc_b"))
        .orderBy("doc_a", "doc_b")
    )
