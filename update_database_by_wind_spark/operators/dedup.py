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
    # Composed as SQL expression strings (one py4j parse each) rather
    # than Column-method chains: the ~30-call chain measured 0.24 s of
    # pure driver-side build per bench pass — 46% of l3a's sf0.1 pass —
    # and the parsed trees are IDENTICAL (DataFrame.sameSemantics
    # receipt, round-18 §9).  Same rationale as dec_sum's expr path.
    docs = load(spark, sf_dir, "documents")
    sigs = docs.selectExpr(
        "md5(substring(text, 1, 60)) AS prefix_sig",
        "md5(concat_ws(' ', array_sort(array_distinct(split(text, ' ')))))"
        " AS tokenset_sig",
    )

    def cluster_stats(col: str, method: str) -> DataFrame:
        return (
            sigs.groupBy(col)
            .agg(F.expr("count(*) AS sz"))
            .agg(
                F.expr("count(*) AS n_clusters"),
                F.expr(
                    "CAST(sum(CASE WHEN sz > 1 THEN 1 ELSE 0 END)"
                    " AS BIGINT) AS n_multi"
                ),
                F.expr(
                    "CAST(sum(CASE WHEN sz > 1 THEN sz ELSE 0 END)"
                    " AS BIGINT) AS n_near_dup_docs"
                ),
                F.expr("max(sz) AS max_cluster"),
            )
            # F.lit for the one literal column (ADVICE round 18: an
            # f-string into a SQL string literal would break/inject on
            # a quote in ``method``; a lit Column can't) — the
            # parse-heavy aggregate chain above keeps the expr path
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


# --- L3e: n-gram Jaccard near-dup (exact, inverted-index join) ----------------

# Stop-shingle document-frequency cap: shingles appearing in more than
# _L3E_DF_CAP documents are boilerplate (navigation chrome, license
# headers, templates) and are dropped from BOTH the intersection and the
# per-document set sizes before any pairing happens.  This is what bounds
# the inverted-index fanout at web scale: without it one hot shingle with
# df = 10M contributes 10M² candidate pairs; with it every posting list
# is ≤ cap, so pair expansion is ≤ cap²/2 per shingle.  The cap is part
# of the query's declared semantics and is mirrored verbatim in the
# oracle SQL below.
_L3E_DF_CAP = 20

# Shared CTE prefix (through the raw co-occurrence pair counts): l3e's
# oracle appends its scoring SELECT; graph.py's duplicate-cluster oracle
# appends threshold + recursive-closure CTEs.  WITH RECURSIVE so the
# appended CTEs may recurse (harmless when nothing does).
_L3E_PAIR_CTES = f"""
WITH RECURSIVE tok AS (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks
  FROM documents
),
grams AS (
  SELECT DISTINCT doc_id,
         toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
  FROM tok, UNNEST(range(1, len(toks) - 1)) AS u(i)
),
freq AS (SELECT shingle, COUNT(*) AS df FROM grams GROUP BY shingle),
kept AS (
  SELECT g.doc_id, g.shingle
  FROM grams g JOIN freq f USING (shingle)
  WHERE f.df <= {_L3E_DF_CAP}
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM kept GROUP BY doc_id),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared
  FROM kept a JOIN kept b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
"""

_L3E_ORACLE = _L3E_PAIR_CTES + """
SELECT p.doc_a, p.doc_b, p.n_shared,
       ROUND(p.n_shared * 1.0 / (sa.n + sb.n - p.n_shared), 6) AS jaccard
FROM pairs p
JOIN sizes sa ON sa.doc_id = p.doc_a
JOIN sizes sb ON sb.doc_id = p.doc_b
WHERE p.n_shared * 1.0 / (sa.n + sb.n - p.n_shared) >= 0.2
"""


# bounded to one entry: a two_pass ngram_jaccard_pairs call evicts the
# previous call's persisted grams before pinning its own (the one-pass
# path persists nothing — see the ReuseExchange note inside)
_POSTINGS_CACHE: list[DataFrame] = []


def ngram_jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    df_cap: int = _L3E_DF_CAP,
    threshold: float = 0.2,
    materialize: str | None = None,
    two_pass: bool = False,
    raw: bool = False,
) -> DataFrame:
    """Capped inverted-index n-gram Jaccard pair mining (L3e core).

    Pipeline — ONE wide shuffle of the shingle data; everything after
    it is bounded by the df cap:

    1. shingle: per-doc DISTINCT word n-grams (narrow map), each
       immediately hashed to an int64 key (``xxhash64``) so the wide
       shuffle below moves 8-byte longs, not n-gram strings.
    2. single ``groupBy(shingle)`` producing BOTH the document
       frequency and the sorted posting list; shingles with df >
       ``df_cap`` (boilerplate head of the Zipf curve) are dropped in
       the same pass.  No separate count pass, no anti-join — the
       round-2 bench showed the two-pass plan paid a full extra
       aggregation over the raw grams for nothing.
    3. per-doc capped set sizes by re-exploding the KEPT posting lists
       (≤ cap ids per list — bounded, tiny next to the raw grams).
    4. posting-list pair expansion: explode the sorted C(k,2) pairs
       map-side; per-shingle work is ≤ cap²/2 by construction — the
       invariant that survives 100 TB.
    5. |A∩B| = pair count; |A|,|B| join back from step 3's sizes.

    The kept posting table feeds two consumers (sizes + pair
    expansion) above one shared exchange, which ReuseExchange
    materializes once per action — no explicit persist (measured
    slower at bench scale; see inline note).  Pass ``materialize=`` a
    scratch path to land the inverted index as parquet instead — the
    100 TB pattern (production dedup pipelines persist the inverted
    index to storage and fan many consumers off it).

    Memory bound: the single-pass groupBy must buffer a hot shingle's
    full posting list before filtering it (max_df × 8 B per
    aggregation buffer) — fine up to df ~ 10⁷, not for a boilerplate
    shingle present in a large fraction of a web corpus.
    ``two_pass=True`` restores the count-first + broadcast-anti-join
    plan whose buffers never exceed the cap; flip it on when max
    document frequency × 8 B threatens executor memory.  Semantics are
    identical either way.
    """
    toks = F.filter(F.split(F.col("text"), " "), lambda t: t != "")
    gram = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size("toks") - (n - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(F.col("toks"), i + j) for j in range(n)]
            ),
        )
    )
    # sequence(1, n) descends when n < 1 — guard short docs to an empty set.
    # No .distinct() after the explode: array_distinct above already makes
    # (doc_id, shingle) unique per document, so a global dedup would be a
    # pure full-posting-set shuffle for nothing.
    #
    # Repartition BEFORE shingling — but only when the input actually
    # arrives in fewer splits than cores (a compact parquet fixture would
    # otherwise run the expensive tokenize+shingle map single-threaded).
    # A user-specified repartition(N) is a required exchange that AQE
    # will NOT elide, so it is gated on the real input partitioning
    # rather than applied unconditionally: at 100 TB the scan already
    # has thousands of splits and no exchange is inserted at all.
    par = docs.sparkSession.sparkContext.defaultParallelism
    narrow = docs.select("doc_id", "text")
    if narrow.rdd.getNumPartitions() < par:
        narrow = narrow.repartition(par)
    # Hash each shingle to int64 (xxhash64) the moment it is exploded:
    # every downstream consumer (df count, posting list, pair expansion)
    # keys on the shingle's identity, never its text, so the wide
    # groupBy(shingle) exchange moves 8-byte longs instead of ~24-char
    # trigram strings — the dominant shuffle of this pipeline, ~3× fewer
    # key bytes.  The hash runs AFTER the explode, not inside the
    # transform lambda: higher-order-function bodies are interpreted
    # per element, while the post-explode projection is whole-stage
    # codegen'd (A/B measured 1.40 s vs 1.67 s at sf0.1).  The oracle
    # keeps grouping by the RAW string: a 64-bit collision
    # (P ≈ n²/2⁶⁵, negligible at any realistic corpus size) would merge
    # two posting lists and be CAUGHT as an oracle mismatch, not
    # masked — string-keyed ground truth, hashed-key execution.
    grams = (
        narrow.select("doc_id", toks.alias("toks"))
        .select(
            "doc_id",
            F.explode(
                F.when(F.size("toks") >= n, gram).otherwise(
                    F.array().cast("array<string>")
                )
            ).alias("shingle_text"),
        )
        .select("doc_id", F.xxhash64("shingle_text").alias("shingle"))
    )
    if two_pass:
        # escape hatch for extreme-df corpora: pin the grams, count df
        # first, anti-join the hot set out before any list is collected
        from pyspark import StorageLevel

        while _POSTINGS_CACHE:
            _POSTINGS_CACHE.pop().unpersist()
        grams = grams.persist(StorageLevel.MEMORY_AND_DISK)
        _POSTINGS_CACHE.append(grams)
        hot = (
            grams.groupBy("shingle")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") > df_cap)
            .select("shingle")
        )
        grams = grams.join(F.broadcast(hot), "shingle", "left_anti")
    posting = (
        grams.groupBy("shingle")
        .agg(
            F.count("*").alias("df"),
            F.array_sort(F.collect_list("doc_id")).alias("docs"),
        )
        .filter(F.col("df") <= df_cap)
        .select("shingle", "docs")
    )
    if materialize:
        spark = docs.sparkSession
        posting.write.mode("overwrite").parquet(materialize)
        posting = spark.read.parquet(materialize)
    # No persist on the one-pass path: both consumers (sizes + pair
    # expansion) sit above the SAME groupBy(shingle) exchange, which
    # Catalyst's ReuseExchange materializes once — the expensive
    # tokenize/shingle map is below it and runs once either way; only
    # the cap-bounded post-shuffle aggregation replays per consumer.
    # Measured at sf0.1: persist cost 0.3–0.5 s MORE per call than the
    # replay (memory write + eviction churn).  Consumers that span
    # multiple ACTIONS (the l3f/l3g loop) take their one materialization
    # via localCheckpoint on the pair table, and true 100 TB pipelines
    # pass ``materialize=`` to land the inverted index on storage.
    sizes = (
        posting.select(F.explode("docs").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count("*").alias("n"))
    )
    multi = posting.filter(F.size("docs") >= 2)
    pair_structs = F.flatten(
        F.transform(
            F.col("docs"),
            lambda x, i: F.transform(
                F.slice(F.col("docs"), i + 2, F.size(F.col("docs"))),
                lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b")),
            ),
        )
    )
    pairs = (
        multi.select(F.explode(pair_structs).alias("p"))
        .select("p.doc_a", "p.doc_b")
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_shared"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    joined = pairs.join(sa, "doc_a").join(sb, "doc_b")
    if raw:
        # unfiltered scored pairs with both set sizes — the shared
        # substrate for other overlap metrics (l3m containment) that
        # must apply their OWN threshold in exact integer arithmetic
        return joined
    jac = F.col("n_shared") / (F.col("na") + F.col("nb") - F.col("n_shared"))
    return joined.filter(jac >= threshold).select(
        "doc_a", "doc_b", "n_shared", F.round(jac, 6).alias("jaccard")
    )


@query("l3e_ngram_jaccard", oracle=_L3E_ORACLE, tags=("dedup", "neardup"))
def l3e_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3e: n-gram Jaccard near-dup with a stop-shingle frequency cap —
    word-trigram sets per doc, pairwise Jaccard = |A∩B| / (|A|+|B|-|A∩B|)
    ≥ 0.2, where shingles with document frequency > _L3E_DF_CAP (20) are
    excluded from both intersections and set sizes (capped semantics,
    mirrored in the oracle).  See ``ngram_jaccard_pairs`` for the scale
    argument: posting lists are bounded by the cap, so the pair expansion
    can never go quadratic on a hot shingle."""
    docs = load(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(docs)


# --- L3b: MinHash LSH near-dup (approximate index, exact-audited oracle) ------

# Exact char-5-gram Jaccard ≥ 0.5 pairs, computed by DuckDB through the
# same shingle inverted index the Spark audit leg uses.  The oracle
# asserts TRUE for ``lsh_found``: the seeded MinHashLSH index must
# recover every exact pair.  On the fixtures every exact pair has
# Jaccard ≥ 0.92, so the per-pair miss probability with 8 independent
# minhash tables is (1 - 0.92)^8 ≈ 2e-9 — the guarantee has wide margin
# (the same rows-only→guarantee upgrade as l5_ann_lsh / a3 / a9b).
_L3B_ORACLE = """
WITH sh AS (
  SELECT DISTINCT doc_id,
         unnest([text[i:i+4]
                 for i in range(1, greatest(length(text) - 4, 1) + 1)]) AS s
  FROM documents
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
p AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(COUNT(*) AS BIGINT) AS n_shared
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT p.doc_a, p.doc_b, p.n_shared,
       ROUND(p.n_shared / (sa.n + sb.n - p.n_shared), 6) AS jaccard,
       TRUE AS lsh_found
FROM p
JOIN sizes sa ON p.doc_a = sa.doc_id
JOIN sizes sb ON p.doc_b = sb.doc_id
WHERE p.n_shared / (sa.n + sb.n - p.n_shared) >= 0.5
ORDER BY doc_a, doc_b
"""


@query("l3b_minhash_lsh_pairs", oracle=_L3B_ORACLE, tags=("dedup", "neardup", "ml"))
def l3b_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3b: MinHash-LSH near-duplicate pairs with an exact-audit oracle.

    Index leg (the 100 TB scale path): shingle(char 5-gram) →
    CountVectorizer(binary) → seeded MinHashLSH(8 tables) →
    approxSimilarityJoin at Jaccard distance ≤ 0.5 — candidate
    comparisons happen only within LSH buckets, never all-pairs.

    Audit leg (driver-checkable ground truth): the exact Jaccard ≥ 0.5
    pair set via a distinct-shingle inverted index — the same
    posting-list shape as l3e (one wide shuffle keyed on shingles; at
    extreme corpus-level df the l3e df-cap / two_pass escape applies,
    documented at ``ngram_jaccard_pairs``).  The output is the exact
    pair set with its true Jaccard plus ``lsh_found``, the per-pair
    recall guarantee the oracle asserts TRUE.  approxSimilarityJoin
    verifies true distances on candidates, so found ⊆ exact and the
    only possible failure is a recall miss — probability ≈ 2e-9/pair
    on the fixtures (see ``_L3B_ORACLE``)."""
    from pyspark.ml.feature import CountVectorizer, MinHashLSH

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
    found = (
        lsh_model.approxSimilarityJoin(feats, feats, 0.5, distCol="jaccard_dist")
        .select(
            F.col("datasetA.doc_id").alias("doc_a"),
            F.col("datasetB.doc_id").alias("doc_b"),
        )
        .filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn("hit", F.lit(True))
    )
    # exact audit leg: distinct-shingle inverted index (l3e shape)
    sh = (
        shingled.select("doc_id", F.explode("shingles").alias("s")).distinct()
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    pairs = (
        sh.alias("a")
        .join(sh.alias("b"), "s")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_shared"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    jac = F.col("n_shared") / (F.col("na") + F.col("nb") - F.col("n_shared"))
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(jac >= 0.5)
        .join(found, ["doc_a", "doc_b"], "left")
        .select(
            "doc_a",
            "doc_b",
            "n_shared",
            F.round(jac, 6).alias("jaccard"),
            F.coalesce(F.col("hit"), F.lit(False)).alias("lsh_found"),
        )
        .orderBy("doc_a", "doc_b")
    )


# --- L3h: portable MinHash LSH (exact arithmetic, fully oracle-able) ----------

# 16 fixed universal-hash permutations h_i(x) = (a_i·x + b_i) mod P over
# portable polynomial shingle hashes.  Everything below is plain modular
# integer arithmetic, so DuckDB can replay it bit-for-bit — unlike Spark
# ML's MinHashLSH, whose murmur-based permutations are engine-specific
# (l3b stays as the rows-only ML-pipeline variant).
_MH_P = 1_000_003
_MH_PERMS = [
    (17, 43), (29, 107), (53, 211), (89, 401),
    (131, 613), (173, 839), (233, 1087), (283, 1321),
    (349, 1571), (409, 1823), (463, 2099), (541, 2351),
    (601, 2609), (659, 2861), (733, 3137), (809, 3413),
]
_MH_BANDS = 4  # 4 bands × 4 rows: P(candidate) = 1-(1-j^4)^4

_L3H_ORACLE = f"""
WITH sh AS (
  SELECT DISTINCT doc_id,
         list_reduce(
           list_transform(string_split(substring(text, CAST(i AS INTEGER), 5), ''),
                          c -> unicode(c)),
           (acc, x) -> (acc * 31 + x) % {_MH_P}) AS sh_hash
  FROM documents, UNNEST(range(1, greatest(length(text) - 4, 1) + 1)) AS t(i)
  WHERE length(text) > 0
),
sig AS (
  SELECT doc_id,
         {", ".join(f"MIN(({a} * sh_hash + {b}) % {_MH_P}) AS h{i}" for i, (a, b) in enumerate(_MH_PERMS))}
  FROM sh GROUP BY doc_id
),
bands AS (
  SELECT doc_id, b.band_id,
         CASE b.band_id
           {" ".join(f"WHEN {bi} THEN concat_ws('_', h{4*bi}, h{4*bi+1}, h{4*bi+2}, h{4*bi+3})" for bi in range(_MH_BANDS))}
         END AS band_key
  FROM sig CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS band_id) b
),
cand AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
  FROM bands x
  JOIN bands y ON x.band_id = y.band_id AND x.band_key = y.band_key
             AND x.doc_id < y.doc_id
)
SELECT c.doc_a, c.doc_b,
       CAST({" + ".join(f"CASE WHEN sa.h{i} = sb.h{i} THEN 1 ELSE 0 END" for i in range(len(_MH_PERMS)))} AS BIGINT) AS n_equal,
       ROUND(({" + ".join(f"CASE WHEN sa.h{i} = sb.h{i} THEN 1 ELSE 0 END" for i in range(len(_MH_PERMS)))}) / {len(_MH_PERMS)}.0, 6) AS est_jaccard
FROM cand c
JOIN sig sa ON c.doc_a = sa.doc_id
JOIN sig sb ON c.doc_b = sb.doc_id
"""


@query("l3h_portable_minhash", oracle=_L3H_ORACLE, tags=("dedup", "neardup"))
def l3h_portable_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3h: MinHash-LSH near-dup with PORTABLE arithmetic — the same
    shingle→minhash→band→bucket-join pipeline as l3b, but every hash is
    explicit modular arithmetic ((a·x+b) mod P over a base-31 polynomial
    fold of the shingle's codepoints), so the whole approximate pipeline
    is deterministically replayable in ANSI SQL and earns a full
    value-hash oracle — no other engine's internal hashing involved.

    Scale shape (the LSH contract): one shuffle of (doc_id, sh_hash)
    int pairs for the 16 min-aggregates, band keys shuffled once for the
    bucket self-join, comparisons only within buckets — O(candidates),
    never O(n²).  The signature ride-along join is on doc_id (16 ints per
    doc).  Candidate volume is tunable by the band/row split (4×4 →
    P(candidate) = 1-(1-j⁴)⁴).

    Empty documents are filtered identically on both sides: Spark's
    ascii('') is 0 while DuckDB's unicode('') is -1 (and DuckDB's %
    keeps the sign), so an unguarded empty text would fold to
    different sh_hash values per engine."""
    docs = (
        load(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .filter(F.length("text") > 0)
    )
    sig = _mh_signatures(docs)
    bands = _mh_bands(sig)
    cand = (
        bands.alias("x")
        .join(
            bands.alias("y"),
            [
                F.col("x.band_id") == F.col("y.band_id"),
                F.col("x.band_key") == F.col("y.band_key"),
                F.col("x.doc_id") < F.col("y.doc_id"),
            ],
        )
        .select(
            F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b")
        )
        .distinct()
    )
    return _mh_score_pairs(cand, sig)


def _mh_signatures(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, h0..h15): the portable MinHash signature pipeline shared
    by l3h (full recompute) and l3k (incremental maintenance) — distinct
    char-5-gram shingles → base-31 polynomial codepoint fold mod P →
    16 universal-hash min-aggregates.  One shuffle of (doc_id, int)
    pairs; every operation is replayable in ANSI SQL."""
    shingles = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(1, greatest(length({text_col}) - 4, 1)),"
                f" i -> substring({text_col}, i, 5))"
            )
        ).alias("shingle"),
    )
    hashed = shingles.select(
        "doc_id",
        F.expr(
            f"aggregate(transform(split(shingle, ''), c -> ascii(c)),"
            f" 0L, (acc, x) -> (acc * 31 + x) % {_MH_P})"
        ).alias("sh_hash"),
    ).distinct()
    return hashed.groupBy("doc_id").agg(
        *[
            F.min((F.lit(a) * F.col("sh_hash") + F.lit(b)) % _MH_P).alias(f"h{i}")
            for i, (a, b) in enumerate(_MH_PERMS)
        ]
    )


def _mh_bands(sig: DataFrame) -> DataFrame:
    """(doc_id, band_id, band_key): 4×4 banding of a signature table."""
    band_keys = F.array(
        *[
            F.concat_ws("_", *[F.col(f"h{4 * bi + r}") for r in range(4)])
            for bi in range(_MH_BANDS)
        ]
    )
    return sig.select(
        "doc_id", F.posexplode(band_keys).alias("band_id", "band_key")
    )


def _mh_score_pairs(cand: DataFrame, sig: DataFrame) -> DataFrame:
    """Ride the signatures back onto (doc_a, doc_b) candidates and emit
    n_equal / est_jaccard.  Join is on doc_id — 16 ints per doc."""
    sig_arr = sig.select(
        "doc_id",
        F.array(*[F.col(f"h{i}") for i in range(len(_MH_PERMS))]).alias("sig"),
    )
    n_eq = F.expr(
        "aggregate(zip_with(sig_a, sig_b, (x, y) -> CASE WHEN x = y THEN 1 ELSE 0 END),"
        " 0L, (acc, v) -> acc + v)"
    )
    return (
        cand.join(
            sig_arr.select(
                F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a")
            ),
            "doc_a",
        )
        .join(
            sig_arr.select(
                F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b")
            ),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            n_eq.alias("n_equal"),
            F.round(n_eq / len(_MH_PERMS), 6).alias("est_jaccard"),
        )
    )


# --- L3k: incremental near-dup index maintenance ------------------------------

# Simulated previous pull: docs %13 == 0 are NEW (absent yesterday) and
# docs %7 == 0 were EDITED (yesterday's copy lacked the last 10 chars).
_L3K_OLD_TEXT = "substring(text, 1, CAST(greatest(length(text) - 10, 1) AS INTEGER))"
_L3K_NEQ = " + ".join(
    f"CASE WHEN sa.h{i} = sb.h{i} THEN 1 ELSE 0 END"
    for i in range(len(_MH_PERMS))
)

# The oracle is the FULL index recompute over the current corpus (the
# l3h CTEs) restricted to pairs touching a changed doc — so a driver
# match proves the incremental plan (reuse stored signatures, re-sign
# only the changed set) reconstructs exactly what a from-scratch
# rebuild would emit for those pairs: U9's merge ≡ recompute contract,
# applied to the LSH index.
_L3K_ORACLE = f"""
WITH cur AS (
  SELECT doc_id, text FROM documents WHERE length(text) > 0
),
sh AS (
  SELECT DISTINCT doc_id,
         list_reduce(
           list_transform(string_split(substring(text, CAST(i AS INTEGER), 5), ''),
                          c -> unicode(c)),
           (acc, x) -> (acc * 31 + x) % {_MH_P}) AS sh_hash
  FROM cur, UNNEST(range(1, greatest(length(text) - 4, 1) + 1)) AS t(i)
),
sig AS (
  SELECT doc_id,
         {", ".join(f"MIN(({a} * sh_hash + {b}) % {_MH_P}) AS h{i}" for i, (a, b) in enumerate(_MH_PERMS))}
  FROM sh GROUP BY doc_id
),
bands AS (
  SELECT doc_id, b.band_id,
         CASE b.band_id
           {" ".join(f"WHEN {bi} THEN concat_ws('_', h{4*bi}, h{4*bi+1}, h{4*bi+2}, h{4*bi+3})" for bi in range(_MH_BANDS))}
         END AS band_key
  FROM sig CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS band_id) b
),
changed AS (
  SELECT doc_id FROM cur
  WHERE doc_id % 13 = 0
     OR (doc_id % 7 = 0 AND {_L3K_OLD_TEXT} <> text)
),
cand AS (
  SELECT DISTINCT least(x.doc_id, y.doc_id) AS doc_a,
                  greatest(x.doc_id, y.doc_id) AS doc_b
  FROM bands x
  JOIN bands y ON x.band_id = y.band_id AND x.band_key = y.band_key
             AND x.doc_id <> y.doc_id
  WHERE x.doc_id IN (SELECT doc_id FROM changed)
)
SELECT c.doc_a, c.doc_b,
       CAST({_L3K_NEQ} AS BIGINT) AS n_equal,
       ROUND(({_L3K_NEQ}) / {len(_MH_PERMS)}.0, 6) AS est_jaccard,
       c.doc_a IN (SELECT doc_id FROM changed) AS a_changed,
       c.doc_b IN (SELECT doc_id FROM changed) AS b_changed
FROM cand c
JOIN sig sa ON c.doc_a = sa.doc_id
JOIN sig sb ON c.doc_b = sb.doc_id
ORDER BY doc_a, doc_b
"""


@query("l3k_incremental_index", oracle=_L3K_ORACLE, tags=("dedup", "neardup", "cdc"))
def l3k_incremental_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3k: INCREMENTAL near-dup index maintenance — the CDC × dedup
    composition a daily-refresh corpus needs.  A full LSH rebuild over
    100 TB for a 0.1% daily delta is the single biggest avoidable cost
    in a production dedup pipeline; this operator maintains the index
    with O(changed) signature work:

    1. change detection by content digest (sha2) against the stored
       pull — the hash column a real signature store keeps per doc;
    2. signatures recomputed ONLY for changed/new docs; unchanged docs
       REUSE their stored signatures (valid because equal digest ⇒
       equal shingle set ⇒ equal signature — the invariant that makes
       signature reuse sound);
    3. banding over the merged index; candidate pairs restricted to
       those touching a changed doc — an edit can only create or
       destroy pairs involving itself, so the delta probe joins
       changed-bands × all-bands, never all × all.

    The oracle is the full from-scratch rebuild (l3h's SQL) restricted
    to changed-touching pairs: a value-hash match PROVES incremental ≡
    recompute (U9's contract, applied to the index).  The stored
    signature table is simulated by signing yesterday's corpus in-plan;
    in production it is a parquet table read back (the ``materialize=``
    pattern at ``ngram_jaccard_pairs``), making step 2 genuinely
    O(changed)."""
    docs = (
        load(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .filter(F.length("text") > 0)
    )
    old_text = F.when(
        F.col("doc_id") % 7 == 0, F.expr(_L3K_OLD_TEXT)
    ).otherwise(F.col("text"))
    stored = docs.filter(F.col("doc_id") % 13 != 0).select(
        "doc_id", old_text.alias("text")
    )
    # CDC detection: digest diff against the stored corpus (new docs
    # have no stored row -> NULL digest -> changed)
    fresh_hash = docs.select("doc_id", F.sha2("text", 256).alias("h_new"))
    stored_hash = stored.select("doc_id", F.sha2("text", 256).alias("h_old"))
    changed_ids = (
        fresh_hash.join(stored_hash, "doc_id", "left")
        .filter(F.col("h_old").isNull() | (F.col("h_old") != F.col("h_new")))
        .select("doc_id")
    )
    # incremental maintenance: re-sign only the changed set, reuse the
    # stored signatures for everything else
    changed_docs = docs.join(changed_ids, "doc_id", "left_semi")
    unchanged_stored = stored.join(changed_ids, "doc_id", "left_anti")
    sig = _mh_signatures(unchanged_stored).unionByName(
        _mh_signatures(changed_docs)
    )
    bands = _mh_bands(sig)
    changed_bands = bands.join(changed_ids, "doc_id", "left_semi")
    cand = (
        changed_bands.alias("x")
        .join(
            bands.alias("y"),
            [
                F.col("x.band_id") == F.col("y.band_id"),
                F.col("x.band_key") == F.col("y.band_key"),
                F.col("x.doc_id") != F.col("y.doc_id"),
            ],
        )
        .select(
            F.least("x.doc_id", "y.doc_id").alias("doc_a"),
            F.greatest("x.doc_id", "y.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    flags = changed_ids.withColumn("is_changed", F.lit(True))
    return (
        _mh_score_pairs(cand, sig)
        .join(
            flags.select(
                F.col("doc_id").alias("doc_a"),
                F.col("is_changed").alias("fa"),
            ),
            "doc_a",
            "left",
        )
        .join(
            flags.select(
                F.col("doc_id").alias("doc_b"),
                F.col("is_changed").alias("fb"),
            ),
            "doc_b",
            "left",
        )
        .select(
            "doc_a",
            "doc_b",
            "n_equal",
            "est_jaccard",
            F.coalesce("fa", F.lit(False)).alias("a_changed"),
            F.coalesce("fb", F.lit(False)).alias("b_changed"),
        )
        .orderBy("doc_a", "doc_b")
    )


# --- L3j: passage(chunk)-level dedup profile ----------------------------------

_L3J_CHUNK = 10  # tokens per passage

_L3J_ORACLE = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split(text, ' '), t -> t <> '') AS tk
  FROM documents
),
chunks AS (
  SELECT doc_id,
         array_to_string(
           tk[(i - 1) * {_L3J_CHUNK} + 1 : i * {_L3J_CHUNK}], ' '
         ) AS chunk
  FROM toks,
       UNNEST(range(1, CAST(floor(len(tk) / {_L3J_CHUNK}) AS BIGINT) + 1))
         AS t(i)
),
occ AS (SELECT chunk, COUNT(*) AS occ FROM chunks GROUP BY chunk)
SELECT c.doc_id,
       COUNT(*) AS n_chunks,
       CAST(SUM(CASE WHEN o.occ > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_chunks,
       ROUND(SUM(CASE WHEN o.occ > 1 THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6)
         AS dup_frac
FROM chunks c JOIN occ o USING (chunk)
GROUP BY c.doc_id
"""


@query("l3j_chunk_dedup", oracle=_L3J_ORACLE, tags=("dedup", "neardup"))
def l3j_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3j: passage-level duplication profile — the Gopher/FineWeb-style
    "fraction of duplicated passages" signal, over fixed 10-token chunks
    (the fixture corpus has no paragraph separators, so fixed-width
    passages are the segmentation).  Per doc: number of full chunks,
    how many of them occur more than once ANYWHERE in the corpus, and
    the duplicated fraction — the input to boilerplate/template
    filtering, one level finer than whole-document dedup (L1/L2) and
    cheaper than pairwise near-dup (L3e).

    Scale shape: chunks are hashed to int64 (xxhash64) before the
    global occurrence groupBy, so the corpus-wide shuffle moves (hash,
    doc_id) pairs — never passage text (same key-compression argument
    as l3e, and a collision would surface as an oracle mismatch).  ONE
    wide shuffle total: the groupBy(h) produces the occurrence count
    AND the doc posting list in the same pass (the l3e single-
    aggregation idiom — a join of chunks against a separately
    aggregated count table would either broadcast a corpus-sized build
    side or re-compute the chunking under a second exchange, both
    verified in the physical plan), then the re-explode of the posting
    lists shuffles bounded (doc_id, flag) rows for the per-doc rollup.
    Memory bound: a boilerplate chunk's full posting list buffers in
    one aggregation buffer before the explode, the same documented
    bound as l3e's one-pass path (fine to df ≈ 10⁷ per chunk; an
    l3e-style two-pass escape applies if a corpus ever needs it).
    No all-pairs stage exists at any scale."""
    toks = F.filter(F.split(F.col("text"), " "), lambda t: t != "")
    chunks_arr = F.transform(
        F.sequence(
            F.lit(1), F.floor(F.size("toks") / _L3J_CHUNK).cast("int")
        ),
        lambda i: F.concat_ws(
            " ", F.slice(F.col("toks"), (i - 1) * _L3J_CHUNK + 1, _L3J_CHUNK)
        ),
    )
    docs = load(spark, sf_dir, "documents")
    chunks = (
        docs.select("doc_id", toks.alias("toks"))
        .select(
            "doc_id",
            F.explode(
                F.when(F.size("toks") >= _L3J_CHUNK, chunks_arr).otherwise(
                    F.array().cast("array<string>")
                )
            ).alias("chunk_text"),
        )
        .select("doc_id", F.xxhash64("chunk_text").alias("h"))
    )
    posting = chunks.groupBy("h").agg(
        F.count("*").alias("occ"), F.collect_list("doc_id").alias("docs")
    )
    dup_flag = F.when(F.col("occ") > 1, 1).otherwise(0)
    return (
        posting.select("occ", F.explode("docs").alias("doc_id"))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum(dup_flag).cast("long").alias("n_dup_chunks"),
            F.round(F.sum(dup_flag) / F.count("*"), 6).alias("dup_frac"),
        )
    )


# --- L2b: canonical-text (normalized) hash dedup -------------------------------

# lower → strip non-alphanumerics → collapse runs of spaces → trim: the
# C4-style "fuzzy-exact" dedup key that merges documents differing only
# in case, punctuation, or whitespace.  Patterns sit in the Java∩RE2
# regex subset both engines execute identically (same discipline as the
# blocklist redaction); DuckDB needs the explicit 'g' flag where Spark
# replaces globally by default.
_L2B_ORACLE = """
WITH keyed AS (
  SELECT doc_id, lang, text,
         sha256(trim(regexp_replace(
             regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
             ' +', ' ', 'g'))) AS ck,
         sha256(text) AS rk
  FROM documents
),
ranked AS (
  SELECT lang,
         ROW_NUMBER() OVER (PARTITION BY ck ORDER BY doc_id) AS crn,
         ROW_NUMBER() OVER (PARTITION BY rk ORDER BY doc_id) AS rrn
  FROM keyed
)
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN crn = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_canonical,
       CAST(SUM(CASE WHEN crn > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_removed,
       CAST(SUM(CASE WHEN crn > 1 AND rrn = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_norm_only
FROM ranked
GROUP BY lang
"""


@query("l2b_canonical_dedup", oracle=_L2B_ORACLE, tags=("dedup",))
def l2b_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2b: dedup on the CANONICALIZED text — lowercase, punctuation
    stripped, whitespace collapsed — the C4-style fuzzy-exact key that
    catches near-identical boilerplate raw hashing (L2) keeps.  Per
    lang: docs, canonical survivors (min doc_id wins, deterministic
    under any partitioning), removed docs, and ``n_norm_only`` — the
    docs removed ONLY because of normalization (their raw text is
    unique), i.e. the marginal yield of canonicalization over L2.

    Scale shape: identical to L2 — the normalization is a narrow
    per-row map and only 32-byte sha2 digests shuffle into the two
    dedup windows; text never crosses the wire.  Both regex patterns
    are in the Java∩RE2 subset both engines execute identically."""
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    canon = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", " "),
            " +",
            " ",
        )
    )
    keyed = docs.select(
        "doc_id",
        "lang",
        F.sha2(canon, 256).alias("ck"),
        F.sha2(F.col("text"), 256).alias("rk"),
    )
    crn = F.row_number().over(Window.partitionBy("ck").orderBy("doc_id"))
    rrn = F.row_number().over(Window.partitionBy("rk").orderBy("doc_id"))
    ranked = keyed.select(
        "lang", crn.alias("crn"), rrn.alias("rrn")
    )
    return ranked.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.when(F.col("crn") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_canonical"),
        F.sum(F.when(F.col("crn") > 1, 1).otherwise(0))
        .cast("long")
        .alias("n_removed"),
        F.sum(
            F.when((F.col("crn") > 1) & (F.col("rrn") == 1), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_norm_only"),
    )


# --- L3m: n-gram CONTAINMENT near-dup (the asymmetric overlap metric) ----------

_L3M_ORACLE = _L3E_PAIR_CTES + """
SELECT p.doc_a, p.doc_b, p.n_shared,
       sa.n AS na, sb.n AS nb,
       CAST(p.n_shared * 1000000 // LEAST(sa.n, sb.n) AS BIGINT)
         AS containment_micro,
       CAST(p.n_shared * 1000000 // (sa.n + sb.n - p.n_shared) AS BIGINT)
         AS jaccard_micro
FROM pairs p
JOIN sizes sa ON sa.doc_id = p.doc_a
JOIN sizes sb ON sb.doc_id = p.doc_b
WHERE p.n_shared * 10 >= 6 * LEAST(sa.n, sb.n)
"""


@query("l3m_containment_dedup", oracle=_L3M_ORACLE, tags=("dedup", "neardup"))
def l3m_containment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3m: n-gram CONTAINMENT near-duplicates — the asymmetric
    overlap metric C(A,B) = |A∩B| / min(|A|,|B|) (Broder's
    resemblance/containment pair, SRC-TN 1997).  Jaccard divides by
    the UNION, so a short document fully embedded in a long one (a
    quoted article, boilerplate-wrapped reposts, a chunk extracted
    from its source) scores near zero even at 100% inclusion;
    containment divides by the SMALLER set and flags exactly those
    subset duplicates — the standard second pass in production corpus
    dedup next to l3e's symmetric Jaccard.

    Reuses :func:`ngram_jaccard_pairs`'s capped inverted-index pair
    mining unchanged (``raw=True`` — one int64-shingle shuffle,
    posting-list pair expansion bounded by the df cap; the exact
    machinery that survives 100 TB), so the marginal cost of the
    second metric is zero extra shuffles: both are projections over
    the same scored pair table.

    Parity design: both the threshold and the reported scores are
    EXACT INTEGER arithmetic — the filter is the cross-multiplied
    ``n_shared * 10 >= 6 * min(na, nb)`` and the scores are
    micro-unit floor divisions (``x * 1e6 DIV y``), so no
    ROUND(double) sits anywhere near a representation midpoint (the
    parity-ledger trap that bit the IVF family this round).  Both
    sizes ride along so the asymmetry is visible: containment 1.0
    rows with na ≠ nb are invisible to a high Jaccard bar by
    construction."""
    docs = load(spark, sf_dir, "documents")
    scored = ngram_jaccard_pairs(docs, raw=True)
    lo = F.least(F.col("na"), F.col("nb"))
    return scored.filter(
        F.col("n_shared") * 10 >= 6 * lo
    ).select(
        "doc_a",
        "doc_b",
        "n_shared",
        "na",
        "nb",
        F.expr("n_shared * 1000000 DIV least(na, nb)").alias(
            "containment_micro"
        ),
        F.expr("n_shared * 1000000 DIV (na + nb - n_shared)").alias(
            "jaccard_micro"
        ),
    )


# --- L3n: blocked edit-distance near-dup (character-level) ----------------------

_L3N_BLK = 16  # block key length (prefix / suffix chars)
_L3N_CAP = 20  # hot-block cap (the l3e df-cap idea for blocks)
_L3N_MAX = 10  # edit-distance threshold

_L3N_ORACLE = f"""
WITH d AS (SELECT doc_id, text FROM documents),
blk AS (
  SELECT doc_id, 'p' || substring(text, 1, {_L3N_BLK}) AS blk FROM d
  UNION ALL
  SELECT doc_id,
         's' || substring(text, greatest(length(text) - {_L3N_BLK - 1}, 1),
                          {_L3N_BLK}) AS blk
  FROM d
),
kept AS (
  SELECT blk FROM blk GROUP BY blk
  HAVING COUNT(*) BETWEEN 2 AND {_L3N_CAP}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM blk a
  JOIN kept k ON k.blk = a.blk
  JOIN blk b ON a.blk = b.blk AND a.doc_id < b.doc_id
)
SELECT c.doc_a, c.doc_b,
       CAST(levenshtein(da.text, db.text) AS BIGINT) AS edit_dist
FROM cand c
JOIN d da ON da.doc_id = c.doc_a
JOIN d db ON db.doc_id = c.doc_b
WHERE levenshtein(da.text, db.text) <= {_L3N_MAX}
"""


@query("l3n_edit_distance_blocked", oracle=_L3N_ORACLE, tags=("dedup", "neardup"))
def l3n_edit_distance_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3n: CHARACTER-level near-duplicates — blocked Levenshtein,
    the axis the token family can't see: a dozen scattered single-
    character edits (OCR noise, emitter typos, encoding mojibake)
    destroys every word trigram they touch (l3e scores low) yet is
    edit-distance ≤ 10; conversely a paragraph reorder is Jaccard-
    identical but edit-distance huge.  Both metrics are standard in
    production dedup; they catch different duplicates.

    All-pairs Levenshtein is O(n²·L²) — never.  The blocking is the
    declared semantics (the l3e df-cap discipline): candidates must
    share a {_L3N_BLK}-char PREFIX or SUFFIX block (the two-ended
    multi-index, so an edit cluster confined to one end of the
    document is still caught by the other end's block), hot blocks
    above {_L3N_CAP} docs are dropped as boilerplate, and only then
    does the quadratic-in-L distance run — per block ≤ cap²/2 pairs,
    each scoring two already-co-located strings.  Shuffle shape: the
    block join moves (16-char key, doc_id); document TEXT moves only
    for surviving candidate pairs.

    Levenshtein is exact integer Wagner–Fischer in both engines, so
    the pair set and every distance hash-check with no float
    anywhere."""
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    pre = d.select(
        "doc_id",
        F.concat(
            F.lit("p"), F.substring("text", 1, _L3N_BLK)
        ).alias("blk"),
    )
    suf = d.select(
        "doc_id",
        F.concat(
            F.lit("s"),
            F.expr(
                f"substring(text, greatest(length(text) - {_L3N_BLK - 1},"
                f" 1), {_L3N_BLK})"
            ),
        ).alias("blk"),
    )
    blk = pre.unionByName(suf)
    kept = (
        blk.groupBy("blk")
        .agg(F.count("*").alias("sz"))
        .filter((F.col("sz") >= 2) & (F.col("sz") <= _L3N_CAP))
        .select("blk")
    )
    b2 = blk.select(F.col("blk").alias("blk2"), F.col("doc_id").alias("doc_b"))
    cand = (
        blk.join(F.broadcast(kept), "blk")
        .join(b2, (F.col("blk") == F.col("blk2")) & (F.col("doc_id") < F.col("doc_b")))
        .select(F.col("doc_id").alias("doc_a"), "doc_b")
        .distinct()
    )
    da = d.select(F.col("doc_id").alias("doc_a"), F.col("text").alias("ta"))
    db = d.select(F.col("doc_id").alias("doc_b"), F.col("text").alias("tb"))
    return (
        cand.join(da, "doc_a")
        .join(db, "doc_b")
        .withColumn(
            "edit_dist", F.levenshtein("ta", "tb").cast("long")
        )
        .filter(F.col("edit_dist") <= _L3N_MAX)
        .select("doc_a", "doc_b", "edit_dist")
    )
