"""Training-data pipeline operators: reproducible splits and
embedding centroids (SURVEY.md §2.8 extension surface).

* Deterministic hash splitting is how a 100 TB corpus gets stable
  train/val/test membership: assignment depends only on the key, so
  any re-run, any cluster size, and any engine agree — unlike
  ``df.sample``/``randomSplit``, whose output changes with
  partitioning.  The multiplicative hash here is oracle-able integer
  arithmetic; a production pipeline swaps in ``xxhash64(content)``
  (same plan shape, engine-specific values → rows-only).
* Per-label centroids are the k-means/IVF training step: one
  narrow explode + one shuffle on (label, pos) — no vector ever
  crosses the wire whole, so the same plan holds at billions of
  vectors.  Decimal-exact sums keep the means partition-order
  independent (functions/numeric.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


from update_database_by_wind_spark.registry import query
from update_database_by_wind_spark.sources import load

# --- deterministic train/val/test split --------------------------------------

_KNUTH = 2654435761  # golden-ratio multiplicative hash constant
# Reduce the key mod a prime BEFORE multiplying: (_PRIME-1)*_KNUTH ≈ 2.7e15
# stays far inside int64, so the bucket arithmetic cannot overflow (and error
# under ANSI mode) even for keys beyond 2^63/_KNUTH ≈ 3.47e9 — the 100 TB key
# range the unreduced form would break at.  And reduce mod _PRIME again
# BETWEEN the multiply and the bucket modulus: ((x*A) % 100) with A
# coprime to 100 is a bijection of (x mod 100) — the "hash" would add
# zero information over the key's low two decimal digits (the same
# degeneracy the round-5 advisor proved for the mod-8 shard hash).
# ((x*A) % P) % 100 mixes every digit of the key into the bucket
# (measured uniform: 100/100 buckets hit, train fraction 80.3% on
# random keys).
_PRIME = 1_000_003


def _bucket_col(key: str = "doc_id"):
    return (((F.col(key) % _PRIME) * F.lit(_KNUTH)) % _PRIME) % 100


def _bucket_sql(key: str = "doc_id") -> str:
    return f"((({key} % {_PRIME}) * {_KNUTH}) % {_PRIME}) % 100"

_TR_SPLIT_ORACLE = f"""
WITH assigned AS (
  SELECT lang, n_chars, {_bucket_sql()} AS bucket
  FROM documents
)
SELECT CASE WHEN bucket < 80 THEN 'train'
            WHEN bucket < 90 THEN 'val'
            ELSE 'test' END AS split,
       lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM assigned
GROUP BY 1, 2
"""


@query("tr_hash_split", oracle=_TR_SPLIT_ORACLE, tags=("training", "sampling"))
def tr_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible 80/10/10 train/val/test split by multiplicative
    hash of the primary key — engine- and partitioning-independent
    membership, the property sampling-based splits lack."""
    docs = load(spark, sf_dir, "documents")
    bucket = _bucket_col()
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    return (
        docs.select(split.alias("split"), "lang", "n_chars")
        .groupBy("split", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


# --- per-label embedding centroids (IVF/k-means training step) -----------------

_TR_CENTROID_ORACLE = """
WITH expl AS (
  SELECT label, CAST(u.pos AS INTEGER) AS pos,
         CAST(FLOOR(CAST(embedding[u.pos] AS DOUBLE) * 1000000)
              AS BIGINT) AS v6
  FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS u(pos)
)
SELECT label, pos,
       CAST(CASE WHEN SUM(v6) < 0
                 THEN -((-2 * SUM(v6) + COUNT(v6)) // (2 * COUNT(v6)))
                 ELSE (2 * SUM(v6) + COUNT(v6)) // (2 * COUNT(v6))
            END AS BIGINT) AS centroid_e6,
       COUNT(*) AS n_vectors
FROM expl
GROUP BY label, pos
"""


@query(
    "tr_label_centroids", oracle=_TR_CENTROID_ORACLE, tags=("training", "vector")
)
def tr_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label mean embedding, one row per (label, dimension) — the
    coarse-quantizer training step behind l4b's IVF-style blocking.
    posexplode keeps only (label, pos, val) triples on the shuffle.

    The mean is the INTEGER micro-mean (floor-quantize each component
    onto the 1e-6 grid once, then the half-away-from-zero integer
    division): the former ``ROUND(decimal-avg, 6)`` output sat on the
    engines' ROUND(double, 6) representation-midpoint split for
    division-derived values — the exact failure a generative sweep
    caught in the sibling IVF assignment (similarity.dot_micro's
    ledger).  Integer output, identical at any partitioning and in
    both engines by construction."""
    emb = load(spark, sf_dir, "embeddings")
    expl = emb.select(
        "label", F.posexplode("embedding").alias("pos0", "valf")
    ).select(
        "label",
        (F.col("pos0") + 1).cast("int").alias("pos"),
        F.floor(F.col("valf").cast("double") * 1000000)
        .cast("long")
        .alias("v6"),
    )
    return expl.groupBy("label", "pos").agg(
        F.expr(
            "CAST(CASE WHEN sum(v6) < 0"
            " THEN -((-2 * sum(v6) + count(v6)) DIV (2 * count(v6)))"
            " ELSE (2 * sum(v6) + count(v6)) DIV (2 * count(v6))"
            " END AS LONG)"
        ).alias("centroid_e6"),
        F.count("*").alias("n_vectors"),
    )


# --- decontamination: n-gram overlap between train and held-out splits ---------

_DECON_ORACLE = f"""
WITH assigned AS (
  SELECT doc_id, lang, text,
         CASE WHEN {_bucket_sql()} < 80 THEN 'train'
              WHEN {_bucket_sql()} < 90 THEN 'val'
              ELSE 'test' END AS split
  FROM documents
),
tok AS (
  SELECT doc_id, lang, split,
         list_filter(string_split(text, ' '), t -> t <> '') AS toks
  FROM assigned
),
grams AS (
  SELECT DISTINCT doc_id, lang, split,
         toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' '
           || toks[i+3] || ' ' || toks[i+4] AS shingle
  FROM tok, UNNEST(range(1, len(toks) - 3)) AS u(i)
),
train_grams AS (SELECT DISTINCT shingle FROM grams WHERE split = 'train'),
eval_docs AS (
  SELECT doc_id, lang, split FROM grams WHERE split <> 'train'
  GROUP BY doc_id, lang, split
),
contaminated AS (
  SELECT g.doc_id FROM grams g JOIN train_grams t USING (shingle)
  WHERE g.split <> 'train'
  GROUP BY g.doc_id
)
SELECT e.split, e.lang,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN c.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_contaminated
FROM eval_docs e LEFT JOIN contaminated c USING (doc_id)
GROUP BY e.split, e.lang
"""


@query("tr_decontamination", oracle=_DECON_ORACLE, tags=("training", "dedup"))
def tr_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination — flag val/test documents sharing any
    word 5-gram with the train split (the overlap check run before
    every serious eval).  Scale shape mirrors l3e: an inverted-index
    semi-join on the shingle — the train side collapses to DISTINCT
    shingles (hashes at 100 TB), eval docs join against it, and only
    (doc_id, shingle) pairs ever shuffle, never documents."""
    docs = load(spark, sf_dir, "documents")
    bucket = _bucket_col()
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    toks = F.filter(F.split(F.col("text"), " "), lambda t: t != "")
    five = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size("toks") - 4),
            lambda i: F.concat_ws(
                " ",
                *[F.element_at(F.col("toks"), i + j) for j in range(5)],
            ),
        )
    )
    grams = (
        docs.select("doc_id", "lang", split.alias("split"), toks.alias("toks"))
        .select(
            "doc_id",
            "lang",
            "split",
            F.explode(
                F.when(F.size("toks") >= 5, five).otherwise(
                    F.array().cast("array<string>")
                )
            ).alias("shingle"),
        )
        .distinct()
    )
    train_grams = (
        grams.filter(F.col("split") == "train").select("shingle").distinct()
    )
    eval_grams = grams.filter(F.col("split") != "train")
    eval_docs = eval_grams.groupBy("doc_id", "lang", "split").agg(
        F.lit(1).alias("_one")
    )
    contaminated = (
        eval_grams.join(train_grams, "shingle", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("is_cont", F.lit(1))
    )
    return (
        eval_docs.join(contaminated, "doc_id", "left")
        .groupBy("split", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.coalesce(F.col("is_cont"), F.lit(0)))
            .cast("long")
            .alias("n_contaminated"),
        )
    )


# --- deterministic stratified downsampling -----------------------------------

_TR_STRAT_ORACLE = f"""
WITH assigned AS (
  SELECT lang, n_chars, {_bucket_sql()} AS bucket
  FROM documents
),
kept AS (
  SELECT * FROM assigned
  WHERE bucket < CASE lang WHEN 'en' THEN 10 WHEN 'zh' THEN 50 ELSE 25 END
)
SELECT lang,
       COUNT(*) AS n_kept,
       CAST(SUM(n_chars) AS BIGINT) AS kept_chars,
       CAST(CASE lang WHEN 'en' THEN 10 WHEN 'zh' THEN 50 ELSE 25 END
            AS BIGINT) AS pct_target
FROM kept
GROUP BY lang
"""


@query(
    "tr_stratified_sample", oracle=_TR_STRAT_ORACLE, tags=("training", "sampling")
)
def tr_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified downsampling — per-language keep rates
    (the data-mixing step that rebalances a crawl before training:
    dominant languages cut hardest).  Same multiplicative-hash bucket
    as tr_hash_split, so membership is stable across re-runs and
    engines, unlike ``df.sampleBy`` whose draw depends on partitioning.
    One scan, no shuffle until the final rollup."""
    docs = load(spark, sf_dir, "documents")
    bucket = _bucket_col()
    rate = (
        F.when(F.col("lang") == "en", 10)
        .when(F.col("lang") == "zh", 50)
        .otherwise(25)
    )
    return (
        docs.filter(bucket < rate)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_kept"),
            F.sum("n_chars").alias("kept_chars"),
            F.max(rate).cast("long").alias("pct_target"),
        )
    )


# --- k-anonymity audit over quasi-identifiers --------------------------------

_TR_KANON_ORACLE = """
WITH qi AS (
  SELECT c_mktsegment,
         c_nationkey,
         CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) AS bal_bucket
  FROM customer
),
groups AS (
  SELECT c_mktsegment, c_nationkey, bal_bucket, COUNT(*) AS group_size
  FROM qi GROUP BY 1, 2, 3
)
SELECT c_mktsegment,
       COUNT(*) AS n_groups,
       CAST(MIN(group_size) AS BIGINT) AS min_k,
       CAST(SUM(CASE WHEN group_size < 5 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_small_groups,
       CAST(SUM(CASE WHEN group_size < 5 THEN group_size ELSE 0 END) AS BIGINT)
         AS n_risky_rows
FROM groups
GROUP BY c_mktsegment
"""


@query("tr_k_anonymity", oracle=_TR_KANON_ORACLE, tags=("training", "privacy"))
def tr_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit — the privacy gate a training corpus passes
    before release: bucket every row by its quasi-identifier tuple
    (segment, nation, coarse balance band) and count equivalence
    classes smaller than k=5; rows in those classes are
    re-identifiable and must be suppressed or generalized.  Two
    stacked integer aggregations; the shuffle carries QI tuples only,
    so the audit runs unchanged over a 100 TB table."""
    cust = load(spark, sf_dir, "customer")
    qi = cust.select(
        "c_mktsegment",
        "c_nationkey",
        F.floor(F.col("c_acctbal") / 1000.0).cast("long").alias("bal_bucket"),
    )
    groups = qi.groupBy("c_mktsegment", "c_nationkey", "bal_bucket").agg(
        F.count("*").alias("group_size")
    )
    small = F.col("group_size") < 5
    return groups.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_groups"),
        F.min("group_size").cast("long").alias("min_k"),
        F.sum(F.when(small, 1).otherwise(0)).cast("long").alias("n_small_groups"),
        F.sum(F.when(small, F.col("group_size")).otherwise(0))
        .cast("long")
        .alias("n_risky_rows"),
    )


# --- sequence packing (concat-then-chunk context windows) ---------------------

_PACK_CAP = 1024  # context-window capacity in tokens
_PACK_SHARDS = 8  # independent packing streams (input splits at scale)

_TR_PACK_ORACLE = f"""
WITH toks AS (
  SELECT doc_id,
         doc_id % {_PACK_SHARDS} AS shard,
         CAST(CEIL(n_chars / 4.0) AS BIGINT) AS n_tokens
  FROM documents
),
offs AS (
  SELECT shard, doc_id, n_tokens,
         COALESCE(SUM(n_tokens) OVER (
           PARTITION BY shard ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_off
  FROM toks
)
SELECT shard,
       CAST(FLOOR(start_off / {_PACK_CAP}) AS BIGINT) AS chunk_id,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS tokens_started,
       CAST(MIN(start_off) % {_PACK_CAP} AS BIGINT) AS first_offset,
       CAST(SUM(CASE WHEN FLOOR(start_off / {_PACK_CAP})
                       <> FLOOR((start_off + n_tokens - 1) / {_PACK_CAP})
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_straddling
FROM offs
GROUP BY 1, 2
"""


@query("tr_sequence_pack", oracle=_TR_PACK_ORACLE, tags=("training", "packing"))
def tr_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for LLM pre-training: concatenate each shard's
    document stream in key order and slice it into fixed ``_PACK_CAP``-token
    context windows (the GPT-style concat-then-chunk pipeline), emitting
    per-chunk occupancy stats (docs beginning in the chunk, tokens they
    contribute, boundary straddles).

    Chunk assignment is a *pure prefix sum* — ``chunk = floor(prev_cum /
    cap)`` — deliberately chosen over greedy first-fit bin packing, which
    needs sequential replay (recursion / applyInPandas) and is what real
    trainers avoid anyway because it wastes tail tokens.  One window per
    shard, everything JVM-side: each shard packs independently, so at
    100 TB the shard count is the parallelism knob (natural input splits)
    and no shard's running sum ever leaves its partition."""
    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        (F.col("doc_id") % _PACK_SHARDS).alias("shard"),
        F.ceil(F.col("n_chars") / 4.0).cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = docs.withColumn(
        "start_off", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    )
    chunk = F.floor(F.col("start_off") / _PACK_CAP)
    end_chunk = F.floor((F.col("start_off") + F.col("n_tokens") - 1) / _PACK_CAP)
    return (
        offs.withColumn("chunk_id", chunk.cast("long"))
        .withColumn("straddles", (chunk != end_chunk).cast("int"))
        .groupBy("shard", "chunk_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("tokens_started"),
            (F.min("start_off") % _PACK_CAP).cast("long").alias("first_offset"),
            F.sum("straddles").cast("long").alias("n_straddling"),
        )
    )


# --- TRmix: temperature-reweighted training mix --------------------------------

_MIX_ALPHA = 0.5  # sampling temperature exponent (alpha < 1 upweights tails)

_TRMIX_ORACLE = f"""
WITH g AS (
  SELECT lang, source, COUNT(*) AS n_docs
  FROM documents
  GROUP BY lang, source
),
tot AS (
  SELECT SUM(n_docs) AS total,
         SUM(POWER(n_docs, {_MIX_ALPHA})) AS wtotal
  FROM g
)
SELECT g.lang, g.source, g.n_docs,
       ROUND(g.n_docs * 1.0 / t.total, 6) AS raw_share,
       ROUND(POWER(g.n_docs, {_MIX_ALPHA}) / t.wtotal, 6) AS temp_share
FROM g, tot t
"""


@query("tr_mix_weights", oracle=_TRMIX_ORACLE, tags=("training",))
def tr_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRmix: temperature-reweighted source-mix shares — for every
    (lang, source) stratum, its raw share of the corpus and its
    share after temperature resampling with exponent α=0.5
    (count^α / Σ count^α), the standard recipe for upweighting
    low-resource strata when composing a training mix (multilingual
    sampling à la the XLM-R / mT5 data recipes).

    Scale shape: one map-side-combined groupBy on (lang, source)
    reduces 100 TB of documents to a stratum-count frame bounded by
    the label-combination count; the normalizing totals ride in on a
    broadcast 1-row crossJoin (the scalar-subquery plan, same pattern
    as a13's bounds), so nothing else shuffles."""
    docs = load(spark, sf_dir, "documents")
    g = docs.groupBy("lang", "source").agg(F.count("*").alias("n_docs"))
    tot = g.agg(
        F.sum("n_docs").alias("total"),
        F.sum(F.pow("n_docs", F.lit(_MIX_ALPHA))).alias("wtotal"),
    )
    return g.crossJoin(F.broadcast(tot)).select(
        "lang",
        "source",
        "n_docs",
        F.round(F.col("n_docs") / F.col("total"), 6).alias("raw_share"),
        F.round(
            F.pow("n_docs", F.lit(_MIX_ALPHA)) / F.col("wtotal"), 6
        ).alias("temp_share"),
    )


# --- TRbudget: token-budget allocation across strata ---------------------------

_BUDGET_FRAC = 0.5  # train on half the corpus tokens, reallocated by temp_share

_TRBUDGET_ORACLE = f"""
WITH tok AS (
  SELECT lang, source,
         CAST(len(list_filter(string_split(text, ' '), t -> t <> ''))
              AS BIGINT) AS n_tok
  FROM documents
),
g AS (
  SELECT lang, source,
         COUNT(*) AS n_docs,
         CAST(SUM(n_tok) AS BIGINT) AS n_tokens
  FROM tok GROUP BY lang, source
),
tot AS (
  SELECT SUM(n_tokens) AS total,
         SUM(POWER(n_tokens, {_MIX_ALPHA})) AS wtotal
  FROM g
)
SELECT g.lang, g.source, g.n_docs, g.n_tokens,
       ROUND(POWER(g.n_tokens, {_MIX_ALPHA}) / t.wtotal, 6) AS temp_share,
       ROUND(LEAST(1.0, {_BUDGET_FRAC} * t.total
                        * (POWER(g.n_tokens, {_MIX_ALPHA}) / t.wtotal)
                        / g.n_tokens), 6) AS keep_rate
FROM g, tot t
WHERE g.n_tokens > 0
"""


@query("tr_token_budget", oracle=_TRBUDGET_ORACLE, tags=("training",))
def tr_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRbudget: token-budget allocation — the step after
    ``tr_mix_weights``: given a training budget of half the corpus
    tokens, redistribute it across (lang, source) strata by the
    temperature shares (token-count^α / Σ) and emit each stratum's
    per-document KEEP RATE = min(1, budget·share / stratum_tokens) —
    the sampling rate a downsampler (tr_stratified_sample's mechanism)
    then applies.  Oversubscribed strata cap at 1.0 (a stratum cannot
    yield more tokens than it has); the budget is relative to corpus
    size, so the query is scale-free.

    Scale shape: token counting is a narrow map (split + size, no
    explode); one map-side-combined groupBy reduces the corpus to the
    stratum frame; the two normalizing totals ride in on a broadcast
    1-row crossJoin.  Nothing data-sized shuffles."""
    docs = load(spark, sf_dir, "documents")
    n_tok = F.size(
        F.filter(F.split(F.col("text"), " "), lambda t: t != "")
    ).cast("long")
    g = (
        docs.select("lang", "source", n_tok.alias("n_tok"))
        .groupBy("lang", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
        )
    )
    tot = g.agg(
        F.sum("n_tokens").alias("total"),
        F.sum(F.pow("n_tokens", F.lit(_MIX_ALPHA))).alias("wtotal"),
    )
    share = F.pow("n_tokens", F.lit(_MIX_ALPHA)) / F.col("wtotal")
    return (
        g.crossJoin(F.broadcast(tot))
        .filter(F.col("n_tokens") > 0)
        .select(
            "lang",
            "source",
            "n_docs",
            "n_tokens",
            F.round(share, 6).alias("temp_share"),
            F.round(
                F.least(
                    F.lit(1.0),
                    F.lit(_BUDGET_FRAC)
                    * F.col("total")
                    * share
                    / F.col("n_tokens"),
                ),
                6,
            ).alias("keep_rate"),
        )
    )


# --- TRshard: deterministic global shuffle into training shards ----------------

_N_SHARDS = 8
# Second multiplicative constant (xxhash32 prime 2), independent of the
# split hash's _KNUTH so shard membership and within-shard order are
# uncorrelated with train/val/test assignment.
_KNUTH2 = 2246822519

# Reduce mod _PRIME BETWEEN the multiply and the shard modulus: taking
# ((x*A) % 8) directly is a no-op for odd A ≡ 1 (mod 8) — _KNUTH is —
# so shard membership would be doc_id's low 3 bits, not a hash
# (round-5 advisor finding).  ((x*A) % P) % 8 mixes every digit of the
# key into the shard (measured: 1/8 agreement with the low-bits form,
# balanced ±3% over the 8 shards on random keys).


def shuffle_shard(docs: DataFrame, n_shards: int = _N_SHARDS) -> DataFrame:
    """Deterministic shuffle-shard over a fixture-shaped ``documents``
    frame (see ``tr_shuffle_shard`` for semantics; ``n_shards`` is
    exposed so the generative suite can fuzz shard-count edge cases —
    1 shard, more shards than rows — against the same oracle form)."""
    shard = (((F.col("doc_id") % _PRIME) * F.lit(_KNUTH)) % _PRIME) % n_shards
    ord_key = ((F.col("doc_id") % _PRIME) * F.lit(_KNUTH2)) % _PRIME
    w = Window.partitionBy("shard").orderBy("ord_key", "doc_id")
    return (
        docs.select(
            shard.alias("shard"),
            ord_key.alias("ord_key"),
            "doc_id",
            "lang",
        )
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .select("shard", "pos", "doc_id", "lang")
    )


def shuffle_shard_oracle_sql(n_shards: int) -> str:
    """The window-form oracle for ``shuffle_shard`` at an arbitrary
    shard count (the registry entry uses this at _N_SHARDS = 8)."""
    return f"""
WITH keyed AS (
  SELECT doc_id, lang,
         (((doc_id % {_PRIME}) * {_KNUTH}) % {_PRIME}) % {n_shards} AS shard,
         ((doc_id % {_PRIME}) * {_KNUTH2}) % {_PRIME} AS ord_key
  FROM documents
)
SELECT CAST(shard AS BIGINT) AS shard,
       CAST(ROW_NUMBER() OVER (PARTITION BY shard
                               ORDER BY ord_key, doc_id) AS BIGINT) AS pos,
       doc_id, lang
FROM keyed
"""


_TRSHARD_ORACLE = shuffle_shard_oracle_sql(_N_SHARDS)


@query("tr_shuffle_shard", oracle=_TRSHARD_ORACLE, tags=("training", "sampling"))
def tr_shuffle_shard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRshard: deterministic global shuffle + sharding — every document
    gets a shard (multiplicative hash of the key) and a reproducible
    position inside its shard (second, independent hash as the sort
    key).  This is how a 100 TB corpus is written out in randomized
    training order: membership and order depend only on the key, so
    any re-run, any cluster size, and any engine produce byte-identical
    shards — the property ``df.sample``/``repartition`` order lacks.

    Scale shape: shard assignment is a narrow map; the within-shard
    position is ONE hash shuffle on ``shard`` plus a per-shard sort.
    At production scale the same order is produced without a global
    window: ``repartition(N, shard).sortWithinPartitions(ord_key)``
    and let the shard writer emit positions implicitly — identical
    order, no single-task rank over a whole shard.  The window form
    here is the oracle-checkable statement of those semantics."""
    return shuffle_shard(load(spark, sf_dir, "documents"))


# --- TRcap: per-domain document cap --------------------------------------------

_DOMAIN_CAP = 40

def domain_cap(docs: DataFrame, cap: int = _DOMAIN_CAP) -> DataFrame:
    """Count-first per-domain cap over a fixture-shaped ``documents``
    frame (see ``tr_domain_cap`` for semantics; ``cap`` is exposed so
    the generative suite can force the hot-source path on tiny
    hypothesis corpora, where the fixture cap of 40 would
    never fire)."""
    prio = ((F.col("doc_id") % _PRIME) * F.lit(_KNUTH2)) % _PRIME
    stats = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("doc_id").alias("key_sum"),
    )
    under = stats.filter(F.col("n_docs") <= cap).select(
        "source",
        "n_docs",
        F.col("n_docs").alias("n_kept"),
        F.lit(0).cast("long").alias("n_dropped"),
        F.col("key_sum").alias("kept_key_sum"),
        F.lit(False).alias("cap_hit"),
    )
    hot = stats.filter(F.col("n_docs") > cap).select("source", "n_docs")
    w = Window.partitionBy("source").orderBy("prio", "doc_id")
    over = (
        docs.join(F.broadcast(hot), "source")
        .select("source", "n_docs", "doc_id", prio.alias("prio"))
        .withColumn("rn", F.row_number().over(w))
        .groupBy("source", "n_docs")
        .agg(
            F.sum(F.when(F.col("rn") <= cap, 1).otherwise(0)).alias(
                "n_kept"
            ),
            F.sum(F.when(F.col("rn") > cap, 1).otherwise(0)).alias(
                "n_dropped"
            ),
            F.sum(
                F.when(F.col("rn") <= cap, F.col("doc_id")).otherwise(0)
            ).alias("kept_key_sum"),
        )
        .select(
            "source",
            "n_docs",
            "n_kept",
            "n_dropped",
            "kept_key_sum",
            F.lit(True).alias("cap_hit"),
        )
    )
    return under.unionByName(over)


def domain_cap_oracle_sql(cap: int) -> str:
    """The window-form oracle for ``domain_cap`` at an arbitrary cap
    (the registry entry uses ``_TRCAP_ORACLE`` = this at the fixture cap of 40)."""
    return f"""
WITH ranked AS (
  SELECT source, doc_id,
         ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY ((doc_id % {_PRIME}) * {_KNUTH2}) % {_PRIME}, doc_id
         ) AS rn
  FROM documents
)
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN rn <= {cap} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_kept,
       CAST(SUM(CASE WHEN rn > {cap} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dropped,
       CAST(SUM(CASE WHEN rn <= {cap} THEN doc_id ELSE 0 END)
            AS BIGINT) AS kept_key_sum,
       COUNT(*) > {cap} AS cap_hit
FROM ranked
GROUP BY source
"""


_TRCAP_ORACLE = domain_cap_oracle_sql(_DOMAIN_CAP)


@query("tr_domain_cap", oracle=_TRCAP_ORACLE, tags=("training", "sampling"))
def tr_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRcap: per-domain document cap — keep at most ``_DOMAIN_CAP``
    documents per source, selected by a deterministic priority hash
    (so the kept set is reproducible, not partition-dependent), and
    report per-source kept/dropped counts plus a checksum of the kept
    keys that pins the exact selection against the oracle.

    Capping over-represented domains is a standard pretraining step
    (a handful of crawl domains would otherwise dominate the mix).

    Scale shape — the part that matters at 100 TB: a count-first
    split.  Sources at or under the cap NEVER enter a window — their
    stats come straight off the map-side-combined groupBy.  Only the
    few over-cap (hot) sources' rows take the per-source ranking
    path, via a broadcast semi-join on the hot-source list, so the
    window's skew exposure is bounded by the hot domains themselves
    rather than the whole corpus."""
    return domain_cap(load(spark, sf_dir, "documents"), _DOMAIN_CAP)


# --- deterministic weighted priority sample ----------------------------------

_WS_TOPK = 5

_TR_WSAMPLE_ORACLE = f"""
WITH keyed AS (
  SELECT lang, doc_id, n_chars,
         ((doc_id % {_PRIME}) * {_KNUTH}) % {_PRIME} * n_chars AS priority
  FROM documents
),
ranked AS (
  SELECT lang, doc_id, n_chars, priority,
         ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY priority DESC, doc_id) AS rk
  FROM keyed
)
SELECT lang, doc_id, n_chars, priority, rk
FROM ranked WHERE rk <= {_WS_TOPK}
"""


@query(
    "tr_weighted_sample", oracle=_TR_WSAMPLE_ORACLE, tags=("training", "sample")
)
def tr_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling per stratum: top-5 documents per
    language by ``hash(doc_id) · weight`` priority, weight = n_chars —
    longer documents are proportionally more likely to hold a top
    priority, the curriculum/quality-weighted selection a training
    pipeline runs per shard.

    Determinism is the contract (re-running selects the SAME sample —
    the reproducibility requirement rand() cannot give across retries
    and engines), so the "random" leg is the portable uniformizing
    hash — key reduced mod the prime BEFORE the multiply and again
    between multiply and use, the round-5/6 lesson on multiplicative
    hashes — and the priority is a pure int64 product (hash < 2^20,
    n_chars < 2^10: no overflow, no floating point anywhere), with
    doc_id as the total tie-break.  This is priority sampling in the
    Efraimidis-Spiridakis shape with an exact-integer key rather than
    u^(1/w) (libm pow is NOT bit-portable across engines; a last-ulp
    difference there could flip a rank, so the exact-integer form is
    what makes the operator hash-checkable).

    Scale shape: rank-within-group over a (lang)-partitioned window —
    at 100 TB the same plan with per-partition top-k pushdown
    (WindowGroupLimit) keeps only k rows per group per task before the
    shuffle, so the full corpus never sorts."""
    docs = load(spark, sf_dir, "documents")
    priority = (
        ((F.col("doc_id") % _PRIME) * F.lit(_KNUTH)) % _PRIME
    ) * F.col("n_chars")
    w = Window.partitionBy("lang").orderBy(
        F.col("priority").desc(), F.col("doc_id").asc()
    )
    return (
        docs.select("lang", "doc_id", "n_chars", priority.alias("priority"))
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= _WS_TOPK)
    )
