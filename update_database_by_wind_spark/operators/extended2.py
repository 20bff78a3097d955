"""Second extension block: embedding-cosine near-dup (the brief's
fifth dedup method), SimHash fingerprints, BPE-ish token counting,
and the remaining UDF kinds (UD1 scalar, UD5 UDTF) — each held to the
oracle gate where the semantics are deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from update_database_by_wind_spark.operators.similarity import _SQL_DOT, dot
from update_database_by_wind_spark.registry import query
from update_database_by_wind_spark.sources import load

# --- L3c: embedding-cosine near-duplicate pairs -------------------------------

_L3C_ORACLE = f"""
WITH pairs AS (
  SELECT a.vec_id AS doc_a, b.vec_id AS doc_b,
         ROUND({_SQL_DOT.format(a='a.embedding', b='b.embedding')}, 6) AS cosine
  FROM embeddings a JOIN embeddings b
    ON a.label = b.label AND a.vec_id < b.vec_id
)
SELECT doc_a, doc_b, cosine
FROM pairs WHERE cosine >= 0.25
"""


@query("l3c_embedding_neardup", oracle=_L3C_ORACLE, tags=("dedup", "similarity"))
def l3c_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3c: embedding-cosine near-dup — semantic duplicates are pairs
    above a cosine threshold.  Blocked by the label column (IVF-style)
    so the candidate set is per-bucket, with canonical a<b ordering;
    at 100 TB the block key comes from a coarse quantizer/LSH rather
    than a cross join."""
    emb = load(spark, sf_dir, "embeddings")
    a = emb.select(
        F.col("vec_id").alias("doc_a"), "label", F.col("embedding").alias("ea")
    )
    b = emb.select(
        F.col("vec_id").alias("doc_b"), "label", F.col("embedding").alias("eb")
    )
    return (
        a.join(b, "label")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.round(dot(F.col("ea"), F.col("eb")), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= 0.25)
    )


# --- L3d: SimHash fingerprints (portable hash → full value-hash oracle) ---------

_SIMHASH_P = 1_000_003
_SIMHASH_BITS = 16

_L3D_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS tok
  FROM documents
),
h AS (
  SELECT doc_id,
         list_reduce(list_transform(string_split(tok, ''), c -> unicode(c)),
                     (acc, x) -> (acc * 31 + x) % {_SIMHASH_P}) AS th
  FROM tok
),
votes AS (
  SELECT doc_id,
         {", ".join(f"SUM(CASE WHEN (th // {1 << i}) % 2 = 1 THEN 1 ELSE -1 END) AS v{i}" for i in range(_SIMHASH_BITS))}
  FROM h GROUP BY doc_id
),
fp AS (
  SELECT d.doc_id,
         COALESCE({" + ".join(f"CASE WHEN v.v{i} > 0 THEN {1 << i} ELSE 0 END" for i in range(_SIMHASH_BITS))}, 0) AS simhash
  FROM (SELECT doc_id FROM documents) d LEFT JOIN votes v ON d.doc_id = v.doc_id
)
SELECT simhash, COUNT(*) AS n_docs, MIN(doc_id) AS canonical_doc
FROM fp GROUP BY simhash ORDER BY simhash
"""


@query("l3d_simhash", oracle=_L3D_ORACLE, tags=("dedup", "neardup"))
def l3d_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3d: 16-bit SimHash over tokens, fully in-plan: token → portable
    base-31 polynomial hash (mod 1e6+3) → per-bit ±1 votes via
    higher-order folds → sign bits → fingerprint.  Near-duplicates share
    fingerprints (small Hamming distance); grouping on the fingerprint
    is the one-shuffle scale shape.  The portable hash makes the whole
    pipeline ANSI-replayable (full value-hash oracle, upgraded from
    rows-only); a production deployment swaps in ``xxhash64`` for better
    bit diffusion — same plan shape, engine-specific values."""
    docs = load(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.col("text"), " "), lambda t: t != "")
    hashes = F.transform(
        toks,
        lambda t: F.aggregate(
            F.transform(F.split(t, ""), lambda c: F.ascii(c)),
            F.lit(0).cast("long"),
            lambda acc, x: (acc * 31 + x) % _SIMHASH_P,
        ),
    )
    bits = _SIMHASH_BITS

    # vote[i] = Σ_tokens (bit_i(hash) ? 1 : -1); fingerprint bit_i = vote>0
    # (mask bound outside the lambda: pyspark dispatches higher-order
    # lambdas by arity, so extra default args change the call shape)
    def vote(bit: int):
        mask = F.lit(1 << bit)
        return F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc + F.when(h.bitwiseAND(mask) != 0, 1).otherwise(-1),
        )

    votes = [vote(i) for i in range(bits)]
    fingerprint = sum(
        (F.when(votes[i] > 0, F.lit(1 << i)).otherwise(F.lit(0)))
        for i in range(bits)
    )
    fp = docs.select("doc_id", fingerprint.alias("simhash"))
    return (
        fp.groupBy("simhash")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("canonical_doc"),
        )
        .orderBy("simhash")
    )


# --- token counting: whitespace + BPE-ish regex ------------------------------------

_TOK_ORACLE = """
WITH counts AS (
  SELECT doc_id, lang,
         CAST(len(list_filter(string_split(text, ' '), t -> t <> ''))
              AS BIGINT) AS n_ws_tokens,
         CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))
              AS BIGINT) AS n_bpe_tokens
  FROM documents
)
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_ws_tokens) AS BIGINT) AS total_ws_tokens,
       CAST(SUM(n_bpe_tokens) AS BIGINT) AS total_bpe_tokens,
       CAST(MAX(n_bpe_tokens) AS BIGINT) AS max_bpe_tokens
FROM counts
GROUP BY lang
"""


@query("t_token_count", oracle=_TOK_ORACLE, tags=("text",))
def t_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace split and a BPE-ish regex
    segmentation (letter runs | digit runs | single other) — the
    pre-tokenizer shape used to budget LLM training tokens."""
    docs = load(spark, sf_dir, "documents")
    ws = F.size(F.filter(F.split(F.col("text"), " "), lambda t: t != ""))
    bpe = F.size(
        F.regexp_extract_all(
            F.col("text"), F.lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), 0
        )
    )
    per_doc = docs.select(
        "lang",
        ws.cast("long").alias("n_ws_tokens"),
        bpe.cast("long").alias("n_bpe_tokens"),
    )
    return per_doc.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_ws_tokens").alias("total_ws_tokens"),
        F.sum("n_bpe_tokens").alias("total_bpe_tokens"),
        F.max("n_bpe_tokens").alias("max_bpe_tokens"),
    )


# --- UD1: row-at-a-time Python UDF (the slow path, demonstrated once) ----------------

_UD1_ORACLE = """
SELECT o_orderkey,
       CASE WHEN o_totalprice >= 200000 THEN 'H'
            WHEN o_totalprice >= 50000 THEN 'M'
            ELSE 'L' END AS tier_udf
FROM orders
WHERE o_orderkey % 211 = 0
"""


@query("ud1_scalar_python_udf", oracle=_UD1_ORACLE, tags=("scalar", "udf"))
def ud1_scalar_python_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UD1: row-at-a-time Python UDF — registered once to prove the
    surface, used on a tiny slice, and deliberately trivial: policy
    (§2.11) is that anything expressible as built-ins must be
    built-ins (this exact logic is CASE WHEN in p3_case_when_tiers;
    per-row serde costs ~10–100× at scale)."""

    @F.udf("string")
    def tier(price: float) -> str:
        if price >= 200000:
            return "H"
        return "M" if price >= 50000 else "L"

    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 211 == 0)
    return o.select("o_orderkey", tier("o_totalprice").alias("tier_udf"))


# --- UD5: Python UDTF (row → rows) ----------------------------------------------------

_UD5_ORACLE = """
WITH tok AS (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks
  FROM documents WHERE doc_id % 83 = 0
),
grams AS (
  SELECT doc_id,
         toks[i] || ' ' || toks[i+1] AS bigram
  FROM tok, UNNEST(range(1, len(toks))) AS u(i)
)
SELECT doc_id, bigram, COUNT(*) AS n
FROM grams
GROUP BY doc_id, bigram
"""


@query("ud5_udtf_bigrams", oracle=_UD5_ORACLE, tags=("text", "udf"))
def ud5_udtf_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UD5: Python UDTF — one document row expands to its bigram rows.
    (explode(transform(...)) covers this in-plan — see
    mm_chunk_expansion — but the UDTF is the escape hatch for
    expansions with per-row Python logic, so it's proven here against
    the same oracle.)"""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id: long, bigram: string")
    class Bigrams:
        def eval(self, doc_id: int, text: str):  # noqa: ANN001
            toks = [t for t in text.split(" ") if t]
            for i in range(len(toks) - 1):
                yield doc_id, toks[i] + " " + toks[i + 1]

    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 83 == 0)
    docs.createOrReplaceTempView("docs_for_udtf")
    spark.udtf.register("bigrams_udtf", Bigrams)
    grams = spark.sql(
        "SELECT g.doc_id, g.bigram FROM docs_for_udtf d,"
        " LATERAL bigrams_udtf(d.doc_id, d.text) g"
    )
    return grams.groupBy("doc_id", "bigram").agg(F.count("*").alias("n"))


# --- P1+P4+P5: projection / rename / cast --------------------------------------------

_P1_ORACLE = """
SELECT p_partkey AS part_id,
       lower(p_name) AS part_name,
       CAST(p_size AS DOUBLE) AS size_d,
       CAST(CAST(p_retailprice AS DECIMAL(12,2)) AS DOUBLE) AS price_dec,
       CAST(p_retailprice AS VARCHAR) AS price_str
FROM part
WHERE p_partkey % 97 = 0
"""


@query("p1_project_rename_cast", oracle=_P1_ORACLE, tags=("projection",))
def p1_project_rename_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1+P4+P5: column projection, rename, and four cast directions
    (int→double, double→decimal, double→string) — the ingest-side
    dtype normalization every updater script does.  Plan check: the
    parquet scan reads only the four referenced columns."""
    p = load(spark, sf_dir, "part").filter(F.col("p_partkey") % 97 == 0)
    return p.select(
        F.col("p_partkey").alias("part_id"),
        F.lower("p_name").alias("part_name"),
        F.col("p_size").cast("double").alias("size_d"),
        F.col("p_retailprice").cast("decimal(12,2)").cast("double").alias(
            "price_dec"
        ),
        F.col("p_retailprice").cast("string").alias("price_str"),
    )


# --- O1: global total-order sort (positions encoded as values) -----------------------

_O1_ORACLE = """
SELECT o_orderkey, o_totalprice,
       CAST(ROW_NUMBER() OVER (ORDER BY o_totalprice DESC, o_orderkey)
            AS BIGINT) AS pos
FROM orders
WHERE o_totalprice > 400000
"""


@query("o1_global_sort", oracle=_O1_ORACLE, tags=("sort",))
def o1_global_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1: global total order, proven through an order-insensitive
    compare by materializing each row's position.  The empty-frame
    window is a deliberate single-partition sort over a *filtered*
    slice; unfiltered global sorts use orderBy (range-partitioned,
    cluster-safe) as in o2_global_topk_orders."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    from pyspark.sql import Window

    w = Window.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return o.select(
        "o_orderkey",
        "o_totalprice",
        F.row_number().over(w).cast("long").alias("pos"),
    )


# --- A9b: approximate percentile (rows-only) --------------------------------------------


_A9B_ORACLE = """
SELECT o_orderstatus, COUNT(*) AS n_rows, TRUE AS within_bounds
FROM orders GROUP BY o_orderstatus
"""


@query("a9b_percentile_approx", oracle=_A9B_ORACLE, tags=("agg", "approx"))
def a9b_percentile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9 approx variant: percentile_approx (Greenwald-Khanna sketch) —
    the constant-memory quantile for 100 TB.  The sketch value itself
    is engine-specific, but its ERROR BOUND is not: with accuracy=1000
    the returned element's rank is within ε=1/1000 of the true median
    rank, so its value must lie inside the exact percentile bracket
    [p(0.5−10ε), p(0.5+10ε)] (10ε of slack keeps interpolation edge
    cases out).  The query emits that bracket check as a boolean, and
    the oracle asserts TRUE per group — turning an un-oracle-able
    approximation into a driver-hash-checked *guarantee* (upgraded from
    rows-only)."""
    o = load(spark, sf_dir, "orders")
    eps = 1.0 / 1000
    return o.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_rows"),
        (
            F.percentile_approx("o_totalprice", 0.5, 1000).between(
                F.expr(f"percentile(o_totalprice, {0.5 - 10 * eps})"),
                F.expr(f"percentile(o_totalprice, {0.5 + 10 * eps})"),
            )
        ).alias("within_bounds"),
    )


# --- ts: rolling correlation vs market (factor-analytics signature) -----------

_TS_CORR_ORACLE = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d, o_orderpriority,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS rev
  FROM orders GROUP BY 1, 2
),
withm AS (
  SELECT d, o_orderpriority, rev,
         CAST(SUM(CAST(rev AS DECIMAL(38,6))) OVER (PARTITION BY d)
              AS DOUBLE) AS mkt
  FROM daily
),
rolled AS (
  SELECT strftime(d, '%Y-%m-%d') AS day, o_orderpriority,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority ORDER BY d) AS rn,
         CAST(COUNT(*) OVER w AS DOUBLE) AS n,
         CAST(SUM(CAST(rev AS DECIMAL(38,6))) OVER w AS DOUBLE) AS sx,
         CAST(SUM(CAST(mkt AS DECIMAL(38,6))) OVER w AS DOUBLE) AS sy,
         CAST(SUM(CAST(rev * rev AS DECIMAL(38,6))) OVER w AS DOUBLE) AS sxx,
         CAST(SUM(CAST(mkt * mkt AS DECIMAL(38,6))) OVER w AS DOUBLE) AS syy,
         CAST(SUM(CAST(rev * mkt AS DECIMAL(38,6))) OVER w AS DOUBLE) AS sxy
  FROM withm
  WINDOW w AS (PARTITION BY o_orderpriority ORDER BY d
               ROWS BETWEEN 29 PRECEDING AND CURRENT ROW)
)
SELECT day, o_orderpriority,
       ROUND((n * sxy - sx * sy)
             / NULLIF(SQRT(n * sxx - sx * sx) * SQRT(n * syy - sy * sy), 0), 6)
         AS corr_30d
FROM rolled
WHERE rn >= 30
"""


@query("ts_rolling_corr", oracle=_TS_CORR_ORACLE, tags=("timeseries", "window"))
def ts_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 30-day correlation of each priority tier's daily
    revenue against the whole-market daily total — the factor-
    analytics shape (per-security rolling corr vs index) from the
    reference's WindPy category.  Implementation: one aggregation to
    daily grain, a per-date window for the market series (no
    self-join), then six decimal-exact windowed power sums feeding the
    closed-form Pearson correlation — every term order-independent,
    so the result is identical at any partitioning or cluster size.
    Frames shorter than 30 days are dropped (undefined corr)."""
    from pyspark.sql import Window

    o = load(spark, sf_dir, "orders")
    daily = (
        o.groupBy(
            F.to_date("o_orderdate").alias("d"),
            "o_orderpriority",
        )
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(38,6)"))
            .cast("double")
            .alias("rev")
        )
    )
    wm = Window.partitionBy("d")
    withm = daily.withColumn(
        "mkt", F.sum(F.col("rev").cast("decimal(38,6)")).over(wm).cast("double")
    )
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy("d")
        .rowsBetween(-29, Window.currentRow)
    )

    def dsum(c):
        return F.sum(c.cast("decimal(38,6)")).over(w).cast("double")

    rev, mkt = F.col("rev"), F.col("mkt")
    n = F.count("*").over(w).cast("double")
    sx, sy = dsum(rev), dsum(mkt)
    sxx, syy, sxy = dsum(rev * rev), dsum(mkt * mkt), dsum(rev * mkt)
    rn = F.row_number().over(
        Window.partitionBy("o_orderpriority").orderBy("d")
    )
    # NULLIF: zero-variance windows (constant series) yield NULL corr
    corr = F.round(
        (n * sxy - sx * sy)
        / F.nullif(
            F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy), F.lit(0.0)
        ),
        6,
    )
    return (
        withm.select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            "o_orderpriority",
            rn.alias("rn"),
            corr.alias("corr_30d"),
        )
        .filter(F.col("rn") >= 30)
        .drop("rn")
    )
