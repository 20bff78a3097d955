"""Vector similarity search over the embeddings table
(SURVEY.md §2.8 L4–L6).

The fixtures are 64-d L2-normalized float vectors (FIXTURES.md), so
cosine similarity ≡ dot product.

Scale design (100 TB / billions of vectors):

* L4 (exact top-k) is brute force — crossJoin + JVM-side higher-order
  array fold + per-query top-k window.  Correct baseline at any k,
  O(queries × corpus); fine for a bounded query set because the
  corpus side streams (no materialized product), but not the shape
  you run for all-pairs at scale.
* L5 (approximate) is BucketedRandomProjectionLSH: random-hyperplane
  bucketing turns the scan into bucket-local probes — the 1000-
  executor path.  Approximate → rows-only check.
* L4b blocks the brute force by the label column (IVF-style coarse
  quantization): only same-bucket candidates are scored, cutting the
  crossJoin by ~10× here and by #partitions in a real IVF.

Everything stays in whole-stage codegen: dot products are
aggregate(zip_with(...)) on the JVM, no Python in the hot loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from update_database_by_wind_spark.registry import query
from update_database_by_wind_spark.sources import fan_out, load

_N_QUERIES = 5
_TOP_K = 3


def dot(a: Column, b: Column) -> Column:
    """JVM-side dot product of two float arrays, in double precision.

    Elements are cast to double *before* multiplying (float32 multiply
    then widen loses bits vs widen-then-multiply), and the fold runs
    left-to-right in element order in both Spark and DuckDB — but the
    result is still rounded at the call site because a 64-term double
    fold is association-sensitive if an engine ever vectorizes it.

    Shape note: the casts happen INSIDE the single zip_with lambda
    rather than via two elementwise ``transform`` pre-passes — the
    values are bit-identical (widen-then-multiply either way), but the
    one-pass form skips materializing two intermediate double arrays
    per row, a measured ~25% saving on the interpreted higher-order
    path that dominates brute-force similarity scans.

    Callers on a hot build path (l4's per-pass composition) format the
    ``_SPARK_DOT`` SQL template below into a single ``F.expr`` instead
    of calling this function — one py4j round trip versus ~15 for the
    Column-method chain (round-18 §9); the parsed tree is IDENTICAL
    (``0.0D`` is the double literal ``F.lit(0.0)`` builds —
    DataFrame.sameSemantics receipt).  The template's ``{a}``/``{b}``
    slots take identifier-safe SQL fragments only; this function itself
    is Column-only (the round-18 str fast path was dead code with an
    unvalidated-interpolation surface — removed round 19 per ADVICE).
    """
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


# Spark-SQL twin of dot(), for the string fast path above; parses to
# the exact tree the Column form builds.
_SPARK_DOT = (
    "aggregate(zip_with({a}, {b},"
    " (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
    " 0.0D, (acc, x) -> acc + x)"
)


# DuckDB twin of dot(): widen to double, pairwise multiply, ordered fold.
_SQL_DOT = (
    "list_sum(list_transform(list_zip("
    "list_transform({a}, x -> CAST(x AS DOUBLE)), "
    "list_transform({b}, x -> CAST(x AS DOUBLE))), p -> p[1] * p[2]))"
)


def dot_micro(a: Column, b: Column) -> Column:
    """EXACT integer dot product on the micro-grid — the
    round-trip-safe alternative to ``ROUND(dot(a, b), 6)`` wherever a
    similarity value feeds an ORDER BY or the output row.

    Each float element is quantized ONCE as ``floor(x * 1e6)``:
    ``x * 1e6`` is one IEEE multiply of the same stored float32 in
    both engines and FLOOR of the same double is the same integer —
    unlike ROUND-to-6-decimals, whose result depends on whether the
    engine rounds the double's shortest decimal representation (Spark
    BigDecimal HALF_UP) or its exact binary value (DuckDB), a one-ulp
    split that a generative sweep hit at a representation midpoint
    (affinity exactly 0.2499995 → Spark 0.25, DuckDB 0.249999 →
    different IVF cell).  Products and the fold then stay in BIGINT —
    exact, association-free, safe under any engine's summation
    order."""
    return F.aggregate(
        F.zip_with(
            a,
            b,
            lambda x, y: F.floor(x.cast("double") * 1000000).cast("long")
            * F.floor(y.cast("double") * 1000000).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def dot_micro_int(a: Column, b: Column) -> Column:
    """:func:`dot_micro` with ``b`` ALREADY on the integer micro-grid
    (e.g. a centroid of micro-means)."""
    return F.aggregate(
        F.zip_with(
            a,
            b,
            lambda x, c: F.floor(x.cast("double") * 1000000).cast("long")
            * c,
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


# DuckDB twins (list_sum over BIGINT yields HUGEINT — callers cast).
_SQL_DOT_MICRO = (
    "list_sum(list_transform(list_zip({a}, {b}), "
    "p -> CAST(FLOOR(CAST(p[1] AS DOUBLE) * 1000000) AS BIGINT)"
    " * CAST(FLOOR(CAST(p[2] AS DOUBLE) * 1000000) AS BIGINT)))"
)
_SQL_DOT_MICRO_INT = (
    "list_sum(list_transform(list_zip({a}, {b}), "
    "p -> CAST(FLOOR(CAST(p[1] AS DOUBLE) * 1000000) AS BIGINT) * p[2]))"
)
_SQL_DOT_INT = (
    "list_sum(list_transform(list_zip({a}, {b}), p -> p[1] * p[2]))"
)


def dot_int(a: Column, b: Column) -> Column:
    """Integer dot product of two arrays ALREADY on the micro-grid."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


# --- L4: exact cosine top-k ---------------------------------------------------

_L4_ORACLE = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qe FROM embeddings
  WHERE vec_id < {_N_QUERIES}
),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         ROUND({_SQL_DOT.format(a='q.qe', b='e.embedding')}, 6) AS cosine
  FROM q CROSS JOIN embeddings e
  WHERE e.vec_id <> q.query_id
),
ranked AS (
  SELECT query_id, neighbor_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id) AS rn
  FROM scored
)
SELECT query_id, neighbor_id, cosine, CAST(rn AS BIGINT) AS rn
FROM ranked WHERE rn <= {_TOP_K}
"""


@query("l4_cosine_topk_exact", oracle=_L4_ORACLE, tags=("similarity",))
def l4_cosine_topk_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4: exact brute-force cosine top-k (normalized ⇒ dot = cosine):
    crossJoin + JVM array fold + per-query top-k window.  Rounded to 6
    before ranking so both engines rank identical values; neighbor_id
    breaks ties deterministically.

    Join orientation is the scale decision: the bounded query set is
    BROADCAST and the corpus is STREAMED, so the per-pair dot-product
    fold distributes across the corpus scan's partitions (the reversed
    orientation ran every fold in the single partition of the pruned
    5-row scan).  ``fan_out`` corrects the single-row-group fixture
    file to core-count partitions (no-op on a real multi-file corpus),
    and Spark's partial WindowGroupLimit prunes each partition to
    top-k per query before the one tiny shuffle.  Measured at sf1:
    1.67 s → 0.55 s for the orientation + fan-out + one-pass fold."""
    # SQL expression strings (one py4j parse each; dot's string fast
    # path): the Column chain measured 0.12-0.18 s of driver-side
    # build per bench pass; parsed trees identical
    # (DataFrame.sameSemantics receipt, round-18 §9).
    emb = load(spark, sf_dir, "embeddings")
    q = emb.where(f"vec_id < {_N_QUERIES}").selectExpr(
        "vec_id AS query_id", "embedding AS qe"
    )
    scored = (
        fan_out(emb.selectExpr("vec_id AS neighbor_id", "embedding"))
        .crossJoin(F.broadcast(q))
        .where("neighbor_id != query_id")
        .selectExpr(
            "query_id",
            "neighbor_id",
            f"round({_SPARK_DOT.format(a='qe', b='embedding')}, 6)"
            " AS cosine",
        )
    )
    return scored.withColumn(
        "rn",
        F.expr(
            "CAST(row_number() OVER (PARTITION BY query_id"
            " ORDER BY cosine DESC, neighbor_id) AS BIGINT)"
        ),
    ).where(f"rn <= {_TOP_K}")


# --- L4b: label-blocked (IVF-style) top-k ---------------------------------------

_L4B_ORACLE = f"""
WITH q AS (
  SELECT vec_id AS query_id, label, embedding AS qe FROM embeddings
  WHERE vec_id < {_N_QUERIES}
),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         ROUND({_SQL_DOT.format(a='q.qe', b='e.embedding')}, 6) AS cosine
  FROM q JOIN embeddings e ON q.label = e.label
  WHERE e.vec_id <> q.query_id
),
ranked AS (
  SELECT query_id, neighbor_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id) AS rn
  FROM scored
)
SELECT query_id, neighbor_id, cosine, CAST(rn AS BIGINT) AS rn
FROM ranked WHERE rn <= {_TOP_K}
"""


@query("l4b_cosine_topk_blocked", oracle=_L4B_ORACLE, tags=("similarity",))
def l4b_cosine_topk_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4b: IVF-style blocked top-k — candidates restricted to the
    query's coarse partition (label), turning the crossJoin into an
    equi-join.  The scale pattern: cluster-assign then probe within
    cluster(s).  The candidate corpus is fanned out so the scoring
    folds parallelize past the fixture's one-row-group scan."""
    emb = load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "label", F.col("embedding").alias("qe")
    )
    cand = fan_out(
        emb.select(F.col("vec_id").alias("neighbor_id"), "label", "embedding")
    )
    scored = (
        q.join(cand, "label")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(dot(F.col("qe"), F.col("embedding")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return scored.withColumn("rn", F.row_number().over(w).cast("long")).filter(
        F.col("rn") <= _TOP_K
    )


# --- L5: approximate ANN via random-projection LSH (recall-gated oracle) ----------

_ANN_RADIUS = 1.2
_ANN_RECALL_FLOOR = 0.6  # measured seeded recall ≥ 0.875 at sf0.01/sf0.1

# DuckDB twin of the exact radius query: ordered left-fold L2, same
# widen-then-subtract association as the Spark side, so the <= radius
# cut lands on bit-identical doubles.
_SQL_SQ_L2 = (
    "list_sum(list_transform(list_zip("
    "list_transform({a}, x -> CAST(x AS DOUBLE)), "
    "list_transform({b}, x -> CAST(x AS DOUBLE))), "
    "p -> (p[1] - p[2]) * (p[1] - p[2])))"
)

_L5_ANN_ORACLE = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qe FROM embeddings
  WHERE vec_id < {_N_QUERIES}
)
SELECT q.query_id,
       CAST(SUM(CASE WHEN e.vec_id <> q.query_id
                      AND sqrt({_SQL_SQ_L2.format(a='q.qe', b='e.embedding')})
                          <= {_ANN_RADIUS}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_exact,
       TRUE AS recall_ok
FROM q CROSS JOIN embeddings e
GROUP BY q.query_id
"""


@query("l5_ann_lsh", oracle=_L5_ANN_ORACLE, tags=("similarity", "ml"))
def l5_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L5: BucketedRandomProjectionLSH approximate neighbors — the
    100 TB path: hyperplane buckets bound the candidate set per query.
    WHICH candidates the seeded projections surface is engine-specific,
    but the index's CONTRACT is not: per query it must recover at least
    ``_ANN_RECALL_FLOOR`` of the exact radius-ball (measured seeded
    recall ≥ 0.875, so the floor has wide margin).  The query emits the
    exact ball size (oracle-checkable) plus that recall guarantee as a
    boolean the oracle asserts TRUE — the same rows-only→guarantee
    upgrade as a9b/a3.  Exact side is a bounded crossJoin (5 query
    vectors) with JVM-fold L2, mirroring the oracle's fold order."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    raw = load(spark, sf_dir, "embeddings")
    emb = raw.select(
        "vec_id", array_to_vector(F.col("embedding")).alias("features")
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        bucketLength=0.5,
        numHashTables=4,
        seed=42,
    )
    model = lsh.fit(emb)
    qv = emb.filter(F.col("vec_id") < _N_QUERIES)
    found = (
        model.approxSimilarityJoin(qv, emb, _ANN_RADIUS, distCol="l2_dist")
        .select(
            F.col("datasetA.vec_id").alias("query_id"),
            F.col("datasetB.vec_id").alias("neighbor_id"),
        )
        .filter(F.col("query_id") != F.col("neighbor_id"))
    )
    qe = raw.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    pa = F.transform(F.col("qe"), lambda x: x.cast("double"))
    pb = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    sq_l2 = F.aggregate(
        F.zip_with(pa, pb, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    exact = (
        # corpus streamed, bounded query set broadcast (same orientation
        # rationale as l4): the L2 folds parallelize over the scan
        fan_out(raw.select("vec_id", "embedding"))
        .crossJoin(F.broadcast(qe))
        .filter(F.col("vec_id") != F.col("query_id"))
        .filter(F.sqrt(sq_l2) <= _ANN_RADIUS)
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
    )
    hits = exact.join(found, ["query_id", "neighbor_id"], "left_semi")
    n_hit = hits.groupBy("query_id").agg(F.count("*").alias("n_hit"))
    return (
        exact.groupBy("query_id")
        .agg(F.count("*").cast("long").alias("n_exact"))
        .join(n_hit, "query_id", "left")
        .select(
            "query_id",
            "n_exact",
            (
                F.coalesce(F.col("n_hit"), F.lit(0))
                >= _ANN_RECALL_FLOOR * F.col("n_exact")
            ).alias("recall_ok"),
        )
    )


# --- L6: vector ops as columns ------------------------------------------------------

_L6_ORACLE = f"""
SELECT label,
       COUNT(*) AS n_vectors,
       ROUND(MIN({_SQL_DOT.format(a='embedding', b='embedding')}), 6) AS min_sq_norm,
       ROUND(MAX({_SQL_DOT.format(a='embedding', b='embedding')}), 6) AS max_sq_norm,
       CAST(MIN(len(embedding)) AS INTEGER) AS min_dim,
       CAST(MAX(len(embedding)) AS INTEGER) AS max_dim
FROM embeddings
GROUP BY label
"""


@query("l6_vector_norms", oracle=_L6_ORACLE, tags=("similarity", "array"))
def l6_vector_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L6: vector ops as plain columns (no UDF): squared L2 norm via
    the same higher-order fold; confirms fixtures are unit-norm."""
    emb = load(spark, sf_dir, "embeddings")
    sq = F.round(dot(F.col("embedding"), F.col("embedding")), 6)
    return (
        emb.select("label", sq.alias("sq_norm"), F.size("embedding").alias("dim"))
        .groupBy("label")
        .agg(
            F.count("*").alias("n_vectors"),
            F.min("sq_norm").alias("min_sq_norm"),
            F.max("sq_norm").alias("max_sq_norm"),
            F.min("dim").alias("min_dim"),
            F.max("dim").alias("max_dim"),
        )
    )


# --- L5 IVF: centroid-quantized ANN probe (exact within the probed cell) --------

_IVF_ORACLE = f"""
WITH expl AS (
  SELECT label, CAST(u.pos AS INTEGER) AS pos,
         CAST(FLOOR(CAST(embedding[u.pos] AS DOUBLE) * 1000000)
              AS BIGINT) AS v6
  FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS u(pos)
),
cent AS (
  SELECT label, pos,
         CASE WHEN SUM(v6) < 0
              THEN -((-2 * SUM(v6) + COUNT(v6)) // (2 * COUNT(v6)))
              ELSE (2 * SUM(v6) + COUNT(v6)) // (2 * COUNT(v6))
         END AS cv6
  FROM expl GROUP BY label, pos
),
cent_arr AS (
  SELECT label, list(CAST(cv6 AS BIGINT) ORDER BY pos) AS centroid6
  FROM cent GROUP BY label
),
q AS (
  SELECT vec_id AS query_id, embedding AS qe FROM embeddings
  WHERE vec_id < {_N_QUERIES}
),
assign AS (
  SELECT query_id, qe, c.label,
         ROW_NUMBER() OVER (
           PARTITION BY query_id
           ORDER BY CAST({_SQL_DOT_MICRO_INT.format(a='qe', b='centroid6')}
                         AS BIGINT) DESC,
                    c.label) AS arn
  FROM q CROSS JOIN cent_arr c
),
best AS (SELECT query_id, qe, label FROM assign WHERE arn = 1),
scored AS (
  SELECT b.query_id, e.vec_id AS neighbor_id,
         CAST({_SQL_DOT_MICRO.format(a='b.qe', b='e.embedding')}
              AS BIGINT) AS cosine_e12
  FROM best b JOIN embeddings e ON b.label = e.label
  WHERE e.vec_id <> b.query_id
)
SELECT query_id, neighbor_id, cosine_e12, CAST(rn AS BIGINT) AS rn
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cosine_e12 DESC, neighbor_id)
                  AS rn
      FROM scored)
WHERE rn <= {_TOP_K}
"""


@query("l5_ivf_topk", oracle=_IVF_ORACLE, tags=("similarity", "ann", "ivf"))
def l5_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L5 IVF variant: a real inverted-file ANN probe, end to end —
    (1) train the coarse quantizer = per-cell centroid (decimal-exact
    mean per dimension, the tr_label_centroids step); (2) assign each
    query to its nearest centroid (nprobe=1; the 5×10 affinity compare
    is a broadcast of the tiny centroid table, never a shuffle);
    (3) exact top-k within the probed cell only.  Candidate count
    drops by the cell count (~10× here, #cells at scale); every step
    is deterministic, so unlike LSH (l5_ann_lsh) this ANN path is
    fully oracle-checked.  At 100 TB the cells come from k-means
    rather than a given label, and the probe fans to nprobe > 1 —
    same plan shape."""
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
    # half-away-from-zero integer micro-mean (the pitfalls-memo integer
    # form): centroid components stay EXACT integers, so the affinity
    # compare below never touches a ROUND(double, 6)
    cent = expl.groupBy("label", "pos").agg(
        F.expr(
            "CAST(CASE WHEN sum(v6) < 0"
            " THEN -((-2 * sum(v6) + count(v6)) DIV (2 * count(v6)))"
            " ELSE (2 * sum(v6) + count(v6)) DIV (2 * count(v6))"
            " END AS LONG)"
        ).alias("cv6")
    )
    cent_arr = cent.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "cv6"))),
            lambda s: s.cv6,
        ).alias("centroid6")
    )
    q = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    assign = q.crossJoin(F.broadcast(cent_arr)).select(
        "query_id",
        "qe",
        "label",
        dot_micro_int(F.col("qe"), F.col("centroid6")).alias("aff"),
    )
    arn = F.row_number().over(
        Window.partitionBy("query_id").orderBy(F.col("aff").desc(), "label")
    )
    best = assign.withColumn("arn", arn).filter(F.col("arn") == 1).select(
        "query_id", "qe", "label"
    )
    scored = (
        best.join(emb, "label")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            dot_micro(F.col("qe"), F.col("embedding")).alias("cosine_e12"),
        )
    )
    rn = F.row_number().over(
        Window.partitionBy("query_id").orderBy(
            F.col("cosine_e12").desc(), "neighbor_id"
        )
    )
    return scored.withColumn("rn", rn.cast("long")).filter(
        F.col("rn") <= _TOP_K
    )


# --- L5 IVF with a TRAINED coarse quantizer (deterministic k-means) -----------
#
# l5_ivf_topk piggybacks on the fixture's label column as cells (documented
# honest limitation).  This variant trains the quantizer itself: Lloyd's
# k-means with hash-selected seeds and a fixed iteration count, every step
# decimal-exact or round-6-gated, so the WHOLE pipeline — seeding,
# assignment, centroid updates, probe — is deterministic and mirrored
# verbatim in the DuckDB oracle.  Assignment metric is squared L2 distance
# expanded as |c|² − 2·q·c (|q|² = 1 is constant for the argmin), which
# avoids sqrt and keeps everything inside the ordered-fold dot product.

_KM_K = 8  # coarse cells
_KM_ITERS = 2  # fixed Lloyd iterations (unrolled identically in the oracle)
_KM_NPROBE = 2  # cells probed per query (the IVF recall/latency dial)
_KM_PRIME = 1_000_003
_KM_KNUTH = 2654435761
_KM_MOD = 100_000_007


def _km_dist_sql(emb: str, cent: str) -> str:
    """|c|² − 2·e·c in EXACT e12 units: the centroid is integer micros,
    the embedding quantizes onto the grid inside the dot — no
    ROUND(double, 6) anywhere in the argmin (the engine-split midpoint
    a generative sweep hit in the sibling label-IVF assignment)."""
    dcc = _SQL_DOT_INT.format(a=cent, b=cent)
    dec = _SQL_DOT_MICRO_INT.format(a=emb, b=cent)
    return f"CAST({dcc} - 2 * {dec} AS BIGINT)"


def _kmeans_oracle_ctes(k: int = _KM_K, iters: int = _KM_ITERS) -> str:
    """CTE chain training the quantizer: cent0 = hash-selected seeds,
    cent{i} = decimal-exact means of the cent{i-1} assignment."""
    h = f"((vec_id % {_KM_PRIME}) * {_KM_KNUTH}) % {_KM_MOD}"
    parts = [
        f"""cent0 AS (
  SELECT ROW_NUMBER() OVER (ORDER BY h, vec_id) AS cell,
         list_transform(embedding,
                        x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000000)
                                  AS BIGINT)) AS centroid
  FROM (SELECT vec_id, embedding, {h} AS h
        FROM embeddings ORDER BY h, vec_id LIMIT {k})
)"""
    ]
    for i in range(1, iters + 1):
        prev = f"cent{i - 1}"
        parts.append(
            f"""assign{i} AS (
  SELECT vec_id, embedding, cell,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
  FROM (SELECT e.vec_id, e.embedding, c.cell,
               {_km_dist_sql('e.embedding', 'c.centroid')} AS d
        FROM embeddings e CROSS JOIN {prev} c)
),
expl{i} AS (
  SELECT cell, CAST(u.pos AS INTEGER) AS pos,
         CAST(FLOOR(CAST(embedding[u.pos] AS DOUBLE) * 1000000)
              AS BIGINT) AS v6
  FROM (SELECT * FROM assign{i} WHERE rn = 1),
       UNNEST(range(1, len(embedding) + 1)) AS u(pos)
),
cent{i} AS (
  SELECT cell, list(CAST(cv6 AS BIGINT) ORDER BY pos) AS centroid
  FROM (SELECT cell, pos,
               CASE WHEN SUM(v6) < 0
                    THEN -((-2 * SUM(v6) + COUNT(v6)) // (2 * COUNT(v6)))
                    ELSE (2 * SUM(v6) + COUNT(v6)) // (2 * COUNT(v6))
               END AS cv6
        FROM expl{i} GROUP BY cell, pos)
  GROUP BY cell
)"""
        )
    return ",\n".join(parts)


_IVF2_ORACLE = f"""
WITH {_kmeans_oracle_ctes()},
idx AS (
  SELECT vec_id, embedding, cell
  FROM (SELECT vec_id, embedding, cell,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
        FROM (SELECT e.vec_id, e.embedding, c.cell,
                     {_km_dist_sql('e.embedding', 'c.centroid')} AS d
              FROM embeddings e CROSS JOIN cent{_KM_ITERS} c))
  WHERE rn = 1
),
qbest AS (
  SELECT query_id, qe, cell
  FROM (SELECT query_id, qe, cell,
               ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY d, cell) AS rn
        FROM (SELECT e.vec_id AS query_id, e.embedding AS qe, c.cell,
                     {_km_dist_sql('e.embedding', 'c.centroid')} AS d
              FROM embeddings e CROSS JOIN cent{_KM_ITERS} c
              WHERE e.vec_id < {_N_QUERIES}))
  WHERE rn <= {_KM_NPROBE}
),
scored AS (
  SELECT b.query_id, i.vec_id AS neighbor_id,
         CAST({_SQL_DOT_MICRO.format(a='b.qe', b='i.embedding')}
              AS BIGINT) AS cosine_e12
  FROM qbest b JOIN idx i USING (cell)
  WHERE i.vec_id <> b.query_id
)
SELECT query_id, neighbor_id, cosine_e12, CAST(rn AS BIGINT) AS rn
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cosine_e12 DESC, neighbor_id)
                  AS rn
      FROM scored)
WHERE rn <= {_TOP_K}
"""


def _km_assign(
    df: DataFrame,
    cent: DataFrame,
    id_col: str,
    emb_col: str,
    nprobe: int = 1,
) -> DataFrame:
    """Nearest-centroid assignment: broadcast the (tiny) centroid table,
    score |c|²−2·e·c per (row, cell), keep the ``nprobe`` nearest (ties
    → lowest cell; index build uses 1, query probing widens).  At
    billions of vectors this stays one narrow pass: k dot products per
    row against a broadcast, no shuffle."""
    d = dot_int(F.col("centroid"), F.col("centroid")) - 2 * dot_micro_int(
        F.col(emb_col), F.col("centroid")
    )
    scored = df.crossJoin(F.broadcast(cent)).select(
        id_col, emb_col, "cell", d.alias("d")
    )
    rn = F.row_number().over(
        Window.partitionBy(id_col).orderBy("d", "cell")
    )
    return (
        scored.withColumn("rn", rn)
        .filter(F.col("rn") <= nprobe)
        .select(id_col, emb_col, "cell")
    )


def kmeans_centroids(
    emb: DataFrame, k: int = _KM_K, iters: int = _KM_ITERS
) -> DataFrame:
    """Deterministic Lloyd's k-means coarse quantizer.

    * **Seeding**: the k vectors with the smallest multiplicative hash
      of vec_id (hash-selected ⇒ reproducible on any engine, unlike
      random init; the reduce-mod-prime-first form cannot overflow
      int64 at 100 TB key ranges).
    * **Fixed iterations** (no convergence test — a data-dependent stop
      would make the plan depth nondeterministic).
    * **Updates**: per-(cell, dimension) decimal-exact mean rounded to
      6, the same partition-order-independent arithmetic as
      tr_label_centroids.

    Each iteration is: one broadcast-assign pass + one explode/groupBy
    (shuffles only (cell, pos, val) triples, never whole vectors) —
    the plan a 1000-executor k-means actually runs.
    """
    h = ((F.col("vec_id") % _KM_PRIME) * F.lit(_KM_KNUTH)) % _KM_MOD
    seeds = (
        emb.select("vec_id", "embedding", h.alias("h"))
        .orderBy("h", "vec_id")
        .limit(k)
    )
    cent = seeds.select(
        F.row_number()
        .over(Window.orderBy("h", "vec_id"))
        .alias("cell"),
        F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") * 1000000).cast("long"),
        ).alias("centroid"),
    )
    for _ in range(iters):
        best = _km_assign(
            emb.select("vec_id", "embedding"), cent, "vec_id", "embedding"
        )
        expl = best.select(
            "cell", F.posexplode("embedding").alias("pos0", "valf")
        ).select(
            "cell",
            (F.col("pos0") + 1).cast("int").alias("pos"),
            F.floor(F.col("valf").cast("double") * 1000000)
            .cast("long")
            .alias("v6"),
        )
        cent = (
            expl.groupBy("cell", "pos")
            .agg(
                F.expr(
                    "CAST(CASE WHEN sum(v6) < 0"
                    " THEN -((-2 * sum(v6) + count(v6))"
                    " DIV (2 * count(v6)))"
                    " ELSE (2 * sum(v6) + count(v6))"
                    " DIV (2 * count(v6))"
                    " END AS LONG)"
                ).alias("cv6")
            )
            .groupBy("cell")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "cv6"))),
                    lambda s: s.cv6,
                ).alias("centroid")
            )
        )
    return cent


@query(
    "l5_ivf_kmeans_topk",
    oracle=_IVF2_ORACLE,
    tags=("similarity", "ann", "ivf", "kmeans"),
)
def l5_ivf_kmeans_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L5 IVF with a TRAINED quantizer: deterministic k-means cells
    (kmeans_centroids), index = assign every vector to its final cell,
    probe = assign the query to its _KM_NPROBE nearest cells and take
    the exact top-k within the probed cells.  No fixture label anywhere
    — the cells are learned from the vectors, and every step (seeding,
    Lloyd updates, probe) is hash-verified against the unrolled SQL
    mirror."""
    emb = load(spark, sf_dir, "embeddings")
    cent = kmeans_centroids(emb)
    index = _km_assign(
        emb.select("vec_id", "embedding"), cent, "vec_id", "embedding"
    )
    q = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    qbest = _km_assign(q, cent, "query_id", "qe", nprobe=_KM_NPROBE)
    scored = (
        qbest.join(index, "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            dot_micro(F.col("qe"), F.col("embedding")).alias("cosine_e12"),
        )
    )
    rn = F.row_number().over(
        Window.partitionBy("query_id").orderBy(
            F.col("cosine_e12").desc(), "neighbor_id"
        )
    )
    return scored.withColumn("rn", rn.cast("long")).filter(
        F.col("rn") <= _TOP_K
    )


# --- L4c: vectorized (Arrow + BLAS) brute-force top-k --------------------------


@query("l4c_cosine_topk_vectorized", oracle=_L4_ORACLE, tags=("similarity", "udf"))
def l4c_cosine_topk_vectorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4c: the same exact top-k as l4, but the scoring kernel is an
    Arrow-batched mapInPandas with a numpy/BLAS matmul — the UD2-style
    escape hatch for numeric kernels where the JVM fold leaves
    throughput on the table (Q@Mᵀ scores a whole batch per call).

    Scale shape: two-stage top-k — each partition emits only its local
    top-k per query (k·q rows), the global window then ranks that tiny
    union, so the shuffle is O(k·q·partitions), never O(corpus).  The
    query block is deliberately collected/broadcast: a query batch is
    small by definition (here 5 vectors; production: one Arrow batch).
    Parity note: BLAS pairwise summation differs from the ordered fold
    by ≤3e-16 on 64-dim unit vectors (measured), far inside the
    round-6 contract, so it shares l4's oracle."""
    import numpy as np
    import pandas as pd

    emb = load(spark, sf_dir, "embeddings")
    qrows = (
        emb.filter(F.col("vec_id") < _N_QUERIES)
        .select("vec_id", "embedding")
        .collect()
    )
    qids = np.array([r["vec_id"] for r in qrows], dtype=np.int64)
    qmat = np.array([r["embedding"] for r in qrows], dtype=np.float64)
    sc = spark.sparkContext
    b_qids, b_qmat = sc.broadcast(qids), sc.broadcast(qmat)
    k = _TOP_K

    def score_batches(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            m = np.array(list(pdf["embedding"]), dtype=np.float64)
            scores = b_qmat.value @ m.T  # (n_queries, batch)
            for qi, qid in enumerate(b_qids.value):
                s = np.round(scores[qi], 6)
                idx = np.nonzero(ids != qid)[0]
                # ascending lexsort on (id, -score) == (score desc, id asc)
                order = np.lexsort((ids[idx], -s[idx]))[:k]
                take = idx[order]
                yield pd.DataFrame(
                    {
                        "query_id": np.full(len(take), qid, dtype=np.int64),
                        "neighbor_id": ids[take],
                        "cosine": s[take],
                    }
                )

    local_topk = emb.select("vec_id", "embedding").mapInPandas(
        score_batches, "query_id long, neighbor_id long, cosine double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return local_topk.withColumn(
        "rn", F.row_number().over(w).cast("long")
    ).filter(F.col("rn") <= k)


# --- L5b: measured recall@k of the IVF probe vs exact ground truth ---------------

_RECALL_ORACLE = f"""
SELECT e.query_id,
       COUNT(*) AS k,
       CAST(SUM(CASE WHEN i.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_hits,
       CAST(SUM(CASE WHEN i.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
            AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS recall_at_k
FROM ({_L4_ORACLE}) e
LEFT JOIN ({_IVF_ORACLE}) i
  ON e.query_id = i.query_id AND e.neighbor_id = i.neighbor_id
GROUP BY e.query_id
"""


@query("l5b_ivf_recall", oracle=_RECALL_ORACLE, tags=("similarity", "ann", "eval"))
def l5b_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L5b: recall@k of the IVF ANN probe measured against the exact
    brute-force ground truth — the evaluation loop every approximate
    index needs before it replaces the exact path in production.  Both
    sides are deterministic registry queries, so even the *quality
    metric* of the ANN index is oracle-checked.  At 100 TB this runs
    over a sampled query set (the exact side is the expensive one) and
    gates index deployment on a recall floor."""
    exact = l4_cosine_topk_exact(spark, sf_dir).select(
        "query_id", "neighbor_id"
    )
    approx = l5_ivf_topk(spark, sf_dir).select(
        "query_id", F.col("neighbor_id").alias("ivf_neighbor_id")
    )
    joined = exact.join(
        approx,
        (exact.query_id == approx.query_id)
        & (exact.neighbor_id == approx.ivf_neighbor_id),
        "left",
    ).select(exact.query_id, "neighbor_id", "ivf_neighbor_id")
    hit = F.when(F.col("ivf_neighbor_id").isNotNull(), 1).otherwise(0)
    return joined.groupBy("query_id").agg(
        F.count("*").alias("k"),
        F.sum(hit).cast("long").alias("n_hits"),
        (F.sum(hit).cast("double") / F.count("*").cast("double")).alias(
            "recall_at_k"
        ),
    )


_RECALL2_ORACLE = f"""
SELECT e.query_id,
       COUNT(*) AS k,
       CAST(SUM(CASE WHEN i.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_hits,
       CAST(SUM(CASE WHEN i.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
            AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS recall_at_k
FROM ({_L4_ORACLE}) e
LEFT JOIN ({_IVF2_ORACLE}) i
  ON e.query_id = i.query_id AND e.neighbor_id = i.neighbor_id
GROUP BY e.query_id
"""


@query(
    "l5b2_ivf_kmeans_recall",
    oracle=_RECALL2_ORACLE,
    tags=("similarity", "ann", "eval", "kmeans"),
)
def l5b2_ivf_kmeans_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L5b2: recall@k of the TRAINED-quantizer IVF probe
    (l5_ivf_kmeans_topk) against the exact brute-force ground truth —
    the deployment gate for the learned index, itself oracle-checked
    end to end (the oracle replays k-means + probe + recall in SQL)."""
    exact = l4_cosine_topk_exact(spark, sf_dir).select(
        "query_id", "neighbor_id"
    )
    approx = l5_ivf_kmeans_topk(spark, sf_dir).select(
        "query_id", F.col("neighbor_id").alias("ivf_neighbor_id")
    )
    joined = exact.join(
        approx,
        (exact.query_id == approx.query_id)
        & (exact.neighbor_id == approx.ivf_neighbor_id),
        "left",
    ).select(exact.query_id, "neighbor_id", "ivf_neighbor_id")
    hit = F.when(F.col("ivf_neighbor_id").isNotNull(), 1).otherwise(0)
    return joined.groupBy("query_id").agg(
        F.count("*").alias("k"),
        F.sum(hit).cast("long").alias("n_hits"),
        (F.sum(hit).cast("double") / F.count("*").cast("double")).alias(
            "recall_at_k"
        ),
    )


# --- L5c: Matryoshka truncated-embedding recall@k ------------------------------

# First 16 of 64 dims, renormalized — the Matryoshka-representation
# deployment question: how much recall does a 4x cheaper index lose?
_MRL_DIMS = 16

_MRL_APPROX_ORACLE = f"""
WITH t AS (
  SELECT vec_id, embedding[1:{_MRL_DIMS}] AS e16 FROM embeddings
),
n AS (
  SELECT vec_id, e16,
         sqrt({_SQL_DOT.format(a='e16', b='e16')}) AS nrm
  FROM t
),
q AS (
  SELECT vec_id AS query_id, e16 AS qe, nrm AS qn
  FROM n WHERE vec_id < {_N_QUERIES}
),
scored AS (
  SELECT q.query_id, n.vec_id AS neighbor_id,
         ROUND({_SQL_DOT.format(a='q.qe', b='n.e16')}
               / NULLIF(q.qn * n.nrm, 0), 6) AS tcos
  FROM q CROSS JOIN n
  WHERE n.vec_id <> q.query_id
),
ranked AS (
  SELECT query_id, neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY tcos DESC NULLS LAST, neighbor_id)
           AS rn
  FROM scored
)
SELECT query_id, neighbor_id FROM ranked WHERE rn <= {_TOP_K}
"""

_MRL_RECALL_ORACLE = f"""
SELECT e.query_id,
       COUNT(*) AS k,
       CAST(SUM(CASE WHEN m.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_hits,
       CAST(SUM(CASE WHEN m.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
            AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS recall_at_k
FROM ({_L4_ORACLE}) e
LEFT JOIN ({_MRL_APPROX_ORACLE}) m
  ON e.query_id = m.query_id AND e.neighbor_id = m.neighbor_id
GROUP BY e.query_id
"""


@query(
    "l5c_matryoshka_recall",
    oracle=_MRL_RECALL_ORACLE,
    tags=("similarity", "ann", "eval"),
)
def l5c_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L5c: recall@k of TRUNCATED (Matryoshka) embeddings against the
    full-dimension exact ground truth — keep the first 16 of 64 dims,
    renormalize, rank by truncated cosine, and measure per-query how
    many of the true top-k survive.  This is the evaluation a
    Matryoshka-trained embedding column exists for: a 4× smaller
    index/shuffle footprint is only deployable if this recall holds.

    Scale shape = l4's: the bounded query set broadcasts, the corpus
    streams through the truncated-dot fold (per-row slice + norm are
    narrow maps computed once, not per pair), and partial
    WindowGroupLimit bounds the shuffle at top-k per partition.  At
    100 TB the truncated leg is the cheap one — the expensive exact
    leg runs on the sampled query set only, exactly like l5b.
    NULLIF guards a zero truncated norm identically in both engines
    (ANSI division) — such rows rank last and can never displace a
    real neighbor.

    Honest fixture note: the synthetic embeddings are isotropic (not
    Matryoshka-trained), so the measured recall here is ~0 — which is
    precisely the answer this gate exists to give ("do NOT deploy the
    truncated index for these vectors").  A Matryoshka-trained model
    concentrates information in the prefix and scores high here; the
    oracle checks the MEASUREMENT, which is exact either way."""
    emb = load(spark, sf_dir, "embeddings")
    t = emb.select(
        "vec_id", F.slice("embedding", 1, _MRL_DIMS).alias("e16")
    ).select(
        "vec_id",
        "e16",
        F.sqrt(dot(F.col("e16"), F.col("e16"))).alias("nrm"),
    )
    q = t.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("e16").alias("qe"),
        F.col("nrm").alias("qn"),
    )
    scored = (
        fan_out(t.select(F.col("vec_id").alias("neighbor_id"), "e16", "nrm"))
        .crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot(F.col("qe"), F.col("e16"))
                / F.nullif(F.col("qn") * F.col("nrm"), F.lit(0.0)),
                6,
            ).alias("tcos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("tcos").desc_nulls_last(), F.col("neighbor_id")
    )
    approx = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _TOP_K)
        .select("query_id", F.col("neighbor_id").alias("mrl_neighbor_id"))
    )
    exact = l4_cosine_topk_exact(spark, sf_dir).select(
        "query_id", "neighbor_id"
    )
    joined = exact.join(
        approx,
        (exact.query_id == approx.query_id)
        & (exact.neighbor_id == approx.mrl_neighbor_id),
        "left",
    ).select(exact.query_id, "neighbor_id", "mrl_neighbor_id")
    hit = F.when(F.col("mrl_neighbor_id").isNotNull(), 1).otherwise(0)
    return joined.groupBy("query_id").agg(
        F.count("*").alias("k"),
        F.sum(hit).cast("long").alias("n_hits"),
        (F.sum(hit).cast("double") / F.count("*").cast("double")).alias(
            "recall_at_k"
        ),
    )


# --- L5d: product quantization (PQ) ANN + recall gate ---------------------------

# 64 dims -> M=4 subspaces x 16 dims, K=8 codes each, trained with the
# SAME deterministic micro-grid Lloyd machinery as the IVF quantizer
# (hash seeding, fixed iterations, half-away integer micro-means, the
# |c|^2 - 2ec assignment with no ROUND anywhere).  A vector is stored
# as 4 code ids (3 bits each) instead of 64 floats -- the 64x
# compression that makes billion-vector search RAM-resident; the ADC
# score is the sum of 4 per-subspace table lookups.
_PQ_M = 4
_PQ_SUB = 16
_PQ_K = 8
_PQ_ITERS = 2


def _pq_slice_sql(m: int) -> str:
    return f"embedding[{m * _PQ_SUB + 1}:{(m + 1) * _PQ_SUB}]"


def _pq_oracle_ctes(m: int) -> str:
    """The kmeans CTE chain of _kmeans_oracle_ctes, specialized to
    subspace ``m``'s slice and name-prefixed pq{m}_ so four chains
    coexist in one oracle."""
    h = f"((vec_id % {_KM_PRIME}) * {_KM_KNUTH}) % {_KM_MOD}"
    sl = _pq_slice_sql(m)
    p = f"pq{m}_"
    parts = [
        f"""{p}cent0 AS (
  SELECT ROW_NUMBER() OVER (ORDER BY h, vec_id) AS cell,
         list_transform({sl},
                        x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000000)
                                  AS BIGINT)) AS centroid
  FROM (SELECT vec_id, embedding, {h} AS h
        FROM embeddings ORDER BY h, vec_id LIMIT {_PQ_K})
)"""
    ]
    for i in range(1, _PQ_ITERS + 1):
        prev = f"{p}cent{i - 1}"
        parts.append(
            f"""{p}assign{i} AS (
  SELECT vec_id, embedding, cell,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
  FROM (SELECT e.vec_id, e.embedding, c.cell,
               {_km_dist_sql(f'e.{sl}', 'c.centroid')} AS d
        FROM embeddings e CROSS JOIN {prev} c)
),
{p}expl{i} AS (
  SELECT cell, CAST(u.pos AS INTEGER) AS pos,
         CAST(FLOOR(CAST(({sl})[u.pos] AS DOUBLE) * 1000000)
              AS BIGINT) AS v6
  FROM (SELECT * FROM {p}assign{i} WHERE rn = 1),
       UNNEST(range(1, {_PQ_SUB} + 1)) AS u(pos)
),
{p}cent{i} AS (
  SELECT cell, list(CAST(cv6 AS BIGINT) ORDER BY pos) AS centroid
  FROM (SELECT cell, pos,
               CASE WHEN SUM(v6) < 0
                    THEN -((-2 * SUM(v6) + COUNT(v6)) // (2 * COUNT(v6)))
                    ELSE (2 * SUM(v6) + COUNT(v6)) // (2 * COUNT(v6))
               END AS cv6
        FROM {p}expl{i} GROUP BY cell, pos)
  GROUP BY cell
)"""
        )
    parts.append(
        f"""{p}codes AS (
  SELECT vec_id, {m} AS m, cell AS code
  FROM (SELECT e.vec_id, c.cell,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                  ORDER BY {_km_dist_sql(f'e.{sl}', 'c.centroid')},
                                           c.cell) AS rn
        FROM embeddings e CROSS JOIN {p}cent{_PQ_ITERS} c)
  WHERE rn = 1
),
{p}tab AS (
  SELECT e.vec_id AS query_id, {m} AS m, c.cell AS code,
         CAST({_SQL_DOT_MICRO_INT.format(a=f'e.{sl}', b='c.centroid')}
              AS BIGINT) AS part_dot
  FROM embeddings e CROSS JOIN {p}cent{_PQ_ITERS} c
  WHERE e.vec_id < {_N_QUERIES}
)"""
    )
    return ",\n".join(parts)


_PQ_CTES = ",\n".join(_pq_oracle_ctes(m) for m in range(_PQ_M))
_PQ_CODE_UNION = " UNION ALL ".join(
    f"SELECT * FROM pq{m}_codes" for m in range(_PQ_M)
)
_PQ_TAB_UNION = " UNION ALL ".join(
    f"SELECT * FROM pq{m}_tab" for m in range(_PQ_M)
)

_PQ_ORACLE = f"""
WITH {_PQ_CTES},
codes AS ({_PQ_CODE_UNION}),
tab AS ({_PQ_TAB_UNION}),
adc AS (
  SELECT t.query_id, c.vec_id AS neighbor_id,
         CAST(SUM(t.part_dot) AS BIGINT) AS adc_e12
  FROM codes c JOIN tab t ON c.m = t.m AND c.code = t.code
  WHERE c.vec_id <> t.query_id
  GROUP BY 1, 2
)
SELECT query_id, neighbor_id, adc_e12, CAST(rn AS BIGINT) AS rn
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY adc_e12 DESC, neighbor_id)
                  AS rn
      FROM adc)
WHERE rn <= {_TOP_K}
"""


def pq_codebooks_and_codes(
    emb: DataFrame,
) -> tuple[list[DataFrame], DataFrame]:
    """Train the M per-subspace codebooks and encode every vector.

    Returns (codebooks, codes): codebooks[m] is the (cell, centroid)
    table of subspace m (K rows of integer micro-grid centroids —
    broadcast-sized by construction), codes is the encoded corpus
    (vec_id, m, code) — the 64×-compressed representation that is ALL
    a PQ index stores per vector."""
    books, code_parts = [], []
    for m in range(_PQ_M):
        sub = emb.select(
            "vec_id",
            F.slice("embedding", m * _PQ_SUB + 1, _PQ_SUB).alias(
                "embedding"
            ),
        )
        cent = kmeans_centroids(sub, k=_PQ_K, iters=_PQ_ITERS)
        # four tiny (8-row) codebooks feed every later stage — pin them
        # so each is trained once, not once per consumer
        cent = cent.localCheckpoint()
        books.append(cent)
        code_parts.append(
            _km_assign(sub, cent, "vec_id", "embedding").select(
                "vec_id", F.lit(m).alias("m"), F.col("cell").alias("code")
            )
        )
    codes = code_parts[0]
    for c in code_parts[1:]:
        codes = codes.unionByName(c)
    return books, codes


@query(
    "l5d_pq_topk",
    oracle=_PQ_ORACLE,
    tags=("similarity", "ann", "pq", "kmeans"),
)
def l5d_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L5d: product-quantization ANN (Jégou et al., TPAMI 2011) — the
    classic memory-side compression the vector family still lacked:
    IVF (l5) prunes WHICH vectors get scored; PQ compresses WHAT is
    stored per vector — 64 floats become M=4 3-bit code ids (64×),
    which is how billion-vector indexes stay RAM-resident.  Each
    16-dim subspace gets its own K=8 codebook from the deterministic
    micro-grid Lloyd trainer (hash seeding, fixed iterations,
    half-away integer micro-means — the IVF quantizer machinery
    applied per slice), and a vector's code is its nearest
    sub-centroid per subspace.

    Query scoring is asymmetric distance computation (ADC), the heart
    of PQ: the query stays FULL precision, a (query × subspace ×
    code) table of partial dots is computed once against the
    codebooks (Q·M·K entries — broadcast-sized), and every database
    vector's score is the SUM of M table lookups selected by its
    stored codes — no vector arithmetic per candidate, just integer
    adds.  Everything is exact micro-grid integer arithmetic end to
    end, so the driver hash-checks codebooks, codes, and ADC scores
    cell-exactly against the four unrolled Lloyd chains in the
    oracle.

    Scale: codebooks are K×M tiny and broadcast; encoding is one
    narrow pass per subspace; the ADC join shuffles (vec_id, m, code)
    triples — 4 small ints per vector, never the vectors themselves.
    The recall gate (l5d_pq_recall) is the honest quality check."""
    emb = load(spark, sf_dir, "embeddings")
    books, codes = pq_codebooks_and_codes(emb)
    tabs = []
    for m, cent in enumerate(books):
        qsub = emb.filter(F.col("vec_id") < _N_QUERIES).select(
            F.col("vec_id").alias("query_id"),
            F.slice("embedding", m * _PQ_SUB + 1, _PQ_SUB).alias("qe"),
        )
        tabs.append(
            qsub.crossJoin(F.broadcast(cent)).select(
                "query_id",
                F.lit(m).alias("m"),
                F.col("cell").alias("code"),
                dot_micro_int(F.col("qe"), F.col("centroid")).alias(
                    "part_dot"
                ),
            )
        )
    tab = tabs[0]
    for t in tabs[1:]:
        tab = tab.unionByName(t)
    adc = (
        codes.join(F.broadcast(tab), ["m", "code"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(F.sum("part_dot").cast("long").alias("adc_e12"))
    )
    rn = F.row_number().over(
        Window.partitionBy("query_id").orderBy(
            F.col("adc_e12").desc(), "vec_id"
        )
    )
    return (
        adc.withColumn("rn", rn.cast("long"))
        .filter(F.col("rn") <= _TOP_K)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "adc_e12",
            "rn",
        )
    )


_PQ_RECALL_ORACLE = f"""
SELECT e.query_id,
       COUNT(*) AS k,
       CAST(SUM(CASE WHEN i.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_hits,
       CAST(SUM(CASE WHEN i.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
            AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS recall_at_k
FROM ({_L4_ORACLE}) e
LEFT JOIN ({_PQ_ORACLE}) i
  ON e.query_id = i.query_id AND e.neighbor_id = i.neighbor_id
GROUP BY e.query_id
"""


@query(
    "l5d_pq_recall",
    oracle=_PQ_RECALL_ORACLE,
    tags=("similarity", "ann", "eval", "pq"),
)
def l5d_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L5d-recall: recall@k of the PQ/ADC top-k against the exact
    brute-force ground truth — the same deploy gate as l5b/l5b2/l5c,
    because a 64× compression is worthless if it forgets the
    neighbors.  (Honest fixture expectation: isotropic synthetic
    vectors are the hardest possible case for coarse codebooks —
    recall is graded, not assumed.)"""
    exact = l4_cosine_topk_exact(spark, sf_dir).select(
        "query_id", "neighbor_id"
    )
    approx = l5d_pq_topk(spark, sf_dir).select(
        "query_id", F.col("neighbor_id").alias("pq_neighbor_id")
    )
    joined = exact.join(
        approx,
        (exact.query_id == approx.query_id)
        & (exact.neighbor_id == approx.pq_neighbor_id),
        "left",
    ).select(exact.query_id, "neighbor_id", "pq_neighbor_id")
    hit = F.when(F.col("pq_neighbor_id").isNotNull(), 1).otherwise(0)
    return joined.groupBy("query_id").agg(
        F.count("*").alias("k"),
        F.sum(hit).cast("long").alias("n_hits"),
        (F.sum(hit).cast("double") / F.count("*").cast("double")).alias(
            "recall_at_k"
        ),
    )
