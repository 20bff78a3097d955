"""Duplicate-cluster graph operators (SURVEY.md §2.8 extension):
near-duplicate PAIRS are only half of a dedup pipeline — production
dedup (e.g. the C4/RefinedWeb/FineWeb recipes) must transitively close
the pair graph into CLUSTERS and keep one canonical document per
cluster.  Pairs (a,b) and (b,c) must collapse a, b, c together even
though (a,c) was never directly scored.

Scale design (100 TB of text → billions of vertices):

* The cluster step is iterative min-label propagation with POINTER
  JUMPING (label ← label(label) each round), the classic Hash-to-Min /
  star-contraction family: convergence in O(log(longest chain)) rounds
  rather than O(diameter).  Near-dup graphs are overwhelmingly small
  dense blobs, so real corpora converge in 2–4 rounds.
* Each round is two bounded shuffles (neighbor-min groupBy + the jump
  self-join), both keyed on vertex id — no all-pairs anything.  Edge
  and label tables carry only (long, long) rows.
* ``localCheckpoint`` after every round cuts the lineage so the plan
  does not grow exponentially with iterations (the standard iterative-
  DataFrame hygiene; on a cluster with a checkpoint dir, ``checkpoint``
  gives the same effect with executor-failure tolerance).
* The convergence probe is a ``count`` of changed labels — a scalar
  aggregate action, never a ``collect`` of data rows.

Oracle: DuckDB recursive CTE computes the exact transitive closure of
the same thresholded pair set and takes MIN(reachable id) per vertex —
literally the definition the distributed loop converges to.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from update_database_by_wind_spark.operators.dedup import (
    _L3E_PAIR_CTES,
    ngram_jaccard_pairs,
)
from update_database_by_wind_spark.registry import query
from update_database_by_wind_spark.sources import load


def _free_ckpt(df: DataFrame) -> None:
    """Unpersist the RDD blocks behind a ``localCheckpoint()``'d
    DataFrame (its plan is a LogicalRDD over the checkpointed rows).
    Spark exposes no public API for this, so it reaches through the
    JVM handle — best-effort no-op if the internals ever move.
    Without it, iterative loops leak one block set per round
    (GraphX/GraphFrames free the prior iteration the same way)."""
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        # py4j reach-through into private internals: any Py4J/attribute
        # error here means the internals moved, and the only fallout of
        # swallowing it is unreclaimed cache blocks for the rest of the
        # loop — never a wrong result.  Deliberately broad for that
        # reason (round-12 audit).
        pass


def connected_components(
    edges: DataFrame,
    src: str = "u",
    dst: str = "v",
    max_iter: int = 25,
) -> DataFrame:
    """Distributed connected components over an undirected edge list.

    Returns one row per vertex appearing in ``edges``:
    ``(id, cluster_id)`` where ``cluster_id`` is the minimum vertex id
    of the component — deterministic under any partitioning.

    Algorithm: min-label propagation + pointer jumping.  Every round,
    each vertex takes the min label over {self} ∪ neighbors, then
    shortcuts through its current label's label.  The jump doubles the
    effective propagation distance per round, so worst-case chain
    graphs need O(log n) rounds, not O(n).  Raises if ``max_iter``
    rounds do not converge (silent truncation would return wrong
    clusters).
    """
    # Symmetrize via ONE explode pass instead of a two-leg union: the
    # union planned the (possibly expensive) ``edges`` pipeline twice —
    # for l3f/l3g/l3i that pipeline is the full near-dup pair mining —
    # and relied on ReuseExchange to dedupe it; explode(array(e, e'))
    # makes the single computation structural (the g3 corners pattern,
    # round 18 §5).
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .select(
            F.explode(
                F.array(
                    F.struct(F.col("u"), F.col("v")),
                    F.struct(
                        F.col("v").alias("u"), F.col("u").alias("v")
                    ),
                )
            ).alias("e")
        )
        .select("e.u", "e.v")
        .distinct()
        .localCheckpoint()
    )
    labels = (
        sym.select(F.col("u").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        nbr = sym.join(labels, sym["v"] == labels["id"]).select(
            F.col("u").alias("id"), "label"
        )
        stepped = (
            labels.unionByName(nbr)
            .groupBy("id")
            .agg(F.min("label").alias("label"))
        )
        jump = stepped.select(
            F.col("id").alias("j_id"), F.col("label").alias("j_label")
        )
        # LAZY local checkpoint (eager=False): the plan is cut to a
        # LogicalRDD immediately, but materialization is deferred to
        # the convergence count below — which therefore computes the
        # new labels, persists their blocks, AND probes convergence in
        # ONE job instead of the former checkpoint-job + count-job
        # pair (guide §7: fixture-scale cost is per-job scheduling;
        # round-19 fold, see OPTIMIZATION_r19.md).
        new_labels = (
            stepped.join(jump, stepped["label"] == jump["j_id"], "left")
            .select(
                "id",
                F.least(
                    F.col("label"), F.coalesce("j_label", "label")
                ).alias("label"),
            )
            .localCheckpoint(eager=False)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        # prior round's checkpoint blocks are dead once the convergence
        # count has consumed them — free eagerly so executor storage
        # stays O(1) in the iteration count, not O(rounds)
        _free_ckpt(labels)
        labels = new_labels
        if changed == 0:
            _free_ckpt(sym)
            return labels.select("id", F.col("label").alias("cluster_id"))
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds"
    )


_L3F_ORACLE = _L3E_PAIR_CTES + """,
dup AS (
  SELECT p.doc_a, p.doc_b
  FROM pairs p
  JOIN sizes sa ON sa.doc_id = p.doc_a
  JOIN sizes sb ON sb.doc_id = p.doc_b
  WHERE p.n_shared * 1.0 / (sa.n + sb.n - p.n_shared) >= 0.2
),
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM dup
  UNION ALL
  SELECT doc_b AS u, doc_a AS v FROM dup
),
reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
),
labels AS (
  SELECT u AS doc_id, LEAST(u, MIN(v)) AS cluster_id
  FROM reach GROUP BY u
)
SELECT doc_id, cluster_id,
       CAST(COUNT(*) OVER (PARTITION BY cluster_id) AS BIGINT)
         AS cluster_size
FROM labels
"""


@query("l3f_dup_clusters", oracle=_L3F_ORACLE, tags=("dedup", "graph"))
def l3f_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3f: transitive near-duplicate clusters — the l3e Jaccard pair
    graph closed into components via distributed label propagation
    (see ``connected_components`` for the scale argument).  One row per
    clustered document: (doc_id, cluster_id = min doc_id in component,
    cluster_size).  Singleton documents (no near-dup edge) are not
    rows — at web scale they are the overwhelming majority and a
    dedup decision needs only the clustered minority.

    The size ride-along is a plain shuffle join on cluster_id: the
    clustered minority of a web corpus is commonly 10-30% of all
    documents (billions of rows), far past broadcast limits, and at
    small scale AQE converts the shuffle join to broadcast on its own."""
    docs = load(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs)
    labels = connected_components(pairs, src="doc_a", dst="doc_b")
    sizes = labels.groupBy("cluster_id").agg(
        F.count("*").cast("long").alias("cluster_size")
    )
    return (
        labels.select(F.col("id").alias("doc_id"), "cluster_id")
        .join(sizes, "cluster_id")
        .select("doc_id", "cluster_id", "cluster_size")
    )


_L3G_ORACLE = _L3E_PAIR_CTES + """,
dup AS (
  SELECT p.doc_a, p.doc_b
  FROM pairs p
  JOIN sizes sa ON sa.doc_id = p.doc_a
  JOIN sizes sb ON sb.doc_id = p.doc_b
  WHERE p.n_shared * 1.0 / (sa.n + sb.n - p.n_shared) >= 0.2
),
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM dup
  UNION ALL
  SELECT doc_b AS u, doc_a AS v FROM dup
),
reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
),
labels AS (
  SELECT u AS doc_id, LEAST(u, MIN(v)) AS cluster_id
  FROM reach GROUP BY u
)
SELECT d.lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN l.doc_id IS NULL OR l.doc_id = l.cluster_id
                THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN l.doc_id IS NOT NULL AND l.doc_id <> l.cluster_id
                THEN 1 ELSE 0 END) AS BIGINT) AS n_removed
FROM documents d LEFT JOIN labels l ON d.doc_id = l.doc_id
GROUP BY d.lang
"""


@query("l3g_cluster_dedup_keep", oracle=_L3G_ORACLE, tags=("dedup", "graph"))
def l3g_cluster_dedup_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3g: the dedup DECISION from l3f's clusters — keep the canonical
    (minimum doc_id) member of every near-dup cluster plus all
    unclustered documents, and report the per-lang keep/remove tally.
    The decision join is a plain shuffle join on doc_id, NOT a
    broadcast: the clustered label table scales with the near-dup
    minority of the corpus (commonly 10-30% of a web crawl — billions
    of rows at 100 TB), which would blow past broadcast/driver limits.
    At test scale AQE converts it to a broadcast join on its own; on a
    cluster both sides hash-shuffle on the long key."""
    docs = load(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs)
    labels = connected_components(pairs, src="doc_a", dst="doc_b").select(
        F.col("id").alias("doc_id"), "cluster_id"
    )
    removed = (F.col("cluster_id").isNotNull()) & (
        F.col("doc_id") != F.col("cluster_id")
    )
    return (
        docs.join(labels, "doc_id", "left")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.when(~removed, 1).otherwise(0))
            .cast("long")
            .alias("n_kept"),
            F.sum(F.when(removed, 1).otherwise(0))
            .cast("long")
            .alias("n_removed"),
        )
    )


# --- L3i: semantic dedup (embedding clusters → keep best quality) -------------

# SemDeDup-style pipeline (public recipe: Abbas et al. 2023, "SemDeDup:
# Data-efficient learning at web-scale through semantic deduplication"):
# embedding-cosine near-dup pairs → transitive clusters → keep ONE
# member per cluster chosen by a quality signal (here: longest text,
# doc_id as the deterministic tiebreak), not by arbitrary id.
_L3I_ORACLE = """
WITH RECURSIVE pairs AS (
  SELECT a.vec_id AS doc_a, b.vec_id AS doc_b
  FROM embeddings a JOIN embeddings b
    ON a.label = b.label AND a.vec_id < b.vec_id
  WHERE ROUND(list_sum(list_transform(list_zip(
          list_transform(a.embedding, x -> CAST(x AS DOUBLE)),
          list_transform(b.embedding, x -> CAST(x AS DOUBLE))),
          p -> p[1] * p[2])), 6) >= 0.25
),
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM pairs
  UNION ALL
  SELECT doc_b AS u, doc_a AS v FROM pairs
),
reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
),
labels AS (
  SELECT u AS doc_id, LEAST(u, MIN(v)) AS cluster_id
  FROM reach GROUP BY u
),
ranked AS (
  SELECT l.doc_id, l.cluster_id, d.n_chars,
         ROW_NUMBER() OVER (PARTITION BY l.cluster_id
                            ORDER BY d.n_chars DESC, l.doc_id) AS rn
  FROM labels l JOIN documents d ON d.doc_id = l.doc_id
)
SELECT doc_id, cluster_id, CAST(n_chars AS BIGINT) AS n_chars,
       rn = 1 AS keep
FROM ranked
"""


@query(
    "l3i_semantic_dedup",
    oracle=_L3I_ORACLE,
    tags=("dedup", "similarity", "graph"),
)
def l3i_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3i: SEMANTIC dedup end to end — the embedding-space analogue of
    l3f+l3g and the missing half of l3c: cosine near-dup pairs (label-
    blocked, threshold 0.25) transitively closed into clusters, then a
    quality-based keep decision (longest text wins, min doc_id breaks
    ties) instead of keep-by-min-id.  One row per clustered document
    with its cluster and keep verdict.

    Scale shape: pair generation is l3c's blocked equi-join (the block
    key becomes a coarse quantizer cell at 100 TB), clustering is
    ``connected_components`` (pointer jumping, O(log chain) rounds),
    and the quality join + per-cluster window shuffle only the
    clustered minority.  No all-pairs stage anywhere."""
    from update_database_by_wind_spark.operators.extended2 import (
        l3c_embedding_neardup,
    )

    docs = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    pairs = l3c_embedding_neardup(spark, sf_dir)
    labels = connected_components(pairs, src="doc_a", dst="doc_b").select(
        F.col("id").alias("doc_id"), "cluster_id"
    )
    rn = F.row_number().over(
        Window.partitionBy("cluster_id").orderBy(
            F.col("n_chars").desc(), "doc_id"
        )
    )
    return (
        labels.join(docs, "doc_id")
        .withColumn("rn", rn)
        .select(
            "doc_id",
            "cluster_id",
            F.col("n_chars").cast("long").alias("n_chars"),
            (F.col("rn") == 1).alias("keep"),
        )
    )


# --- G2: integer-exact damped PageRank -----------------------------------------


def pagerank_integer(
    edges: DataFrame,
    iterations: int = 5,
    scale: int = 1_000_000,
    damp_pct: int = 85,
) -> DataFrame:
    """Distributed damped PageRank over a directed edge list
    ``(src, dst)``, in EXACT integer arithmetic so the fixpoint
    iteration is bit-portable across engines, partitionings, and
    cluster sizes — the floating-point formulation is association-
    sensitive (a groupBy sum's addend order changes with the shuffle),
    which makes cross-engine hash verification impossible.

    Recurrence (every vertex starts at ``scale``):

        r'(v) = BASE + Σ_{(u,v)∈E} (r(u) * damp_pct) div (100 * deg(u))

    with ``BASE = scale * (100 - damp_pct) div 100``.  Integer floor
    division leaks a little mass per hop (the classic fixed-point
    trade: determinism over stochasticity — ranks are ORDINAL scores,
    and the leak is uniform enough to preserve ordering), and both
    engines' integral division agree because every operand is
    positive.  Callers wanting the undirected variant pass the
    symmetrized edge list; every vertex then has deg ≥ 1, so there are
    no dangling-mass cases to special-case.

    The vertex set is ``distinct(src ∪ dst)``, carried through every
    round: a vertex that receives no contribution (zero in-degree on
    genuinely directed input) keeps rank BASE rather than dropping out
    of the table — dropping it would also erase its OUTBOUND mass from
    round 2 on.  Sink vertices (zero out-degree) keep their received
    rank; their damped mass leaks, the standard dangling-node
    simplification, stated here rather than hidden.

    Scale design: the edge list joined with out-degrees is computkpointed
    once; each iteration is one join (ranks are hash-partitioned on
    ``node`` by the previous groupBy, and the join + re-aggregation
    reuse that partitioning) plus one aggregation — the standard
    O(E/p)-per-round distributed PageRank, with ``localCheckpoint``
    lineage cuts and eager block frees (`_free_ckpt`) keeping plan
    depth and executor storage O(1) in the iteration count."""
    base = scale * (100 - damp_pct) // 100
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    e = edges.join(deg, "src").localCheckpoint()
    verts = (
        edges.select("src")
        .union(edges.select(F.col("dst").alias("src")))
        .distinct()
        .select(F.col("src").alias("node"))
        .localCheckpoint()
    )
    ranks = verts.select(
        "node", F.lit(scale).cast("long").alias("pr")
    ).localCheckpoint()
    for _ in range(iterations):
        contrib = e.join(ranks, e["src"] == ranks["node"]).select(
            F.col("dst").alias("node"),
            F.expr(f"(pr * {damp_pct}) div (100 * deg)").alias("c"),
        )
        new_ranks = (
            verts.join(
                contrib.groupBy("node").agg(F.sum("c").alias("c")),
                "node",
                "left",
            )
            .select(
                "node",
                (F.lit(base) + F.coalesce(F.col("c"), F.lit(0)))
                .cast("long")
                .alias("pr"),
            )
            .localCheckpoint()
        )
        _free_ckpt(ranks)
        ranks = new_ranks
    _free_ckpt(e)
    _free_ckpt(verts)
    return ranks


def _pagerank_oracle(iterations: int = 5) -> str:
    """Unrolled-iteration DuckDB twin of :func:`pagerank_integer` over
    the customer↔supplier trade graph — r0..rN as chained CTEs, the
    identical integer recurrence (`//` and `div` agree on positive
    operands)."""
    ctes = [
        """pairs AS (
  SELECT DISTINCT o_custkey AS c, l_suppkey AS s
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
edges AS (
  SELECT c * 2 AS src, s * 2 + 1 AS dst FROM pairs
  UNION ALL
  SELECT s * 2 + 1 AS src, c * 2 AS dst FROM pairs
),
deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
r0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS pr FROM deg)"""
    ]
    for i in range(1, iterations + 1):
        ctes.append(
            f"""r{i} AS (
  SELECT e.dst AS node,
         CAST(150000 + SUM((r.pr * 85) // (100 * d.deg)) AS BIGINT) AS pr
  FROM edges e JOIN r{i - 1} r ON e.src = r.node
  JOIN deg d ON d.src = e.src
  GROUP BY e.dst
)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END
         AS node_type,
       node // 2 AS node_key,
       pr,
       CAST(ROW_NUMBER() OVER (ORDER BY pr DESC, node) AS BIGINT) AS rn
FROM r{iterations}
ORDER BY pr DESC, node
LIMIT 20"""
    )


_G2_ORACLE = _pagerank_oracle()


@query("g2_pagerank", oracle=_G2_ORACLE, tags=("graph", "iterative"))
def g2_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G2: damped PageRank over the bipartite customer↔supplier trade
    graph (an edge per distinct trading pair from orders ⋈ lineitem,
    symmetrized), 5 iterations of the integer-exact recurrence, top-20
    vertices with deterministic tie-breaks.  Node ids pack both
    keyspaces into one long (customer → 2k, supplier → 2k+1).

    This is the repo's iterative-algorithm leg beyond connected
    components: the oracle UNROLLS the identical recurrence as chained
    CTEs, so the driver hash-checks a genuinely iterative distributed
    computation cell-exactly — possible only because the arithmetic is
    integer (see :func:`pagerank_integer`; a float PageRank cannot be
    hash-verified across engines).  At 100 TB the per-round cost is
    one edge-sized join + one aggregation, ranks stay co-partitioned
    across rounds, and lineage/storage stay O(1) in rounds."""
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    lineitem = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    pairs = (
        lineitem.join(orders, lineitem["l_orderkey"] == orders["o_orderkey"])
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    edges = pairs.select(
        (F.col("c") * 2).alias("src"), (F.col("s") * 2 + 1).alias("dst")
    ).union(
        pairs.select(
            (F.col("s") * 2 + 1).alias("src"), (F.col("c") * 2).alias("dst")
        )
    )
    ranks = pagerank_integer(edges, iterations=5)
    w = Window.orderBy(F.col("pr").desc(), F.col("node"))
    return (
        ranks.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 20)
        .select(
            F.when(F.col("node") % 2 == 0, "customer")
            .otherwise("supplier")
            .alias("node_type"),
            F.expr("node div 2").alias("node_key"),
            "pr",
            "rn",
        )
    )


# --- G3: exact triangle counting (degree-oriented wedge join) ------------------


def triangle_count(edges: DataFrame, a: str = "a", b: str = "b") -> DataFrame:
    """Exact per-vertex triangle counts over an undirected edge list
    (one row per edge, ``a < b``, no self-loops).

    Algorithm: the classic degree-ordered orientation (node-iterator++
    / Schank-Wagner).  Each undirected edge is oriented from the
    lower-ranked endpoint to the higher, where rank is the total order
    ``(degree, id)``.  The oriented graph is a DAG in which every
    triangle {u,v,w} appears EXACTLY once as a wedge u→v, u→w
    (rank(v) < rank(w)) closed by the oriented edge v→w — so one
    wedge self-join plus one closing join counts each triangle once,
    no post-hoc dedup.

    Scale design: orientation bounds every vertex's out-degree by
    O(sqrt(m)) on any graph (the arboricity argument), so the wedge
    join materializes O(m^{3/2}) rows worst-case instead of the
    unoriented Σdeg² — the difference between feasible and not on a
    power-law graph where the top hub's deg² alone exceeds the edge
    count.  Both joins are plain equi-joins keyed on vertex ids
    (shuffle-partitionable; the oriented edge list carries only three
    long columns), and the final count is a map-side-combinable
    groupBy over exploded triangle corners.

    Returns ``(v, n_tri)`` — one row per vertex that closes at least
    one triangle."""
    deg = (
        edges.select(F.col(a).alias("u"))
        .union(edges.select(F.col(b).alias("u")))
        .groupBy("u")
        .agg(F.count("*").alias("d"))
    )
    e = (
        edges.select(F.col(a).alias("x"), F.col(b).alias("y"))
        .join(deg.select(F.col("u").alias("x"), F.col("d").alias("dx")), "x")
        .join(deg.select(F.col("u").alias("y"), F.col("d").alias("dy")), "y")
    )
    lower_first = (F.col("dx") < F.col("dy")) | (
        (F.col("dx") == F.col("dy")) & (F.col("x") < F.col("y"))
    )
    # Materialize the oriented DAG once (localCheckpoint, the house
    # iterative-hygiene pattern): it feeds THREE consumers (both wedge
    # legs and the closing join), and lazily each consumer re-planned
    # the pair-expansion + two degree joins — ~65 Exchange nodes of
    # duplicated subtree before, ~10 after (round-18 audit).  The
    # checkpoint is O(m) rows of three longs, the same bound the wedge
    # join already carries.
    oriented = e.select(
        F.when(lower_first, F.col("x")).otherwise(F.col("y")).alias("src"),
        F.when(lower_first, F.col("y")).otherwise(F.col("x")).alias("dst"),
        F.when(lower_first, F.col("dy")).otherwise(F.col("dx")).alias("d_dst"),
    ).localCheckpoint()
    e1 = oriented.select(
        F.col("src").alias("u"), F.col("dst").alias("v"), F.col("d_dst").alias("dv")
    )
    e2 = oriented.select(
        F.col("src").alias("u"), F.col("dst").alias("w"), F.col("d_dst").alias("dw")
    )
    wedges = e1.join(e2, "u").filter(
        (F.col("dv") < F.col("dw"))
        | ((F.col("dv") == F.col("dw")) & (F.col("v") < F.col("w")))
    )
    closing = oriented.select(
        F.col("src").alias("v"), F.col("dst").alias("w")
    )
    tri = wedges.join(closing, ["v", "w"]).select("u", "v", "w")
    # One explode pass, not a 3-way union: each union leg re-planned
    # (and partially re-executed) the ENTIRE wedge pipeline — the
    # formatted plan carried ~95 Exchange nodes / 370 KB of tree and
    # g3 spent 5.1 s at sf0.01 mostly re-running the closing join per
    # corner leg (round-18 audit).  explode(array(u,v,w)) reads each
    # triangle row once; same (vtx, count) semantics.
    corners = tri.select(
        F.explode(F.array("u", "v", "w")).alias("vtx")
    )
    return corners.groupBy("vtx").agg(F.count("*").cast("long").alias("n_tri"))


_G3_ORACLE = """
WITH pairs AS (
  SELECT DISTINCT l1.l_suppkey AS a, l2.l_suppkey AS b
  FROM lineitem l1 JOIN lineitem l2 ON l1.l_orderkey = l2.l_orderkey
  WHERE l1.l_suppkey < l2.l_suppkey
),
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM pairs e1
  JOIN pairs e2 ON e2.a = e1.a AND e2.b > e1.b
  JOIN pairs e3 ON e3.a = e1.b AND e3.b = e2.b
),
pv AS (
  SELECT vtx, COUNT(*) AS n_tri FROM (
    SELECT x AS vtx FROM tri
    UNION ALL SELECT y FROM tri
    UNION ALL SELECT z FROM tri
  )
  GROUP BY vtx
),
tot AS (SELECT COUNT(*) AS total_triangles FROM tri)
SELECT pv.vtx AS suppkey,
       pv.n_tri,
       tot.total_triangles,
       CAST(ROW_NUMBER() OVER (ORDER BY pv.n_tri DESC, pv.vtx) AS BIGINT)
         AS rn
FROM pv, tot
ORDER BY pv.n_tri DESC, pv.vtx
LIMIT 20
"""


@query("g3_triangle_count", oracle=_G3_ORACLE, tags=("graph",))
def g3_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G3: exact triangle counting over the supplier co-fulfillment
    graph — suppliers are adjacent when they ship lineitems of the
    same order.  Triangles are the unit of clustering coefficient /
    community density, the standard graph-shape statistic next to
    components (g1/l3f) and centrality (g2).

    Edge construction is a per-order pair expansion: the self-join on
    ``l_orderkey`` fans out at most k(k-1)/2 pairs for an order with k
    distinct suppliers — k is bounded by order size (≤ 7 lineitems on
    this schema), so the expansion is O(rows), not quadratic in any
    global dimension.  The counting itself is
    :func:`triangle_count`'s degree-oriented wedge join (each
    triangle found exactly once; O(m^{3/2}) worst-case intermediate,
    the standard distributed bound).

    The oracle counts the same triangles by canonical vertex order
    (x < y < z) — a DIFFERENT single-count scheme than the Spark
    side's degree orientation, so the cell-exact hash match proves
    both enumerate the identical triangle set, not just the same
    code path twice.  ``total_triangles`` rides along as a
    broadcast scalar receipt."""
    lineitem = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    l2 = lineitem.select(
        F.col("l_orderkey").alias("r_orderkey"),
        F.col("l_suppkey").alias("r_suppkey"),
    )
    pairs = (
        lineitem.join(
            l2, lineitem["l_orderkey"] == l2["r_orderkey"]
        )
        .filter(F.col("l_suppkey") < F.col("r_suppkey"))
        .select(
            F.col("l_suppkey").alias("a"), F.col("r_suppkey").alias("b")
        )
        .distinct()
    )
    pv = triangle_count(pairs)
    total = pv.agg(
        (F.sum("n_tri") / 3).cast("long").alias("total_triangles")
    )
    w = Window.orderBy(F.col("n_tri").desc(), F.col("vtx"))
    return (
        pv.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 20)
        .crossJoin(F.broadcast(total))
        .select(
            F.col("vtx").alias("suppkey"),
            "n_tri",
            "total_triangles",
            "rn",
        )
    )


# --- G4: multi-hop BFS distances from a landmark ------------------------------


def bfs_hops(
    edges: DataFrame,
    source: int,
    src: str = "u",
    dst: str = "v",
    max_rounds: int = 20,
) -> DataFrame:
    """Single-source BFS hop distances over an undirected edge list —
    the landmark-distance primitive behind reachability features,
    "degrees of separation" analytics, and landmark-based shortest-path
    approximation (Potamias et al., CIKM 2009).

    Returns ``(id, dist)`` for every vertex REACHABLE from ``source``
    (unreachable vertices are simply absent — the caller decides how to
    treat infinity).

    Algorithm: frontier-expansion BFS.  Round d joins only the CURRENT
    frontier against the edge list and anti-joins the seen set, so each
    round's shuffle is proportional to the frontier's out-edges, not
    the whole graph — the standard distributed BFS bound of O(diameter)
    rounds over O(m) total joined rows.  ``localCheckpoint`` after
    every round cuts lineage (iterative-DataFrame hygiene, same as
    :func:`connected_components`); the convergence probe is a scalar
    ``count`` of the new frontier.  Raises if the frontier is still
    non-empty after ``max_rounds`` — a silently truncated BFS would
    return wrong (missing) distances.
    """
    # one explode pass symmetrizes without planning ``edges`` twice
    # (same rationale as connected_components)
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .select(
            F.explode(
                F.array(
                    F.struct(F.col("u"), F.col("v")),
                    F.struct(
                        F.col("v").alias("u"), F.col("u").alias("v")
                    ),
                )
            ).alias("e")
        )
        .select("e.u", "e.v")
        .distinct()
        .localCheckpoint()
    )
    spark = edges.sparkSession
    dist = spark.createDataFrame(
        [(int(source), 0)], "id long, dist long"
    ).localCheckpoint()
    frontier = dist.select("id")
    # Per-round job fold (round 19): both per-round checkpoints are
    # LAZY (eager=False cuts the plan to a LogicalRDD immediately but
    # defers materialization), so each round runs ONE action — the
    # convergence count — whose job computes the new frontier,
    # persists its blocks, materializes the previous round's deferred
    # dist union (its anti-join input), and returns the frontier size.
    # The old loop paid three eager actions per round (frontier
    # checkpoint + count + full dist re-checkpoint).  ``dist`` stays a
    # SINGLE checkpointed RDD per round — a first rewrite that kept it
    # as a lazy union of per-round legs measured SLOWER (g4 sf1 4.72 →
    # 5.58 s: the anti join re-scans every leg every round), recorded
    # in OPTIMIZATION_r19.md.  Frees are deferred one round: a lazy
    # checkpoint's inputs may not be unpersisted until the checkpoint
    # has materialized (the truncated lineage cannot recompute).
    pending: list[DataFrame] = []
    for d in range(1, max_rounds + 1):
        new = (
            frontier.join(sym, frontier["id"] == sym["u"])
            .select(F.col("v").alias("id"))
            .distinct()
            .join(dist, "id", "left_anti")
            .withColumn("dist", F.lit(d).cast("long"))
            .localCheckpoint(eager=False)
        )
        n_new = new.count()
        # the count materialized `new` and (through its anti join) the
        # previous round's dist — everything staged two rounds back is
        # now dead
        for df in pending:
            _free_ckpt(df)
        pending = []
        if n_new == 0:
            _free_ckpt(sym)
            return dist
        prev = dist
        dist = dist.unionByName(new).localCheckpoint(eager=False)
        pending = [prev, new]
        frontier = new.select("id")
    raise RuntimeError(
        f"bfs_hops: frontier still growing after {max_rounds} rounds"
    )


_G4_ORACLE = """
WITH RECURSIVE el AS (
  SELECT l_orderkey, l_suppkey FROM lineitem
  WHERE l_returnflag = 'R' AND l_quantity >= 45
),
pairs AS (
  SELECT DISTINCT a.l_suppkey AS u, b.l_suppkey AS v
  FROM el a JOIN el b ON a.l_orderkey = b.l_orderkey
  WHERE a.l_suppkey < b.l_suppkey
),
edges AS (SELECT u, v FROM pairs UNION ALL SELECT v, u FROM pairs),
verts AS (SELECT DISTINCT u FROM edges),
lm AS (SELECT MIN(u) AS s FROM verts),
reach(id, d) AS (
  SELECT s, 0 FROM lm
  UNION
  SELECT e.v, r.d + 1 FROM reach r JOIN edges e ON e.u = r.id
  WHERE r.d < 20
),
dist AS (SELECT id, MIN(d) AS dist FROM reach GROUP BY id),
unre AS (
  SELECT COUNT(*) AS n_unreached FROM verts
  WHERE u NOT IN (SELECT id FROM dist)
)
SELECT CAST(id AS BIGINT) AS suppkey,
       CAST(dist AS BIGINT) AS dist,
       CAST(n_unreached AS BIGINT) AS n_unreached
FROM dist, unre
"""


@query("g4_bfs_hops", oracle=_G4_ORACLE, tags=("graph",))
def g4_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G4: BFS hop distances from a landmark supplier over the
    SPARSIFIED co-fulfillment graph — suppliers are adjacent when they
    both ship a returned ('R') high-quantity (≥ 45) lineitem of the
    same order.  Completes the graph family's reachability axis:
    components (l3f/g1) say WHETHER two vertices connect, PageRank
    (g2) says how central they are, triangles (g3) say how clustered —
    this says HOW FAR, the primitive behind degrees-of-separation
    features and landmark-based distance sketches.

    The thresholded edge set keeps the graph genuinely multi-hop at
    fixture scale (max distance 6 at sf0.01, 9 at sf0.1 — measured,
    not assumed) instead of the diameter-2 blob the full
    co-fulfillment graph collapses to.  The landmark is the minimum
    vertex id — deterministic under any partitioning.

    The oracle recomputes the same distances via DuckDB's recursive
    CTE bounded at depth 20; the Spark loop RAISES past 20 rounds
    rather than silently truncating, so both sides agree by
    construction on any graph they both accept.  ``n_unreached`` rides
    along as a broadcast scalar receipt that isolated components are
    counted, not silently dropped (2 unreached vertices exist at
    sf0.1)."""
    lineitem = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_returnflag") == "R") & (F.col("l_quantity") >= 45)
    )
    l2 = lineitem.select(
        F.col("l_orderkey").alias("r_orderkey"),
        F.col("l_suppkey").alias("r_suppkey"),
    )
    pairs = (
        lineitem.join(l2, lineitem["l_orderkey"] == l2["r_orderkey"])
        .filter(F.col("l_suppkey") < F.col("r_suppkey"))
        .select(
            F.col("l_suppkey").alias("u"), F.col("r_suppkey").alias("v")
        )
        .distinct()
        # materialize the pair list once: THREE consumers replan it
        # otherwise (the verts union's two legs and bfs_hops' sym) —
        # each a fresh lineitem self-join (round-19 fold; the g3
        # localCheckpoint hygiene pattern)
        .localCheckpoint()
    )
    verts = (
        pairs.select(F.col("u").alias("id"))
        .union(pairs.select(F.col("v").alias("id")))
        .distinct()
        .localCheckpoint()
    )
    source = verts.agg(F.min("id")).collect()[0][0]  # scalar, metadata-sized
    if source is None:
        raise ValueError("g4_bfs_hops: empty edge set — no landmark")
    dist = bfs_hops(pairs, source)
    n_unreached = verts.join(dist, "id", "left_anti").count()
    return dist.select(
        F.col("id").alias("suppkey"),
        "dist",
        F.lit(n_unreached).cast("long").alias("n_unreached"),
    )
