"""Plan-shape regression tests (SURVEY.md §5.5).

Correctness says the answer is right; these say the PLAN is right —
the properties that decide whether the same code survives 100 TB.
"""

from __future__ import annotations

from pyspark.sql import functions as F

import update_database_by_wind_spark.operators  # noqa: F401
from update_database_by_wind_spark.plans import formatted_plan
from update_database_by_wind_spark.registry import REGISTRY
from update_database_by_wind_spark.sources import load


def test_star_join_broadcasts_dimensions(spark, sf_oracle):
    """J1: every dimension side must broadcast — a shuffled dimension
    join on a 100 TB fact table is the classic catastrophic plan."""
    plan = formatted_plan(REGISTRY["j1_star_join_revenue"].fn(spark, sf_oracle))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_flagship_pushes_filter_and_prunes_columns(spark, sf_oracle):
    """A1: the shipdate filter must reach the parquet scan and the
    scan schema must carry only the 7 referenced columns (of 11)."""
    plan = formatted_plan(REGISTRY["a1_pricing_summary"].fn(spark, sf_oracle))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    read_schema = next(
        line for line in plan.splitlines() if "ReadSchema" in line
    )
    assert "l_orderkey" not in read_schema  # unreferenced → pruned
    assert "l_quantity" in read_schema


def test_global_topk_avoids_full_sort(spark, sf_oracle):
    """O2: orderBy+limit must plan TakeOrderedAndProject (per-task
    k-row heaps), never a global sort materialization."""
    plan = formatted_plan(REGISTRY["o2_global_topk_orders"].fn(spark, sf_oracle))
    assert "TakeOrderedAndProject" in plan


def test_theta_band_join_is_hash_not_bnlj(spark, sf_oracle):
    """J6: the equi prefix must make this a hash join with a residual
    condition — BNLJ on two large sides would be O(n·m)."""
    plan = formatted_plan(REGISTRY["j6_theta_band_join"].fn(spark, sf_oracle))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_semi_anti_joins_stay_join_form(spark, sf_oracle):
    """J3/J4: EXISTS/NOT EXISTS shapes plan as semi/anti joins (no
    subquery re-execution per row)."""
    semi = formatted_plan(
        REGISTRY["j3_semi_join_active_customers"].fn(spark, sf_oracle)
    )
    anti = formatted_plan(
        REGISTRY["j4_anti_join_inactive_customers"].fn(spark, sf_oracle)
    )
    assert "LeftSemi" in semi
    assert "LeftAnti" in anti


def test_asof_join_is_single_window_no_join(spark, sf_oracle):
    """J8: the as-of rewrite must contain NO join operator at all —
    one union + one window over (key, ts), i.e. a single shuffle."""
    plan = formatted_plan(REGISTRY["j8_asof_join_last_click"].fn(spark, sf_oracle))
    assert "Window" in plan
    for join_kind in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin"):
        assert join_kind not in plan, f"unexpected {join_kind} in as-of plan"


def test_whole_stage_codegen_covers_flagship(spark, sf_oracle):
    """A1 must run inside WholeStageCodegen (no interpreted gaps —
    the decimal-sum helpers must not break codegen).  AQE only shows
    codegen spans on the FINAL plan, so execute before explaining."""
    df = REGISTRY["a1_pricing_summary"].fn(spark, sf_oracle)
    df.collect()
    plan = formatted_plan(df)
    assert "== Final Plan ==" in plan
    # formatted mode marks codegen stages with `[codegen id : N]`
    assert "[codegen id :" in plan
    # the scan, filter, project and partial aggregate must all be
    # inside codegen stages (starred operators)
    for op in ("* Filter", "* Project", "* HashAggregate"):
        assert op in plan, op


def test_cross_join_only_where_declared(spark, sf_oracle):
    """L4 is the only operator allowed a cartesian/BNLJ shape (brute-
    force scoring is its contract; L4b is the blocked alternative)."""
    for name, spec in REGISTRY.items():
        if name.startswith(("l4_", "j5_", "l3b", "l5_")) or "st" in spec.tags:
            continue
        if "streaming" in spec.tags:
            continue
        plan = formatted_plan(spec.fn(spark, sf_oracle))
        assert "CartesianProduct" not in plan, name


def test_partitioned_write_prunes_partitions(spark, sf_oracle):
    """S1b: reading the month-partitioned layout with a month filter
    must prune at the directory level (PartitionFilters on o_month),
    not scan-and-filter."""
    plan = formatted_plan(REGISTRY["s1b_partitioned_parquet"].fn(spark, sf_oracle))
    part_lines = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert part_lines, "no PartitionFilters in scan"
    assert any("o_month" in ln for ln in part_lines), part_lines
    # the data filter must NOT appear as a post-scan Filter on o_month
    assert "PushedFilters: [In(o_month" not in plan


def test_bucketed_join_avoids_shuffle(spark, sf_oracle):
    """Co-located join: both sides bucketed (8, join key) + sorted →
    SortMergeJoin with NO Exchange on either side.  This is the
    at-scale answer for repeated fact⋈fact joins on the same key:
    shuffle once at write time, never again at read time.  Broadcast
    is disabled so the test proves bucketing, not dim broadcasting."""
    old_thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        old_aqe_thr = spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold")
    except Exception:
        old_aqe_thr = None
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        (
            load(spark, sf_oracle, "orders")
            .select("o_orderkey", "o_custkey", "o_totalprice")
            .write.mode("overwrite")
            .bucketBy(8, "o_custkey")
            .sortBy("o_custkey")
            .saveAsTable("b_orders")
        )
        (
            load(spark, sf_oracle, "customer")
            .select("c_custkey", "c_mktsegment")
            .write.mode("overwrite")
            .bucketBy(8, "c_custkey")
            .sortBy("c_custkey")
            .saveAsTable("b_customer")
        )
        joined = spark.table("b_orders").join(
            spark.table("b_customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        plan = formatted_plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed join still shuffles"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thr)
        if old_aqe_thr is not None:
            spark.conf.set(
                "spark.sql.adaptive.autoBroadcastJoinThreshold", old_aqe_thr
            )
        else:
            spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")


def test_scan_partition_sizing_conf(spark):
    """Session factory pins shuffle partitions + AQE coalescing so
    small inputs don't fan out to 200 empty tasks."""
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert int(spark.conf.get("spark.sql.shuffle.partitions")) <= 64


def test_compaction_reduces_file_count(spark, sf_oracle, tmp_path):
    """U7 structural check: 64 fragment files compact to exactly 4
    part files with identical row count."""
    import glob

    li = load(spark, sf_oracle, "lineitem").limit(5000)
    frag, comp = str(tmp_path / "frag"), str(tmp_path / "comp")
    li.repartition(64).write.mode("overwrite").parquet(frag)
    spark.read.parquet(frag).repartition(4).write.mode("overwrite").parquet(comp)
    n_frag = len(glob.glob(f"{frag}/part-*"))
    n_comp = len(glob.glob(f"{comp}/part-*"))
    assert n_frag == 64 and n_comp == 4, (n_frag, n_comp)
    assert spark.read.parquet(comp).count() == li.count()


def test_tpch_depth_shapes_broadcast_and_take_ordered(spark, sf_oracle):
    """Q5/Q10/Q18: all dimensions broadcast (single fact-fact shuffle
    is the only exchange-worthy join) and Q10's LIMIT plans as
    TakeOrderedAndProject, not a global sort."""
    q5 = formatted_plan(REGISTRY["q5_local_supplier_volume"].fn(spark, sf_oracle))
    assert "BroadcastHashJoin" in q5
    assert "CartesianProduct" not in q5
    assert "BroadcastNestedLoopJoin" not in q5
    q10 = formatted_plan(REGISTRY["q10_returned_item_revenue"].fn(spark, sf_oracle))
    assert "TakeOrderedAndProject" in q10
    q18 = formatted_plan(REGISTRY["q18_large_volume_orders"].fn(spark, sf_oracle))
    assert "BroadcastHashJoin" in q18


def test_q14_pushes_shipdate_filter(spark, sf_oracle):
    """Q14: the one-month shipdate filter must reach the parquet scan."""
    plan = formatted_plan(REGISTRY["q14_promo_revenue"].fn(spark, sf_oracle))
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan


def test_chunk_dedup_is_join_free_single_scan(spark, sf_oracle):
    """L3j: the occurrence count and the doc posting list must come out
    of ONE groupBy — a join of the chunk stream against a separately
    aggregated count table either broadcasts a corpus-sized build side
    or recomputes the chunking under a second exchange (both observed
    before the fix).  Invariants: no join operator of any kind, exactly
    one parquet scan, and the wide shuffle keys on the int64 chunk
    hash, not the chunk text."""
    plan = formatted_plan(REGISTRY["l3j_chunk_dedup"].fn(spark, sf_oracle))
    for join_kind in (
        "SortMergeJoin",
        "BroadcastHashJoin",
        "ShuffledHashJoin",
        "CartesianProduct",
        "BroadcastNestedLoopJoin",
    ):
        assert join_kind not in plan, f"unexpected {join_kind} in l3j plan"
    # formatted mode prints each scan twice (tree + detail block); the
    # detail block's Location line appears once per distinct scan node
    assert plan.count("Location: InMemoryFileIndex") == 1, (
        "chunking computed twice"
    )
    assert "xxhash64(chunk_text" in plan  # hashed before the exchange
    assert "hashpartitioning(h#" in plan  # shuffle keys on the hash


def test_domain_cap_hot_branch_broadcasts_and_topk_avoids_sort(
    spark, sf_oracle
):
    """TRcap (L23): the hot-source list must BROADCAST onto the corpus
    (it is bounded by the domain count, a shuffled join would move the
    whole corpus twice) and there must be no cartesian/BNLJ anywhere."""
    plan = formatted_plan(REGISTRY["tr_domain_cap"].fn(spark, sf_oracle))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bpe_pair_counts_aggregates_before_pair_explode(spark, sf_oracle):
    """Tbpe (L24): the vocabulary groupBy must sit BELOW the pair
    explode in the plan — exploding character pairs over raw documents
    (corpus-sized) instead of the vocabulary (Heaps-law bounded) is the
    scale mistake this operator exists to avoid.  Also: the final
    top-20 must be a TakeOrderedAndProject, not a global sort."""
    plan = formatted_plan(REGISTRY["t_bpe_pair_counts"].fn(spark, sf_oracle))
    assert "TakeOrderedAndProject" in plan
    # the explode (Generate) must consume the aggregated vocab, i.e.
    # appear ABOVE at least one HashAggregate in the formatted tree
    lines = plan.splitlines()
    gen_idx = [i for i, l in enumerate(lines) if "Generate" in l]
    agg_idx = [i for i, l in enumerate(lines) if "HashAggregate" in l]
    assert gen_idx and agg_idx
    # formatted_plan prints operators root-first: a Generate feeding on
    # an aggregate output has a HashAggregate listed after it (deeper)
    assert any(a > min(gen_idx) for a in agg_idx), plan


def test_shuffle_shard_is_single_exchange(spark, sf_oracle):
    """TRshard (L22): one hash exchange on `shard` feeds the per-shard
    rank — a second data-sized exchange (e.g. a global sort) would
    double the shuffle volume of every training-order write."""
    import re

    plan = formatted_plan(REGISTRY["tr_shuffle_shard"].fn(spark, sf_oracle))
    exchanges = re.findall(r"^\(\d+\) Exchange", plan, flags=re.M)
    assert len(exchanges) == 1, plan
    assert "hashpartitioning(shard" in plan
    assert "rangepartitioning" not in plan


def test_zorder_write_tightens_file_stats(spark, sf_oracle, tmp_path):
    """S10: the point of the Morton key is FILE-LEVEL data skipping —
    after a z-sorted ``repartitionByRange`` write, every file's parquet
    footer must carry a custkey min/max much tighter than the global
    domain (a date-sorted layout leaves custkey spans at ~full domain,
    so customer-scoped scans prune nothing)."""
    import glob

    import pyarrow.parquet as pq

    from update_database_by_wind_spark.operators.storage import zorder_value

    base = load(spark, sf_oracle, "orders").select(
        "o_custkey",
        F.datediff(
            F.col("o_orderdate"), F.lit("1992-01-01").cast("date")
        ).alias("d"),
    )
    # boundary pass: normalize both dims to 16 bits (metadata-sized)
    mx = base.agg(
        F.max("o_custkey").alias("xm"), F.max("d").alias("ym")
    ).first()
    z = base.select(
        "o_custkey",
        "d",
        F.expr(f"(o_custkey * 65536) div ({mx.xm} + 1)").alias("xn"),
        F.expr(f"(d * 65536) div ({mx.ym} + 1)").alias("yn"),
    ).withColumn("zval", zorder_value("xn", "yn"))
    zdir, ddir = str(tmp_path / "z"), str(tmp_path / "bydate")
    (
        z.repartitionByRange(16, "zval")
        .sortWithinPartitions("zval")
        .write.parquet(zdir)
    )
    (
        z.repartitionByRange(16, "d")
        .sortWithinPartitions("d")
        .write.parquet(ddir)
    )

    def custkey_spans(d: str) -> list[int]:
        spans = []
        for f in glob.glob(d + "/*.parquet"):
            md = pq.ParquetFile(f).metadata
            idx = md.schema.to_arrow_schema().get_field_index("o_custkey")
            lo = min(
                md.row_group(rg).column(idx).statistics.min
                for rg in range(md.num_row_groups)
            )
            hi = max(
                md.row_group(rg).column(idx).statistics.max
                for rg in range(md.num_row_groups)
            )
            spans.append(hi - lo)
        return spans

    z_spans, d_spans = custkey_spans(zdir), custkey_spans(ddir)
    assert len(z_spans) >= 4 and len(d_spans) >= 4
    z_avg = sum(z_spans) / len(z_spans)
    d_avg = sum(d_spans) / len(d_spans)
    # date-sorted files see the whole customer domain; z-sorted files
    # must cut the span at least in half (measured: ~8x tighter)
    assert z_avg < 0.5 * d_avg, (z_avg, d_avg)


def test_bloom_prefilter_joins_all_broadcast(spark, sf_oracle):
    """J12: all four lookups (3 Bloom positions + the exact-truth semi
    check) must be BroadcastHashJoins — the probe side (the 100 TB
    fact) must never shuffle for a filter whose whole point is
    avoiding a shuffle."""
    plan = formatted_plan(REGISTRY["j12_bloom_prefilter"].fn(spark, sf_oracle))
    assert plan.count("BroadcastHashJoin") >= 4, plan
    for bad in ("SortMergeJoin", "ShuffledHashJoin", "CartesianProduct"):
        assert bad not in plan, bad


def test_dynamic_partition_pruning_on_partitioned_join(spark, sf_oracle, tmp_path):
    """DPP (SURVEY §4.1): joining the hive-partitioned fact layout to a
    dim filtered on a NON-join column must inject a runtime
    DynamicPruningExpression into the fact scan's PartitionFilters —
    the matching months are only known after the dim filter runs, so
    static pruning (s1b's receipt) cannot help, and without DPP the
    100 TB fact side lists every partition directory.  The filter is
    on the dim's count column (not the month) precisely so Catalyst
    cannot constant-propagate an IN list across the join."""
    orders = load(spark, sf_oracle, "orders").withColumn(
        "o_month", F.date_format("o_orderdate", "yyyy-MM")
    )
    fact_dir, dim_dir = str(tmp_path / "fact"), str(tmp_path / "dim")
    orders.write.partitionBy("o_month").parquet(fact_dir)
    orders.groupBy("o_month").agg(F.count("*").alias("n")).write.parquet(
        dim_dir
    )
    fact = spark.read.parquet(fact_dir)
    sel = (
        spark.read.parquet(dim_dir)
        .filter(F.col("n") % 2 == 0)
        .select("o_month")
    )
    joined = fact.join(sel, "o_month").groupBy("o_month").agg(
        F.count("*").alias("cnt")
    )
    plan = formatted_plan(joined)
    part_lines = [
        ln for ln in plan.splitlines() if "PartitionFilters" in ln
    ]
    assert any(
        "dynamicpruningexpression" in ln.lower() for ln in part_lines
    ), plan
    # and the S11 registry query (same shape over its scratch layout)
    # must plan the same runtime filter
    s11 = formatted_plan(REGISTRY["s11_dpp_join"].fn(spark, sf_oracle))
    assert "dynamicpruningexpression" in s11.lower(), s11


def test_event_funnel_is_single_exchange(spark, sf_oracle):
    """E1: the chained-window funnel must shuffle the events ONCE on
    user_id — the whole point of the window formulation over the
    three-round aggregate+join chain the oracle uses."""
    import re

    plan = formatted_plan(REGISTRY["e1_event_funnel"].fn(spark, sf_oracle))
    exchanges = [
        ln
        for ln in plan.splitlines()
        if re.match(r"^\(\d+\) Exchange", ln)
    ]
    # one hash exchange for the user window; the final 3-row union of
    # 1-row aggregates may add SinglePartition exchanges (metadata-
    # sized) — no second data-sized hash exchange is allowed
    hash_ex = [
        ln for ln in plan.splitlines() if "hashpartitioning(user_id" in ln
    ]
    assert len(hash_ex) >= 1
    assert plan.count("hashpartitioning(user_id") <= 2, plan  # tree+detail


def test_heavy_hitters_candidates_broadcast_not_shuffled_fact(spark, sf_oracle):
    """A15: the exact pass must BROADCAST the candidate set into the
    semi-join (candidates are O(C x partitions) rows — shuffling the
    fact side against them would be the wrong plan at 100 TB), and the
    only nested-loop join is the declared 1-row scalar crossJoin."""
    import re

    plan = formatted_plan(REGISTRY["a15_heavy_hitters"].fn(spark, sf_oracle))
    assert "BroadcastHashJoin" in plan
    assert "MapInPandas" in plan
    assert "CartesianProduct" not in plan
    # formatted mode lists each node twice (tree + detail): count ids
    bnlj = set(re.findall(r"\((\d+)\) BroadcastNestedLoopJoin", plan))
    assert len(bnlj) == 1, plan  # the 1-row scalar crossJoin only


def test_weighted_sample_pushes_group_limit(spark, sf_oracle):
    """L26: rank-within-group top-k must plan WindowGroupLimit on BOTH
    sides of the exchange (partial per-task top-k before the shuffle,
    final after) — the property that keeps the full corpus from ever
    sorting."""
    import re

    plan = formatted_plan(REGISTRY["tr_weighted_sample"].fn(spark, sf_oracle))
    nodes = set(re.findall(r"\((\d+)\) WindowGroupLimit", plan))
    assert len(nodes) >= 2, plan  # partial (per-task) AND final


def test_interval_concurrency_single_scan(spark, sf_oracle):
    """E2: the boundary-delta construction must NOT duplicate the
    session aggregation subtree — exactly one events scan (the union
    formulation planned two scans + two shuffles of events; the
    explode formulation is the fix)."""
    import re

    plan = formatted_plan(
        REGISTRY["e2_interval_concurrency"].fn(spark, sf_oracle)
    )
    scans = set(re.findall(r"\((\d+)\) Scan parquet", plan))
    assert len(scans) == 1, plan


def test_ivm_delta_joins_broadcast_dimension(spark, sf_oracle):
    """U16: both the view build and the delta maintenance must
    broadcast the customer dimension (the delta side is batch-sized;
    shuffling fact or delta against a shuffled dim would not survive
    scale), with no cartesian shapes."""
    import re

    plan = formatted_plan(
        REGISTRY["u16_join_view_maintenance"].fn(spark, sf_oracle)
    )
    bhj = set(re.findall(r"\((\d+)\) BroadcastHashJoin", plan))
    assert len(bhj) >= 2, plan  # view build AND delta leg
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_mor_read_anti_join_is_broadcast(spark, tmp_path):
    """U18: the deletion-vector anti-join must broadcast the vector
    side — the data scan never shuffles to apply tombstones (the MOR
    read-path premise at 100 TB: vectors are keys-only and tiny next
    to the data)."""
    import re

    from pyspark.sql import functions as F

    from update_database_by_wind_spark.operators.update_pipeline import (
        mor_delete,
        mor_read,
    )

    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "b", 30)],
        "pk long, m string, val long",
    )
    df.repartition(F.col("m")).write.partitionBy("m").parquet(path)
    mor_delete(spark, path, F.col("pk") == 2, "m", "pk")
    plan = formatted_plan(mor_read(spark, path, "m", "pk"))
    bhj = set(re.findall(r"\((\d+)\) BroadcastHashJoin", plan))
    assert len(bhj) == 1, plan
    assert "LeftAnti" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_o7_both_topk_legs_are_take_ordered(spark, sf_oracle):
    """O7's claim is that neither the summary leg nor the maintained
    leg materializes a global sort — both must plan as
    TakeOrderedAndProject, and no Sort+Exchange pair may appear."""
    plan = formatted_plan(REGISTRY["o7_incremental_topk"].fn(spark, sf_oracle))
    assert "TakeOrderedAndProject" in plan, plan
    assert "GlobalLimit" not in plan or "TakeOrderedAndProject" in plan


def test_a17_counter_join_broadcasts(spark, sf_oracle):
    """A17's probe-side estimate joins the ≤192-row counter table —
    that join must broadcast (a shuffle there would defeat the point
    of a sketch)."""
    plan = formatted_plan(REGISTRY["a17_countmin_sketch"].fn(spark, sf_oracle))
    assert "BroadcastHashJoin" in plan, plan


def test_w10_runs_single_hash_exchange(spark, sf_oracle):
    """W10: the change-point formulation exists to keep ONE data-sized
    hash exchange — both windows and the run aggregate share the
    user_id partitioning.  The two-row_number alternative would add a
    (user_id, event_type) exchange; catch any regression toward it."""
    plan = formatted_plan(REGISTRY["w10_event_runs"].fn(spark, sf_oracle))
    assert "hashpartitioning(user_id" in plan
    assert "hashpartitioning(user_id, event_type" not in plan, (
        "run aggregate re-partitioned by (user, type) — second shuffle"
    )
    # rangepartitioning is only the final presentation sort
    n_hash = sum(
        1
        for ln in plan.splitlines()
        if "Exchange hashpartitioning" in ln
    )
    assert n_hash <= 2, plan  # tree node + its detail block


def test_a19_register_build_map_side_combines(spark, sf_oracle):
    """A19: the grouped-HLL register build must plan a PARTIAL
    aggregate (max(rho) combined map-side to |groups|*64 rows per
    task) before the exchange — the property that makes the sketch
    shuffle state instead of keys."""
    plan = formatted_plan(REGISTRY["a19_grouped_hll"].fn(spark, sf_oracle))
    assert "partial_max(rho" in plan, plan


def test_e4_single_data_sized_exchange(spark, sf_oracle):
    """E4: the LEAD window's user_id hash partitioning must be the
    only data-sized exchange; the pair count must partial-aggregate
    (map-side combine to ≤ |types|² rows per task) before its own
    exchange — the property that keeps the transition matrix cheap
    at any event volume."""
    plan = formatted_plan(
        REGISTRY["e4_transition_matrix"].fn(spark, sf_oracle)
    )
    assert "hashpartitioning(user_id" in plan
    assert "partial_count" in plan, plan


def test_j13_bin_join_plans_no_nested_loop(spark, sf_oracle):
    """J13: the bin rewrite exists to turn the interval inequality
    join into a shuffled/broadcast EQUI join — a nested-loop or
    cartesian anywhere means the rewrite regressed to the plan it
    was built to avoid.  (The query also raises in-query; this pins
    it at test time without executing the pipeline.)"""
    plan = formatted_plan(
        REGISTRY["j13_interval_bin_join"].fn(spark, sf_oracle)
    )
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "Join" in plan


def test_j13_sessionization_windows_are_chunk_partitioned(spark, sf_oracle):
    """J13 (round-12 fix): the incident-detection prefix must
    sessionize the raw error stream under CHUNK-partitioned windows;
    the only unpartitioned window allowed is the pass-2 edge-run merge,
    which orders run-level start_us at calendar cardinality.  A
    windowspec ordering t_us with no partition column means the prefix
    regressed to the global single-partition sort."""
    import re

    from update_database_by_wind_spark.plans.explain import optimized_plan

    op = optimized_plan(REGISTRY["j13_interval_bin_join"].fn(spark, sf_oracle))
    specs = set(re.findall(r"windowspecdefinition\([^)]*", op))
    assert any("windowspecdefinition(chunk" in s for s in specs), specs
    for s in specs:
        head = s.removeprefix("windowspecdefinition(")
        if head.startswith("chunk"):
            continue  # raw-stream pass: partitioned — good
        assert head.startswith("start_us"), s  # merge pass only


def test_l3n_blocking_join_is_equi_on_block_keys(spark, sf_oracle):
    """L3n: candidate generation must be an equi self-join on the
    block key (16-char prefix/suffix), never an all-pairs text
    comparison — the declared-blocking contract that bounds the
    quadratic Levenshtein to cap²/2 pairs per block."""
    plan = formatted_plan(
        REGISTRY["l3n_edit_distance_blocked"].fn(spark, sf_oracle)
    )
    assert "CartesianProduct" not in plan, plan
    assert "levenshtein" in plan


def test_e5_o8_rank_rewrite_has_no_single_partition_exchange(
    spark, sf_oracle
):
    """E5/O8 (round-12 fix): the quintile scores and the descending
    running revenue sum must come from BUCKET-partitioned windows
    (functions/ranks.py) — an Exchange SinglePartition anywhere means
    the plan regressed to the global-sort window the rewrite replaced,
    the round-11 verdict's scale-`weak` shape."""
    for name in ("e5_rfm_segmentation", "o8_pareto_concentration"):
        plan = formatted_plan(REGISTRY[name].fn(spark, sf_oracle))
        # formatted mode prints the exchange argument on its own
        # Arguments: line, so grep the bare token, not the tree label
        assert "SinglePartition" not in plan, (name, plan)
        # the ranks really do come from windows (bucket-partitioned)
        assert "row_number()" in plan, (name, plan)


def test_rank_filter_topk_compiles_to_take_ordered(spark, sf_oracle):
    """Round-12 window audit: the rank+filter<=k sites (g2/g3 top-20,
    a17/st18 probe-12, t_oov vocabulary) rely on Spark rewriting
    row_number-over-unpartitioned-window + filter into
    Limit+Sort (physical TakeOrderedAndProject), so the global window
    only ever sees <= k rows.  Pin the rewrite on one representative
    per family — if a Spark upgrade or a refactor (e.g. an expression
    between the window and the filter that defeats the pattern match)
    regresses it, this fails rather than shipping a data-sized
    single-partition sort."""
    for name in ("g2_pagerank", "a17_countmin_sketch"):
        plan = formatted_plan(REGISTRY[name].fn(spark, sf_oracle))
        assert "TakeOrderedAndProject" in plan, (name, plan)


def test_forward_fill_smells_are_the_declared_scalar_shapes(spark, sf_oracle):
    """W5 (round-13 window-leader audit): the plan's only
    BroadcastNestedLoopJoin is the declared 1-row bounds crossJoin
    (global min/max day broadcast against the bounded user set), and
    its only SinglePartition exchange is that scalar aggregate's
    final merge of map-side partials — both metadata-sized by
    construction.  The data-sized spine ⋈ daily join must be a hash
    join (asserted by the BNLJ count: a second nested loop would be
    the forbidden shape), and the fill window partitions by user."""
    import re

    plan = formatted_plan(REGISTRY["w5_forward_fill"].fn(spark, sf_oracle))
    assert "CartesianProduct" not in plan
    bnlj = set(re.findall(r"\((\d+)\) BroadcastNestedLoopJoin", plan))
    assert len(bnlj) == 1, plan  # the 1-row bounds crossJoin only
    sp = [ln for ln in plan.splitlines() if "SinglePartition" in ln]
    assert len(sp) == 1, plan  # the scalar agg's final merge only
    assert "hashpartitioning(user_id" in plan  # the fill window's spec


def test_scoped_vector_read_is_partition_pruned(spark, tmp_path):
    """mor_compact_seq's scoped fold filters the vector aggregate on
    the partition column AFTER _read_vectors_seq's groupBy — safe only
    because Catalyst pushes the filter through the alias and the
    aggregate down to the scan as a PartitionFilter, so a scoped
    nightly pass reads only the scoped _deletes subdirs, not the whole
    tombstone store (round-15 review adjudication: verified here
    rather than restructured).  If an expression between the filter
    and the scan ever defeats the pushdown, this fails instead of
    silently turning scoped maintenance into a full vector sweep."""
    import os

    from pyspark.sql import functions as F

    dels = os.path.join(str(tmp_path), "_deletes")
    spark.createDataFrame(
        [("a", 1, 5), ("b", 2, 6), ("c", 3, 7)],
        "m string, pk long, __seq long",
    ).write.partitionBy("m").parquet(dels)
    agg = (
        spark.read.parquet(dels)
        .groupBy(F.col("m").alias("__dv_p"), F.col("pk").alias("__dv_k"))
        .agg(F.max("__seq").alias("__dv_seq"))
        .filter(F.col("__dv_p").isin(["a"]))
    )
    plan = formatted_plan(agg)
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and "m" in pf[0] and "a" in pf[0], plan
