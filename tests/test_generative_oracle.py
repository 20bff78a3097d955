"""Generative differential testing (SURVEY.md §5 upgrade): hypothesis
builds arbitrary corpora, writes them as fixture-shaped parquet, and
runs the REAL registry query against its REAL DuckDB oracle on that
input — so the oracle equivalence is proven on adversarial data, not
just on the driver's fixtures.  Collision-rich vocab (few distinct
tokens) forces duplicate texts, shared shingles, and split ties.
"""

from __future__ import annotations

import os
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from oracle_harness import compare, run_oracle

import update_database_by_wind_spark.operators  # noqa: F401 — registers queries
from update_database_by_wind_spark.registry import REGISTRY

_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_VOCAB = ["a", "b", "ab", "ba", "x", "yz"]

_DOCS = st.lists(
    st.tuples(
        st.lists(st.sampled_from(_VOCAB), min_size=0, max_size=12),  # tokens
        st.sampled_from(["en", "de"]),
        st.sampled_from(["web", "book"]),
    ),
    min_size=0,
    max_size=15,
)


def _write_documents(docs) -> str:
    """Write a fixture-shaped documents.parquet into a fresh sf_dir."""
    sf_dir = tempfile.mkdtemp(prefix="wind_spark_gen_")
    texts = [" ".join(toks) for toks, _, _ in docs]
    table = pa.table(
        {
            "doc_id": pa.array(range(len(docs)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array([lang for _, lang, _ in docs], pa.string()),
            "source": pa.array([src for _, _, src in docs], pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(table, os.path.join(sf_dir, "documents.parquet"))
    return sf_dir


@pytest.mark.parametrize(
    "name",
    [
        "l1_exact_dedup",
        "l2_hash_dedup",
        "l3a_near_dup_signatures",
        "l3e_ngram_jaccard",
        "l7_word_frequency",
        "l8_tfidf_top_terms",
        "l9_lexicon_sentiment",
        "l11_quality_filter",
        "t_token_count",
        "t_language_id",
        "t_fingerprint",
        "t_quality_score",
        "tr_hash_split",
        "tr_decontamination",
        "tr_stratified_sample",
        "t_repetition_ratio",
        "t_redact_blocklist",
        "f_hash_functions",
        # graph dedup + portable fingerprints: empty texts exercise the
        # l3h ascii('')≠unicode('') guard, collision-rich vocab forces
        # multi-hop duplicate chains through connected components
        "l3d_simhash",
        "l3f_dup_clusters",
        "l3g_cluster_dedup_keep",
        "l3h_portable_minhash",
        # round-4 additions: passage-level dedup (chunk boundary cases —
        # docs shorter than one chunk, collision-rich repeated chunks)
        # and the stratum-count mix reweighting
        "l3j_chunk_dedup",
        "tr_mix_weights",
        "tr_token_budget",
        "l2b_canonical_dedup",
        # multimodal surface on adversarial text payloads: empty docs
        # must expand to ZERO chunks (sequence(0,-1) descends — caught
        # here) and decode byte features must match ascii() on the
        # ASCII-vocab corpus
        "mm_binary_decode",
        "mm_chunk_expansion",
        # round-6 resize leg: empty payloads take the stride-0 sentinel,
        # 1-char docs resize to themselves, and ≥64-char docs hit
        # stride > 1 with a ragged final sample
        "mm_resize_downsample",
        # round-5: incremental LSH index maintenance — tiny collision-
        # rich corpora make %7 edits and %13 inserts near-duplicate
        # each other, exercising the changed×all candidate restriction
        # and the truncated-old-text edge (docs shorter than the
        # 10-char edit suffix)
        "l3k_incremental_index",
        # round-5 training-pipeline trio: shuffle-shard order must be
        # engine-identical on any corpus (incl. empty), BPE pair
        # counting must agree on 1-char words (no pairs) and on the
        # weighted tie-breaks of this collision-rich vocab, domain cap
        # runs here in its all-under-cap regime (the hot path gets its
        # own low-cap test below)
        "tr_shuffle_shard",
        "tr_domain_cap",
        "t_bpe_pair_counts",
        # unigram-LM scoring: collision-rich vocab gives extreme
        # smoothed probabilities; empty corpora must yield zero rows
        # through the null normalizing scalars identically
        "t_unigram_logprob",
    ],
)
@given(docs=_DOCS)
@settings(**_SETTINGS)
def test_query_matches_oracle_on_generated_corpus(spark, name, docs):
    sf_dir = _write_documents(docs)
    spec = REGISTRY[name]
    problems = compare(spec.fn(spark, sf_dir), run_oracle(spec.oracle, sf_dir))
    assert not problems, (name, problems)


# --- l3e stop-shingle cap: corpora engineered to trip the df cap -------------

_HOT_TOKS = st.lists(
    st.lists(st.sampled_from(_VOCAB), min_size=0, max_size=8),
    min_size=25,
    max_size=35,
)


@given(tok_lists=_HOT_TOKS)
@settings(**_SETTINGS)
def test_l3e_cap_active_matches_oracle(spark, tok_lists):
    """Every generated doc carries an injected boilerplate trigram with
    df ≥ 25 > cap(20), so the stop-shingle filter is ACTIVE — the plan
    and the oracle must agree on the capped semantics, not just on
    corpora where the cap is a no-op."""
    docs = [
        (toks + ["hotx", "hoty", "hotz"], "en", "web") for toks in tok_lists
    ]
    sf_dir = _write_documents(docs)
    spec = REGISTRY["l3e_ngram_jaccard"]
    problems = compare(spec.fn(spark, sf_dir), run_oracle(spec.oracle, sf_dir))
    assert not problems, problems


def test_l3e_cap_drops_boilerplate_only_pairs(spark):
    """Docs that share ONLY a hot boilerplate shingle must produce no
    pair; genuine near-dups must survive the cap."""
    docs = [
        ([f"u{i}", f"t{i}", f"w{i}", "terms", "of", "service"], "en", "web")
        for i in range(30)  # df("terms of service") = 30 > cap
    ]
    docs.append((["alpha", "beta", "gamma", "delta", "eps"], "en", "web"))
    docs.append((["alpha", "beta", "gamma", "delta", "zeta"], "en", "web"))
    sf_dir = _write_documents(docs)
    spec = REGISTRY["l3e_ngram_jaccard"]
    problems = compare(spec.fn(spark, sf_dir), run_oracle(spec.oracle, sf_dir))
    assert not problems, problems
    pairs = {
        (r.doc_a, r.doc_b) for r in spec.fn(spark, sf_dir).collect()
    }
    assert pairs == {(30, 31)}, pairs


@given(tok_lists=_HOT_TOKS)
@settings(**_SETTINGS)
def test_l3e_two_pass_matches_oracle_on_hot_shingle(spark, tok_lists):
    """The ``two_pass=True`` escape hatch (count-first + broadcast
    anti-join, aggregation buffers bounded by the cap instead of by a
    hot shingle's full df) must reproduce the capped semantics of the
    one-pass plan — proven against the SAME DuckDB oracle on corpora
    where every doc carries an injected boilerplate trigram with
    df ≥ 25 ≫ cap(20), i.e. where the hot-set anti-join is active."""
    from update_database_by_wind_spark.operators.dedup import (
        _L3E_ORACLE,
        ngram_jaccard_pairs,
    )
    from update_database_by_wind_spark.sources import load

    docs = [
        (toks + ["hotx", "hoty", "hotz"], "en", "web") for toks in tok_lists
    ]
    sf_dir = _write_documents(docs)
    res = ngram_jaccard_pairs(
        load(spark, sf_dir, "documents"), two_pass=True
    )
    problems = compare(res, run_oracle(_L3E_ORACLE, sf_dir))
    assert not problems, problems


def test_l3e_two_pass_extreme_df_boilerplate(spark):
    """Deterministic worst case for the one-pass buffer bound: a
    boilerplate shingle present in EVERY one of 60 docs (df = 60, 3×
    the cap).  two_pass must (a) drop the boilerplate-only pairs,
    (b) keep the genuine near-dup pair, and (c) agree cell-exactly
    with both the oracle and the one-pass plan."""
    from update_database_by_wind_spark.operators.dedup import (
        _L3E_ORACLE,
        ngram_jaccard_pairs,
    )
    from update_database_by_wind_spark.sources import load

    docs = [
        ([f"u{i}", f"t{i}", f"w{i}", "terms", "of", "service"], "en", "web")
        for i in range(60)
    ]
    docs.append((["alpha", "beta", "gamma", "delta", "eps"], "en", "web"))
    docs.append((["alpha", "beta", "gamma", "delta", "zeta"], "en", "web"))
    sf_dir = _write_documents(docs)
    loaded = load(spark, sf_dir, "documents")
    two = ngram_jaccard_pairs(loaded, two_pass=True)
    problems = compare(two, run_oracle(_L3E_ORACLE, sf_dir))
    assert not problems, problems
    got_two = {(r.doc_a, r.doc_b) for r in two.collect()}
    got_one = {
        (r.doc_a, r.doc_b)
        for r in ngram_jaccard_pairs(loaded, two_pass=False).collect()
    }
    assert got_two == got_one == {(60, 61)}, (got_two, got_one)


# --- events corpus: timestamp-heavy paths (lag, RANGE frames, as-of) ----------

_BASE_US = 1_704_067_200_000_000  # 2024-01-01 00:00:00 UTC in microseconds

_EVENTS = st.lists(
    st.tuples(
        st.integers(0, 50_000),  # minutes offset (spans ~35 days)
        st.integers(0, 3),  # user_id
        st.sampled_from(["click", "view", "purchase", "signup", "error"]),
        st.integers(0, 9_999),  # value in cents → exact 2-decimal double
        st.integers(0, 9),  # props k
    ),
    min_size=0,
    max_size=25,
)


def _write_events(events) -> str:
    sf_dir = tempfile.mkdtemp(prefix="wind_spark_gen_ev_")
    table = pa.table(
        {
            "event_id": pa.array(range(len(events)), pa.int64()),
            # TIMESTAMP(NANOS) like the fixture: Spark reads it via the
            # nanosAsLong path in sources/tables.py, DuckDB as naive
            # TIMESTAMP_NS — the exact engine-pair shape of the corpus
            "ts": pa.array(
                [(_BASE_US + m * 60_000_000) * 1000 for m, *_ in events],
                pa.timestamp("ns"),
            ),
            "user_id": pa.array([u for _, u, *_ in events], pa.int64()),
            "event_type": pa.array([t for _, _, t, *_ in events], pa.string()),
            "value": pa.array([c / 100 for *_, c, _ in events], pa.float64()),
            "props": pa.array([f'{{"k": {k}}}' for *_, k in events], pa.string()),
        }
    )
    pq.write_table(table, os.path.join(sf_dir, "events.parquet"))
    return sf_dir


@pytest.mark.parametrize(
    "name",
    [
        "w2_lag_daily_returns",
        "w3_moving_average",
        "w3b_time_range_rolling",
        "w5_forward_fill",
        "j7_range_join_daily_windows",
        "j8_asof_join_last_click",
        "j8b_asof_join_pandas",
        "ts_sessionize_batch",
        "ts_resample_monthly_ohlc",
        "f_json_extraction",
        "ts_rsi",
        "ts_max_drawdown",
        "ts_vwap",
        "ts_ewma",
        "w8_value_window_family",
        "u3_scd2_history",
    ],
)
@given(events=_EVENTS)
@settings(**_SETTINGS)
def test_query_matches_oracle_on_generated_events(spark, name, events):
    sf_dir = _write_events(events)
    spec = REGISTRY[name]
    problems = compare(spec.fn(spark, sf_dir), run_oracle(spec.oracle, sf_dir))
    assert not problems, (name, problems)


# --- orders/customer/supplier corpus: windows, scalars, set ops, updates ------
# Tie-rich prices (8 distinct values) force rank/dedup/top-k tie handling;
# custkeys deliberately include values absent from customer (outer-join
# edges); acctbal spans negative/zero.  The constant nation/region
# dimensions are copied from the sf0.001 fixture, like TPC-H's fixed dims.

_TIE_PRICES = [0.0, 101.25, 101.25, 987.5, 987.5, 1500.0, 33333.33, 250.125]

_ORDERS = st.lists(
    st.tuples(
        st.integers(0, 9),  # o_custkey — customer has ≤ 8 rows → anti edges
        st.sampled_from(["O", "F", "P"]),
        st.sampled_from(_TIE_PRICES),
        st.integers(0, 1500),  # days offset from 1996-01-01
        st.sampled_from(
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
        ),
    ),
    min_size=0,
    max_size=20,
)

_CUSTOMERS = st.lists(
    st.tuples(
        st.integers(0, 3),  # c_nationkey (fixture nation has ≥ 4 rows)
        st.sampled_from([-99999, -1, 0, 1, 123456, 778899]),  # acctbal cents
        st.sampled_from(["BUILDING", "AUTOMOBILE", "MACHINERY"]),
    ),
    min_size=0,
    max_size=8,
)

_SUPPLIERS = st.lists(
    st.tuples(
        st.integers(0, 3),
        st.sampled_from([-99999, 0, 123456, 778899]),  # overlaps customer
    ),
    min_size=0,
    max_size=6,
)

_BASE_DAY_MS = 820_454_400_000  # 1996-01-01 00:00:00 UTC in milliseconds


def _write_orders(orders, customers, suppliers) -> str:
    import shutil

    sf_dir = tempfile.mkdtemp(prefix="wind_spark_gen_ord_")
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(range(len(orders)), pa.int64()),
                "o_custkey": pa.array([c for c, *_ in orders], pa.int64()),
                "o_orderstatus": pa.array(
                    [s for _, s, *_ in orders], pa.string()
                ),
                "o_totalprice": pa.array(
                    [p for _, _, p, *_ in orders], pa.float64()
                ),
                "o_orderdate": pa.array(
                    [_BASE_DAY_MS + d * 86_400_000 for *_, d, _ in orders],
                    pa.timestamp("ms"),
                ),
                "o_orderpriority": pa.array(
                    [pr for *_, pr in orders], pa.string()
                ),
            }
        ),
        os.path.join(sf_dir, "orders.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array(range(len(customers)), pa.int64()),
                "c_name": pa.array(
                    [f"Customer#{i}" for i in range(len(customers))],
                    pa.string(),
                ),
                "c_nationkey": pa.array(
                    [n for n, *_ in customers], pa.int32()
                ),
                "c_acctbal": pa.array(
                    [b / 100 for _, b, _ in customers], pa.float64()
                ),
                "c_mktsegment": pa.array(
                    [m for *_, m in customers], pa.string()
                ),
            }
        ),
        os.path.join(sf_dir, "customer.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "s_suppkey": pa.array(range(len(suppliers)), pa.int64()),
                "s_name": pa.array(
                    [f"Supplier#{i}" for i in range(len(suppliers))],
                    pa.string(),
                ),
                "s_nationkey": pa.array(
                    [n for n, _ in suppliers], pa.int32()
                ),
                "s_acctbal": pa.array(
                    [b / 100 for _, b in suppliers], pa.float64()
                ),
            }
        ),
        os.path.join(sf_dir, "supplier.parquet"),
    )
    for t in ("nation", "region"):
        shutil.copy(
            f"/root/testdata/sf0.001/{t}.parquet",
            os.path.join(sf_dir, f"{t}.parquet"),
        )
    return sf_dir


# --- embeddings corpus: similarity / IVF / k-means tie-break paths ------------
# Components come from a tiny set of exactly-representable float32 values
# (quarters), so dot products and decimal-exact centroid means are exact
# doubles on both engines and every tie the rank/argmin logic can hit is
# hit: duplicate vectors (cosine ties at the top-k boundary), zero
# vectors, identical k-means seeds, single-populated-cell clusterings.

_VEC_VALS = [-1.0, -0.5, -0.25, 0.0, 0.25, 0.5, 1.0]

_EMBS = st.integers(2, 4).flatmap(
    lambda dim: st.lists(
        st.tuples(
            st.lists(
                st.sampled_from(_VEC_VALS), min_size=dim, max_size=dim
            ),
            st.integers(0, 2),  # label (coarse cell for blocked variants)
        ),
        min_size=1,
        max_size=14,
    )
)


def _write_embeddings(vecs) -> str:
    sf_dir = tempfile.mkdtemp(prefix="wind_spark_gen_emb_")
    table = pa.table(
        {
            "vec_id": pa.array(range(len(vecs)), pa.int64()),
            "embedding": pa.array(
                [v for v, _ in vecs], pa.list_(pa.float32())
            ),
            "label": pa.array([lb for _, lb in vecs], pa.int32()),
        }
    )
    pq.write_table(table, os.path.join(sf_dir, "embeddings.parquet"))
    # paired documents (doc_id = vec_id) for the semantic-dedup keep
    # decision; tie-rich n_chars exercises the quality tiebreak
    n_chars = [(3, 7, 7, 1)[i % 4] for i in range(len(vecs))]
    docs = pa.table(
        {
            "doc_id": pa.array(range(len(vecs)), pa.int64()),
            "text": pa.array(["x" * n for n in n_chars], pa.string()),
            "lang": pa.array(["en"] * len(vecs), pa.string()),
            "source": pa.array(["web"] * len(vecs), pa.string()),
            "n_chars": pa.array(n_chars, pa.int64()),
        }
    )
    pq.write_table(docs, os.path.join(sf_dir, "documents.parquet"))
    return sf_dir


# l5_ann_lsh is deliberately absent: its recall-floor contract is
# calibrated for the 64-d fixture corpus, and a probabilistic LSH index
# can legitimately dip below any fixed floor on an adversarial 2-d
# corpus — that would be flake, not signal.  Its structural guarantee is
# covered by the deterministic duplicate-corpus test below instead.
@pytest.mark.parametrize(
    "name",
    [
        "l4_cosine_topk_exact",
        "l4b_cosine_topk_blocked",
        "l4c_cosine_topk_vectorized",
        "l6_vector_norms",
        "l3c_embedding_neardup",
        "l5_ivf_topk",
        "l5_ivf_kmeans_topk",
        "l5b_ivf_recall",
        "l5b2_ivf_kmeans_recall",
        "tr_label_centroids",
        "l3i_semantic_dedup",
    ],
)
@given(vecs=_EMBS)
@settings(**_SETTINGS)
def test_query_matches_oracle_on_generated_embeddings(spark, name, vecs):
    sf_dir = _write_embeddings(vecs)
    spec = REGISTRY[name]
    problems = compare(spec.fn(spark, sf_dir), run_oracle(spec.oracle, sf_dir))
    assert not problems, (name, problems)


def test_kmeans_ivf_on_identical_vectors(spark):
    """All vectors identical → all k-means seeds identical, every
    centroid equal, all assignment distances tied: the (d, cell)
    tie-break must collapse everything into cell 1 identically on both
    engines, and top-k must rank the all-1.0-cosine neighbors purely by
    neighbor_id."""
    vecs = [([0.5, 0.5, -0.5], 0) for _ in range(12)]
    sf_dir = _write_embeddings(vecs)
    for name in ("l5_ivf_kmeans_topk", "l5b2_ivf_kmeans_recall"):
        spec = REGISTRY[name]
        problems = compare(
            spec.fn(spark, sf_dir), run_oracle(spec.oracle, sf_dir)
        )
        assert not problems, (name, problems)


def test_ann_lsh_recall_on_duplicate_corpus(spark):
    """Well-separated distinct vectors (pairwise L2 = 2·√2 > radius) with
    exact duplicates: each query's radius ball contains only its own
    duplicates, which hash to identical LSH buckets by construction —
    so the recall guarantee holds structurally (recall = 1), making the
    probabilistic index deterministic on this corpus."""
    base = [
        [2.0, 0.0, 0.0, 0.0],
        [0.0, 2.0, 0.0, 0.0],
        [0.0, 0.0, 2.0, 0.0],
        [0.0, 0.0, 0.0, 2.0],
        [-2.0, 0.0, 0.0, 0.0],
    ]
    vecs = [(v, i % 3) for i, v in enumerate(base * 3)]
    sf_dir = _write_embeddings(vecs)
    spec = REGISTRY["l5_ann_lsh"]
    problems = compare(spec.fn(spark, sf_dir), run_oracle(spec.oracle, sf_dir))
    assert not problems, problems


_LONG_DOCS = st.lists(
    st.lists(st.sampled_from(["a", "b"]), min_size=0, max_size=30),
    min_size=1,
    max_size=10,
)


@given(docs=_LONG_DOCS)
@settings(**_SETTINGS)
def test_chunk_dedup_on_long_collision_rich_docs(spark, docs):
    """l3j with documents long enough for MULTIPLE 10-token chunks and
    a two-letter vocab so identical chunks recur across documents —
    the shared corpus strategy caps docs at 12 tokens, which never
    exercises multi-chunk splits or cross-doc duplicate chunks."""
    sf_dir = _write_documents([(toks, "en", "web") for toks in docs])
    spec = REGISTRY["l3j_chunk_dedup"]
    problems = compare(spec.fn(spark, sf_dir), run_oracle(spec.oracle, sf_dir))
    assert not problems, problems


def test_l3b_minhash_lsh_recall_floor(spark):
    """Since round 5, l3b emits the EXACT char-5-gram Jaccard ≥ 0.5 pair
    set (driver-oracle-checkable) with ``lsh_found`` as the per-pair
    recall guarantee of the seeded MinHashLSH index.  This test pins the
    semantics against an independent Python ground truth: the emitted
    pair set must EQUAL the true pair set (the audit leg is exact, not
    approximate), and the index must recover ≥90% of true pairs.  With
    seed=42 and 8 OR-amplified hash tables, P(miss) ≤ (1-j)^8 ≤ 0.4%
    per true pair; measured recall on both fixture scales is 1.0 — the
    0.9 floor is the contract, not the expectation (the driver oracle
    asserts lsh_found=TRUE outright, which also holds)."""
    import pyarrow.parquet as _pq

    sf_dir = "/root/testdata/sf0.001"
    t = _pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    ids, texts = t["doc_id"].to_pylist(), t["text"].to_pylist()

    def shingles(s: str) -> frozenset:
        if not s:
            return frozenset()
        return frozenset(s[i : i + 5] for i in range(max(len(s) - 4, 1)))

    sets = [(i, shingles(txt)) for i, txt in zip(ids, texts)]
    sets.sort()
    truth = set()
    for a in range(len(sets)):
        ia, sa = sets[a]
        for b in range(a + 1, len(sets)):
            ib, sb = sets[b]
            union = len(sa | sb)
            if union and len(sa & sb) / union >= 0.5:
                truth.add((ia, ib))
    assert truth, "fixture corpus must contain near-duplicate pairs"
    rows = REGISTRY["l3b_minhash_lsh_pairs"].fn(spark, sf_dir).collect()
    got = {(r.doc_a, r.doc_b) for r in rows}
    assert got == truth, (sorted(truth - got), sorted(got - truth))
    found = {(r.doc_a, r.doc_b) for r in rows if r.lsh_found}
    recall = len(found) / len(truth)
    assert recall >= 0.9, (recall, sorted(truth - found))


@pytest.mark.parametrize(
    "name",
    [
        "w1_rank_top_orders_per_segment",
        "w4_cumulative_spend",
        "w6_ntile_acctbal_quartiles",
        "p2_filter_kitchen_sink",
        "p3_case_when_tiers",
        "f_datetime_functions",
        "o2_global_topk_orders",
        "o4_union_high_balance",
        "o5_intersect_except_nations",
        "j2_left_join_order_counts",
        "j3_semi_join_active_customers",
        "j4_anti_join_inactive_customers",
        "j6_theta_band_join",
        "u1_incremental_diff",
        "u2_upsert_merge",
        "u4_idempotent_rerun",
        "u5_calendar_backfill",
        "u12_cdc_classify",
        "a12_mode_per_group",
        "a13_histogram_equiwidth",
    ],
)
@given(orders=_ORDERS, customers=_CUSTOMERS, suppliers=_SUPPLIERS)
@settings(**_SETTINGS)
def test_query_matches_oracle_on_generated_orders(
    spark, name, orders, customers, suppliers
):
    sf_dir = _write_orders(orders, customers, suppliers)
    spec = REGISTRY[name]
    problems = compare(spec.fn(spark, sf_dir), run_oracle(spec.oracle, sf_dir))
    assert not problems, (name, problems)


# --- external-feed source: portable hash replay over arbitrary codes ----------

_CODE_CHARS = "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789."

_CODES = st.lists(
    st.text(alphabet=_CODE_CHARS, min_size=1, max_size=12),
    min_size=1,
    max_size=6,
    unique=True,
)


@given(codes=_CODES, days=st.integers(1, 40))
@settings(**_SETTINGS)
def test_windsim_feed_matches_sql_replay(spark, codes, days):
    """The S9 external-feed source must be bit-identical to its DuckDB
    replay for ANY security list and horizon — the portable base-31
    hash and mod-first quote arithmetic are the contract."""
    import duckdb

    from update_database_by_wind_spark.sources import windsim

    feed = (
        windsim.wsd(spark, tuple(codes), days)
        .selectExpr(
            "code",
            "date_format(trade_date, 'yyyy-MM-dd') AS d",
            "close",
            "volume",
        )
    )
    sql = (
        "WITH "
        + windsim.oracle_sql(tuple(codes), days)
        + " SELECT code, strftime(trade_date, '%Y-%m-%d') AS d,"
        " close, volume FROM quotes"
    )
    con = duckdb.connect()
    try:
        oracle = con.sql(sql).df()
    finally:
        con.close()
    problems = compare(feed, oracle)
    assert not problems, problems


# --- round-5 domain cap: force the hot-source (ranking-window) path ----------


@given(docs=_DOCS)
@settings(**_SETTINGS)
def test_domain_cap_hot_path_matches_oracle(spark, docs):
    """At cap=2, any source with ≥3 generated docs takes the
    count-first split's HOT branch (broadcast semi-join + per-source
    ranking window) — the branch the fixture-cap registry query never
    exercises on a ≤15-doc corpus.  Both branches must agree with the
    single-window oracle, including the kept-key checksum that pins
    WHICH docs the priority hash selected."""
    from update_database_by_wind_spark.operators.training import (
        domain_cap,
        domain_cap_oracle_sql,
    )
    from update_database_by_wind_spark.sources import load

    sf_dir = _write_documents(docs)
    got = domain_cap(load(spark, sf_dir, "documents"), cap=2)
    problems = compare(got, run_oracle(domain_cap_oracle_sql(2), sf_dir))
    assert not problems, problems


# --- round-5 orders/customer corpora: fuzz the Bloom prefilter + z-order ------

_BASE_DAY_US = 694_224_000_000_000  # 1992-01-01 00:00:00 UTC in µs

_CUSTOMERS = st.lists(
    st.sampled_from([0.0, 6999.75, 7000.0, 7000.25, 9999.5]),  # vs >7000 cut
    min_size=0,
    max_size=7,
)
_ORDERS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=9),  # o_custkey, incl. orphans
        st.integers(min_value=0, max_value=40),  # day offset
        st.sampled_from(["O", "F", "P"]),
    ),
    min_size=0,
    max_size=30,
)


def _write_orders_customer(balances, orders) -> str:
    """Fixture-shaped orders.parquet + customer.parquet with only the
    columns the queries under test reference (load() reads by name)."""
    sf_dir = tempfile.mkdtemp(prefix="wind_spark_gen_oc_")
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array(range(len(balances)), pa.int64()),
                "c_acctbal": pa.array(balances, pa.float64()),
            }
        ),
        os.path.join(sf_dir, "customer.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(range(len(orders)), pa.int64()),
                "o_custkey": pa.array([c for c, _, _ in orders], pa.int64()),
                "o_orderstatus": pa.array(
                    [s for _, _, s in orders], pa.string()
                ),
                "o_orderdate": pa.array(
                    [
                        _BASE_DAY_US + d * 86_400_000_000
                        for _, d, _ in orders
                    ],
                    pa.timestamp("us"),
                ),
            }
        ),
        os.path.join(sf_dir, "orders.parquet"),
    )
    return sf_dir


@pytest.mark.parametrize(
    "name",
    [
        "j12_bloom_prefilter",
        "s10_zorder_clustering",
        # a14's small-set regime: generated corpora have ≤ 30 orders,
        # so the sketch is UNDER-full (sketch_size < k → est must equal
        # the exact count) and the odd/even shard split often leaves
        # one shard empty — merge ≡ recompute must hold through both
        "a14_kmv_sketch",
    ],
)
@given(balances=_CUSTOMERS, orders=_ORDERS)
@settings(**_SETTINGS)
def test_orders_query_matches_oracle_on_generated_corpus(
    spark, name, balances, orders
):
    """j12: orphan probe keys, boundary balances (exactly 7000 must
    NOT build), and empty build sets must reproduce the identical
    pass/true/false-positive counts — the Bloom's false positives are
    part of the contract.  s10: degenerate domains (single customer,
    single day, empty table) must normalize and bucket identically
    through the NULL-propagating bounds row."""
    sf_dir = _write_orders_customer(balances, orders)
    try:
        spec = REGISTRY[name]
        problems = compare(
            spec.fn(spark, sf_dir), run_oracle(spec.oracle, sf_dir)
        )
        assert not problems, (name, problems)
    finally:
        import shutil

        shutil.rmtree(sf_dir, ignore_errors=True)


# --- round-6 targeted fuzzes ---------------------------------------------------
# The generic corpus sweep assigns doc_ids 0..n-1 and ASCII tokens, which
# under-exercises: l3k's %13/%7 change classes (id 0 is always "new"),
# tr_shuffle_shard's fixed shard count, t_bpe's substring arithmetic on
# multi-byte code points, and l5c's recall on vectors where truncation
# SHOULD work.  Each fuzz below drives exactly that axis.


def _write_documents_with_ids(docs) -> str:
    """documents.parquet with CHOSEN doc_ids (the generic writer's
    0..n-1 assignment pins l3k's %13/%7 change classes to fixed rows)."""
    sf_dir = tempfile.mkdtemp(prefix="wind_spark_gen_ids_")
    texts = [" ".join(toks) for _, toks in docs]
    table = pa.table(
        {
            "doc_id": pa.array([i for i, _ in docs], pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(docs), pa.string()),
            "source": pa.array(["web"] * len(docs), pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(table, os.path.join(sf_dir, "documents.parquet"))
    return sf_dir


_L3K_TOKS = st.lists(st.sampled_from(_VOCAB), min_size=0, max_size=12)

# id regimes vs l3k's change detection (new: %13==0; edited: %7==0 with a
# text long enough that truncating 10 chars changes it):
#   empty_delta — no id is %13 or %7: changed set EMPTY, result must be
#     zero rows (nothing to maintain);
#   all_new — every id %13==0: the stored signature index is EMPTY
#     (delta-only corpus, the first-ever pull);
#   edit_heavy — every id %7==0, none %13: change detection rides
#     entirely on the digest diff, including short texts whose
#     truncation is a no-op (edited id but UNCHANGED content).
_L3K_REGIMES = {
    "empty_delta": st.lists(
        st.integers(1, 500).filter(lambda i: i % 13 != 0 and i % 7 != 0),
        min_size=0,
        max_size=10,
        unique=True,
    ),
    "all_new": st.lists(
        st.integers(0, 38).map(lambda k: k * 13),
        min_size=0,
        max_size=10,
        unique=True,
    ),
    "edit_heavy": st.lists(
        st.integers(1, 70).map(lambda k: k * 7).filter(lambda i: i % 13 != 0),
        min_size=0,
        max_size=10,
        unique=True,
    ),
}


@st.composite
def _docs_with_ids(draw, ids_strategy):
    ids = draw(ids_strategy)
    return [(i, draw(_L3K_TOKS)) for i in ids]


@pytest.mark.parametrize("regime", sorted(_L3K_REGIMES))
@given(data=st.data())
@settings(**_SETTINGS)
def test_l3k_incremental_index_split_point_regimes(spark, regime, data):
    """l3k (incremental ≡ recompute) under adversarial change-set
    shapes: an empty delta must produce zero pairs, a delta-only corpus
    must rebuild from an empty stored index, and an edit-heavy corpus
    must classify by digest (short texts are 'edited' ids with
    unchanged content).  All three must match the from-scratch SQL
    rebuild cell-exactly."""
    import shutil

    docs = data.draw(_docs_with_ids(_L3K_REGIMES[regime]))
    sf_dir = _write_documents_with_ids(docs)
    try:
        spec = REGISTRY["l3k_incremental_index"]
        res = spec.fn(spark, sf_dir)
        problems = compare(res, run_oracle(spec.oracle, sf_dir))
        assert not problems, (regime, problems)
        if regime == "empty_delta":
            assert res.count() == 0
    finally:
        shutil.rmtree(sf_dir, ignore_errors=True)


@given(docs=_DOCS, n_shards=st.sampled_from([1, 2, 3, 8, 64, 101]))
@settings(**_SETTINGS)
def test_shuffle_shard_arbitrary_shard_counts(spark, docs, n_shards):
    """tr_shuffle_shard at shard counts the fixture query never sees:
    1 (degenerates to a single globally-ordered shard), counts that
    exceed the corpus size (most shards empty), and non-powers-of-two.
    Membership and within-shard order must replay identically in SQL
    at every count."""
    import shutil

    from update_database_by_wind_spark.operators.training import (
        shuffle_shard,
        shuffle_shard_oracle_sql,
    )
    from update_database_by_wind_spark.sources import load

    sf_dir = _write_documents(docs)
    try:
        got = shuffle_shard(load(spark, sf_dir, "documents"), n_shards)
        problems = compare(
            got, run_oracle(shuffle_shard_oracle_sql(n_shards), sf_dir)
        )
        assert not problems, (n_shards, problems)
    finally:
        shutil.rmtree(sf_dir, ignore_errors=True)


# Unicode-heavy vocabulary for the BPE pair counter: CJK, an astral-plane
# emoji pair (surrogate-paired in UTF-16 engines), a precomposed and a
# COMBINING-mark accent (two code points rendering as one glyph), and
# single-char words (no pairs at all).  Both engines index substring()
# by code point (verified: identical pair lists on all of these), which
# is exactly the parity this fuzz pins.
_UNICODE_VOCAB = [
    "日",
    "本語",
    "👍🎉",
    "é",
    "étude",
    "ßß",
    "好好好",
    "a",
    "語語語語",
]

_UNICODE_DOCS = st.lists(
    st.tuples(
        st.lists(st.sampled_from(_UNICODE_VOCAB), min_size=0, max_size=10),
        st.sampled_from(["en", "zh"]),
        st.sampled_from(["web", "book"]),
    ),
    min_size=0,
    max_size=12,
)


@pytest.mark.parametrize(
    "name",
    [
        "t_bpe_pair_counts",
        # the resize kernel strides CODE POINTS (decode before
        # sampling) — a byte-striding kernel diverges on the first
        # multi-byte character, which this corpus is built to catch
        "mm_resize_downsample",
    ],
)
@given(docs=_UNICODE_DOCS)
@settings(**_SETTINGS)
def test_unicode_vocab_matches_oracle(spark, name, docs):
    """Multi-byte text parity: character-pair extraction and strided
    resampling (length / sequence / substring / ascii) must count code
    points, not bytes, identically in both engines — including
    astral-plane emoji and combining marks — and 1-char words must
    contribute no BPE pairs."""
    import shutil

    sf_dir = _write_documents(docs)
    try:
        spec = REGISTRY[name]
        problems = compare(
            spec.fn(spark, sf_dir), run_oracle(spec.oracle, sf_dir)
        )
        assert not problems, (name, problems)
    finally:
        shutil.rmtree(sf_dir, ignore_errors=True)


# One-hot ±1 prefixes (dims 0-15) with an exactly-zero tail: all the
# information lives in the first 16 dims — the corpus a Matryoshka-
# trained encoder produces, where the truncated index SHOULD deploy.
_PREFIX_VECS = st.lists(
    st.tuples(st.integers(0, 15), st.sampled_from([1.0, -1.0])),
    min_size=0,
    max_size=12,
)


def _write_prefix_embeddings(vecs) -> str:
    sf_dir = tempfile.mkdtemp(prefix="wind_spark_gen_emb16_")
    arrs = []
    for d, s in vecs:
        v = [0.0] * 64
        v[d] = s
        arrs.append(v)
    table = pa.table(
        {
            "vec_id": pa.array(range(len(vecs)), pa.int64()),
            "embedding": pa.array(arrs, pa.list_(pa.float32())),
            "label": pa.array([d for d, _ in vecs], pa.int32()),
        }
    )
    pq.write_table(table, os.path.join(sf_dir, "embeddings.parquet"))
    return sf_dir


@given(vecs=_PREFIX_VECS)
@settings(**_SETTINGS)
def test_matryoshka_recall_is_perfect_on_prefix_concentrated_vectors(
    spark, vecs
):
    """l5c's honest fixture answer is recall ~0 (isotropic vectors); the
    gate must also PASS when it should.  With unit one-hot prefixes and
    an exactly-zero tail, the truncated cosine equals the full-dim dot
    for every pair (norms are exactly 1.0), so the two rankings — and
    their shared neighbor_id tie-break — are identical: recall@k must
    be exactly 1.0 for every query, and the measurement must still
    match the SQL replay cell-exactly."""
    import shutil

    sf_dir = _write_prefix_embeddings(vecs)
    try:
        spec = REGISTRY["l5c_matryoshka_recall"]
        res = spec.fn(spark, sf_dir)
        problems = compare(res, run_oracle(spec.oracle, sf_dir))
        assert not problems, problems
        assert all(r["recall_at_k"] == 1.0 for r in res.collect())
    finally:
        shutil.rmtree(sf_dir, ignore_errors=True)
