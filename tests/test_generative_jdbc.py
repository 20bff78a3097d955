"""Generative differential testing for the JDBC upsert path (round-3
verdict gap: the S5/S6/U2/U4 stage-then-MERGE machinery was
driver-verified on fixtures but never hypothesis-fuzzed).

hypothesis builds multi-batch feeds with colliding primary keys —
duplicates inside a batch, overwrites across batches — pushes them
through the real ``upsert_jdbc`` into an in-memory Derby over real
JDBC, and checks the final table against an independently computed
reference of the documented semantics: within a batch the max
``order_col`` row wins the stage (keep-latest dedup), across batches
the last batch containing a key wins (MERGE updates unconditionally on
match).  A re-run of the final batch must be a byte-identical no-op
(U4 idempotence).
"""

from __future__ import annotations

import uuid

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_VALUES = [0.0, 0.25, 1.5, -2.75, 10.0]

# batches of (pk, value) rows; pk range is tight so collisions within
# and across batches are the common case, not the edge case
_BATCHES = st.lists(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),
            st.sampled_from(_VALUES),
        ),
        min_size=1,
        max_size=8,
    ),
    min_size=1,
    max_size=3,
)


@given(batches=_BATCHES)
@settings(**_SETTINGS)
def test_jdbc_upsert_matches_keep_latest_reference(spark, batches):
    from update_database_by_wind_spark.sources.jdbc import (
        upsert_jdbc,
        write_jdbc,
    )

    url = f"jdbc:derby:memory:fuzz_{uuid.uuid4().hex[:10]};create=true"
    # create the empty target (schema only) so every batch goes through
    # the one uniform code path: stage + MERGE
    empty = spark.createDataFrame([], "pk bigint, seq bigint, val double")
    write_jdbc(empty, url, "fuzz_t", mode="overwrite")

    expected: dict[int, tuple[int, float]] = {}
    seq = 0
    for batch in batches:
        rows = []
        for pk, val in batch:
            rows.append((pk, seq, val))
            seq += 1
        # reference semantics: within the batch, max seq per pk wins
        # the stage; MERGE then overwrites the stored row on match
        winners: dict[int, tuple[int, float]] = {}
        for pk, s, v in rows:
            if pk not in winners or s > winners[pk][0]:
                winners[pk] = (s, v)
        expected.update(winners)
        df = spark.createDataFrame(rows, "pk bigint, seq bigint, val double")
        upsert_jdbc(df, url, "fuzz_t", pk_cols=["pk"], order_col="seq")

    def read_back() -> dict[int, tuple[int, float]]:
        return {
            r.pk: (r.seq, r.val)
            for r in spark.read.jdbc(url, "fuzz_t").collect()
        }

    assert read_back() == expected
    # U4 idempotence: replaying the final batch changes nothing
    last_rows = [
        (pk, s, v)
        for (pk, v), s in zip(
            batches[-1], range(seq - len(batches[-1]), seq)
        )
    ]
    df = spark.createDataFrame(last_rows, "pk bigint, seq bigint, val double")
    upsert_jdbc(df, url, "fuzz_t", pk_cols=["pk"], order_col="seq")
    assert read_back() == expected


# --- CDC merge: insert/update/delete feeds through cdc_merge_sql --------------

_CDC_OPS = st.lists(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),  # pk
            st.sampled_from(_VALUES),
            st.sampled_from(["insert", "update", "delete"]),
        ),
        min_size=1,
        max_size=8,
    ),
    min_size=1,
    max_size=3,
)


@given(batches=_CDC_OPS)
@settings(**_SETTINGS)
def test_jdbc_cdc_merge_matches_apply_reference(spark, batches):
    """``cdc_merge_sql`` semantics under arbitrary feeds, including the
    degenerate labels a classifier never emits but an at-least-once
    transport can replay: a 'delete' for an absent key is a no-op, an
    'insert' for a present key updates (MERGE matches on the key, not
    on the label), and within a batch the max-seq row per key wins the
    stage.  The reference is an independently computed dict apply;
    after all batches, re-applying the final batch must be a no-op."""
    from update_database_by_wind_spark.sources.jdbc import (
        cdc_merge_sql,
        upsert_jdbc,
        write_jdbc,
    )

    url = f"jdbc:derby:memory:cdcfz_{uuid.uuid4().hex[:10]};create=true"
    empty = spark.createDataFrame([], "pk bigint, seq bigint, val double")
    write_jdbc(empty, url, "cdc_t", mode="overwrite")
    merge = cdc_merge_sql(
        "cdc_t", "cdc_t_stage", ["pk"], ["seq", "val"]
    )

    def apply_batch(rows) -> None:
        df = spark.createDataFrame(
            rows, "pk bigint, seq bigint, val double, change_type string"
        )
        upsert_jdbc(
            df,
            url,
            "cdc_t",
            pk_cols=["pk"],
            order_col="seq",
            merge_sql=merge,
            column_types="change_type VARCHAR(16)",
        )

    expected: dict[int, tuple[int, float]] = {}
    seq = 0
    all_rows = []
    for batch in batches:
        rows = []
        for pk, val, change in batch:
            rows.append((pk, seq, val, change))
            seq += 1
        all_rows.append(rows)
        winners: dict[int, tuple[int, float, str]] = {}
        for pk, s, v, c in rows:
            if pk not in winners or s > winners[pk][0]:
                winners[pk] = (s, v, c)
        for pk, (s, v, c) in winners.items():
            if c == "delete":
                expected.pop(pk, None)
            else:
                expected[pk] = (s, v)
        apply_batch(rows)

    def read_back() -> dict[int, tuple[int, float]]:
        return {
            r.pk: (r.seq, r.val)
            for r in spark.read.jdbc(url, "cdc_t").collect()
        }

    assert read_back() == expected
    # idempotence: replaying the final batch leaves the table unchanged
    apply_batch(all_rows[-1])
    assert read_back() == expected
