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
