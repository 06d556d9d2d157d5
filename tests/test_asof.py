"""As-of join semantics: at-or-before, left-outer nulls, tie rule."""

import pytest

from warc_bench_spark.operators.asof import asof_join


def test_asof_at_or_before_and_nulls(spark):
    left = spark.createDataFrame(
        [
            (1, "k1", 10),   # before any state -> NULL
            (2, "k1", 20),   # exactly at state ts=20 -> sees 200 (at-or-before)
            (3, "k1", 25),   # between 20 and 30 -> 200
            (4, "k1", 30),   # at 30 -> 300
            (5, "k1", 99),   # after everything -> 300
            (6, "k2", 50),   # key with no right rows at all -> NULL
        ],
        "event_id long, k string, ts long",
    )
    right = spark.createDataFrame(
        [("k1", 20, 200.0), ("k1", 30, 300.0)], "k string, ts long, state double"
    )
    got = {
        r["event_id"]: r["state"]
        for r in asof_join(left, right, on=["k"], ts="ts", state_cols=["state"]).collect()
    }
    assert got == {1: None, 2: 200.0, 3: 200.0, 4: 300.0, 5: 300.0, 6: None}


def test_asof_multiple_state_cols_and_collision_guard(spark):
    left = spark.createDataFrame([(1, "k", 5)], "event_id long, k string, ts long")
    right = spark.createDataFrame(
        [("k", 5, 1.0, "a")], "k string, ts long, sv double, tag string"
    )
    row = asof_join(left, right, on=["k"], ts="ts", state_cols=["sv", "tag"]).collect()[0]
    assert (row["sv"], row["tag"]) == (1.0, "a")

    bad = spark.createDataFrame([("k", 5, 1.0)], "k string, ts long, event_id double")
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, bad, on=["k"], ts="ts", state_cols=["event_id"])
