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


def test_asof_null_state_in_latest_row_is_preserved(spark):
    """ADVICE r4: a legitimately-NULL state value in the LATEST right row
    must be carried (whole-row fill), not skipped in favor of an older
    non-null value."""
    left = spark.createDataFrame(
        [(1, "k", 25), (2, "k", 35)], "event_id long, k string, ts long"
    )
    right = spark.createDataFrame(
        [("k", 10, 100.0, "x"), ("k", 20, None, "y"), ("k", 30, 300.0, None)],
        "k string, ts long, sv double, tag string",
    )
    got = {
        r["event_id"]: (r["sv"], r["tag"])
        for r in asof_join(
            left, right, on=["k"], ts="ts", state_cols=["sv", "tag"]
        ).collect()
    }
    # event 1: latest row is ts=20 whose sv is NULL -> (None, 'y'), NOT 100.0
    # event 2: latest row is ts=30 whose tag is NULL -> (300.0, None)
    assert got == {1: (None, "y"), 2: (300.0, None)}


def test_asof_reserved_internal_names_guarded(spark):
    left = spark.createDataFrame(
        [(1, "k", 5, 0)], "event_id long, k string, ts long, _asof_src int"
    )
    right = spark.createDataFrame([("k", 5, 1.0)], "k string, ts long, sv double")
    with pytest.raises(ValueError, match="reserved"):
        asof_join(left, right, on=["k"], ts="ts", state_cols=["sv"])


def test_asof_user_src_column_passes_through(spark):
    """A user column named '_src' is NOT special (the r4 implementation
    silently overwrote and dropped it)."""
    left = spark.createDataFrame(
        [(1, "k", 25, "mine")], "event_id long, k string, ts long, _src string"
    )
    right = spark.createDataFrame([("k", 20, 2.0)], "k string, ts long, sv double")
    row = asof_join(left, right, on=["k"], ts="ts", state_cols=["sv"]).collect()[0]
    assert row["_src"] == "mine" and row["sv"] == 2.0
