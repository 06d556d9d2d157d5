"""As-of join semantics: at-or-before, left-outer nulls, tie rule, and the
hot-key time-range salting (identical results to the unsalted plan)."""

import json
import os
import subprocess
import sys

import pytest

from warc_bench_spark.operators.asof import asof_join


def _skewed_corpus():
    """Deterministic skewed as-of corpus: one key holds ~50% of all rows
    (VERDICT r5 item 6's shape), with every edge the salting must survive:
    ts exactly on bucket boundaries, left==right ts ties, buckets with no
    right rows (carry-in only), buckets with no left rows, and a key with
    no right rows at all."""
    left, right = [], []
    eid = 0
    for i in range(500):  # hot key: irregular ts incl. exact multiples of 10
        eid += 1
        left.append((eid, "hot", (i * 7) % 365))
    for i in range(60):
        right.append(("hot", i * 6 + (i % 3), float(i)))  # hits 0, boundaries
    for k in range(10):
        for i in range(25):
            eid += 1
            left.append((eid, f"cold{k}", i * 11 + k))
        if k != 7:  # cold7: no right rows at all -> NULL state throughout
            for i in range(5):
                right.append((f"cold{k}", i * 40 + k, float(100 * k + i)))
    return left, right


def _expected(left, right):
    """Pure-Python oracle: latest right state at-or-before, per key."""
    by_key = {}
    for k, ts, sv in right:
        by_key.setdefault(k, []).append((ts, sv))
    out = {}
    for eid, k, ts in left:
        prior = [(t, s) for t, s in by_key.get(k, []) if t <= ts]
        out[eid] = max(prior)[1] if prior else None
    return out


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


_SALT_WORKER = r"""
import sys, json
sys.path.insert(0, sys.argv[1])
from warc_bench_spark.session import get_spark
from warc_bench_spark.operators.asof import asof_join
import pyspark.sql.functions as F

payload = json.loads(sys.argv[2])
spark = get_spark("asof-salt-2", cores=2, shuffle_partitions=2)
spark.sparkContext.setLogLevel("ERROR")
left = spark.createDataFrame(payload["left"], "event_id long, k string, ts long")
right = spark.createDataFrame(payload["right"], "k string, ts long, sv double")
hot = spark.createDataFrame([("hot",)], "k string")
got = asof_join(
    left, right, on=["k"], ts="ts", state_cols=["sv"],
    hot_keys=hot, salt_interval=10,
).collect()
print("RESULT:" + json.dumps({r["event_id"]: r["sv"] for r in got}))
"""


def test_asof_salted_equals_plain_on_skewed_corpus(spark):
    """One key with ~50% of rows: the salted plan (hot-routed AND all-hot)
    must byte-match both the unsalted plan and the pure-Python oracle."""
    left_rows, right_rows = _skewed_corpus()
    left = spark.createDataFrame(left_rows, "event_id long, k string, ts long")
    right = spark.createDataFrame(right_rows, "k string, ts long, sv double")
    want = _expected(left_rows, right_rows)

    plain = {
        r["event_id"]: r["sv"]
        for r in asof_join(left, right, on=["k"], ts="ts", state_cols=["sv"]).collect()
    }
    assert plain == want

    hot = spark.createDataFrame([("hot",)], "k string")
    salted = {
        r["event_id"]: r["sv"]
        for r in asof_join(
            left, right, on=["k"], ts="ts", state_cols=["sv"],
            hot_keys=hot, salt_interval=10,
        ).collect()
    }
    assert salted == want

    all_hot = {
        r["event_id"]: r["sv"]
        for r in asof_join(
            left, right, on=["k"], ts="ts", state_cols=["sv"], salt_interval=25,
        ).collect()
    }
    assert all_hot == want


def test_asof_salted_local2_equals_local8(spark):
    """The salted plan is parallelism-invariant: a separate local[2] JVM
    (different shuffle partitioning) produces the identical mapping."""
    left_rows, right_rows = _skewed_corpus()
    want = _expected(left_rows, right_rows)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    payload = json.dumps({"left": left_rows, "right": right_rows})
    out = subprocess.run(
        [sys.executable, "-c", _SALT_WORKER, repo, payload],
        capture_output=True, text=True, timeout=300, check=True,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("RESULT:")][0]
    got = {int(k): v for k, v in json.loads(line[len("RESULT:"):]).items()}
    assert got == want


def test_asof_salted_null_state_in_latest_row_preserved(spark):
    """The whole-row-fill guarantee survives salting: a NULL state value in
    the latest right row (in a PRIOR bucket, so it rides the carry-in) must
    not fall back to an older non-null value."""
    left = spark.createDataFrame(
        [(1, "k", 25), (2, "k", 45)], "event_id long, k string, ts long"
    )
    right = spark.createDataFrame(
        [("k", 1, 100.0, "x"), ("k", 9, None, "y"), ("k", 41, 300.0, None)],
        "k string, ts long, sv double, tag string",
    )
    got = {
        r["event_id"]: (r["sv"], r["tag"])
        for r in asof_join(
            left, right, on=["k"], ts="ts", state_cols=["sv", "tag"],
            salt_interval=10,
        ).collect()
    }
    assert got == {1: (None, "y"), 2: (300.0, None)}
