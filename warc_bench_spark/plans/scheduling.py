"""Scheduling-layer oracle queries: the retry/timeout isolation state
machine (X5/X6), previously covered only as Spark config documentation.

Reference semantics (``/root/reference/src/orby/trajectory_collector/
ray_scripts/parallel_computing_tasks.py:42-138`` and
``parallel_computing_controller.py:40-87``): each data point gets up to
``dp_max_retries`` (default 3) isolated attempts; an attempt FAILS if it
raises or exceeds the per-attempt ``timeout`` (default 600 s); the first
success wins, and a point whose budget is exhausted is dropped from the
batch (quarantined), never retried again.

Re-expressed relationally — the shape that matters at 100 TB, where the
attempt log is a table and the state machine is one window + one
aggregate (no driver-side loop over tasks): attempt order within a task
is a row_number window, the verdict is a min-over-conditional aggregate.
Both shuffles key on task_id, so the window and the groupBy share one
co-partitioned exchange.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .relational import register, t

MAX_RETRIES = 3       # dp_max_retries default (controller.py:40)
TIMEOUT_VALUE = 180.0  # the per-attempt cap, in this corpus's value units


@register(
    "q61_retry_quarantine",
    f"""
    WITH a AS (
      SELECT event_id % 200 AS task_id,
             row_number() OVER (PARTITION BY event_id % 200 ORDER BY event_id)
               AS attempt_no,
             (event_type <> 'error' AND value <= {TIMEOUT_VALUE!r}) AS ok
      FROM events),
    s AS (
      SELECT task_id,
             MIN(CASE WHEN ok AND attempt_no <= {MAX_RETRIES}
                      THEN attempt_no END) AS first_ok,
             CAST(COUNT(*) AS BIGINT) AS n_attempts
      FROM a GROUP BY task_id)
    SELECT task_id,
           CASE WHEN first_ok IS NOT NULL THEN 'ok'
                ELSE 'quarantined' END AS status,
           CAST(COALESCE(first_ok, LEAST({MAX_RETRIES}, n_attempts)) AS BIGINT)
             AS attempts_used
    FROM s ORDER BY task_id
    """,
)
def q61(spark, sf_dir):
    """X5/X6 retry + timeout isolation as a distributed state machine:
    attempts ordered per task, failure = error OR over-timeout, first
    success within the retry budget wins, exhausted budget quarantines."""
    ev = t(spark, sf_dir, "events")
    task_id = (F.col("event_id") % 200).alias("task_id")
    w = Window.partitionBy(F.col("event_id") % 200).orderBy("event_id")
    a = ev.select(
        task_id,
        F.row_number().over(w).alias("attempt_no"),
        (
            (F.col("event_type") != "error") & (F.col("value") <= TIMEOUT_VALUE)
        ).alias("ok"),
    )
    s = a.groupBy("task_id").agg(
        F.min(
            F.when(
                F.col("ok") & (F.col("attempt_no") <= MAX_RETRIES),
                F.col("attempt_no"),
            )
        ).alias("first_ok"),
        F.count(F.lit(1)).alias("n_attempts"),
    )
    return s.select(
        "task_id",
        F.when(F.col("first_ok").isNotNull(), "ok")
        .otherwise("quarantined")
        .alias("status"),
        F.coalesce(F.col("first_ok"), F.least(F.lit(MAX_RETRIES), F.col("n_attempts")))
        .cast("long")
        .alias("attempts_used"),
    ).orderBy("task_id")


@register(
    "q65_asof_state_join",
    """
    WITH l AS (
        SELECT event_id, user_id, ts, value
        FROM events WHERE event_type = 'click'
    ), r AS (
        -- unique state row per (user, ts): the as-of contract
        SELECT user_id, ts, MAX(value) AS state_val
        FROM events WHERE event_type = 'view'
        GROUP BY user_id, ts
    )
    SELECT l.event_id, l.user_id, l.value,
           (SELECT r.state_val FROM r
            WHERE r.user_id = l.user_id AND r.ts <= l.ts
            ORDER BY r.ts DESC LIMIT 1) AS state_val
    FROM l ORDER BY event_id
    """,
)
def q65(spark, sf_dir):
    """As-of join (operators/asof.py): every click event picks up the most
    recent view-state value at-or-before its timestamp, per user — the
    consult-latest-state-before-now pattern of frequency_limiter.py:24-47
    lifted to one union + one per-key window pass (single exchange; the
    oracle states the same semantics as a correlated latest-row lookup,
    which is fine for DuckDB at oracle scale and would be the WRONG shape
    at 100 TB)."""
    from ..operators.asof import asof_join

    ev = t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("state_val"))
    )
    joined = asof_join(clicks, views, on=["user_id"], ts="ts", state_cols=["state_val"])
    return joined.select("event_id", "user_id", "value", "state_val").orderBy(
        "event_id"
    )


@register(
    "q70_asof_salted_state",
    """
    WITH l AS (
        SELECT event_id, user_id, epoch_us(ts) AS its, value
        FROM events WHERE event_type = 'click'
    ), r AS (
        -- unique state row per (user, ts): the as-of contract
        SELECT user_id, epoch_us(ts) AS its, MAX(value) AS state_val
        FROM events WHERE event_type = 'view'
        GROUP BY user_id, epoch_us(ts)
    )
    SELECT l.event_id, l.user_id, l.value,
           (SELECT r.state_val FROM r
            WHERE r.user_id = l.user_id AND r.its <= l.its
            ORDER BY r.its DESC LIMIT 1) AS state_val
    FROM l ORDER BY event_id
    """,
)
def q70(spark, sf_dir):
    """q65's as-of state join routed through the SALTED physical path
    (operators/asof.py ``salt_interval`` with no ``hot_keys`` = the
    all-hot case): windows partition by (user, hour-bucket) instead of
    one partition per user, with each bucket's carry-in state injected
    as a synthetic head row — the r6 hot-key skew remedy, here under the
    full value-hash oracle (the oracle states the plain as-of semantics;
    salting is physical only, so any divergence is a salting bug).
    Timestamps are exact integer microseconds on both engines
    (``unix_micros`` / ``epoch_us``) — no float epoch, no truncation
    ambiguity. Reference semantics: frequency_limiter.py:24-47's
    consult-latest-state-before-now, as in q65."""
    from ..operators.asof import asof_join

    ev = t(spark, sf_dir, "events").withColumn(
        "its", F.unix_micros(F.col("ts").cast("timestamp"))
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "its", "value"
    )
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "its")
        .agg(F.max("value").alias("state_val"))
    )
    joined = asof_join(
        clicks,
        views,
        on=["user_id"],
        ts="its",
        state_cols=["state_val"],
        salt_interval=3_600_000_000,  # 1-hour buckets in microseconds
    )
    return joined.select("event_id", "user_id", "value", "state_val").orderBy(
        "event_id"
    )


RANGE_W_US = 7_200_000_000  # 2 h lookback, exact integer microseconds
# (sized to the corpus: per-user inter-event gaps are hours, so a 30 s
# window matches nothing at any SF — 2 h gives 82/2006 nonzero clicks
# at sf0.01 and 10/210 at sf0.001, so the count does real work)


@register(
    "q72_range_join_recent_views",
    f"""
    WITH l AS (
        SELECT event_id, user_id, epoch_us(ts) AS its
        FROM events WHERE event_type = 'click'
    ), r AS (
        SELECT user_id, epoch_us(ts) AS its
        FROM events WHERE event_type = 'view'
    )
    SELECT l.event_id, l.user_id,
           CAST((SELECT COUNT(*) FROM r
                 WHERE r.user_id = l.user_id
                   AND r.its >= l.its - {RANGE_W_US}
                   AND r.its <  l.its) AS BIGINT) AS n_views_2h
    FROM l ORDER BY event_id
    """,
)
def q72(spark, sf_dir):
    """Time-range join (an operator Spark has no native form of): for
    every click, count the same user's views in the preceding 2 h.
    Scale shape = the canonical BUCKETED interval join: each view lands
    in exactly one floor(ts/W) bucket, each click probes its two
    covering buckets (range width == bucket width), the join is a plain
    equi-join on (user, bucket) with the true range as a residual
    filter — candidates per click are bounded by per-user-per-30s event
    density, never by corpus size, and the shuffle keys on (user,
    bucket) so a hot user's history still spreads over time buckets.
    A view joins through at most one of the two probe buckets, so no
    double counting; LEFT OUTER + conditional count keeps zero-view
    clicks. The oracle states the same semantics as a correlated COUNT
    (fine at oracle scale, the wrong shape at 100 TB). Timestamps are
    exact integer microseconds both sides (q70's discipline)."""
    ev = t(spark, sf_dir, "events").withColumn(
        "its", F.unix_micros(F.col("ts").cast("timestamp"))
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "its"
    )
    views = (
        ev.filter(F.col("event_type") == "view")
        .select("user_id", F.col("its").alias("v_its"))
        .withColumn("bucket", F.floor(F.col("v_its") / RANGE_W_US))
    )
    # the two probe buckets are always distinct (floor((t-W)/W) ==
    # floor(t/W) - 1 for integer W), so no dedup pass is needed.
    # floor-of-double exactness (a wrong bucket would MISS matches, not
    # just over-probe): its < 2^53 so the dividend is exact, and a
    # non-integer quotient sits >= 1/W ~ 1.4e-10 from any integer while
    # doubles near its/W ~ 2.4e5 are spaced ~3e-11 — correct rounding
    # cannot cross the integer boundary; an exactly-integer quotient is
    # representable and divides exactly.
    probes = clicks.withColumn(
        "bucket",
        F.explode(
            F.array(
                F.floor((F.col("its") - RANGE_W_US) / RANGE_W_US),
                F.floor(F.col("its") / RANGE_W_US),
            )
        ),
    )
    joined = probes.join(views, ["user_id", "bucket"], "left_outer")
    hit = (
        F.col("v_its").isNotNull()
        & (F.col("v_its") >= F.col("its") - RANGE_W_US)
        & (F.col("v_its") < F.col("its"))
    )
    return (
        joined.groupBy("event_id", "user_id")
        .agg(F.count(F.when(hit, 1)).alias("n_views_2h"))
        .orderBy("event_id")
    )
