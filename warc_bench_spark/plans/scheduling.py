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
