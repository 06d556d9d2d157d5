"""As-of (temporal latest-state) join — an operator Spark lacks natively.

"For each left event, attach the most recent right-side state at or before
the event's timestamp, per key" — the relational lift of every
consult-latest-state-before-now pattern in the reference's scheduling
layer (``/root/reference/src/orby/trajectory_collector/ray_scripts/
frequency_limiter.py:24-47`` checks the requests recorded before the
current instant; the crawl analog is "which robots/config snapshot was in
force when this URL was fetched").

Spark-first formulation — NOT a correlated per-row lookup and NOT a range
join: tag both sides, union them, and run ONE window pass per key ordered
by (ts, side) with ``last(value, ignorenulls=True)`` over the preceding
frame. Right rows sort before left rows at equal timestamps, so the join
is at-or-before. Cost = one hash exchange on the key + one sort — the
same price as a groupBy, no matter how many right rows precede each left
row (a correlated max-subquery formulation re-scans per row; a range join
explodes). This is the standard large-scale as-of strategy.

Determinism: callers must make the right side unique per (key, ts) —
otherwise "the" state at a timestamp is ambiguous in ANY engine. The
helper raises nothing at runtime (a distributed uniqueness check would
cost a shuffle); q65's plan dedups with an aggregate first and the test
covers the tie rule.

NULL state values: the fill carries the whole latest right ROW, not each
column independently — state columns ride in one struct, and a struct
literal is non-NULL even when every field is NULL, so a legitimately-NULL
state value in the latest row is preserved instead of falling back to an
older non-null one (which would silently diverge from "latest state
at-or-before" and from q65's latest-row oracle).

Scale notes: the window partitions by the join key, so a hot key
serializes into one task — the same skew surface as any per-key window.
The remedy is IMPLEMENTED here (not just documented): pass ``hot_keys``
(+ ``salt_interval``) and hot keys are range-split on TIME — the
order-compatible salting of the politeness two-phase rank
(``politeness.py:56-90``), transposed from rank-offsets to state
carry-in:

* every row gets ``_salt = floor(ts / salt_interval)`` (cold keys get one
  degenerate bucket, so routing is a single pass with no branch);
* the per-(key, bucket) LATEST right state is a tiny aggregate (one row
  per key x bucket), and a window over that tiny table yields each
  bucket's carry-in = latest right state from all EARLIER buckets;
* carry-in rows are unioned back as synthetic right rows that sort before
  everything in their bucket, so the fill window can partition by
  (key, bucket) — a hot key's timeline now parallelizes across buckets
  while every left row still sees the exact at-or-before state.

Equality with the unsalted plan for ANY salt assignment is the invariant
(``tests/test_asof.py`` pins it on a 50%-hot-key corpus at local[2] and
local[8]).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts: str,
    state_cols: list[str],
    hot_keys: DataFrame | None = None,
    salt_interval: int | None = None,
) -> DataFrame:
    """Left rows + latest right ``state_cols`` at-or-before ``ts`` per ``on``.

    ``right`` must be unique per (``on``, ``ts``); state columns must not
    collide with left column names. Left rows with no preceding right row
    keep NULL state (left-outer as-of semantics). State values that are
    NULL in the latest right row stay NULL (whole-row fill, see module
    docstring).

    Skew remedy (module docstring): pass ``hot_keys`` (a DataFrame of the
    ``on`` columns, from a CHEAP already-materialized source — the
    ``rank_in_host`` caveat applies) plus ``salt_interval`` (a time-range
    width in ``ts`` units) to range-split hot keys' windows across time
    buckets. Results are identical to the unsalted plan for any interval.
    Passing ``salt_interval`` with ``hot_keys=None`` splits EVERY key (the
    all-hot case).
    """
    overlap = set(state_cols) & set(left.columns)
    if overlap:
        raise ValueError(f"state columns collide with left columns: {overlap}")
    for internal in ("_asof_src", "_asof_state", "_asof_salt"):
        if internal in left.columns or internal in right.columns:
            raise ValueError(f"reserved internal column name in input: {internal}")

    state_struct = F.struct(*[F.col(c) for c in state_cols])
    r_tagged = right.select(
        *on, ts, state_struct.alias("_asof_state")
    ).withColumn("_asof_src", F.lit(0))
    state_type = r_tagged.schema["_asof_state"].dataType
    l_tagged = left.withColumn(
        "_asof_state", F.lit(None).cast(state_type)
    ).withColumn("_asof_src", F.lit(1))
    unioned = l_tagged.unionByName(r_tagged, allowMissingColumns=True)

    if salt_interval is not None:
        bucket = F.floor(F.col(ts).cast("long") / F.lit(salt_interval))
        if hot_keys is None:
            salted = unioned.withColumn("_asof_salt", bucket)
        else:
            # single-pass routing, no branch: cold keys collapse to one
            # degenerate bucket (== the plain per-key window)
            flag = F.broadcast(
                hot_keys.select(*on).distinct().withColumn("_hot", F.lit(True))
            )
            salted = (
                unioned.join(flag, on, "left")
                .withColumn(
                    "_asof_salt",
                    F.when(F.col("_hot").isNotNull(), bucket).otherwise(F.lit(0)),
                )
                .drop("_hot")
            )
        # tiny per-(key, bucket) table: latest right state inside the bucket
        # (right unique per (key, ts) -> max_by on ts is well-defined), and
        # EVERY occupied bucket (left or right rows) so no carry-in is lost
        per_bucket = salted.groupBy(*on, "_asof_salt").agg(
            F.max_by(
                "_asof_state", F.when(F.col("_asof_src") == 0, F.col(ts))
            ).alias("_latest")
        )
        w_carry = (
            Window.partitionBy(*on)
            .orderBy("_asof_salt")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        carry = (
            per_bucket.withColumn(
                "_asof_state", F.last("_latest", ignorenulls=True).over(w_carry)
            )
            .filter(F.col("_asof_state").isNotNull())
            # synthetic right row at the head of its bucket: NULL ts sorts
            # first under asc_nulls_first, src=-1 beats real rows at any tie
            .select(
                *on,
                F.lit(None).cast(salted.schema[ts].dataType).alias(ts),
                "_asof_state",
                F.lit(-1).alias("_asof_src"),
                "_asof_salt",
            )
        )
        unioned = salted.unionByName(carry, allowMissingColumns=True)
        part_cols: list = [*on, "_asof_salt"]
    else:
        part_cols = list(on)

    # right (_asof_src=0) before left (_asof_src=1) at equal ts -> at-or-before
    frame = (
        Window.partitionBy(*part_cols)
        .orderBy(F.col(ts).asc_nulls_first(), F.col("_asof_src").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.withColumn(
        "_asof_state", F.last("_asof_state", ignorenulls=True).over(frame)
    )
    out = filled.filter(F.col("_asof_src") == 1)
    for c in state_cols:
        out = out.withColumn(c, F.col(f"_asof_state.{c}"))
    return out.drop("_asof_src", "_asof_state", "_asof_salt")
