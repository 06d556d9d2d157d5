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
serializes into one task — the same skew surface as any per-key window;
the politeness two-phase-rank treatment (order-compatible range salting)
applies if a key is hot enough to matter. State columns travel through
one exchange only.
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
) -> DataFrame:
    """Left rows + latest right ``state_cols`` at-or-before ``ts`` per ``on``.

    ``right`` must be unique per (``on``, ``ts``); state columns must not
    collide with left column names. Left rows with no preceding right row
    keep NULL state (left-outer as-of semantics). State values that are
    NULL in the latest right row stay NULL (whole-row fill, see module
    docstring).
    """
    overlap = set(state_cols) & set(left.columns)
    if overlap:
        raise ValueError(f"state columns collide with left columns: {overlap}")
    for internal in ("_asof_src", "_asof_state"):
        if internal in left.columns or internal in right.columns:
            raise ValueError(f"reserved internal column name in input: {internal}")

    state_struct = F.struct(*[F.col(c) for c in state_cols])
    r_tagged = right.select(
        *on, ts, state_struct.alias("_asof_state")
    ).withColumn("_asof_src", F.lit(0))
    l_tagged = left.withColumn(
        "_asof_state",
        F.lit(None).cast(r_tagged.schema["_asof_state"].dataType),
    ).withColumn("_asof_src", F.lit(1))
    unioned = l_tagged.unionByName(r_tagged, allowMissingColumns=True)

    # right (_asof_src=0) before left (_asof_src=1) at equal ts -> at-or-before
    frame = (
        Window.partitionBy(*on)
        .orderBy(F.col(ts).asc(), F.col("_asof_src").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.withColumn(
        "_asof_state", F.last("_asof_state", ignorenulls=True).over(frame)
    )
    out = filled.filter(F.col("_asof_src") == 1)
    for c in state_cols:
        out = out.withColumn(c, F.col(f"_asof_state.{c}"))
    return out.drop("_asof_src", "_asof_state")
