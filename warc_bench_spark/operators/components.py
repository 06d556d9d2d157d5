"""Connected components over candidate-pair edges (dedup clustering).

The MinHash/LSH family (``plans/similarity_text.py``) emits verified
candidate PAIRS; a production dedup pipeline then has to group pairs into
duplicate CLUSTERS and elect one canonical representative per cluster —
i.e. connected components over the pair graph, the step that turns
"q24/q60 candidate pairs" into "keep one doc per duplicate set" (the
at-scale completion of the greedy per-group semantics of
``/root/reference/scripts/goal_filtering.py:8-100``, whose keep-first
rule this mirrors by electing the MINIMUM doc id per component).

Spark shape: iterative min-label propagation — each round every vertex
takes the min of its own label and its neighbors' labels; the fixpoint
assigns every vertex min(component). All per-round work is one
edge⋈labels hash join + a groupBy min + a least() merge, entirely JVM;
the driver only steers the loop. Convergence is detected with a single
``sum(comp)`` aggregate per round: labels only ever decrease, so the sum
is strictly monotone until the fixpoint (an exact-integer check, no row
diffing).

Scale notes (100 TB / 10^10-doc design point):
* edges come from the LSH band join with its stop-bucket cap, so |E| is
  bounded by bucket occupancy, never quadratic in the corpus;
* labels and edges shuffle on vertex id — co-partitioned across rounds
  (the same AQE-planned hash exchange every iteration);
* rounds needed = component diameter under the INITIAL labels. Near-dup
  components are quasi-cliques (every member collides in the same band
  bucket), so 2-4 rounds from identity labels — and usually ONE round
  when the caller seeds labels with the band-bucket minimum (each bucket
  is a clique, so the bucket min already IS the component label unless
  buckets chain; see ``init``). The cap exists for adversarial chains,
  and exhausting it RAISES rather than returning non-minimal labels
  (the fixpoint contract is unconditional). A pointer-jumping variant
  (large-star/small-star) would cut worst-case rounds to O(log d) at the
  cost of two joins/round — not worth it while components are band
  buckets;
* every round references the previous labels TWICE (as the join probe
  and inside the neighbor-min build), so without truncation the logical
  plan tree DOUBLES per round — exponential plan size, driver OOM on a
  25-node path graph. Each round therefore ends in an eager
  ``localCheckpoint()``, which both materializes the labels and cuts the
  lineage to a leaf (the same discipline GraphFrames' CC applies).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iters: int = 50,
    init: DataFrame | None = None,
) -> DataFrame:
    """(src, dst) pair edges -> (id, comp) with comp = min vertex id of the
    component. Deterministic for any partitioning (min is order-free).

    Vertices are the ids appearing in ``edges``; isolated docs never enter
    the dedup graph and keep themselves by definition, so callers that
    need them add ``comp = id`` rows afterwards.

    ``init`` (optional, columns (id, comp)): seed labels. Each seed comp
    MUST be a vertex id inside the same component ("component-dominated" —
    the min-label fixpoint is then unchanged: it converges to min over the
    component of the initial labels, and every vertex contributes its own
    id via ``least``). LSH callers pass the band-bucket minimum, which
    resolves clique-shaped components before the first round and cuts the
    loop to a single confirming iteration. Missing/duplicate ids are fine
    (left join + min aggregate below).

    Raises ``RuntimeError`` if ``max_iters`` rounds pass without reaching
    the fixpoint (component diameter under the initial labels exceeds the
    cap): returning silently would break the "comp = min vertex id"
    contract with labels that are merely *smaller*, not *minimal*.
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .persist()
    )
    labels = sym.select(F.col("a").alias("id")).distinct()
    if init is not None:
        seed = init.groupBy(F.col("id").alias("_sid")).agg(
            F.min("comp").alias("_seed")
        )
        labels = (
            labels.join(seed, labels["id"] == seed["_sid"], "left")
            .select(
                "id",
                F.least(
                    F.col("id"), F.coalesce(F.col("_seed"), F.col("id"))
                ).alias("comp"),
            )
        )
    else:
        labels = labels.withColumn("comp", F.col("id"))
    labels = labels.localCheckpoint()
    prev_sum = labels.agg(F.sum("comp")).collect()[0][0]

    converged = False
    for _ in range(max_iters):
        nbr_min = (
            sym.join(labels, sym["b"] == labels["id"])
            .groupBy("a")
            .agg(F.min("comp").alias("nbr_comp"))
        )
        # eager localCheckpoint: materializes the round AND truncates the
        # doubled-lineage plan (see module docstring)
        labels = (
            labels.join(nbr_min, labels["id"] == nbr_min["a"], "left")
            .select(
                "id",
                F.least(
                    F.col("comp"), F.coalesce(F.col("nbr_comp"), F.col("comp"))
                ).alias("comp"),
            )
            .localCheckpoint()
        )
        cur_sum = labels.agg(F.sum("comp")).collect()[0][0]
        if cur_sum == prev_sum:  # labels only decrease; equal sum = fixpoint
            converged = True
            break
        prev_sum = cur_sum

    sym.unpersist()
    if not converged:
        raise RuntimeError(
            f"connected_components did not reach the min-label fixpoint in "
            f"{max_iters} rounds (component diameter exceeds the cap); "
            "raise max_iters or pre-contract the graph"
        )
    return labels
