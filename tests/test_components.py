"""Connected components (dedup-cluster election) vs a pure-Python oracle."""

import random

from warc_bench_spark.operators.components import connected_components


def _uf_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in parent}


def _run(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["id"]: r["comp"] for r in connected_components(df).collect()}
    want = _uf_components(edges)
    assert got == want
    return got


def test_components_random_graph(spark):
    rng = random.Random(11)
    edges = [
        (rng.randint(0, 80), rng.randint(0, 80)) for _ in range(120)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    _run(spark, edges)


def test_components_long_chain_converges(spark):
    """A 25-node path has diameter 24 — min propagation needs ~24 rounds;
    the sum-monotone convergence loop must run them all (adversarial for
    the quasi-clique assumption, still exact)."""
    edges = [(i, i + 1) for i in range(24)]
    got = _run(spark, edges)
    assert set(got.values()) == {0}


def test_components_cap_exhaustion_raises(spark):
    """Non-convergence must RAISE, not return non-minimal labels (ADVICE r4:
    a silent return would break the 'comp = min vertex id' contract)."""
    import pytest

    edges = [(i, i + 1) for i in range(24)]
    df = spark.createDataFrame(edges, "src long, dst long")
    with pytest.raises(RuntimeError, match="fixpoint"):
        connected_components(df, max_iters=2)


def test_components_seeded_init_matches_and_cuts_rounds(spark):
    """Bucket-min seeding: same fixpoint, fewer rounds. A clique needs 2
    rounds unseeded (one to propagate, one to confirm) but exactly 1 with
    correct seeds — so max_iters=1 raises unseeded and succeeds seeded."""
    import pytest

    edges = [(a, b) for a in range(6) for b in range(a + 1, 6)]
    df = spark.createDataFrame(edges, "src long, dst long")
    with pytest.raises(RuntimeError):
        connected_components(df, max_iters=1)
    seeds = spark.createDataFrame([(v, 0) for v in range(6)], "id long, comp long")
    got = {
        r["id"]: r["comp"]
        for r in connected_components(df, max_iters=1, init=seeds).collect()
    }
    assert got == {v: 0 for v in range(6)}


def test_components_partial_and_duplicate_seeds(spark):
    """Seeds may cover only some vertices and repeat ids (the min aggregate
    + left join absorb both); result must still be the component minimum."""
    edges = [(1, 2), (2, 3), (10, 11)]
    df = spark.createDataFrame(edges, "src long, dst long")
    # seed only vertex 3 (with a non-min component member, twice)
    seeds = spark.createDataFrame([(3, 2), (3, 2)], "id long, comp long")
    got = {
        r["id"]: r["comp"]
        for r in connected_components(df, init=seeds).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_components_cliques_and_isolated_pairs(spark):
    edges = (
        [(a, b) for a in range(5) for b in range(a + 1, 5)]  # clique 0-4
        + [(10, 11), (11, 12)]  # path
        + [(20, 21)]  # pair
    )
    got = _run(spark, edges)
    assert all(got[v] == 0 for v in range(5))
    assert got[10] == got[11] == got[12] == 10
    assert got[20] == got[21] == 20
