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
