"""PageRank: oracle parity on small graphs, isolated-node semantics."""

import pytest

from fastdup_spark.operators.pagerank import pagerank


def _oracle(edges, nodes, damping=0.85, iters=50):
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    allnodes = set(nodes) | set(adj)
    r = {n: 1.0 for n in allnodes}
    for _ in range(iters):
        new = {}
        for n in allnodes:
            inflow = sum(r[m] / len(adj[m]) for m in adj.get(n, ()) if m in adj)
            new[n] = (1 - damping) + damping * inflow
        r = new
    return r


def test_pagerank_matches_oracle(spark):
    edges = [(1, 2), (2, 3), (3, 1), (3, 4)]
    e = spark.createDataFrame(edges, "src long, dst long")
    got = {r["doc_id"]: r["pagerank"] for r in pagerank(e, max_iter=50, tol=1e-9).collect()}
    want = _oracle(edges, [])
    for n, v in want.items():
        assert got[n] == pytest.approx(v, abs=1e-3)


def test_pagerank_symmetric_clique(spark):
    edges = [(1, 2), (1, 3), (2, 3)]
    e = spark.createDataFrame(edges, "src long, dst long")
    got = [r["pagerank"] for r in pagerank(e).collect()]
    assert max(got) - min(got) < 1e-6  # symmetry -> equal ranks


def test_pagerank_isolated_nodes(spark):
    e = spark.createDataFrame([(1, 2)], "src long, dst long")
    v = spark.createDataFrame([(1,), (2,), (9,)], "doc_id long")
    got = {r["doc_id"]: r["pagerank"] for r in pagerank(e, vertices=v).collect()}
    assert got[9] == pytest.approx(0.15, abs=1e-6)  # teleport mass only
    assert got[1] == got[2]
