"""North-rule score parity: page_rank vs an INDEPENDENT dense numpy
implementation of the reference's delta-push power iteration
(PageRankComputation.java semantics, re-derived here from the update rule,
not from operators/pagerank.py) — per-vertex scores must be allclose at
1e-6 on a seeded random web-ish graph, for plain / weighted / personalized
variants.  The fixture tests (test_pagerank.py) pin the reference's own
values at its SCORE_PRECISION 1e-5; this test pins the distributed
implementation against exact float64 math at the north rule's 1e-6."""

import numpy as np
import pytest

from graph_data_science_spark.operators.graph import LinkGraph
from graph_data_science_spark.operators.pagerank import PageRankConfig, page_rank


def _random_graph(seed: int, n: int = 64, m: int = 400):
    """Seeded digraph with hubby out-degrees, self-loop-free, deduped."""
    rng = np.random.RandomState(seed)
    # square a uniform to skew sources toward low ids (hubs)
    src = (rng.uniform(0, 1, m) ** 2 * n).astype(int)
    dst = rng.randint(0, n, m)
    keep = src != dst
    edges = sorted({(int(s), int(d)) for s, d in zip(src[keep], dst[keep])})
    weights = {
        e: float(np.random.RandomState((e[0] * 9973 + e[1]) % (2**31)).uniform(0.5, 3.0))
        for e in edges
    }
    return n, edges, weights


def _numpy_delta_pagerank(
    n, edges, damping, tolerance, max_iterations, weights=None, sources=None
):
    """Dense float64 delta-push: init rank = delta = 1-d (sources only when
    personalized); each superstep delta' = d * A^T (delta/deg gated at
    delta > tol, ungated on the first superstep); rank += delta'; dangling
    mass is NOT redistributed; converged when no delta' exceeds tol."""
    alpha = 1.0 - damping
    w = np.zeros((n, n))
    for (s, d) in edges:
        w[s, d] = weights[(s, d)] if weights is not None else 1.0
    deg = w.sum(axis=1)
    share = np.divide(w, deg[:, None], out=np.zeros_like(w), where=deg[:, None] > 0)

    rank = np.full(n, alpha)
    if sources is not None:
        rank = np.where(np.isin(np.arange(n), sources), alpha, 0.0)
    delta = rank.copy()
    ran, converged = max_iterations, False
    for t in range(1, max_iterations):
        gate = 0.0 if t == 1 else tolerance
        sending = np.where(delta > gate, delta, 0.0)
        delta = damping * (share.T @ sending)
        rank = rank + delta
        if tolerance > 0.0 and not (delta > tolerance).any():
            ran, converged = t, True
            break
    return rank, ran, converged


@pytest.mark.parametrize(
    "variant,seed",
    [("plain", 7), ("weighted", 11), ("personalized", 13)],
)
def test_page_rank_allclose_1e6_vs_numpy(spark, variant, seed):
    n, edges, weights = _random_graph(seed)
    tol, iters = 1e-9, 25
    kw = {}
    edge_tuples = edges
    np_weights = None
    if variant == "weighted":
        edge_tuples = [(s, d, weights[(s, d)]) for s, d in edges]
        np_weights = weights
        kw["weighted"] = True
    if variant == "personalized":
        kw["source_nodes"] = [0, 3, 5]
    g = LinkGraph.from_edges(spark, edge_tuples, nodes=range(n))
    res = page_rank(
        g,
        PageRankConfig(
            tolerance=tol, max_iterations=iters, checkpoint_every=4, **kw
        ),
    )
    got = np.zeros(n)
    for r in res.scores.collect():
        got[r["id"]] = r["score"]
    want, ran, converged = _numpy_delta_pagerank(
        n, edges, 0.85, tol, iters,
        weights=np_weights, sources=kw.get("source_nodes"),
    )
    np.testing.assert_allclose(got, want, atol=1e-6, rtol=0)
    # float64 vs distributed summation should in fact agree far tighter
    np.testing.assert_allclose(got, want, atol=1e-10, rtol=0)
    assert res.did_converge == converged
