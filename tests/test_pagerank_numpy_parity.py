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


def test_extrapolated_page_rank_vs_exact_linear_solve(spark):
    """The Aitken-extrapolated path must land within the RIGOROUS error bound
    of the exact fixpoint x = (I - d·Mᵀ)⁻¹ · α1 (direct float64 solve, no
    iteration): the loop stops when ‖δ‖∞ ≤ tol, the returned vector's
    residual is d·Mᵀδ, and error = (I - d·Mᵀ)⁻¹ · residual, so
    ‖error‖∞ ≤ tol · max(1, ‖d·Mᵀ‖∞) · ‖(I - d·Mᵀ)⁻¹‖∞ — computed exactly
    on the 64-node graph.  It must also converge in fewer supersteps than
    the plain recurrence needs (independently simulated in numpy)."""
    n, edges, _ = _random_graph(17)
    d, tol = 0.85, 1e-7
    g = LinkGraph.from_edges(spark, edges, nodes=range(n))
    res = page_rank(
        g,
        PageRankConfig(
            tolerance=tol, max_iterations=120,
            checkpoint_every=4, extrapolate_every=8,
        ),
    )
    assert res.did_converge
    got = np.zeros(n)
    for r in res.scores.collect():
        got[r["id"]] = r["score"]

    w = np.zeros((n, n))
    for (s, t) in edges:
        w[s, t] = 1.0
    deg = w.sum(axis=1)
    share = np.divide(w, deg[:, None], out=np.zeros_like(w), where=deg[:, None] > 0)
    A = np.eye(n) - d * share.T
    exact = np.linalg.solve(A, np.full(n, 0.15))
    inv_norm = np.abs(np.linalg.inv(A)).sum(axis=1).max()
    mt_norm = d * share.sum(axis=0).max()
    bound = tol * max(1.0, mt_norm) * inv_norm
    assert np.abs(got - exact).max() <= bound

    _, ran_plain, conv_plain = _numpy_delta_pagerank(n, edges, d, tol, 200)
    assert conv_plain
    assert res.ran_iterations < ran_plain
