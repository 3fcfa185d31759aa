"""Fuzz the exact rank-assignment solver against brute-force enumeration."""

import itertools

import numpy as np

from tensor_networks_tpu.search.constraint import (
    BAD_SCORE,
    RankAssignmentSolver,
)

np.random.seed(17)


def _random_instance(rng):
    n_edges = int(rng.integers(1, 5))
    edges = [f"e{i}" for i in range(n_edges)]
    cands = {}
    errs = {}
    for e in edges:
        k = int(rng.integers(2, 6))
        sizes = sorted(
            set(int(s) for s in rng.integers(1, 30, size=k)), reverse=True
        )
        # larger kept size -> smaller truncation error
        errors = sorted(rng.uniform(0, 1, size=len(sizes)))
        cands[e] = sizes
        errs[e] = errors

    n_nodes = int(rng.integers(1, 4))
    terms = []
    for _ in range(n_nodes):
        fixed = float(rng.integers(1, 10))
        attached = [
            e for e in edges if rng.random() < 0.7
        ] or [edges[0]]
        terms.append((fixed, attached))
    return edges, cands, errs, terms


def _brute_force(edges, cands, errs, terms, delta, upper):
    best_cost = None
    for combo in itertools.product(*[range(len(cands[e])) for e in edges]):
        err = sum(errs[e][i] for e, i in zip(edges, combo))
        if err > delta**2:
            continue
        assign = {e: cands[e][i] for e, i in zip(edges, combo)}
        cost = sum(
            fixed * np.prod([assign[e] for e in attached])
            for fixed, attached in terms
        )
        if cost <= upper and (best_cost is None or cost < best_cost):
            best_cost = cost
    return best_cost


def test_solver_matches_brute_force():
    rng = np.random.default_rng(3)
    for _ in range(60):
        edges, cands, errs, terms = _random_instance(rng)
        delta = float(np.sqrt(rng.uniform(0.1, 2.0)))
        upper = float(rng.integers(50, 20000))

        solver = RankAssignmentSolver()
        for e in edges:
            solver.add_edge(e, cands[e], errs[e])
        for fixed, attached in terms:
            solver.add_node_term(fixed, attached)
        assign, cost = solver.solve(delta, upper)

        expected = _brute_force(edges, cands, errs, terms, delta, upper)
        if expected is None:
            assert assign is None and cost == BAD_SCORE
        else:
            assert assign is not None
            assert np.isclose(cost, expected), (cost, expected)
            # the reported assignment must actually achieve that cost
            achieved = sum(
                fixed * np.prod([assign[e] for e in attached])
                for fixed, attached in terms
            )
            assert np.isclose(achieved, cost)
            err = sum(
                errs[e][cands[e].index(assign[e])] for e in edges
            )
            assert err <= delta**2 + 1e-12
