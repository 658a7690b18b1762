"""Clique-lift structural collision analysis (exp/analysis.py).

Backs the BASELINE.md explanation of the clique SR sweep's residual
failures: failing pairs are exactly the pairs whose clique complexes have
identical per-dim cell/adjacency counts.
"""
import json
import os

import numpy as np
import pytest

from cwn_tpu.exp.analysis import clique_structure_signature
from cwn_tpu.lift.simplicial import clique_complex


def _complex_of(edges, n, dim=3):
    ei = np.array([[u for u, v in edges] + [v for u, v in edges],
                   [v for u, v in edges] + [u for u, v in edges]])
    return clique_complex(np.ones((n, 1), np.float32), ei, n,
                          expansion_dim=dim, include_down_adj=True)


def test_signature_invariant_under_relabeling():
    # K4 with a pendant vertex, and a relabeled copy.
    edges = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3), (3, 4)]
    perm = [2, 4, 0, 1, 3]
    edges_p = [(perm[u], perm[v]) for u, v in edges]
    s1 = clique_structure_signature(_complex_of(edges, 5))
    s2 = clique_structure_signature(_complex_of(edges_p, 5))
    assert s1 == s2


def test_signature_separates_different_clique_structure():
    # Same vertex and edge count: a 4-cycle + chord path vs a triangle
    # + disjoint edge: different triangle (2-cell) counts.
    tri = [(0, 1), (1, 2), (0, 2), (3, 4)]
    cyc = [(0, 1), (1, 2), (2, 3), (3, 0)]
    s_tri = clique_structure_signature(_complex_of(tri, 5))
    s_cyc = clique_structure_signature(_complex_of(cyc, 5))
    assert s_tri != s_cyc


ARTIFACT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "exp_results", "sr_clique_analysis.json")


@pytest.mark.skipif(not os.path.exists(ARTIFACT),
                    reason="sr_clique_analysis.json not generated")
def test_clique_failures_are_structural_collisions():
    """Every measured clique-sweep failure rate is bounded by the family's
    colliding-pair fraction, and collision-free families were solved."""
    with open(ARTIFACT) as f:
        fams = json.load(f)["families"]
    assert fams, "empty analysis artifact"
    for fam, res in fams.items():
        if "measured_failure_mean" not in res:
            continue
        assert res["measured_failure_mean"] <= \
            res["colliding_pair_fraction"] + 1e-12, fam
        if res["colliding_pairs"] == 0:
            assert res["measured_failure_mean"] == 0.0, fam
