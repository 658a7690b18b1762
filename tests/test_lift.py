"""Lifting correctness: hand-derived structural expectations + cross-checks.

Mirrors the reference's test strategy (/root/reference/data/test_utils.py and
data/helper_test.py): exact expectations on small fixtures, plus an
independent-implementation cross-check of the ring search (networkx
chordless_cycles) on random graphs.
"""
import numpy as np
import pytest

from cwn_tpu.lift import clique_complex, find_induced_cycles, ring_2complex
from tests.fixtures import (
    all_test_graphs,
    bridged_graph,
    fullstop_graph,
    house_graph,
    kite_graph,
    pyramid_graph,
    square_graph,
)


def adj_multiset(index, shared):
    """Canonical multiset of (src, dst, shared) triples."""
    if index is None:
        return set()
    return {(int(index[0, i]), int(index[1, i]), int(shared[i]))
            for i in range(index.shape[1])}


def test_house_clique_complex():
    g = house_graph()
    c = clique_complex(g.x, g.edge_index, g.num_nodes, expansion_dim=2, y=g.y)

    assert c.dimension == 2
    assert c.cochains[0].num_cells == 5
    assert c.cochains[1].num_cells == 6
    assert c.cochains[2].num_cells == 1

    # Edge ids in lexicographic order.
    edge_list = [(0, 1), (0, 3), (1, 2), (2, 3), (2, 4), (3, 4)]
    bi = c.cochains[1].boundary_index
    got_edges = [tuple(sorted(bi[0, bi[1] == e])) for e in range(6)]
    assert got_edges == edge_list

    # Triangle (2,3,4): boundaries are edges (2,3)=3, (2,4)=4, (3,4)=5.
    t_bi = c.cochains[2].boundary_index
    assert sorted(t_bi[0].tolist()) == [3, 4, 5]
    assert (t_bi[1] == 0).all()

    # Vertex upper adjacency: one symmetric pair per edge, shared cob = edge id.
    expect_v_up = set()
    for e, (u, v) in enumerate(edge_list):
        expect_v_up.add((u, v, e))
        expect_v_up.add((v, u, e))
    assert adj_multiset(c.cochains[0].upper_index,
                        c.cochains[0].shared_coboundaries) == expect_v_up

    # Edge upper adjacency: pairs of triangle boundaries {3,4,5}, shared cob 0.
    expect_e_up = {(a, b, 0) for a in (3, 4, 5) for b in (3, 4, 5) if a != b}
    assert adj_multiset(c.cochains[1].upper_index,
                        c.cochains[1].shared_coboundaries) == expect_e_up

    # Edge lower adjacency: edges sharing a vertex.
    expect_e_down = set()
    for e1 in range(6):
        for e2 in range(6):
            if e1 == e2:
                continue
            shared = set(edge_list[e1]) & set(edge_list[e2])
            for v in shared:
                expect_e_down.add((e1, e2, v))
    assert adj_multiset(c.cochains[1].lower_index,
                        c.cochains[1].shared_boundaries) == expect_e_down

    # Features: edges/triangles sum member vertex features (x = id+1).
    assert c.cochains[1].x[:, 0].tolist() == [3.0, 5.0, 5.0, 7.0, 8.0, 9.0]
    assert c.cochains[2].x[:, 0].tolist() == [12.0]
    assert c.y.tolist() == [5]


def test_house_ring_complex():
    g = house_graph()
    c = ring_2complex(g.x, g.edge_index, None, g.num_nodes, y=g.y, max_k=6)

    # 2-cells: triangle (3 verts) then square (4 verts).
    assert c.cochains[2].num_cells == 2
    bi = c.cochains[2].boundary_index
    ring0 = sorted(bi[0, bi[1] == 0].tolist())
    ring1 = sorted(bi[0, bi[1] == 1].tolist())
    assert ring0 == [3, 4, 5]          # triangle edges (2,3),(2,4),(3,4)
    assert ring1 == [0, 1, 2, 3]       # square edges (0,1),(0,3),(1,2),(2,3)

    # Edge upper adjacency: all pairs within each ring's boundary set.
    expect = set()
    for rid, edges in [(0, [3, 4, 5]), (1, [0, 1, 2, 3])]:
        for a in edges:
            for b in edges:
                if a != b:
                    expect.add((a, b, rid))
    assert adj_multiset(c.cochains[1].upper_index,
                        c.cochains[1].shared_coboundaries) == expect


def test_ring_max_k_sensitivity():
    g = house_graph()
    c3 = ring_2complex(g.x, g.edge_index, None, g.num_nodes, max_k=3)
    assert c3.cochains[2].num_cells == 1    # only the triangle
    c4 = ring_2complex(g.x, g.edge_index, None, g.num_nodes, max_k=4)
    assert c4.cochains[2].num_cells == 2


def test_bridged_rings():
    g = bridged_graph()
    rings = find_induced_cycles(g.edge_index, g.num_nodes, max_k=4)
    ring_sets = {tuple(sorted(r)) for r in rings}
    assert ring_sets == {(0, 1, 3, 4), (1, 2, 3, 4), (0, 1, 2, 3)}


def test_pyramid_clique_dim3():
    g = pyramid_graph()
    c = clique_complex(g.x, g.edge_index, g.num_nodes, expansion_dim=3)
    assert c.dimension == 3
    assert [c.cochains[d].num_cells for d in range(4)] == [4, 6, 4, 1]
    # The tetrahedron's boundaries are all four triangles.
    assert sorted(c.cochains[3].boundary_index[0].tolist()) == [0, 1, 2, 3]


def test_fullstop_no_edges():
    g = fullstop_graph()
    c = ring_2complex(g.x, g.edge_index, None, g.num_nodes, max_k=6)
    assert c.dimension == 0
    assert c.cochains[0].num_cells == 1
    assert c.cochains[0].upper_index is None


def test_edge_features_undirected():
    g = square_graph()
    # Per-direction edge attrs that agree across directions.
    ea = np.array([[1.], [1.], [2.], [2.], [3.], [3.], [4.], [4.]])
    c = ring_2complex(g.x, g.edge_index, ea, g.num_nodes, max_k=4)
    # edges lex: (0,1)=a1, (0,3)=a4, (1,2)=a2, (2,3)=a3
    assert c.cochains[1].x[:, 0].tolist() == [1.0, 4.0, 2.0, 3.0]


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_rings_cross_check_networkx(seed):
    """Independent re-implementation cross-check (reference does the same vs
    networkx, data/helper_test.py:68-100)."""
    import networkx as nx
    rng = np.random.default_rng(seed)
    n = 12
    p = 0.25
    mask = rng.random((n, n)) < p
    pairs = [(i, j) for i in range(n) for j in range(i + 1, n) if mask[i, j]]
    if not pairs:
        pytest.skip("empty graph")
    ei = np.array([[u for u, v in pairs] + [v for u, v in pairs],
                   [v for u, v in pairs] + [u for u, v in pairs]])
    max_k = 7

    mine = {tuple(sorted(r)) for r in find_induced_cycles(ei, n, max_k=max_k)}
    G = nx.Graph(pairs)
    theirs = {tuple(sorted(cyc)) for cyc in nx.chordless_cycles(G, length_bound=max_k)}
    assert mine == theirs


def test_all_fixtures_lift_clean():
    for g in all_test_graphs():
        c = ring_2complex(g.x, g.edge_index, None, g.num_nodes, max_k=7)
        cc = clique_complex(g.x, g.edge_index, g.num_nodes, expansion_dim=2)
        for comp in (c, cc):
            for dim, co in comp.cochains.items():
                if co.boundary_index is not None and dim > 0:
                    assert co.boundary_index[0].max() < comp.cochains[dim - 1].num_cells


def test_native_ring_kernel_matches_python():
    """The C++ enumeration must agree with the pure-Python oracle."""
    rng = np.random.default_rng(7)
    for seed in range(4):
        r = np.random.default_rng(seed)
        n = 30
        mask = r.random((n, n)) < 0.15
        pairs = [(i, j) for i in range(n) for j in range(i + 1, n) if mask[i, j]]
        if not pairs:
            continue
        ei = np.array([[u for u, v in pairs] + [v for u, v in pairs],
                       [v for u, v in pairs] + [u for u, v in pairs]])
        a = find_induced_cycles(ei, n, max_k=8, use_native=True)
        b = find_induced_cycles(ei, n, max_k=8, use_native=False)
        assert a == b
