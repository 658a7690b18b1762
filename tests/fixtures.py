"""Hand-built test graphs mirroring the reference's dummy complexes.

Unlike the reference (which hand-writes every index tensor,
/root/reference/data/dummy_complexes.py), we hand-write only the *graphs*
and the expected *structural facts* (cell sets, boundary sets, adjacency
multisets); the complexes themselves are produced by our lift.  Tests then
check the lift output against the hand-derived facts.
"""
import numpy as np

from cwn_tpu.data import Graph


def undirected(pairs):
    """Expand undirected pairs into a [2, 2E] directed edge_index."""
    src, dst = [], []
    for u, v in pairs:
        src += [u, v]
        dst += [v, u]
    return np.array([src, dst])


def house_graph() -> Graph:
    """Square 0-1-2-3 with roof vertex 4 over edge 2-3 (triangle 2-3-4)."""
    return Graph(
        x=np.arange(1, 6, dtype=np.float32).reshape(-1, 1),
        edge_index=undirected([(0, 1), (1, 2), (2, 3), (0, 3), (3, 4), (2, 4)]),
        y=np.array([5]),
    )


def kite_graph() -> Graph:
    """Two triangles 0-1-2, 1-2-3 sharing edge 1-2, plus tail 3-4."""
    return Graph(
        x=np.arange(1, 6, dtype=np.float32).reshape(-1, 1),
        edge_index=undirected([(0, 1), (0, 2), (1, 2), (1, 3), (2, 3), (3, 4)]),
        y=np.array([5]),
    )


def square_graph() -> Graph:
    return Graph(
        x=np.arange(1, 5, dtype=np.float32).reshape(-1, 1),
        edge_index=undirected([(0, 1), (1, 2), (2, 3), (0, 3)]),
        y=np.array([4]),
    )


def square_dot_graph() -> Graph:
    """Square plus an isolated vertex (edge case: cell with no adjacency)."""
    return Graph(
        x=np.arange(1, 6, dtype=np.float32).reshape(-1, 1),
        edge_index=undirected([(0, 1), (1, 2), (2, 3), (0, 3)]),
        y=np.array([5]),
    )


def fullstop_graph() -> Graph:
    """A single isolated vertex (edge case: no edges at all)."""
    return Graph(x=np.ones((1, 1), np.float32),
                 edge_index=np.zeros((2, 0), np.int64), y=np.array([1]))


def colon_graph() -> Graph:
    """Two isolated vertices."""
    return Graph(x=np.ones((2, 1), np.float32),
                 edge_index=np.zeros((2, 0), np.int64), y=np.array([2]))


def bridged_graph() -> Graph:
    """Square 0-1-2-3 with bridge 1-4-3: rings 0-1-4-3, 1-2-3-4, 0-1-2-3."""
    return Graph(
        x=np.arange(1, 6, dtype=np.float32).reshape(-1, 1),
        edge_index=undirected([(0, 1), (1, 2), (2, 3), (0, 3), (1, 4), (3, 4)]),
        y=np.array([5]),
    )


def pyramid_graph() -> Graph:
    """K4: tetrahedron (3-dimensional clique complex)."""
    return Graph(
        x=np.arange(1, 5, dtype=np.float32).reshape(-1, 1),
        edge_index=undirected([(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]),
        y=np.array([4]),
    )


def molecular_graph() -> Graph:
    """Ring of 5 with a pendant plus a square; molecule-ish shape."""
    return Graph(
        x=np.arange(1, 9, dtype=np.float32).reshape(-1, 1),
        edge_index=undirected([(0, 1), (1, 2), (2, 3), (3, 4), (0, 4),
                               (4, 5), (5, 6), (6, 7), (2, 7)]),
        y=np.array([8]),
    )


def all_test_graphs():
    return [house_graph(), kite_graph(), square_graph(), square_dot_graph(),
            fullstop_graph(), colon_graph(), bridged_graph(), pyramid_graph(),
            molecular_graph()]
