"""Engine-level propagate tests with hand-computed expected aggregates.

Parity: /root/reference/mp/test_cell_mp.py:13-268 — the same house /
square-dot / fullstop / colon / bridged structures, the same exact expected
message tensors (adapted to our canonical cell ordering where the complex
comes from the lift), hand-written index tensors for the engine-isolation
cases.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from cwn_tpu.batch import pack_complexes
from cwn_tpu.complex import Cochain, Complex
from cwn_tpu.lift import ring_2complex
from cwn_tpu.mp import gather_down_attr, gather_up_attr, propagate
from tests.fixtures import bridged_graph, colon_graph, fullstop_graph, \
    square_dot_graph

IDENT = lambda xj, attr: xj
B_IDENT = lambda xj: xj
ADD_ATTR = lambda xj, attr: xj + attr


def house_complex() -> Complex:
    """The reference's hand-built house (data/dummy_complexes.py:45):
    square 0-1-2-3, roof vertex 4 over edge 2-3; edges numbered
    e0=(0,1) e1=(1,2) e2=(2,3) e3=(0,3) e4=(3,4) e5=(2,4); one triangle
    t0 = {e2, e4, e5}.  Features are 1..N per dim."""
    both = lambda pairs: np.array(
        [[u for u, v in pairs] + [v for u, v in pairs],
         [v for u, v in pairs] + [u for u, v in pairs]])
    dup = lambda vals: np.array(vals + vals)

    v_pairs = [(0, 1), (1, 2), (2, 3), (0, 3), (3, 4), (2, 4)]
    v = Cochain(dim=0, x=np.arange(1, 6, dtype=np.float32).reshape(-1, 1),
                upper_index=both(v_pairs),
                shared_coboundaries=dup([0, 1, 2, 3, 4, 5]),
                num_cells_up=6)

    e_up_pairs = [(2, 4), (2, 5), (4, 5)]
    e_down_pairs = [(0, 3), (0, 1), (1, 2), (1, 5), (2, 3), (2, 4),
                    (2, 5), (3, 4), (4, 5)]
    e_down_shared = [0, 1, 2, 2, 3, 3, 2, 3, 4]
    e_boundary = np.array([[0, 1, 1, 2, 2, 3, 0, 3, 3, 4, 2, 4],
                           [0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5]])
    e = Cochain(dim=1, x=np.arange(1, 7, dtype=np.float32).reshape(-1, 1),
                upper_index=both(e_up_pairs),
                shared_coboundaries=dup([0, 0, 0]),
                lower_index=both(e_down_pairs),
                shared_boundaries=dup(e_down_shared),
                boundary_index=e_boundary,
                num_cells_up=1, num_cells_down=5)

    t = Cochain(dim=2, x=np.array([[1.0]], np.float32),
                boundary_index=np.array([[2, 4, 5], [0, 0, 0]]),
                num_cells_down=6)
    return Complex(v, e, t, y=np.array([1]))


def _prop(batch, k, x_down=None, x_up=None, **kw):
    buf = batch.dims[k]
    up_attr = gather_up_attr(buf, x_up)
    down_attr = gather_down_attr(buf, x_down)
    return propagate(buf, buf.x, up_attr=up_attr, down_attr=down_attr,
                     boundary_attr=x_down, **kw)


def test_house_vertex_level():
    """Parity: test_propagate_at_vertex_level_in_cmp (exact tensors)."""
    batch = pack_complexes([house_complex()], max_dim=2, pad_multiple=8)
    up, down, boundary = _prop(batch, 0, message_up=IDENT,
                               message_down=IDENT, message_boundary=B_IDENT)
    assert np.array_equal(np.asarray(up)[:5], [[6], [4], [11], [9], [7]])
    assert not np.any(np.asarray(down))
    assert not np.any(np.asarray(boundary))


def test_house_vertex_level_with_coboundary_attr():
    """Upper messages x_j + x_{shared edge} — checks the up_attr gather."""
    batch = pack_complexes([house_complex()], max_dim=2, pad_multiple=8)
    x_e = jnp.asarray(batch.dims[1].x)
    up, _, _ = _prop(batch, 0, x_up=x_e, message_up=ADD_ATTR)
    assert np.array_equal(np.asarray(up)[:5], [[11], [7], [22], [21], [18]])


def test_house_edge_level():
    """Parity: test_edge_propagate_in_cmp (exact tensors)."""
    batch = pack_complexes([house_complex()], max_dim=2, pad_multiple=8)
    x_v = jnp.asarray(batch.dims[0].x)
    up, down, boundary = _prop(batch, 1, x_down=x_v, message_up=IDENT,
                               message_down=IDENT, message_boundary=B_IDENT)
    assert np.array_equal(np.asarray(up)[:6], [[0], [0], [11], [0], [9], [8]])
    assert np.array_equal(np.asarray(down)[:6],
                          [[6], [10], [17], [9], [13], [10]])
    assert np.array_equal(np.asarray(boundary)[:6],
                          [[3], [5], [7], [5], [9], [8]])


def test_house_edge_level_with_attrs():
    """Lower messages x_j + x_{shared vertex}; upper x_j + x_{triangle}."""
    batch = pack_complexes([house_complex()], max_dim=2, pad_multiple=8)
    x_v = jnp.asarray(batch.dims[0].x)
    x_t = jnp.asarray(batch.dims[2].x)
    up, down, _ = _prop(batch, 1, x_down=x_v, x_up=x_t,
                        message_up=ADD_ATTR, message_down=ADD_ATTR)
    # down: e0: (2+2)+(4+1)=9; e1: (1+2)+(3+3)+(6+3)=18; e2: (2+3)+(6+3)+
    # (4+4)+(5+4)=31; e3: (1+1)+(3+4)+(5+4)=18; e4: (3+4)+(4+4)+(6+5)=26;
    # e5: (2+3)+(3+3)+(5+5)=21
    assert np.array_equal(np.asarray(down)[:6],
                          [[9], [18], [31], [18], [26], [21]])
    # up (triangle attr = 1): e2: (5+1)+(6+1)=13; e4: 11; e5: 10
    assert np.array_equal(np.asarray(up)[:6],
                          [[0], [0], [13], [0], [11], [10]])


def test_house_two_cell_level():
    """Parity: test_propagate_at_two_cell_level...single_one."""
    batch = pack_complexes([house_complex()], max_dim=2, pad_multiple=8)
    x_e = jnp.asarray(batch.dims[1].x)
    up, down, boundary = _prop(batch, 2, x_down=x_e, message_up=IDENT,
                               message_down=IDENT, message_boundary=B_IDENT)
    assert not np.any(np.asarray(up))
    assert not np.any(np.asarray(down))
    assert np.array_equal(np.asarray(boundary)[:1], [[14]])


@pytest.mark.parametrize("graph,n_iso", [(square_dot_graph(), [4]),
                                         (fullstop_graph(), [0]),
                                         (colon_graph(), [0, 1])])
def test_isolated_vertices_get_zero_messages(graph, n_iso):
    """Parity: test_smp_messaging_with_isolated_nodes etc. — isolated
    vertices receive exactly the zero vector."""
    c = ring_2complex(graph.x, graph.edge_index, None, graph.num_nodes,
                      y=graph.y, max_k=7)
    batch = pack_complexes([c], max_dim=2, pad_multiple=8)
    up, _, _ = _prop(batch, 0, message_up=IDENT)
    up = np.asarray(up)
    for v in n_iso:
        assert not np.any(up[v])
    connected = [v for v in range(graph.num_nodes) if v not in n_iso]
    for v in connected:
        assert np.any(up[v])


def _edge_key_to_id(complex_):
    """edge id -> (u, v) from the dim-1 boundary index of a lifted complex."""
    b = complex_.cochains[1].boundary_index
    pairs = {}
    for vert, edge in zip(b[0], b[1]):
        pairs.setdefault(int(edge), []).append(int(vert))
    return {tuple(sorted(vs)): e for e, vs in pairs.items()}


def test_bridged_replicated_adjacencies():
    """Parity: test_cmp_messaging_with_replicated_adjs — cells sharing
    MORE THAN ONE (co)boundary exchange one message per shared cell.

    Bridged graph: square 0-1-2-3 with bridge 1-4-3.  Rings (by vertex
    set): A=0-1-4-3, B=1-2-3-4, C=0-1-2-3; every ring pair shares TWO
    edges, so each lower-adjacency message counts twice."""
    g = bridged_graph()
    c = ring_2complex(g.x, g.edge_index, None, g.num_nodes, y=g.y,
                  max_k=7, init_rings=True)
    assert c.two_cells.num_cells == 3

    eid = _edge_key_to_id(c)
    # Ring ids by boundary edge sets.
    ring_edges = {}
    b2 = c.cochains[2].boundary_index
    for e, r in zip(b2[0], b2[1]):
        ring_edges.setdefault(int(r), set()).add(int(e))
    key = lambda *pairs: frozenset(eid[p] for p in pairs)
    rid = {frozenset(v): k for k, v in ring_edges.items()}
    ra = rid[key((0, 1), (1, 4), (3, 4), (0, 3))]
    rb = rid[key((1, 2), (2, 3), (3, 4), (1, 4))]
    rc = rid[key((0, 1), (1, 2), (2, 3), (0, 3))]

    batch = pack_complexes([c], max_dim=2, pad_multiple=8)
    x_e = jnp.asarray(batch.dims[1].x)
    up, down, boundary = _prop(batch, 2, x_down=x_e, message_up=IDENT,
                               message_down=IDENT, message_boundary=B_IDENT)
    down = np.asarray(down)
    boundary = np.asarray(boundary)
    # Ring features (init sum of vertices, x_v = 1..5): A=12, B=14, C=10.
    assert batch.dims[2].x[ra, 0] == 12
    assert batch.dims[2].x[rb, 0] == 14
    assert batch.dims[2].x[rc, 0] == 10
    # Every pair shares two edges -> each neighbour counted twice.
    assert down[ra, 0] == 2 * 14 + 2 * 10
    assert down[rb, 0] == 2 * 12 + 2 * 10
    assert down[rc, 0] == 2 * 12 + 2 * 14
    # Boundary messages: sum of the 4 boundary edge features (x_u + x_v).
    assert boundary[ra, 0] == 3 + 7 + 9 + 5
    assert boundary[rb, 0] == 5 + 7 + 9 + 7
    assert boundary[rc, 0] == 3 + 5 + 7 + 5

    # Edge level: (3,4) sits in rings A and B; its co-member (1,4) is
    # shared with BOTH, so it appears twice in the upper messages.
    up_e, _, _ = _prop(batch, 1, message_up=IDENT)
    up_e = np.asarray(up_e)
    e34 = eid[(3, 4)]
    expected = (3 + 7 + 5) + (5 + 7 + 7)   # A: e01+e14+e03, B: e12+e23+e14
    assert up_e[e34, 0] == expected
