"""Batch packing invariants (mirrors /root/reference/data/test_batching.py).

Instead of asserting exact batched index tensors, we check the semantic
invariants the reference tests establish: per-complex structure is preserved
under batching (decode-back equality), and model outputs on a batch equal
per-complex outputs.
"""
import collections

import numpy as np
import jax
import pytest

from cwn_tpu.batch import PadPlan, pack_complexes
from cwn_tpu.lift import ring_2complex
from cwn_tpu.models import SparseCIN
from tests.fixtures import all_test_graphs, house_graph, square_graph


def lift_all(max_k=7):
    return [ring_2complex(g.x, g.edge_index, None, g.num_nodes, y=g.y, max_k=max_k)
            for g in all_test_graphs()]


def decode_adjacency(batch, k, complexes):
    """Recover per-complex (src, dst, cob) triples from the packed buffers."""
    buf = batch.dims[k]
    out = [set() for _ in complexes]
    # Cell offsets per dim from complex order.
    offs = {d: np.cumsum([0] + [c.cochains[d].num_cells if d in c.cochains else 0
                                for c in complexes]) for d in (k, k + 1)}
    valid = buf.up_mask > 0
    src, dst, cob = buf.up_src[valid], buf.up_dst[valid], buf.up_cob[valid]
    owner = buf.batch[dst]
    for s, d, cb, o in zip(src, dst, cob, owner):
        out[o].add((int(s - offs[k][o]), int(d - offs[k][o]),
                    int(cb - offs[k + 1][o])))
    return out


def test_pack_decodes_back():
    complexes = lift_all()
    batch = pack_complexes(complexes, max_dim=2, pad_multiple=32)
    decoded = decode_adjacency(batch, 0, complexes)
    for c, dec in zip(complexes, decoded):
        co = c.cochains[0]
        expect = set()
        if co.upper_index is not None:
            for i in range(co.upper_index.shape[1]):
                expect.add((int(co.upper_index[0, i]), int(co.upper_index[1, i]),
                            int(co.shared_coboundaries[i])))
        assert dec == expect

    # Feature rows survive packing in order.
    k = 1
    off = 0
    for c in complexes:
        if 1 not in c.cochains or c.cochains[1].x is None:
            continue
        n = c.cochains[1].num_cells
        assert np.allclose(batch.dims[1].x[off:off + n], c.cochains[1].x)
        off += n


def test_batch_vector_and_masks():
    complexes = lift_all()
    batch = pack_complexes(complexes, max_dim=2, pad_multiple=32)
    for k in range(3):
        buf = batch.dims[k]
        n_valid = int(buf.cell_mask.sum())
        total = sum(c.cochains[k].num_cells for c in complexes if k in c.cochains)
        assert n_valid == total
        # Padded cells point to the trash segment.
        assert (buf.batch[buf.cell_mask == 0] == batch.batch_size).all()
        # Destination sort.
        assert (np.diff(buf.up_dst) >= 0).all()
        assert (np.diff(buf.b_dst) >= 0).all()


def test_model_batched_equals_single():
    complexes = lift_all()
    batch = pack_complexes(complexes, max_dim=2, pad_multiple=32)
    model = SparseCIN(num_input_features=1, num_classes=3, num_layers=2,
                      hidden=8, max_dim=2, use_coboundaries=True)
    vs = model.init({"params": jax.random.PRNGKey(0)}, batch, train=False)
    out = np.asarray(model.apply(vs, batch, train=False))
    for i, c in enumerate(complexes):
        single = pack_complexes([c], max_dim=2, pad_multiple=32)
        o = np.asarray(model.apply(vs, single, train=False))
        assert np.allclose(o[0], out[i], atol=1e-4), f"complex {i}"


def test_pad_plan_union_covers():
    complexes = lift_all()
    plans = [PadPlan.for_complexes([c], 2) for c in complexes]
    u = PadPlan.union(plans)
    for p in plans:
        assert u.covers(p)
    # Packing with a larger plan gives identical model output.
    model = SparseCIN(num_input_features=1, num_classes=3, num_layers=1,
                      hidden=8, max_dim=2)
    c = complexes[0]
    small = pack_complexes([c], max_dim=2, pad_multiple=16)
    big_plan = PadPlan(batch_size=4,
                       num_cells=tuple(n * 2 for n in u.num_cells),
                       num_up=tuple(n * 2 for n in u.num_up),
                       num_down=tuple(n * 2 for n in u.num_down),
                       num_boundary=tuple(n * 2 for n in u.num_boundary))
    big = pack_complexes([c], max_dim=2, plan=big_plan)
    vs = model.init({"params": jax.random.PRNGKey(0)}, small, train=False)
    o1 = np.asarray(model.apply(vs, small, train=False))
    o2 = np.asarray(model.apply(vs, big, train=False))
    assert np.allclose(o1[0], o2[0], atol=1e-5)


def _multiset(src, dst, shared, mask):
    # A true multiset (Counter), not a set: erroneously DUPLICATED entries
    # in the packed buffers would skew sum-aggregation yet pass a set
    # comparison.
    v = mask > 0
    if shared is None:
        return collections.Counter(
            (int(s), int(d)) for s, d in zip(src[v], dst[v]))
    return collections.Counter(
        (int(s), int(d), int(c))
        for s, d, c in zip(src[v], dst[v], shared[v]))


def test_house_square_exact_batched_tensors():
    """Exact batched index tensors for [house, square], hand-derived.

    Mirrors /root/reference/data/test_batching.py's literal-tensor checks:
    every adjacency of every dim is asserted as an explicit multiset of
    GLOBAL (offset-shifted) ids, pinning the __inc__ offset semantics —
    upper/lower offset by num_cells(k), shared_coboundaries by
    num_cells(k+1), shared_boundaries by num_cells(k-1), and
    boundary_index's dual offset (row0 by num_cells(k-1), row1 by
    num_cells(k)) (/root/reference/data/complex.py:148-169)."""
    house = house_graph()
    square = square_graph()
    cs = [ring_2complex(g.x, g.edge_index, None, g.num_nodes, y=g.y, max_k=6)
          for g in (house, square)]
    batch = pack_complexes(cs, max_dim=2, pad_multiple=8)

    # House: 5 verts, 6 lex edges, rings [triangle(3,4,5), square(0,1,2,3)].
    # Square: 4 verts, 4 lex edges [(0,1),(0,3),(1,2),(2,3)], 1 ring.
    h_edges = [(0, 1), (0, 3), (1, 2), (2, 3), (2, 4), (3, 4)]
    s_edges = [(0, 1), (0, 3), (1, 2), (2, 3)]
    OV, OE, OR = 5, 6, 2        # square's offsets = house cell counts

    # dim0 upper: one symmetric pair per edge, shared cob = edge id.
    expect = set()
    for e, (u, v) in enumerate(h_edges):
        expect |= {(u, v, e), (v, u, e)}
    for e, (u, v) in enumerate(s_edges):
        expect |= {(u + OV, v + OV, e + OE), (v + OV, u + OV, e + OE)}
    b0 = batch.dims[0]
    assert _multiset(b0.up_src, b0.up_dst, b0.up_cob, b0.up_mask) == collections.Counter(expect)

    # dim1 upper: all ordered pairs within each ring's boundary edges.
    expect = set()
    for rid, edges in [(0, [3, 4, 5]), (1, [0, 1, 2, 3])]:
        expect |= {(a, b, rid) for a in edges for b in edges if a != b}
    sq = [e + OE for e in range(4)]
    expect |= {(a, b, OR) for a in sq for b in sq if a != b}
    b1 = batch.dims[1]
    assert _multiset(b1.up_src, b1.up_dst, b1.up_cob, b1.up_mask) == collections.Counter(expect)

    # dim1 lower: edges sharing a vertex, shared = the vertex id.
    expect = set()
    for edges, ov, oe in [(h_edges, 0, 0), (s_edges, OV, OE)]:
        for i, e1 in enumerate(edges):
            for j, e2 in enumerate(edges):
                if i == j:
                    continue
                for v in set(e1) & set(e2):
                    expect.add((i + oe, j + oe, v + ov))
    assert _multiset(b1.down_src, b1.down_dst, b1.down_shared,
                     b1.down_mask) == collections.Counter(expect)

    # dim1 boundary: vertex -> edge links (dual offset).
    expect = set()
    for edges, ov, oe in [(h_edges, 0, 0), (s_edges, OV, OE)]:
        for e, (u, v) in enumerate(edges):
            expect |= {(u + ov, e + oe), (v + ov, e + oe)}
    assert _multiset(b1.b_src, b1.b_dst, None, b1.b_mask) == collections.Counter(expect)

    # dim2 boundary: ring -> its edges.
    expect = {(3, 0), (4, 0), (5, 0),
              (0, 1), (1, 1), (2, 1), (3, 1)}
    expect |= {(e + OE, OR) for e in range(4)}
    b2 = batch.dims[2]
    assert _multiset(b2.b_src, b2.b_dst, None, b2.b_mask) == collections.Counter(expect)

    # Batch (owner) vectors over valid cells.
    for k, counts in [(0, (5, 4)), (1, (6, 4)), (2, (2, 1))]:
        buf = batch.dims[k]
        owners = buf.batch[buf.cell_mask > 0]
        assert owners.tolist() == [0] * counts[0] + [1] * counts[1]
