"""Pallas segment-SpMM kernel vs the XLA oracle (interpret mode on CPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cwn_tpu.batch import add_tile_plans, pack_complexes
from cwn_tpu.lift import ring_2complex
from cwn_tpu.ops import segment_sum
from cwn_tpu.ops.pallas_segment import segment_spmm, segment_spmm_ad
from cwn_tpu.ops.tiles import build_tile_plan
from tests.fixtures import all_test_graphs


@pytest.fixture(autouse=True)
def _interpret_mode():
    from cwn_tpu.ops import pallas_segment
    pallas_segment.set_interpret(True)
    yield
    pallas_segment.set_interpret(False)


def _random_adjacency(seed, n_src=300, n_dst=280, e=1500, f=32, signed=False):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n_src, e)
    dst = np.sort(rng.integers(0, n_dst, e))
    w = (rng.random(e) < 0.9).astype(np.float32)
    if signed:
        w = w * rng.choice([-1.0, 1.0], e).astype(np.float32)
    x = rng.normal(size=(n_src, f)).astype(np.float32)
    return src, dst, w, x


@pytest.mark.parametrize("signed", [False, True])
def test_kernel_matches_oracle(signed):
    src, dst, w, x = _random_adjacency(0, signed=signed)
    n_src, n_dst = x.shape[0], 280
    plan = build_tile_plan(src, dst, w, n_src, n_dst,
                           tile=128, window=512, block=128)
    got = np.asarray(segment_spmm(jnp.asarray(x), plan))[:n_dst]
    want = np.zeros((n_dst, x.shape[1]), np.float32)
    np.add.at(want, dst, x[src] * w[:, None])
    assert np.allclose(got, want, atol=1e-4)


def test_kernel_gradient():
    src, dst, w, x = _random_adjacency(1)
    n_src, n_dst = x.shape[0], 280
    fwd = build_tile_plan(src, dst, w, n_src, n_dst,
                          tile=128, window=512, block=128)
    bwd = build_tile_plan(dst, src, w, n_dst, n_src,
                          tile=128, window=512, block=128)

    def f(z):
        return (segment_spmm_ad(z, fwd, bwd)[:n_dst] ** 2).sum()

    g = np.asarray(jax.grad(f)(jnp.asarray(x)))
    dense = np.zeros((n_dst, n_src), np.float32)
    np.add.at(dense, (dst, src), w)
    g_ref = np.asarray(jax.grad(
        lambda z: ((jnp.asarray(dense) @ z) ** 2).sum())(jnp.asarray(x)))
    assert np.allclose(g, g_ref, atol=1e-2)


def test_empty_adjacency():
    plan = build_tile_plan(np.zeros(0), np.zeros(0), np.zeros(0), 64, 64,
                           tile=128, window=128, block=128)
    out = np.asarray(segment_spmm(jnp.ones((64, 8)), plan))
    assert np.allclose(out, 0.0)


def test_model_equivalence_with_plans():
    """SparseCIN forward identical with and without kernel plans."""
    from cwn_tpu.models import SparseCIN
    complexes = [ring_2complex(g.x, g.edge_index, None, g.num_nodes, y=g.y,
                               max_k=7) for g in all_test_graphs()]
    batch = pack_complexes(complexes, max_dim=2, pad_multiple=32)
    batch_p = add_tile_plans(batch, tile=128, window=128, block=128)
    model = SparseCIN(num_input_features=1, num_classes=2, num_layers=2,
                      hidden=16, max_dim=2, use_coboundaries=False,
                      dropout_rate=0.0)
    vs = model.init({"params": jax.random.PRNGKey(0)}, batch, train=False)
    o1 = np.asarray(model.apply(vs, batch, train=False))
    o2 = np.asarray(model.apply(vs, batch_p, train=False))
    assert np.allclose(o1, o2, atol=1e-4)


def _random_two_sided(seed, n_src=300, n_cob=120, n_dst=280, e=1500, f=32):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n_src, e)
    dst = np.sort(rng.integers(0, n_dst, e))
    cob = rng.integers(0, n_cob, e)
    w = (rng.random(e) < 0.9).astype(np.float32)
    xs = rng.normal(size=(n_src, f)).astype(np.float32)
    xu = rng.normal(size=(n_cob, f)).astype(np.float32)
    bias = rng.normal(size=(f,)).astype(np.float32)
    return src, dst, cob, w, xs, xu, bias


@pytest.mark.parametrize("act", ["relu", "id"])
def test_fused_message_matches_oracle(act):
    from cwn_tpu.ops.pallas_segment import fused_message_spmm
    src, dst, cob, w, xs, xu, bias = _random_two_sided(0)
    n_src, n_cob, n_dst = xs.shape[0], xu.shape[0], 280
    kw = dict(tile=128, window=512, block=128)
    fwd = build_tile_plan(src, dst, w, n_src, n_dst, extra=cob,
                          num_extra=n_cob, **kw)
    bs = build_tile_plan(dst, src, w, n_dst, n_src, extra=cob,
                         num_extra=n_cob, **kw)
    bc = build_tile_plan(dst, cob, w, n_dst, n_cob, extra=src,
                         num_extra=n_src, **kw)
    got = np.asarray(fused_message_spmm(
        jnp.asarray(xs), jnp.asarray(xu), jnp.asarray(bias),
        fwd, bs, bc, act))[:n_dst]
    pre = xs[src] + xu[cob] + bias
    msg = (np.maximum(pre, 0) if act == "relu" else pre) * w[:, None]
    want = np.zeros((n_dst, xs.shape[1]), np.float32)
    np.add.at(want, dst, msg)
    assert np.allclose(got, want, atol=1e-4)


def test_fused_message_gradients():
    from cwn_tpu.ops.pallas_segment import fused_message_spmm
    src, dst, cob, w, xs, xu, bias = _random_two_sided(1)
    n_src, n_cob, n_dst = xs.shape[0], xu.shape[0], 280
    kw = dict(tile=128, window=512, block=128)
    fwd = build_tile_plan(src, dst, w, n_src, n_dst, extra=cob,
                          num_extra=n_cob, **kw)
    bs = build_tile_plan(dst, src, w, n_dst, n_src, extra=cob,
                         num_extra=n_cob, **kw)
    bc = build_tile_plan(dst, cob, w, n_dst, n_cob, extra=src,
                         num_extra=n_src, **kw)

    def loss(args):
        a, b, c = args
        return (fused_message_spmm(a, b, c, fwd, bs, bc, "relu")[:n_dst]
                ** 2).sum()

    def loss_ref(args):
        a, b, c = args
        pre = a[src] + b[cob] + c
        msg = jnp.maximum(pre, 0) * w[:, None]
        out = jnp.zeros((n_dst, a.shape[1])).at[dst].add(msg)
        return (out ** 2).sum()

    args = (jnp.asarray(xs), jnp.asarray(xu), jnp.asarray(bias))
    got = jax.grad(loss)(args)
    want = jax.grad(loss_ref)(args)
    for g, r in zip(got, want):
        assert np.allclose(np.asarray(g), np.asarray(r), atol=1e-2)


def test_coboundary_model_equivalence_with_plans():
    """EmbedSparseCIN (fused coboundary path) == oracle path, fwd + grads."""
    from cwn_tpu.models.molec import EmbedSparseCIN
    # Random (not constant) types: constant features make BN variance ~0,
    # whose gradient amplifies f32 reorder noise unboundedly.
    rng = np.random.default_rng(7)
    complexes = [ring_2complex(
        rng.integers(0, 4, (g.num_nodes, 1)), g.edge_index,
        ((g.edge_index[0] + g.edge_index[1]) % 4)[:, None], g.num_nodes,
        y=g.y, max_k=7) for g in all_test_graphs()]
    batch = pack_complexes(complexes, max_dim=2, pad_multiple=32)
    batch_p = add_tile_plans(batch, tile=128, window=128, block=128)
    model = EmbedSparseCIN(atom_types=4, bond_types=4, out_size=2,
                           num_layers=2, hidden=16, dropout_rate=0.0,
                           max_dim=2, use_coboundaries=True, embed_edge=True)
    vs = model.init({"params": jax.random.PRNGKey(0)}, batch, train=False)
    o1 = np.asarray(model.apply(vs, batch, train=False))
    o2 = np.asarray(model.apply(vs, batch_p, train=False))
    assert np.allclose(o1, o2, atol=1e-4)

    def loss(p, b):
        out = model.apply({"params": p, "batch_stats": vs["batch_stats"]},
                          b, train=True,
                          rngs={"dropout": jax.random.PRNGKey(0)},
                          mutable=["batch_stats"])[0]
        return (out ** 2).sum()

    g1 = jax.tree.leaves(jax.grad(loss)(vs["params"], batch))
    g2 = jax.tree.leaves(jax.grad(loss)(vs["params"], batch_p))
    # rtol-dominated: f32 accumulation-order differences get amplified by
    # the gradient through train-mode batch statistics.
    for a, b in zip(g1, g2):
        assert np.allclose(np.asarray(a), np.asarray(b), rtol=2e-3,
                           atol=5e-3)
