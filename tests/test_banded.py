"""Banded dense-block SpMM vs the segment-sum oracle.

The banded kernel (cwn_tpu.ops.banded) must reproduce
sum_{e: dst[e]=d} w[e] * x[src[e]] exactly (its A operand is exact in
bf16 and passes=3 makes the value operand f32-exact), for banded,
scattered-within-window, duplicate-edge, and empty adjacencies, plus the
custom VJP against jax.grad of the XLA oracle.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cwn_tpu.ops import segment_sum
from cwn_tpu.ops.banded import (BandedPlan, banded_spmm, banded_spmm_ad,
                                build_banded_plan)
from cwn_tpu.ops import pallas_segment


@pytest.fixture(autouse=True)
def _interpret():
    pallas_segment.set_interpret(True)
    yield
    pallas_segment.set_interpret(False)


def _oracle(x, src, dst, w, num_dst):
    out = np.zeros((num_dst, x.shape[1]), np.float32)
    np.add.at(out, dst, w[:, None] * x[src])
    return out


def _random_adj(rng, n_src, n_dst, n_edges, spread):
    dst = rng.integers(0, n_dst, n_edges)
    src = np.clip(dst * n_src // max(n_dst, 1)
                  + rng.integers(-spread, spread + 1, n_edges), 0,
                  n_src - 1)
    w = rng.choice([-1.0, 1.0], n_edges).astype(np.float32)
    return src, dst, w


@pytest.mark.parametrize("spread", [4, 60, 200])
def test_banded_matches_oracle(spread):
    rng = np.random.default_rng(0)
    n_src, n_dst, n_edges = 300, 280, 1500
    src, dst, w = _random_adj(rng, n_src, n_dst, n_edges, spread)
    x = rng.normal(size=(n_src, 24)).astype(np.float32)

    plan = build_banded_plan(src, dst, w, n_src, n_dst, block=128,
                             window=256, passes=3)
    assert plan is not None
    out = np.asarray(banded_spmm(jnp.asarray(x), plan))[:n_dst]
    np.testing.assert_allclose(out, _oracle(x, src, dst, w, n_dst),
                               rtol=1e-5, atol=1e-5)


def test_banded_duplicate_edges_and_zero_weights():
    rng = np.random.default_rng(1)
    src = np.array([0, 0, 0, 5, 5, 9, 9, 9], np.int64)
    dst = np.array([1, 1, 1, 2, 2, 3, 3, 3], np.int64)
    w = np.array([1, 1, -1, 1, 0, -1, -1, -1], np.float32)
    x = rng.normal(size=(16, 8)).astype(np.float32)
    plan = build_banded_plan(src, dst, w, 16, 8, block=128, window=128,
                             passes=3)
    out = np.asarray(banded_spmm(jnp.asarray(x), plan))[:8]
    np.testing.assert_allclose(out, _oracle(x, src, dst, w, 8),
                               rtol=1e-5, atol=1e-5)


def test_banded_empty_and_gap_blocks():
    # dsts only in the 3rd block of 4: other blocks must come out zero.
    src = np.arange(10, dtype=np.int64)
    dst = np.full(10, 300, np.int64)
    w = np.ones(10, np.float32)
    x = np.random.default_rng(2).normal(size=(16, 8)).astype(np.float32)
    plan = build_banded_plan(src, dst, w, 16, 512, block=128, window=128,
                             passes=3)
    out = np.asarray(banded_spmm(jnp.asarray(x), plan))
    ref = _oracle(x, src, dst, w, 512)
    np.testing.assert_allclose(out[:512], ref, rtol=1e-5, atol=1e-5)

    empty = build_banded_plan(np.zeros(0), np.zeros(0), np.zeros(0),
                              16, 64, block=128, window=128)
    assert empty.empty
    assert np.asarray(banded_spmm(jnp.asarray(x), empty)).shape[0] == 128


def test_banded_rejects_inexact_weights_and_scatter():
    src = np.array([0, 1], np.int64)
    dst = np.array([0, 1], np.int64)
    assert build_banded_plan(src, dst, np.array([0.3, 1.0], np.float32),
                             8, 8) is None
    # Fully scattered structure (uniform random, huge spread) over a tiny
    # edge count: tiles > max_fill * edges -> None.
    rng = np.random.default_rng(3)
    s = rng.integers(0, 100_000, 40)
    d = rng.integers(0, 100_000, 40)
    assert build_banded_plan(s, d, np.ones(40, np.float32),
                             100_000, 100_000, max_fill=0.25) is None


def test_banded_vjp_matches_oracle_grad():
    rng = np.random.default_rng(4)
    n_src, n_dst = 200, 160
    src, dst, w = _random_adj(rng, n_src, n_dst, 900, 40)
    x = rng.normal(size=(n_src, 16)).astype(np.float32)
    fwd = build_banded_plan(src, dst, w, n_src, n_dst, block=128,
                            window=256, passes=3)
    bwd = build_banded_plan(dst, src, w, n_dst, n_src, block=128,
                            window=256, passes=3)
    assert fwd is not None and bwd is not None

    s_j, d_j, w_j = jnp.asarray(src), jnp.asarray(dst), jnp.asarray(w)

    def loss_kernel(xx):
        return jnp.sum(banded_spmm_ad(xx, fwd, bwd)[:n_dst] ** 2)

    def loss_oracle(xx):
        m = xx[s_j] * w_j[:, None]
        return jnp.sum(segment_sum(m, d_j, n_dst) ** 2)

    gk = jax.grad(loss_kernel)(jnp.asarray(x))
    go = jax.grad(loss_oracle)(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(gk)[:n_src], np.asarray(go),
                               rtol=1e-4, atol=1e-4)


def test_banded_feat_padding():
    """Non-128-multiple feature widths round-trip (pad + slice)."""
    rng = np.random.default_rng(5)
    src, dst, w = _random_adj(rng, 64, 64, 200, 10)
    x = rng.normal(size=(64, 50)).astype(np.float32)
    plan = build_banded_plan(src, dst, w, 64, 64, block=128, window=128,
                             passes=3)
    out = np.asarray(banded_spmm(jnp.asarray(x), plan))[:64]
    np.testing.assert_allclose(out, _oracle(x, src, dst, w, 64),
                               rtol=1e-5, atol=1e-5)
