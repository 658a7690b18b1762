"""TPU canary for the factorized-channel miscompilation (mp.py barrier).

On TPU, the single-output jitted factorized channel at CSL-like shapes
(n1=1024, n2=4096, M=32768) compiled to wrong results (off by O(100))
while eager/CPU/numpy agreed — XLA fused the own-term recompute into the
final scatter-add incorrectly.  mp.factorized_up_channel carries an
optimization_barrier guard; this test asserts jit == eager at the
offending shape scale and must run on a real TPU (skipped elsewhere).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _on_tpu():
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


@pytest.mark.slow
@pytest.mark.skipif(not _on_tpu(), reason="requires a real TPU")
def test_jitted_channel_matches_eager_at_csl_shapes():
    import dataclasses

    from cwn_tpu.batch import CochainBuffers
    from cwn_tpu.mp import factorized_up_channel

    rng = np.random.default_rng(0)
    n1, n2, f = 1024, 4096, 160
    # ~8 members per coboundary, CSL-like density.
    n_cob, r = 1968, 8
    cobs = np.repeat(np.arange(n_cob), r)
    members = rng.integers(0, 984, size=n_cob * r)
    M = 32768
    pad = M - len(cobs)
    b_src = np.concatenate([members, np.full(pad, n1 - 1)]).astype(np.int32)
    b_dst = np.concatenate([cobs, np.full(pad, n2 - 1)]).astype(np.int32)
    b_mask = np.concatenate([np.ones(len(cobs), np.float32),
                             np.zeros(pad, np.float32)])
    order = np.argsort(b_dst, kind="stable")
    b_src, b_dst, b_mask = b_src[order], b_dst[order], b_mask[order]
    forder = np.argsort(b_src, kind="stable")

    def buf(**kw):
        base = dict(x=None, cell_mask=np.ones(n1, np.float32),
                    batch=np.zeros(n1, np.int32),
                    up_src=np.zeros(0, np.int32), up_dst=np.zeros(0, np.int32),
                    up_cob=np.zeros(0, np.int32), up_mask=np.zeros(0, np.float32),
                    down_src=np.zeros(0, np.int32), down_dst=np.zeros(0, np.int32),
                    down_shared=np.zeros(0, np.int32),
                    down_mask=np.zeros(0, np.float32),
                    b_src=np.zeros(0, np.int32), b_dst=np.zeros(0, np.int32),
                    b_mask=np.zeros(0, np.float32),
                    up_orient=None, down_orient=None, y=None, sel_mask=None)
        base.update(kw)
        return CochainBuffers(**base)

    d1 = buf(fac_src=b_src[forder], fac_cob=b_dst[forder],
             fac_mask=b_mask[forder])
    d2 = buf(cell_mask=np.ones(n2, np.float32), batch=np.zeros(n2, np.int32),
             b_src=b_src, b_dst=b_dst, b_mask=b_mask)

    # conftest pins the default device to CPU; this canary must compile
    # and execute on the REAL chip.
    tpu = jax.devices()[0]
    with jax.default_device(tpu):
        x = jnp.asarray(rng.normal(size=(n1, f)).astype(np.float32))
        xu = jnp.asarray(rng.normal(size=(n2, f)).astype(np.float32))
        kernel = jnp.asarray(
            rng.normal(size=(2 * f, f)).astype(np.float32) * 0.1)
        bias = jnp.asarray(rng.normal(size=(f,)).astype(np.float32))
        act = lambda v: jnp.maximum(v, 0.0)

        eager = np.asarray(factorized_up_channel(x, xu, kernel, bias,
                                                 d1, d2, act, n1))
        jitted = np.asarray(jax.jit(lambda a, b: factorized_up_channel(
            a, b, kernel, bias, d1, d2, act, n1))(x, xu))
    np.testing.assert_allclose(jitted, eager, atol=2.0, rtol=0.05)

    # The KERNEL variant recomputes `own` with the same gather+act shape
    # but feeds Pallas custom calls XLA cannot fuse into — assert it too
    # (ADVICE r4: the barrier guards only the XLA variant; this pins that
    # the kernel variant is immune at the offending shape scale).
    from cwn_tpu.mp import factorized_up_channel_kernel
    from cwn_tpu.ops.banded import build_banded_plan
    from cwn_tpu.ops.tiles import build_tile_plan_auto

    def iplan(src, dst, w, ns, nd):
        p = build_banded_plan(src, dst, w, ns, nd)
        pt = build_banded_plan(dst, src, w, nd, ns)
        if p is None or pt is None:
            p = build_tile_plan_auto(src, dst, w, ns, nd)
            pt = build_tile_plan_auto(dst, src, w, nd, ns)
        return p, pt

    m = len(b_src)
    pos = np.arange(m, dtype=np.int64)
    fs, fst = iplan(pos, b_dst, b_mask, m, n2)
    fo, fot = iplan(pos, d1.fac_src, d1.fac_mask, m, n1)
    fg, fgt = iplan(d1.fac_cob, d1.fac_src, d1.fac_mask, n2, n1)
    d1k = dataclasses.replace(d1, fac_s_plan=fs, fac_s_plan_t=fst,
                              fac_o_plan=fo, fac_o_plan_t=fot,
                              fac_g_plan=fg, fac_g_plan_t=fgt)
    with jax.default_device(tpu):
        kern = np.asarray(jax.jit(lambda a, b: factorized_up_channel_kernel(
            a, b, kernel, bias, d1k, d2, act, n1))(x, xu))
    np.testing.assert_allclose(kern, eager, atol=2.0, rtol=0.05)
