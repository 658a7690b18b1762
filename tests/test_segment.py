"""Segment ops vs numpy oracle."""
import numpy as np
import jax.numpy as jnp

from cwn_tpu.ops import segment_max, segment_mean, segment_sum


def np_segment(data, ids, n, mask, reduce):
    out = np.zeros((n, data.shape[1]), data.dtype)
    for s in range(n):
        sel = (ids == s) & (mask > 0)
        if sel.any():
            if reduce == "sum":
                out[s] = data[sel].sum(0)
            elif reduce == "mean":
                out[s] = data[sel].mean(0)
            elif reduce == "max":
                out[s] = data[sel].max(0)
    return out


def test_segment_ops_match_numpy():
    rng = np.random.default_rng(0)
    e, n, f = 57, 10, 4
    ids = np.sort(rng.integers(0, n, e)).astype(np.int32)
    data = rng.normal(size=(e, f)).astype(np.float32)
    mask = (rng.random(e) < 0.8).astype(np.float32)

    for reduce, fn in [("sum", segment_sum), ("mean", segment_mean),
                       ("max", segment_max)]:
        got = np.asarray(fn(jnp.asarray(data), jnp.asarray(ids), n,
                            mask=jnp.asarray(mask), indices_are_sorted=True))
        want = np_segment(data, ids, n, mask, reduce)
        assert np.allclose(got, want, atol=1e-5), reduce


def test_empty_segments_zero():
    data = jnp.ones((4, 2))
    ids = jnp.array([0, 0, 3, 3])
    for fn in (segment_sum, segment_mean, segment_max):
        out = np.asarray(fn(data, ids, 5))
        assert np.allclose(out[1], 0) and np.allclose(out[2], 0) \
            and np.allclose(out[4], 0)
