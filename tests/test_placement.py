"""tune_state_placement: correctness of the probe/keep-best contract."""
import jax
import jax.numpy as jnp

from cwn_tpu.utils.placement import tune_state_placement


def test_tuner_returns_probed_state_and_times():
    def make_state():
        return (jnp.zeros(()), jnp.ones((4,)))

    @jax.jit
    def step(count, vec, batch):
        return count + 1, vec + batch, (vec * batch).sum()

    batch = jnp.full((4,), 2.0)
    iters, windows, allocs = 3, 2, 3
    state, best, times = tune_state_placement(
        make_state, step, batch, allocs=allocs, iters=iters, windows=windows)
    assert len(times) == allocs
    assert best == min(times)
    # Each candidate runs 1 warmup + windows*iters probe steps from
    # identical init values; the winner is returned post-probe.
    steps_run = 1 + windows * iters
    assert int(state[0]) == steps_run
    assert jnp.allclose(state[1], 1.0 + 2.0 * steps_run)
