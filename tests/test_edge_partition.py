"""Edge-partitioned message passing vs the single-device oracle.

Runs on the virtual 8-device CPU mesh: cells sharded over the mesh, halo
exchange via all_gather, local segment sums — outputs must equal the
unpartitioned propagate exactly.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from cwn_tpu.batch import pack_complexes
from cwn_tpu.lift import ring_2complex
from cwn_tpu.mp import propagate
from cwn_tpu.parallel.edge_partition import ep_propagate, shard_batch
from tests.fixtures import all_test_graphs


@pytest.mark.parametrize("n_dev", [2, 4, 8])
def test_ep_propagate_matches_single_device(n_dev):
    devices = jax.devices("cpu")[:n_dev]
    mesh = Mesh(np.array(devices), ("cells",))

    complexes = [ring_2complex(g.x, g.edge_index, None, g.num_nodes, y=g.y,
                               max_k=7) for g in all_test_graphs()] * 3
    batch = pack_complexes(complexes, max_dim=2, pad_multiple=128)
    sharded = shard_batch(batch, n_dev)

    k = 1  # edges: has up, down, boundary channels
    buf = batch.dims[k]
    n = buf.cell_mask.shape[0]
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(n, 16)).astype(np.float32))
    battr = jnp.asarray(rng.normal(
        size=(batch.dims[k - 1].cell_mask.shape[0], 16)).astype(np.float32))

    # Oracle: unpartitioned propagate with identity messages.
    up_ref, down_ref, b_ref = propagate(
        buf, x, boundary_attr=battr,
        message_up=lambda xj, a: xj, message_down=lambda xj, a: xj,
        message_boundary=lambda b: b)

    sbuf = sharded.dims[k]
    x_sh = x.reshape(n_dev, n // n_dev, 16)
    nb = battr.shape[0]
    b_sh = battr.reshape(n_dev, nb // n_dev, 16)

    def f(buf_local, x_local, battr_local):
        return ep_propagate(buf_local, x_local, axis="cells",
                            boundary_attr_local=battr_local)

    mapped = jax.shard_map(
        lambda b, xl, bl: f(jax.tree.map(lambda v: v[0], b), xl[0], bl[0]),
        mesh=mesh,
        in_specs=(P("cells"), P("cells"), P("cells")),
        out_specs=P("cells"), check_vma=False)

    up, down, bnd = mapped(sbuf, x_sh, b_sh)
    # per-device [N/D, F] outputs concatenate over the mesh axis -> [N, F]
    up = np.asarray(up).reshape(n, 16)
    down = np.asarray(down).reshape(n, 16)
    bnd = np.asarray(bnd).reshape(n, 16)

    assert np.allclose(up, np.asarray(up_ref), atol=1e-5)
    assert np.allclose(down, np.asarray(down_ref), atol=1e-5)
    assert np.allclose(bnd, np.asarray(b_ref), atol=1e-5)
