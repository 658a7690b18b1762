"""ComplexLoader fast paths: uniform-structure templates + batch caching.

The template path must produce batches IDENTICAL to a from-scratch pack
(indices, masks, plans are structural; only x / y / sel streams differ per
batch), and non-shuffled loaders must replay cached batches across epochs.
"""
import numpy as np
import pytest

from cwn_tpu.data.datasets.flow import load_flow_dataset
from cwn_tpu.train.loader import ComplexLoader, _structures_identical
from tests.fixtures import all_test_graphs
from cwn_tpu.lift import ring_2complex


@pytest.fixture(scope="module")
def flow_samples():
    train, test = load_flow_dataset(num_points=150, num_train=8, num_test=4,
                                    train_orientation="default",
                                    test_orientation="random", seed=1234)
    return train, test


def test_flow_train_is_uniform_test_is_not(flow_samples):
    train, test = flow_samples
    assert _structures_identical(train, 1)
    # Random test orientations flip adjacency signs per sample.
    assert not _structures_identical(test, 1)


def test_heterogeneous_graphs_are_not_uniform():
    cs = [ring_2complex(g.x, g.edge_index, None, g.num_nodes,
                        y=np.array([0]), max_k=6)
          for g in all_test_graphs()[:3]]
    assert not _structures_identical(cs, 2)


def _batch_equal(a, b):
    import jax
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb)
    return all(np.array_equal(np.asarray(u), np.asarray(v))
               for u, v in zip(la, lb))


def test_uniform_template_matches_scratch_pack(flow_samples):
    train, _ = flow_samples
    kw = dict(batch_size=3, max_dim=1, pad_multiple=16,
              keep_top_upper=True, device_prefetch=False)
    fast = ComplexLoader(train, shuffle=True, seed=7, **kw)
    slow = ComplexLoader(train, shuffle=True, seed=7, **kw)
    slow._uniform = False          # force the generic pack path
    for _ in range(2):             # epoch 2 exercises template reuse
        for fb, sb in zip(fast, slow):
            assert _batch_equal(fb, sb)


def test_uniform_template_with_pallas_plans(flow_samples):
    train, _ = flow_samples
    kw = dict(batch_size=4, max_dim=1, pad_multiple=16,
              keep_top_upper=True, device_prefetch=False, use_pallas=True)
    fast = ComplexLoader(train, shuffle=True, seed=3, **kw)
    b1 = list(fast)
    b2 = list(fast)
    # Template reused across epochs: structural arrays are the same objects.
    assert b1[0].dims[1].up_src is b2[0].dims[1].up_src
    # x differs (different shuffle), structure equal.
    assert b1[0].dims[1].up_plan is b2[0].dims[1].up_plan


def test_nonshuffled_loader_caches_batches(flow_samples):
    _, test = flow_samples
    loader = ComplexLoader(test, batch_size=2, max_dim=1, pad_multiple=16,
                           keep_top_upper=True, device_prefetch=False)
    e1 = list(loader)
    e2 = list(loader)
    assert all(a is b for a, b in zip(e1, e2))   # replayed, not repacked
    assert loader._cached_batches is not None
