"""EnvEdit augmented-feature alternation + NavWorld pytree integrity."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vln_goat_tpu.rollout.world import NavWorld
from vln_goat_tpu.sim.graph_sim import make_synthetic_scan


def test_navworld_is_valid_pytree():
    scans = [make_synthetic_scan("w0", num_vps=8, seed=0)]
    world = NavWorld.build(scans, feat_dim=8, seed=0)
    leaves, treedef = jax.tree_util.tree_flatten(world)
    rebuilt = jax.tree_util.tree_unflatten(treedef, leaves)
    assert rebuilt.feat.shape == world.feat.shape
    assert rebuilt.num_objs == 0 and not rebuilt.has_aug


def test_envedit_feature_alternation():
    scans = [make_synthetic_scan("w1", num_vps=8, seed=1)]
    rng = np.random.default_rng(0)
    base = rng.standard_normal((8, 36, 8)).astype(np.float32)
    aug = rng.standard_normal((8, 36, 8)).astype(np.float32)
    world = NavWorld.build(scans, features=base, feat_dim=8,
                           aug_features=aug)
    assert world.has_aug
    scan = jnp.zeros((4,), jnp.int32)
    vp = jnp.asarray([0, 1, 2, 3])
    use_aug = jnp.asarray([True, False, True, False])
    out = np.asarray(world.get_feat(scan, vp, use_aug))
    np.testing.assert_allclose(out[0], aug[0], atol=1e-6)
    np.testing.assert_allclose(out[1], base[1], atol=1e-6)
    np.testing.assert_allclose(out[2], aug[2], atol=1e-6)
    # without selector: always base
    out2 = np.asarray(world.get_feat(scan, vp))
    np.testing.assert_allclose(out2[0], base[0], atol=1e-6)
