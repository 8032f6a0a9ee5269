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


def test_pretrain_envedit_alternation():
    """Pretrain TrajBatchBuilder samples original vs EnvEdit-augmented
    features 50/50 per example (pretrain_src/data/dataset.py:226-233)."""
    from vln_goat_tpu.pretrain.data import (PretrainShapes,
                                            TrajBatchBuilder,
                                            items_from_dataset)
    from vln_goat_tpu.rollout.env import make_synthetic_dataset

    scans = [make_synthetic_scan("w1", num_vps=10, seed=1)]
    graphs = {g.scan_id: g for g in scans}
    rng = np.random.default_rng(0)
    base = np.zeros((10, 36, 8), np.float32)           # all-zero base
    aug = np.ones((10, 36, 8), np.float32)             # all-one aug
    shapes = PretrainShapes(max_txt_len=24, max_steps=6, max_cands=16,
                            max_gmap=32, max_mlm=6, mrc_prob_dim=8)
    builder = TrajBatchBuilder(graphs, ["w1"], base, shapes,
                               mask_token_id=63, vocab_size=64,
                               aug_features=aug, seed=0)
    data = make_synthetic_dataset(graphs, 32, vocab_size=63,
                                  path_len=(3, 5), seed=2)
    items = items_from_dataset(data, graphs)
    n_aug = 0
    for it in items:
        ex = builder.build_one(it, end_vp_type="pos")
        m = float(np.abs(ex["traj_view_img_fts"]).max())
        assert m in (0.0, 1.0)
        n_aug += int(m == 1.0)
    # both sources used, roughly half each
    assert 4 <= n_aug <= 28, n_aug
