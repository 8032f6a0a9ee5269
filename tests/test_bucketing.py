"""gt-length-bucketed batching (EpisodeBatcher bucket_caps) + the
teacher_horizon="auto" train step.

The teacher-forced rollout is loss-identical at any horizon >= the batch's
max gt length (trainer.py docstring; established by test_vec_teacher /
test_fused_dagger), so bucketing only has to guarantee (1) batches are
length-homogeneous with gt arrays padded to the bucket cap, (2) the epoch
still covers the whole dataset, (3) the "auto" train step computes the
same loss as a fixed-horizon step on the same batch."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vln_goat_tpu.config import GoatConfig
from vln_goat_tpu.models.goat import GoatModel
from vln_goat_tpu.rollout.env import EpisodeBatcher, make_synthetic_dataset
from vln_goat_tpu.rollout.rollout import NavRollout, RolloutConfig
from vln_goat_tpu.rollout.world import NavWorld
from vln_goat_tpu.sim.graph_sim import make_synthetic_scan
from vln_goat_tpu.train import trainer as TR
from vln_goat_tpu.train.params import init_goat_params

TINY = GoatConfig(num_l_layers=1, num_x_layers=1, num_pano_layers=1,
                  hidden_size=32, num_attention_heads=2, intermediate_size=64,
                  vocab_size=64, max_position_embeddings=64,
                  image_feat_size=16, feat_dropout=0.0,
                  hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)


@pytest.fixture(scope="module")
def rig():
    scans = [make_synthetic_scan(f"s{i}", num_vps=30, degree=3, seed=i)
             for i in range(2)]
    graphs = {g.scan_id: g for g in scans}
    world = NavWorld.build(scans, feat_dim=16, seed=0)
    rcfg = RolloutConfig(num_nodes=16, horizon=8, feat_dim=16)
    model = GoatModel(TINY, dtype=jnp.float32)
    params = init_goat_params(model, jax.random.PRNGKey(0), max_cands=8,
                              num_nodes=rcfg.num_nodes)
    ro = NavRollout(model, world, rcfg)
    data = make_synthetic_dataset(graphs, 96, vocab_size=TINY.vocab_size,
                                  path_len=(3, 7), seed=1, max_instr_len=24)
    return scans, graphs, world, ro, params, data


def test_bucketed_batches_homogeneous_and_complete(rig):
    scans, graphs, _, _, _, data = rig
    caps = (5, 8)
    b = EpisodeBatcher(data, graphs, [g.scan_id for g in scans],
                       batch_size=8, max_instr_len=24, max_gt_len=8,
                       bucket_caps=caps, seed=3)
    seen = set()
    n_epoch_batches = len(data) // 8
    for _ in range(n_epoch_batches):
        items = b.next_minibatch()
        cap = b._gt_cap
        assert cap in caps
        for it in items:
            n = len(it["path"])
            assert n <= cap, "item longer than its bucket cap"
            if cap != caps[-1]:
                assert n <= cap
            seen.add(it["instr_id"])
        batch = b.make_batch(items)
        assert batch["gt_path"].shape[1] == cap
        assert int(batch["gt_len"].max()) <= cap
    # one epoch's worth of homogeneous batches still covers ~the dataset
    # (bucket remainders < batch_size roll into the next epoch)
    assert len(seen) >= len(data) - 8 * len(caps)


def test_bucketed_sampling_is_seeded(rig):
    scans, graphs, _, _, _, data = rig
    kw = dict(batch_size=8, max_instr_len=24, max_gt_len=8,
              bucket_caps=(5, 8), seed=11)
    b1 = EpisodeBatcher(data, graphs, [g.scan_id for g in scans], **kw)
    b2 = EpisodeBatcher(data, graphs, [g.scan_id for g in scans], **kw)
    for _ in range(6):
        i1, i2 = b1.next_minibatch(), b2.next_minibatch()
        assert [x["instr_id"] for x in i1] == [x["instr_id"] for x in i2]


@pytest.mark.slow
def test_auto_teacher_horizon_matches_fixed(rig):
    scans, graphs, _, ro, params, data = rig
    b = EpisodeBatcher(data, graphs, [g.scan_id for g in scans],
                       batch_size=8, max_instr_len=24, max_gt_len=8,
                       bucket_caps=(5, 8), seed=5)
    tx = TR.make_optimizer(lr=1e-4)
    state = TR.init_train_state(params, tx)
    step_auto = jax.jit(TR.make_train_step(
        ro, tx, train_alg="dagger", ml_weight=0.2, remat="full",
        teacher_horizon="auto"))
    rng = jax.random.PRNGKey(2)
    caps_seen = set()
    for i in range(6):
        items, batch = b.next_batch()
        cap = batch["gt_path"].shape[1]
        caps_seen.add(cap)
        # fixed-horizon control on the SAME batch
        step_fix = jax.jit(TR.make_train_step(
            ro, tx, train_alg="dagger", ml_weight=0.2, remat="full",
            teacher_horizon=int(cap)))
        r = jax.random.fold_in(rng, i)
        _, m_auto = step_auto(state, batch, r)
        _, m_fix = step_fix(state, batch, r)
        np.testing.assert_allclose(float(m_auto["loss"]),
                                   float(m_fix["loss"]), rtol=1e-6)
        if len(caps_seen) == 2:
            break
    assert len(caps_seen) == 2, "both buckets should appear within 6 draws"


def test_fuse_dagger_pads_mismatched_gt(rig):
    scans, graphs, _, _, _, data = rig
    b = EpisodeBatcher(data, graphs, [g.scan_id for g in scans],
                       batch_size=4, max_instr_len=24, max_gt_len=8,
                       bucket_caps=(5, 8), seed=7)
    b1 = b.make_batch(b.next_minibatch(), gt_cap=5)
    b2 = b.make_batch(b.next_minibatch(), gt_cap=8)
    fused = TR.fuse_dagger_batches(b1, b2)
    assert fused["gt_path"].shape == (8, 8)
    assert bool(fused["is_teacher"][:4].all())
    # the widened columns of the narrow half carry the -1 pad sentinel
    assert (np.asarray(fused["gt_path"][:4, 5:]) == -1).all()
