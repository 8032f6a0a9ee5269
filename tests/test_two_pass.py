"""Two-pass DAgger exactness.

The replay (build_teacher_rollout_vec(forced=True)) must reproduce the
one-pass sampled rollout's loss AND parameter gradients exactly when
deterministic: once the sampled actions are recorded, the trajectory is
piecewise-constant in the params, so both compute the same CE over the
same (state, target) sequence.  Prefix chunking (rows sorted by length,
later steps on a static prefix) must be bit-identical to the full-B
replay — ended rows' updates are masked no-ops.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

# full rollout traces on CPU: minutes, not seconds — slow tier
pytestmark = pytest.mark.slow

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


def make_rig(expert_policy="spl", B=8, horizon=7):
    scans = [make_synthetic_scan(f"s{i}", num_vps=30, degree=3, seed=i)
             for i in range(2)]
    graphs = {g.scan_id: g for g in scans}
    world = NavWorld.build(scans, feat_dim=16, seed=0)
    rcfg = RolloutConfig(num_nodes=16, horizon=horizon, feat_dim=16,
                         expert_policy=expert_policy)
    model = GoatModel(TINY, dtype=jnp.float32)
    params = init_goat_params(model, jax.random.PRNGKey(0), max_cands=8,
                              num_nodes=rcfg.num_nodes)
    ro = NavRollout(model, world, rcfg)
    data = make_synthetic_dataset(graphs, 64, vocab_size=TINY.vocab_size,
                                  path_len=(3, 5), seed=1, max_instr_len=24)
    b = EpisodeBatcher(data, graphs, [g.scan_id for g in scans],
                       batch_size=B, max_instr_len=24, max_gt_len=6)
    _, batch = b.next_batch()
    return ro, params, batch


def one_pass(ro, params, batch, rng):
    fn = ro.build_rollout("sample", train_ml=True, deterministic=True,
                          record_actions=True)

    def loss(p):
        return fn(p, batch, rng)["ml_loss"]

    out = fn(params, batch, rng)
    g = jax.grad(loss)(params)
    return out, g


def replay_grads(ro, params, batch, rng, actions, chunks=None, T2=None):
    import dataclasses as dc

    f_ro = ro if T2 is None else NavRollout(
        ro.model, ro.world, dc.replace(ro.rcfg, horizon=T2))
    fn = f_ro.build_teacher_rollout_vec(deterministic=True, forced=True,
                                        chunks=chunks)

    def loss(p):
        return fn(p, batch, rng, actions=actions)["ml_loss"]

    out = fn(params, batch, rng, actions=actions)
    g = jax.grad(loss)(params)
    return out, g


def assert_trees_close(a, b, atol=2e-5):
    flat_a, flat_b = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(flat_a) == len(flat_b)
    for x, y in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=atol,
                                   rtol=1e-4)


@pytest.mark.parametrize("expert", ["spl", "ndtw"])
def test_replay_matches_one_pass(expert):
    ro, params, batch = make_rig(expert_policy=expert)
    rng = jax.random.PRNGKey(5)
    out1, g1 = one_pass(ro, params, batch, rng)
    out2, g2 = replay_grads(ro, params, batch, jax.random.PRNGKey(9),
                            actions=out1["a_tok"])
    np.testing.assert_allclose(float(out1["ml_loss"]),
                               float(out2["ml_loss"]), rtol=1e-5)
    assert_trees_close(g1, g2)


def test_chunked_replay_bit_identical():
    """Tail rows are FORCED to stop at step 2 (the replay accepts any
    action array), so the prefix chunk genuinely excludes active rows'
    tails — not a trivial full-width chunk."""
    ro, params, batch = make_rig(B=8)
    rng = jax.random.PRNGKey(3)
    out1, _ = one_pass(ro, params, batch, rng)
    a_tok = np.asarray(out1["a_tok"]).copy()
    a_tok[2:, 4:] = 0  # rows 4..7 emit stop at t=2 -> ended from t=3
    actions_p = jnp.asarray(a_tok)

    ref, gref = replay_grads(ro, params, batch, rng, actions_p)
    got, ggot = replay_grads(ro, params, batch, rng, actions_p,
                             chunks=((3, 4),))
    np.testing.assert_allclose(float(ref["ml_loss"]), float(got["ml_loss"]),
                               rtol=1e-6)
    assert_trees_close(gref, ggot, atol=1e-6)


def test_short_horizon_replay():
    """Truncating the replay horizon to a bound on the max episode length
    drops no loss mass: forced early stops make T2 < H meaningful."""
    ro, params, batch = make_rig(B=8, horizon=7)
    rng = jax.random.PRNGKey(11)
    out1, _ = one_pass(ro, params, batch, rng)
    a_tok = np.asarray(out1["a_tok"]).copy()
    a_tok[3:, :] = 0  # every row emits stop by t=3 -> max length 4
    ref, gref = replay_grads(ro, params, batch, rng, jnp.asarray(a_tok))
    got, ggot = replay_grads(ro, params, batch, rng,
                             jnp.asarray(a_tok[:5]), T2=5)
    np.testing.assert_allclose(float(ref["ml_loss"]), float(got["ml_loss"]),
                               rtol=1e-5)
    assert_trees_close(gref, ggot)


def test_train_step_2pass_runs():
    ro, params, batch = make_rig(B=8)
    tx = TR.make_optimizer(lr=1e-4)
    state = TR.init_train_state(params, tx)
    step = TR.make_train_step_2pass(ro, tx, ml_weight=0.2,
                                    teacher_horizon=6,
                                    horizon_buckets=(3, 5),
                                    chunk_points=(2, 4),
                                    prefix_fracs=(0.5,))
    for i in range(2):
        state, m = step(state, batch, jax.random.PRNGKey(i))
        assert np.isfinite(float(m["loss"]))
        assert np.isfinite(float(m["grad_norm"]))
