"""Training-step tests: gradient flow, loss decrease, and data-parallel mesh
execution on 8 virtual devices."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vln_goat_tpu.config import GoatConfig
from vln_goat_tpu.models.goat import GoatModel
from vln_goat_tpu.parallel.mesh import make_mesh, replicate_tree, shard_batch
from vln_goat_tpu.rollout.env import EpisodeBatcher, make_synthetic_dataset
from vln_goat_tpu.rollout.rollout import NavRollout, RolloutConfig
from vln_goat_tpu.rollout.world import NavWorld
from vln_goat_tpu.sim.graph_sim import make_synthetic_scan
from vln_goat_tpu.train.params import init_goat_params
from vln_goat_tpu.train.trainer import (init_train_state, make_optimizer,
                                        make_train_step)

TINY = GoatConfig(num_l_layers=1, num_x_layers=1, num_pano_layers=1,
                  hidden_size=32, num_attention_heads=2, intermediate_size=64,
                  vocab_size=64, max_position_embeddings=64,
                  image_feat_size=16, feat_dropout=0.1)


@pytest.fixture(scope="module")
def setup():
    scans = [make_synthetic_scan("s0", num_vps=12, seed=0)]
    world = NavWorld.build(scans, feat_dim=16, seed=0)
    model = GoatModel(TINY)
    params = init_goat_params(model, jax.random.PRNGKey(0), max_cands=16,
                              num_nodes=16)
    rcfg = RolloutConfig(num_nodes=16, horizon=6, feat_dim=16)
    ro = NavRollout(model, world, rcfg)
    graphs = {g.scan_id: g for g in scans}
    data = make_synthetic_dataset(graphs, 16, vocab_size=64, path_len=(3, 4),
                                  seed=1)
    batcher = EpisodeBatcher(data, graphs, ["s0"], batch_size=8,
                             max_instr_len=24, max_gt_len=6)
    return dict(world=world, model=model, params=params, ro=ro,
                batcher=batcher)


@pytest.mark.slow
def test_train_step_reduces_teacher_loss(setup):
    # 8 optimization iterations (~12s); the fast tier keeps the
    # single-step grad-flow check below.
    s = setup
    tx = make_optimizer(lr=3e-3, grad_clip=40.0)
    step_fn = jax.jit(make_train_step(s["ro"], tx, train_alg="imitation"))
    state = init_train_state(s["params"], tx)
    _, batch = s["batcher"].next_batch()
    losses = []
    for i in range(8):
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.9, losses


def test_dagger_step_runs_and_has_grads(setup):
    s = setup
    tx = make_optimizer(lr=1e-4)
    step_fn = jax.jit(make_train_step(s["ro"], tx, train_alg="dagger",
                                      ml_weight=0.2))
    state = init_train_state(s["params"], tx)
    _, batch = s["batcher"].next_batch()
    state, metrics = step_fn(state, batch, jax.random.PRNGKey(0))
    assert float(metrics["grad_norm"]) > 0
    assert np.isfinite(float(metrics["loss"]))


@pytest.mark.slow
def test_train_step_on_8_device_mesh(setup):
    """Data-parallel over the virtual 8-CPU mesh: batch sharded on 'dp',
    params replicated; result must match metric finiteness and run.

    The persistent compile cache is bypassed here: serializing the
    8-device CPU executable for the cache write aborts the process
    (SIGABRT inside compilation_cache.put_executable_and_time — the
    serialized form blows the cache writer's limits), while compiling
    and RUNNING the same executable is fine.  Observed 2026-08-20 under
    the persist-every-compile conftest config."""
    s = setup
    assert len(jax.devices()) == 8
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10**9)
    try:
        mesh = make_mesh()
        tx = make_optimizer(lr=1e-4)
        step_fn = jax.jit(make_train_step(s["ro"], tx,
                                          train_alg="imitation"))
        state = init_train_state(s["params"], tx)
        state = jax.tree.map(lambda x: x, state)
        _, batch = s["batcher"].next_batch()
        with mesh:
            sharded = shard_batch(batch, mesh)
            rep_state = jax.device_put(
                state, jax.sharding.NamedSharding(
                    mesh, jax.sharding.PartitionSpec()))
            new_state, metrics = step_fn(rep_state, sharded,
                                         jax.random.PRNGKey(0))
        assert np.isfinite(float(metrics["loss"]))
        # the sharded-batch loss must equal the single-device loss
        state2, metrics2 = step_fn(state, batch, jax.random.PRNGKey(0))
        np.testing.assert_allclose(float(metrics["loss"]),
                                   float(metrics2["loss"]), rtol=1e-4)
    finally:
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)


def test_lr_schedule_warmup_and_decay():
    """--lr_sch parity shapes (agent_base.py:125-130: transformers
    get_scheduler, warmup 3000, num_training_steps=iters, lr_end=1e-8):
    linear warmup 0->lr at warmup_steps, then each family's decay law."""
    from vln_goat_tpu.train.trainer import make_lr_schedule

    lr, warm, total = 2e-5, 100, 1000
    for name, end in [("linear", 0.0), ("polynomial", 1e-8),
                      ("cosine", 0.0), ("constant_with_warmup", lr)]:
        s = make_lr_schedule(name, lr, warm, total)
        assert float(s(0)) == 0.0, name
        np.testing.assert_allclose(float(s(warm // 2)), lr / 2, rtol=2e-2)
        np.testing.assert_allclose(float(s(warm)), lr, rtol=1e-6)
        # strictly decaying after warmup (except constant_with_warmup)
        mid, late = float(s((warm + total) // 2)), float(s(total))
        if name == "constant_with_warmup":
            np.testing.assert_allclose([mid, late], lr, rtol=1e-6)
        else:
            assert lr > mid > late
            np.testing.assert_allclose(late, end, atol=1e-7)
    # linear family decays linearly: value at midpoint of decay = lr/2
    s = make_lr_schedule("linear", lr, warm, total)
    np.testing.assert_allclose(float(s(warm + (total - warm) // 2)),
                               lr / 2, rtol=1e-2)
    # constant is the bare float (no schedule object semantics needed)
    assert make_lr_schedule("constant", lr, warm, total) == lr
