"""Pre-training stack tests: task batches build, losses are finite, training
reduces them, and SAP fused accuracy improves on a fixed batch."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vln_goat_tpu.config import GoatConfig, PretrainConfig
from vln_goat_tpu.pretrain.data import (PretrainShapes, TrajBatchBuilder,
                                        items_from_dataset)
from vln_goat_tpu.pretrain.model import GoatPretrainModel
from vln_goat_tpu.pretrain.train import (MetaTaskSampler, init_pretrain_params,
                                         make_eval_steps, make_pretrain_optimizer,
                                         make_pretrain_steps)
from vln_goat_tpu.rollout.env import make_synthetic_dataset
from vln_goat_tpu.sim.graph_sim import make_synthetic_scan

TINY = GoatConfig(num_l_layers=1, num_x_layers=1, num_pano_layers=1,
                  hidden_size=32, num_attention_heads=2, intermediate_size=64,
                  vocab_size=64, max_position_embeddings=64,
                  image_feat_size=16, feat_dropout=0.0)
TASKS = ("mlm", "mrc", "sap", "cfp")


@pytest.fixture(scope="module")
def setup():
    scans = [make_synthetic_scan(f"p{i}", num_vps=12, seed=10 + i)
             for i in range(2)]
    graphs = {g.scan_id: g for g in scans}
    order = [g.scan_id for g in scans]
    vtot = sum(g.num_vps for g in scans)
    feats = np.random.default_rng(0).standard_normal((vtot, 36, 16)).astype(
        np.float32)
    shapes = PretrainShapes(max_txt_len=24, max_steps=6, max_cands=16,
                            max_gmap=32, max_mlm=6, mrc_prob_dim=16)
    builder = TrajBatchBuilder(graphs, order, feats, shapes,
                               mask_token_id=63, vocab_size=64, seed=0)
    data = make_synthetic_dataset(graphs, 16, vocab_size=63, path_len=(3, 5),
                                  max_instr_len=20, seed=2)
    items = items_from_dataset(data, graphs)
    model = GoatPretrainModel(TINY, tasks=TASKS, image_prob_size=16)
    batches = {t: jax.tree.map(jnp.asarray, builder.build_batch(items[:6], t))
               for t in TASKS}
    params = init_pretrain_params(model, jax.random.PRNGKey(0), batches)
    return dict(builder=builder, items=items, model=model, params=params,
                batches=batches)


@pytest.mark.slow
def test_task_losses_finite(setup):
    s = setup
    ev = make_eval_steps(s["model"], TASKS)
    for t in TASKS:
        m = ev[t](s["params"], s["batches"][t])
        assert np.isfinite(float(m["loss"])), t


@pytest.mark.slow
def test_sap_labels_valid(setup):
    b = setup["batches"]["sap"]
    gl = np.asarray(b["global_act_labels"])
    ll = np.asarray(b["local_act_labels"])
    gm = np.asarray(b["gmap_masks"])
    assert (gl >= 0).all() and (ll >= 0).all()  # synthetic goals reachable
    for i, lab in enumerate(gl):
        assert gm[i, lab]


@pytest.mark.slow
def test_pretrain_steps_reduce_loss(setup):
    s = setup
    cfg = PretrainConfig(learning_rate=3e-3, warmup_steps=0,
                         num_train_steps=100, weight_decay=0.0)
    tx = make_pretrain_optimizer(cfg)
    steps = make_pretrain_steps(s["model"], tx, TASKS)
    from vln_goat_tpu.pretrain.train import PretrainState
    state = PretrainState(s["params"], tx.init(s["params"]),
                          jnp.zeros((), jnp.int32))
    first, last = {}, {}
    for i in range(10):
        for t in ("mlm", "sap"):
            state, m = steps[t](state, s["batches"][t], jax.random.PRNGKey(i))
            if i == 0:
                first[t] = float(m["loss"])
            last[t] = float(m["loss"])
    for t in ("mlm", "sap"):
        assert last[t] < first[t], (t, first[t], last[t])


def test_meta_sampler_deterministic():
    a = MetaTaskSampler(("mlm", "sap", "cfp"), (1, 1, 1), seed=7)
    b = MetaTaskSampler(("mlm", "sap", "cfp"), (1, 1, 1), seed=7)
    seq_a = [a.task_at(i) for i in range(50)]
    seq_b = [b.task_at(i) for i in range(50)]
    assert seq_a == seq_b
    assert len(set(seq_a)) == 3
