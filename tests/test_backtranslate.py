"""Back-translation: speaker decodes swap into episodes, shared noise feeds
the rollout with already_dropout semantics."""
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
from vln_goat_tpu.speaker.backtranslate import (backtranslate,
                                                shared_drop_mask,
                                                swap_instructions)
from vln_goat_tpu.speaker.model import SpeakerConfig
from vln_goat_tpu.speaker.speaker import Speaker
from vln_goat_tpu.train.params import init_goat_params

# multi-10s full-scale runs: slow tier (pytest -m 'not slow')
pytestmark = pytest.mark.slow


TINY = GoatConfig(num_l_layers=1, num_x_layers=1, num_pano_layers=1,
                  hidden_size=32, num_attention_heads=2, intermediate_size=64,
                  vocab_size=64, max_position_embeddings=64,
                  image_feat_size=16, feat_dropout=0.4)


def test_backtranslation_roundtrip():
    scans = [make_synthetic_scan("bt0", num_vps=12, seed=4)]
    graphs = {g.scan_id: g for g in scans}
    feats = np.random.default_rng(0).standard_normal(
        (scans[0].num_vps, 36, 16)).astype(np.float32)
    world = NavWorld.build(scans, features=feats, feat_dim=16)
    data = make_synthetic_dataset(graphs, 6, vocab_size=60, path_len=(3, 4),
                                  seed=5)
    items = [{**d, "path_local": [graphs[d["scan"]].index[v]
                                  for v in d["path"]]} for d in data]

    scfg = SpeakerConfig(vocab_size=64, feature_size=16 + 8,
                         image_feat_size=16, hidden_size=32, word_size=16,
                         head_dim=8, num_heads=2, num_layers=1, ff_dim=32,
                         dropout=0.0, feat_dropout=0.0, max_decode=12)
    sp = Speaker(scfg)
    toks, noise = backtranslate(sp, sp.params, graphs, feats, {"bt0": 0},
                                items, max_steps=4,
                                rng=jax.random.PRNGKey(0), feat_drop=0.4,
                                angle_feat_size=8, image_feat_size=16)
    assert toks.shape[0] == len(items)
    assert noise.shape == (16,)
    # inverted dropout: kept lanes are scaled by 1/(1-p)
    kept = noise[noise > 0]
    np.testing.assert_allclose(kept, 1.0 / 0.6, rtol=1e-5)

    new_items = swap_instructions(items, toks, eos_id=2, bos_id=0)
    assert all(len(it["instr_encoding"]) >= 1 for it in new_items)

    # rollout with the swapped instructions + shared noise
    model = GoatModel(TINY)
    params = init_goat_params(model, jax.random.PRNGKey(0), max_cands=16,
                              num_nodes=16)
    ro = NavRollout(model, world, RolloutConfig(num_nodes=16, horizon=4,
                                                feat_dim=16))
    batcher = EpisodeBatcher(new_items, graphs, ["bt0"], batch_size=3,
                             max_instr_len=16, max_gt_len=5)
    _, batch = batcher.next_batch()
    batch = dict(batch, feat_noise=jnp.asarray(noise))
    fn = ro.jitted(feedback="teacher", train_ml=True)
    out = fn(params, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(out["ml_loss"]))
