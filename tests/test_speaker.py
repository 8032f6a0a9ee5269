"""Speaker tests: teacher-forced training reduces loss, decode emits valid
sequences, overfit on a tiny set yields matching decodes, BLEU sanity."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vln_goat_tpu.eval.bleu import corpus_bleu
from vln_goat_tpu.rollout.env import make_synthetic_dataset
from vln_goat_tpu.sim.graph_sim import make_synthetic_scan
from vln_goat_tpu.speaker.model import SpeakerConfig
from vln_goat_tpu.speaker.speaker import Speaker, build_path_batch


@pytest.fixture(scope="module")
def setup():
    cfg = SpeakerConfig(vocab_size=32, feature_size=16 + 8, image_feat_size=16,
                        hidden_size=32, word_size=16, head_dim=8, num_heads=2,
                        num_layers=1, ff_dim=32, dropout=0.0, feat_dropout=0.0,
                        max_decode=10)
    scans = [make_synthetic_scan("sp0", num_vps=10, seed=3)]
    graphs = {g.scan_id: g for g in scans}
    feats = np.random.default_rng(0).standard_normal(
        (scans[0].num_vps, 36, 16)).astype(np.float32)
    data = make_synthetic_dataset(graphs, 4, vocab_size=30, path_len=(3, 4),
                                  max_instr_len=16, seed=4)
    items = [{**d, "path_local": [graphs[d["scan"]].index[v]
                                  for v in d["path"]]} for d in data]
    fb = build_path_batch(graphs, feats, {"sp0": 0}, items, max_steps=4,
                          angle_feat_size=8, image_feat_size=16)
    # target "instructions": short token sequences ending in EOS(2)
    rng = np.random.default_rng(1)
    toks = np.zeros((len(items), 9), np.int32)
    for i in range(len(items)):
        n = int(rng.integers(3, 6))
        toks[i, 0] = cfg.bos_id  # <BOS> = last vocab slot
        toks[i, 1:1 + n] = rng.integers(3, 30, n)
        toks[i, 1 + n] = cfg.eos_id
    batch = {**jax.tree.map(jnp.asarray, fb), "tokens": jnp.asarray(toks)}
    return dict(cfg=cfg, batch=batch)


@pytest.mark.slow
def test_speaker_overfits_and_decodes(setup):
    cfg, batch = setup["cfg"], setup["batch"]
    sp = Speaker(cfg)
    step, opt_state = sp.make_train_step(lr=3e-3)
    params = sp.params
    losses = []
    for i in range(60):
        params, opt_state, loss = step(params, opt_state, batch,
                                       jax.random.PRNGKey(i))
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.3, (losses[0], losses[-1])

    out = np.asarray(sp.infer(params, batch))
    tgt = np.asarray(batch["tokens"])[:, 1:]
    # overfit: greedy decode must reproduce the targets up to EOS
    for b in range(out.shape[0]):
        n = int(np.argmax(tgt[b] == 2))
        assert (out[b, :n + 1] == tgt[b, :n + 1]).all(), (b, out[b], tgt[b])


def test_speaker_sample_decode_valid(setup):
    cfg, batch = setup["cfg"], setup["batch"]
    sp = Speaker(cfg)
    out = np.asarray(sp.infer(sp.params, batch, rng=jax.random.PRNGKey(7),
                              sample=True))
    assert out.shape[1] == cfg.max_decode
    # after EOS everything must be pad
    for b in range(out.shape[0]):
        if (out[b] == 2).any():
            e = int(np.argmax(out[b] == 2))
            assert (out[b, e + 1:] == 0).all()


def test_corpus_bleu():
    hyp = [["the", "cat", "sat", "on", "the", "mat"]]
    refs = [[["the", "cat", "sat", "on", "the", "mat"]]]
    b4, bs = corpus_bleu(hyp, refs)
    assert abs(b4 - 1.0) < 1e-9
    hyp2 = [["the", "dog"]]
    refs2 = [[["the", "cat", "sat"]]]
    b4_2, _ = corpus_bleu(hyp2, refs2, smooth=True)
    assert 0.0 <= b4_2 < 0.7
