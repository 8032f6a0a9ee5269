"""Speaker checkpoint surface (VERDICT r4 item 8): the reference
Transpeaker save format (map_nav_src/r2r/transpeaker.py:329-363) must map
onto our TranspeakerModel with FULL key coverage and forward parity, so a
user's trained transpeaker .pt drives our back-translation path directly.

The reference model (models/transpeaker_model.py) is instantiated
UNMODIFIED at a tiny config (its module-level `args = parse_args()` is fed
via sys.argv) and compared against speaker_torch_to_flax's output."""
import os
import sys

import numpy as np
import pytest

import jax

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

torch = pytest.importorskip("torch")

# reference-model instantiation (~30s setup on this 1-core host): slow
# tier; the converter-surface drift guard in the FAST tier is
# tests/test_ckpt_audit.py
pytestmark = [pytest.mark.slow]

H, W, A, FF, HEADS, LAYERS, VOCAB, FEAT = 32, 24, 8, 48, 2, 2, 50, 40


@pytest.fixture(scope="module")
def rig():
    import oracle_harness as OH

    OH.install_fake_mattersim({})
    # transpeaker_model reads its config from r2r.parser at IMPORT time
    argv = ["prog", "--mode", "train", "--root_dir", "/tmp",
            "--hDim", str(H),
            "--wemb", str(W), "--aemb", str(A), "--proj_hidden", str(FF),
            "--speaker_head_num", str(HEADS),
            "--speaker_layer_num", str(LAYERS),
            "--speaker_dropout", "0", "--featdropout", "0"]
    old = sys.argv
    try:
        sys.argv = argv
        for m in list(sys.modules):
            if m.startswith("models.transpeaker_model"):
                del sys.modules[m]
        from models.transpeaker_model import Transpeaker
    finally:
        sys.argv = old
    torch.manual_seed(0)
    ref = Transpeaker(feature_size=FEAT, hidden_size=H, word_size=W,
                      tgt_vocab_size=VOCAB, padding_idx=0)
    ref.eval()

    from vln_goat_tpu.speaker.model import SpeakerConfig, TranspeakerModel

    scfg = SpeakerConfig(vocab_size=VOCAB, feature_size=FEAT,
                         image_feat_size=FEAT - 8, hidden_size=H,
                         word_size=W, head_dim=A, num_heads=HEADS,
                         num_layers=LAYERS, ff_dim=FF,
                         dropout=0.0, feat_dropout=0.0)
    model = TranspeakerModel(scfg)
    B, T, L = 3, 5, 7
    rng = np.random.RandomState(1)
    acts = rng.randn(B, T, FEAT).astype(np.float32)
    feats = rng.randn(B, T, 36, FEAT).astype(np.float32)
    dec = rng.randint(1, VOCAB, size=(B, L)).astype(np.int32)
    init = model.init(jax.random.PRNGKey(0), acts, feats,
                      np.ones((B, T), bool), dec)
    return dict(ref=ref, model=model, init=init, scfg=scfg,
                acts=acts, feats=feats, dec=dec)


def test_speaker_key_coverage(rig):
    """Every reference key is consumed (except the two sinusoid buffers)
    and every param in our tree is covered — the audit invariant."""
    from vln_goat_tpu.train.checkpoint import (merge_loaded,
                                               speaker_torch_to_flax)

    sd = {k: v.detach().numpy() for k, v in rig["ref"].state_dict().items()}
    tree, skipped = speaker_torch_to_flax(sd)
    assert sorted(skipped) == ["decoder.pos_emb.pe", "encoder.pos_emb.pe"]
    merged, missing, extra = merge_loaded(rig["init"], {"params": tree})
    assert not missing, missing
    assert not extra, extra


def test_speaker_forward_parity(rig):
    """Reference Transpeaker.forward logits == ours with converted
    weights (eval mode, full-length masks)."""
    from vln_goat_tpu.train.checkpoint import (merge_loaded,
                                               speaker_torch_to_flax)

    sd = {k: v.detach().numpy() for k, v in rig["ref"].state_dict().items()}
    tree, _ = speaker_torch_to_flax(sd)
    merged, _, _ = merge_loaded(rig["init"], {"params": tree})
    acts, feats, dec = rig["acts"], rig["feats"], rig["dec"]
    B, T = acts.shape[:2]
    with torch.no_grad():
        ref_logits = rig["ref"](
            torch.from_numpy(acts.copy()), torch.from_numpy(feats.copy()),
            torch.from_numpy(dec.astype(np.int64)),
            ctx_mask=None, already_dropfeat=True)[0].numpy()
    ours = rig["model"].apply(
        merged, acts, feats, np.ones((B, T), bool), dec,
        already_dropfeat=True, deterministic=True)
    np.testing.assert_allclose(np.asarray(ours), ref_logits,
                               rtol=2e-4, atol=2e-4)


def test_speaker_wrapper_load(tmp_path, rig):
    """load_reference_speaker unwraps the {'transpeaker': {'state_dict'}}
    save format (transpeaker.py:329-344)."""
    from vln_goat_tpu.train.checkpoint import (load_reference_speaker,
                                               speaker_torch_to_flax)

    p = str(tmp_path / "spk.pt")
    torch.save({"transpeaker": {"epoch": 3,
                                "state_dict": rig["ref"].state_dict(),
                                "optimizer": {}}}, p)
    sd = load_reference_speaker(p)
    tree, skipped = speaker_torch_to_flax(sd)
    assert len(skipped) == 2
    kq = np.asarray(tree["enc_0_self_attn"]["W_Q"]["kernel"])
    ref_wq = rig["ref"].encoder.layers[0].enc_self_attn.W_Q.weight
    np.testing.assert_array_equal(kq, ref_wq.detach().numpy().T)
