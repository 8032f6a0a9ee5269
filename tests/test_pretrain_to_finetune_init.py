"""Pretrain-checkpoint -> fine-tune-model initialization (the documented
release flow: --bert_ckpt_file model_step_best_42000.pt; key surgery parity
with vlnbert_init.py:52-69)."""
import os
import sys
import tempfile

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference/pretrain_src"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference repo not mounted")

import jax
import jax.numpy as jnp


def test_pretrain_ckpt_initializes_finetune_model():
    # build the pretrain oracle and save its flat state dict like
    # ModelSaver does (utils/save.py:23-71: strips 'module.')
    sys.path.insert(0, REF)
    import types

    import transformers.modeling_utils as mu
    if not hasattr(mu, "apply_chunking_to_forward"):
        from transformers.pytorch_utils import apply_chunking_to_forward
        mu.apply_chunking_to_forward = apply_chunking_to_forward
    sys.modules.setdefault("pynvml", types.ModuleType("pynvml"))
    from tests.test_pretrain_parity import TASKS, VOCAB, _our_config, \
        _ref_config
    from model.pretrain_goat import GlocalTextPathCMTPreTraining

    torch.manual_seed(9)
    tm = GlocalTextPathCMTPreTraining(_ref_config()).eval()
    path = tempfile.mktemp(suffix=".pt")
    torch.save(tm.state_dict(), path)

    from vln_goat_tpu.models.goat import GoatModel
    from vln_goat_tpu.train.checkpoint import (load_reference_checkpoint,
                                               merge_loaded, torch_to_flax)
    from vln_goat_tpu.train.params import init_goat_params

    loaded = torch_to_flax(load_reference_checkpoint(path))
    ours = GoatModel(_our_config())
    init = init_goat_params(ours, jax.random.PRNGKey(0), max_cands=4,
                            num_nodes=6)
    merged, missing, extra = merge_loaded(init, loaded)

    # every fine-tune encoder tower + sap head must be covered by the
    # pretrain checkpoint; only fine-tune-specific modules may be missing
    allowed_missing_roots = {
        "gmap_pooler", "vp_pooler", "txt_pooler", "local_his_map",
        "local_his_ln",
        # R2R pretrain carries no objnav head / the reference surgery also
        # leaves these to fresh init
    }
    for m in missing:
        root = m.split("/")[0]
        assert root in allowed_missing_roots, f"unexpected missing {m}"
    # the language tower weights must be byte-identical after conversion
    ref_w = tm.bert.embeddings.word_embeddings.weight.detach().numpy()
    np.testing.assert_array_equal(
        np.asarray(merged["params"]["embeddings"]["word_embeddings"]
                   ["embedding"]), ref_w)
    ref_q = tm.bert.lang_encoder.layer[0].attention.self.query.weight \
        .detach().numpy()
    np.testing.assert_allclose(
        np.asarray(merged["params"]["lang_encoder"]["layer_0"]["attention"]
                   ["self"]["query"]["kernel"]), ref_q.T, atol=0)
    # sap heads transferred (reference surgery re-homes '_head'/'sap_fuse')
    ref_h = tm.global_sap_head.net[0].weight.detach().numpy()
    np.testing.assert_allclose(
        np.asarray(merged["params"]["global_sap_head"]["net_0"]["kernel"]),
        ref_h.T, atol=0)
    # and the loaded model still runs
    ids = jnp.zeros((1, 6), jnp.int32)
    out = ours.apply(merged, ids, jnp.ones((1, 6), bool),
                     method=GoatModel.forward_text)
    assert np.isfinite(np.asarray(out)).all()
    os.remove(path)
