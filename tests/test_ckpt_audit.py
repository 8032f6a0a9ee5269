"""Fast-tier checkpoint key-coverage audit (VERDICT r4 item 8): the
converter surface is diffed against CHECKED-IN snapshots of the reference
model's state_dict key list (tests/fixtures/ref_ckpt_keys_*.txt, written
by `scripts/audit_ckpt_keys.py --dump`), so converter drift is caught on
every run without instantiating torch models.  The slow end
(regenerating the snapshot from the unmodified reference) stays in
scripts/audit_ckpt_keys.py --synth.

Param trees come from jax.eval_shape — structure and shapes only, no
device work — which is exactly what merge_loaded's audit needs."""
import os
import sys

import numpy as np
import pytest

import jax

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(HERE), "scripts"))


def _fixture_sd(name):
    path = os.path.join(HERE, "fixtures", name)
    sd = {}
    with open(path) as f:
        for line in f:
            key, _, shape = line.strip().partition(" ")
            dims = tuple(int(d) for d in shape.split(",") if d)
            sd[key] = np.zeros(dims, np.float32)
    return sd


def _shape_init(causal):
    from vln_goat_tpu.config import GoatConfig
    from vln_goat_tpu.models.goat import GoatModel
    from vln_goat_tpu.train.params import init_goat_params

    kw = {}
    if causal:
        kw = dict(do_back_txt=True, do_back_img=True,
                  do_back_txt_type="type_2", do_back_img_type="type_1",
                  do_add_method="door", do_front_txt=True,
                  do_front_img=True, do_front_his=True)
    cfg = GoatConfig.for_dataset("r2r", **kw)
    model = GoatModel(cfg)
    return jax.eval_shape(
        lambda: init_goat_params(model, jax.random.PRNGKey(0),
                                 max_cands=4, num_nodes=8))


@pytest.mark.parametrize("causal,fixture", [
    (True, "ref_ckpt_keys_causal.txt"),
    (False, "ref_ckpt_keys_plain.txt"),
])
def test_finetune_ckpt_key_coverage(causal, fixture):
    from audit_ckpt_keys import expected_unused

    from vln_goat_tpu.train.checkpoint import merge_loaded, torch_to_flax

    sd = _fixture_sd(fixture)
    loaded = torch_to_flax(sd)
    init = _shape_init(causal)
    _, missing, extra = merge_loaded(init, loaded)
    exp = expected_unused(causal=causal)
    unexpected = [k for k in extra if not any(s in k for s in exp)]
    assert not missing, f"our params not covered: {missing[:8]}"
    assert not unexpected, f"reference keys unconsumed: {unexpected[:8]}"
