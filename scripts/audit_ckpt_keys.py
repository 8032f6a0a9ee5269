"""Checkpoint key-coverage audit (VERDICT r3 item 4, "real-data drill").

Diffs the converter's accepted key set (train/checkpoint.torch_to_flax +
merge_loaded) against a reference checkpoint's EXACT key list, so that day
one with the released GOAT weights is a run, not a debugging session.

Two sources for the key list:
- --ckpt PATH: a real released .pt (fine-tune wrapper dict or flat
  pretrain dict, agent_base.py:205-253 / vlnbert_init.py:22-69 surgery
  surface).
- --synth (default when no --ckpt): instantiate the UNMODIFIED reference
  model at the released R2R GOAT production config (768/12/3072, layers
  6/2/3, full causal flags per run_r2r_goat.sh:30-67) and use its
  state_dict() key list — identical to the released checkpoint's modulo
  training state.

Exit status: 0 when every reference key is consumed and every param in our
tree is covered (modulo the documented expected-unused set), 1 otherwise,
with the full diff printed.
"""
import argparse
import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

def expected_unused(causal: bool = True, dataset: str = "r2r",
                    back_txt_type: str = "type_2",
                    back_img_type: str = "type_1",
                    add_method: str = "door"):
    """Reference keys that are DEAD WEIGHT at a given config — modules
    torch instantiates unconditionally (or for a branch the config never
    takes) whose parameters the forward pass never reads.  Our flax
    modules materialize lazily, so these have no counterpart by design;
    skipping them mirrors the reference's own tolerant load
    (agent_base.py:238-253).  Each entry cites the reference evidence."""
    out = [
        # HF registered buffer, not a parameter
        "position_ids",
        # created at :608, never called anywhere in vilmodel_GOAT.py —
        # front-door txt feats go straight to the lang encoder's
        # z_front_cross_attn (:114-117)
        "front_txt_encoder",
    ]
    if dataset not in ("reverie", "soon"):
        # used only in the REVERIE/SOON object branches
        out += ["og_head",                          # :577, used at :817
                "img_embeddings/nav_type_embedding",  # used at :716-718
                "img_embeddings/layer_norm"]          # used at :720
    if causal:
        if back_txt_type != "type_1":
            out.append("lang_encoder/z_txt_linear")   # type_1 only, :113
        if add_method != "concat":
            out.append("lang_encoder/concat_linear")  # concat only, :158
        if back_img_type != "type_2":
            out.append("img_embeddings/do_img_attn")  # type_2 only, :670
        else:
            # type_2 skips the type_1 summation projections?  no — the
            # type_2 door path reads img_after_linear/do_img_after_linear
            # too (:673-675); nothing extra to expect
            pass
    return tuple(out)


def synth_state_dict(causal: bool = True):
    """State dict of the unmodified reference GlocalTextPathNavCMT at the
    production R2R GOAT config (+ Critic keys as the released fine-tune
    wrapper carries them, agent_base.py:205-215)."""
    import oracle_harness as OH

    from vln_goat_tpu.sim.graph_sim import make_synthetic_scan

    graphs = {"a0": make_synthetic_scan("a0", num_vps=8, seed=0)}
    OH.install_fake_mattersim(graphs)
    tmp = tempfile.mkdtemp(prefix="audit_")
    OH.write_roberta_config(tmp)
    over = {}
    if causal:
        # run_r2r_goat.sh:57-67.  NB the script's --do_back_imgobj_type is
        # not an r2r/parser.py flag; the effective do_back_img_type is the
        # parser default 'type_1' (parser.py:137)
        over = dict(do_back_txt=True, do_back_img=True,
                    do_back_txt_type="type_2", do_back_img_type="type_1",
                    do_add_method="door", do_front_txt=True,
                    do_front_img=True, do_front_his=True)
    args = OH.make_ref_args(tmp, feat_dim=768, **over)
    cwd = os.getcwd()
    os.chdir(tmp)
    try:
        from models.vlnbert_init import get_vlnbert_models

        model = get_vlnbert_models(args, config=None)
    finally:
        os.chdir(cwd)
    import numpy as np

    sd = {k: v.detach().cpu().numpy()
          for k, v in model.state_dict().items()}
    return sd, args


def our_init_params(causal: bool = True):
    import jax

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
    return init_goat_params(model, jax.random.PRNGKey(0), max_cands=4,
                            num_nodes=8)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=None,
                    help=".pt to audit; default: synthesize the released "
                         "key list from the unmodified reference model")
    ap.add_argument("--plain", action="store_true",
                    help="audit the non-causal (no z-dict) config instead")
    ap.add_argument("--dump", default=None,
                    help="write the reference key:shape list to this file "
                         "(tests/fixtures snapshot for the fast-tier "
                         "audit test) instead of auditing")
    a = ap.parse_args()
    causal = not a.plain

    from vln_goat_tpu.train.checkpoint import (load_reference_checkpoint,
                                               merge_loaded, torch_to_flax)

    if a.ckpt:
        sd = load_reference_checkpoint(a.ckpt)
        src = a.ckpt
    else:
        sd, _ = synth_state_dict(causal)
        src = "reference model state_dict (synthetic, production config)"

    if a.dump:
        import numpy as np

        with open(a.dump, "w") as f:
            for k in sorted(sd):
                shape = ",".join(str(d) for d in np.asarray(sd[k]).shape)
                f.write(f"{k} {shape}\n")
        print(f"dumped {len(sd)} keys -> {a.dump}")
        return 0

    loaded = torch_to_flax(sd)
    init = our_init_params(causal)
    _, missing, extra = merge_loaded(init, loaded)

    n_ref = len(sd)
    exp = expected_unused(causal=causal)
    unexpected_extra = [k for k in extra
                        if not any(s in k for s in exp)]
    print(f"source: {src}")
    print(f"reference keys: {n_ref}")
    print(f"our params not covered (missing): {len(missing)}")
    for k in missing:
        print(f"  MISSING {k}")
    print(f"reference keys unconsumed (extra): {len(extra)} "
          f"({len(extra) - len(unexpected_extra)} expected)")
    for k in unexpected_extra:
        print(f"  EXTRA   {k}")
    ok = not missing and not unexpected_extra
    print("AUDIT " + ("PASS" if ok else "FAIL"))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
