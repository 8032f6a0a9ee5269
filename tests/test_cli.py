"""CLI end-to-end smoke at the real command surface (tiny synthetic)."""
import json
import os

import numpy as np
import pytest


def _tiny(monkeypatch):
    import vln_goat_tpu.config as C

    orig = C.GoatConfig.for_dataset.__func__

    def tiny(cls, dataset, **kw):
        kw.update(hidden_size=32, num_attention_heads=2, intermediate_size=64,
                  vocab_size=64, max_position_embeddings=64)
        return orig(cls, dataset, **kw)

    monkeypatch.setattr(C.GoatConfig, "for_dataset", classmethod(tiny))


COMMON = ["--num_l_layers", "1", "--num_pano_layers", "1",
          "--num_x_layers", "1", "--image_feat_size", "16",
          "--num_nodes", "12", "--batch_size", "2",
          "--max_action_len", "3", "--max_instr_len", "16",
          "--train_alg", "imitation", "--lr", "1e-4"]


@pytest.mark.slow
def test_cli_train_and_valid(tmp_path, monkeypatch):
    _tiny(monkeypatch)
    from vln_goat_tpu import cli

    out = str(tmp_path / "run")
    cli.main(["--mode", "train", "--synthetic", "--output_dir", out,
              "--iters", "1", "--log_every", "1"] + COMMON)
    assert os.path.isdir(os.path.join(out, "ckpt_latest"))
    assert os.path.exists(os.path.join(out, "metrics.jsonl"))

    cli.main(["--mode", "valid", "--synthetic", "--output_dir", out,
              "--submit", "--resume_file",
              os.path.join(out, "ckpt_latest")] + COMMON)
    subs = json.load(open(os.path.join(out, "submit_val_unseen.json")))
    assert subs and "trajectory" in subs[0]


@pytest.mark.slow
def test_cli_aug_backtranslation_and_resume(tmp_path, monkeypatch):
    """Aug interleave + speaker back-translation wiring
    (main_nav.py:220-252, agent.py:459-474) and kill-and-resume: a run
    interrupted at iter 1 and resumed to iter 2 reproduces the
    uninterrupted 2-iter run's parameters exactly."""
    _tiny(monkeypatch)
    import jax

    from vln_goat_tpu import cli
    from vln_goat_tpu.train.checkpoint import load_train_state_params

    common = COMMON + ["--aug", "synthetic", "--use_transpeaker",
                       "--aug_times", "1"]

    outA = str(tmp_path / "A")          # uninterrupted: 2 iters
    cli.main(["--mode", "train", "--synthetic", "--output_dir", outA,
              "--iters", "2", "--log_every", "2"] + common)

    outB = str(tmp_path / "B")          # interrupted, then resumed
    cli.main(["--mode", "train", "--synthetic", "--output_dir", outB,
              "--iters", "1", "--log_every", "1"] + common)
    # NOTE with aug_times=1 one group = 2 updates, so iters=1 consumes one
    # full group (iter counter advances to 2) — matching run A's single
    # 2-update cycle; the resume below is then a no-op continuation that
    # must keep params identical.
    cli.main(["--mode", "train", "--synthetic", "--output_dir", outB,
              "--iters", "2", "--log_every", "2", "--resume_file",
              os.path.join(outB, "train_state_latest")] + common)

    pa = load_train_state_params(os.path.join(outA, "train_state_latest"))
    pb = load_train_state_params(os.path.join(outB, "train_state_latest"))
    flat_a = jax.tree_util.tree_leaves_with_path(pa)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(pb))
    assert flat_a
    for path, va in flat_a:
        np.testing.assert_allclose(np.asarray(va),
                                   np.asarray(flat_b[path]),
                                   rtol=0, atol=0,
                                   err_msg=jax.tree_util.keystr(path))


@pytest.mark.slow
def test_cli_resume_continues_iteration(tmp_path, monkeypatch):
    """--resume_file on a full train-state dir continues the iteration
    counter and reproduces the uninterrupted loss trajectory
    (agent_base.py:205-253)."""
    _tiny(monkeypatch)
    import jax

    from vln_goat_tpu import cli
    from vln_goat_tpu.train.checkpoint import load_train_state_params

    outA = str(tmp_path / "A")          # uninterrupted: 2 iters
    cli.main(["--mode", "train", "--synthetic", "--output_dir", outA,
              "--iters", "2", "--log_every", "1"] + COMMON)
    outB = str(tmp_path / "B")          # killed after 1 iter, resumed
    cli.main(["--mode", "train", "--synthetic", "--output_dir", outB,
              "--iters", "1", "--log_every", "1"] + COMMON)
    cli.main(["--mode", "train", "--synthetic", "--output_dir", outB,
              "--iters", "2", "--log_every", "1", "--resume_file",
              os.path.join(outB, "train_state_latest")] + COMMON)

    pa = load_train_state_params(os.path.join(outA, "train_state_latest"))
    pb = load_train_state_params(os.path.join(outB, "train_state_latest"))
    leaves_a = jax.tree_util.tree_leaves_with_path(pa)
    leaves_b = dict(jax.tree_util.tree_leaves_with_path(pb))
    assert leaves_a
    for path, va in leaves_a:
        np.testing.assert_allclose(np.asarray(va),
                                   np.asarray(leaves_b[path]),
                                   rtol=0, atol=1e-7,
                                   err_msg=jax.tree_util.keystr(path))


def test_cli_train_with_causal_banks(tmp_path, monkeypatch):
    _tiny(monkeypatch)
    from vln_goat_tpu import cli
    from vln_goat_tpu.tools.zdict import save_instr_zdict_tsv

    lm = {f"lm{i}": np.random.randn(32).astype(np.float32) for i in range(3)}
    dr = {f"dr{i}": np.random.randn(32).astype(np.float32) for i in range(2)}
    tsv = str(tmp_path / "instr_z.tsv")
    save_instr_zdict_tsv(tsv, lm, dr, {k: 1 / 3 for k in lm},
                         {k: 1 / 2 for k in dr})
    out = str(tmp_path / "causal")
    # back-translation is covered by the slow-tier aug test; keeping the
    # fast tier's one CLI train path to causal banks alone saves ~20s
    cli.main(["--mode", "train", "--synthetic", "--output_dir", out,
              "--iters", "1", "--log_every", "1",
              "--instr_zdict_file", tsv] + COMMON)
    assert os.path.exists(os.path.join(out, "train.log"))


@pytest.mark.slow
def test_cli_train_lr_sch(tmp_path, monkeypatch):
    """--use_lr_sch/--lr_sch/--warmup_steps drive the scheduler path from
    the real command surface (agent_base.py:125-130 parity).  (This test
    previously also covered --train_alg dagger_2pass, pruned in round 5
    after losing its on-chip A/B 0.9 vs 104.7 eps/s.)"""
    _tiny(monkeypatch)
    from vln_goat_tpu import cli

    out = str(tmp_path / "runsch")
    cli.main(["--mode", "train", "--synthetic", "--output_dir", out,
              "--iters", "1", "--log_every", "1", "--max_action_len", "6",
              "--use_lr_sch", "--lr_sch", "linear",
              "--warmup_steps", "1"] + COMMON)
    assert os.path.isdir(os.path.join(out, "ckpt_latest"))
