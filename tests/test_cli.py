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
    cli.main(["--mode", "train", "--synthetic", "--output_dir", out,
              "--iters", "1", "--log_every", "1", "--do_back_txt",
              "--instr_zdict_file", tsv] + COMMON)
    assert os.path.exists(os.path.join(out, "train.log"))
