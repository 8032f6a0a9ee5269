"""Utility/observability components + single-process distributed helpers."""
import json
import os

import numpy as np
import pytest

from vln_goat_tpu.parallel.distributed import (all_gather_objects,
                                               merge_dist_results,
                                               shard_data_for_process)
from vln_goat_tpu.tools.do_utils import (build_image_zdict, build_text_zdict,
                                         count_corpus_words, load_room_types)
from vln_goat_tpu.tools.zdict import WordPicker, load_img_zdict_tsv
from vln_goat_tpu.utils.logger import (MetricsLogger, RunningMeter, Timer,
                                       write_to_record_file)


def test_running_meter_ignores_nan():
    m = RunningMeter("x", smooth=0.5)
    m(1.0)
    m(float("nan"))
    m(3.0)
    assert abs(m.val - 2.0) < 1e-9


def test_metrics_logger(tmp_path):
    path = str(tmp_path / "m.jsonl")
    ml = MetricsLogger(path)
    ml.set_step(10)
    ml.log_scalar_dict({"loss": 1.5}, prefix="train")
    ml.set_step(20)
    ml.log_scalar_dict({"sr": 55.0}, prefix="val")
    lines = [json.loads(l) for l in open(path)]
    assert lines[0] == {"step": 10, "train/loss": 1.5}
    assert lines[1]["val/sr"] == 55.0


def test_record_file(tmp_path):
    path = str(tmp_path / "r.log")
    write_to_record_file("hello", path, verbose=False)
    write_to_record_file("world", path, verbose=False)
    assert open(path).read() == "hello\nworld\n"


def test_distributed_single_process():
    assert all_gather_objects({"a": 1}) == [{"a": 1}]
    assert merge_dist_results([[1, 2], [3]]) == [1, 2, 3]
    data = list(range(10))
    assert shard_data_for_process(data, 0, 1) == data
    assert shard_data_for_process(data, 0, 3) == [0, 1, 2]
    assert shard_data_for_process(data, 2, 3) == [6, 7, 8, 9]


def test_do_utils_image_zdict(tmp_path):
    rng = np.random.default_rng(0)
    room_types = {
        ("s1", "v1"): ["kitchen"] * 20 + ["hallway"] * 16,
        ("s1", "v2"): ["bedroom"] * 36,
        ("s2", "v1"): ["garage"] * 36,  # unseen scan: excluded
    }
    feats = {k: rng.standard_normal((36, 8)).astype(np.float32)
             for k in room_types}

    def view_features(scan, vp):
        return feats[(scan, vp)]

    tsv = str(tmp_path / "img_z.tsv")
    f, pz = build_image_zdict(room_types, view_features, seen_scans=["s1"],
                              top_k=2, out_tsv=tsv)
    assert set(f) == {"kitchen", "bedroom"}  # top-2 by count over seen
    assert abs(sum(pz.values()) - 1.0) < 1e-9
    np.testing.assert_allclose(f["bedroom"], feats[("s1", "v2")].mean(0),
                               atol=1e-5)
    loaded = load_img_zdict_tsv(tsv)
    assert loaded["img_features"].shape == (2, 8)


def test_do_utils_text_zdict(tmp_path):
    picker = WordPicker()
    instrs = ["turn left at the door", "go past the door to the stairs"]
    lm, dr = count_corpus_words(instrs, picker)
    assert lm["door"] == 2 and "left" in dr

    def embed(w):
        return np.full(4, float(len(w)), np.float32)

    tsv = str(tmp_path / "txt_z.tsv")
    (lm_f, lm_p), (dr_f, dr_p) = build_text_zdict(lm, dr, embed, out_tsv=tsv)
    assert abs(sum(lm_p.values()) - 1.0) < 1e-9
    assert os.path.getsize(tsv) > 0


@pytest.mark.slow
def test_efficiency_count_tiny():
    from vln_goat_tpu.config import GoatConfig
    from vln_goat_tpu.tools.efficiency import efficiency_count

    cfg = GoatConfig(num_l_layers=1, num_x_layers=1, num_pano_layers=1,
                     hidden_size=32, num_attention_heads=2,
                     intermediate_size=64, vocab_size=64,
                     max_position_embeddings=64, image_feat_size=16)
    out = efficiency_count(cfg, bs=2, txt_len=8)
    assert out["params_m"] > 0
    for k in ("language_gflops", "panorama_gflops", "navigation_gflops"):
        assert out[k] > 0, out
