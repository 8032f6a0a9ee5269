"""FACL/BACL tooling tests: CFP extraction, KMeans front-door picker, z-dict
update + TSV round-trips."""
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vln_goat_tpu.config import GoatConfig
from vln_goat_tpu.models.goat import GoatModel
from vln_goat_tpu.pretrain.data import (PretrainShapes, TrajBatchBuilder,
                                        items_from_dataset)
from vln_goat_tpu.rollout.env import make_synthetic_dataset
from vln_goat_tpu.sim.graph_sim import make_synthetic_scan
from vln_goat_tpu.tools.cfp_extract import (extract_cfp_features, load_cfp_tsv,
                                            save_cfp_tsv)
from vln_goat_tpu.tools.kmeans import FrontDoorPicker, kmeans_fit
from vln_goat_tpu.tools.zdict import (WordPicker, load_instr_zdict_tsv,
                                      save_instr_zdict_tsv,
                                      update_instr_zdict, broadcast_zdict)

TINY = GoatConfig(num_l_layers=1, num_x_layers=1, num_pano_layers=1,
                  hidden_size=32, num_attention_heads=2, intermediate_size=64,
                  vocab_size=64, max_position_embeddings=64,
                  image_feat_size=16, feat_dropout=0.0,
                  mode="extract_cfp_features")


@pytest.fixture(scope="module")
def setup():
    scans = [make_synthetic_scan("c0", num_vps=12, seed=5)]
    graphs = {g.scan_id: g for g in scans}
    feats = np.random.default_rng(1).standard_normal(
        (scans[0].num_vps, 36, 16)).astype(np.float32)
    shapes = PretrainShapes(max_txt_len=24, max_steps=6, max_cands=16,
                            max_gmap=32, mrc_prob_dim=16)
    builder = TrajBatchBuilder(graphs, ["c0"], feats, shapes,
                               mask_token_id=63, vocab_size=64, seed=0)
    data = make_synthetic_dataset(graphs, 10, vocab_size=63, path_len=(3, 4),
                                  max_instr_len=20, seed=3)
    items = items_from_dataset(data, graphs)
    model = GoatModel(TINY)
    batch = jax.tree.map(jnp.asarray, builder.build_batch(items[:4], "cfp"))
    params = model.init(jax.random.PRNGKey(0), batch,
                        method=GoatModel.extract_cfp)
    return dict(model=model, params=params, builder=builder, items=items)


@pytest.mark.slow
def test_cfp_extraction_and_tsv(setup, tmp_path):
    s = setup
    tsv = str(tmp_path / "cfp.tsv")
    feats = extract_cfp_features(s["model"], s["params"], s["builder"],
                                 s["items"], batch_size=4, out_tsv=tsv)
    n = len(s["items"])
    assert feats["txt_feats"].shape == (n, 32)
    assert np.isfinite(feats["txt_feats"]).all()
    # tanh-pooled outputs are bounded
    assert np.abs(feats["gmap_feats"]).max() <= 1.0 + 1e-6
    loaded = load_cfp_tsv(tsv, dim=32)
    np.testing.assert_allclose(loaded["vp_feats"], feats["vp_feats"],
                               atol=1e-6)


def test_kmeans_and_frontdoor_picker(setup):
    rng = np.random.default_rng(0)
    # three well-separated blobs must be recovered
    x = np.concatenate([rng.normal(0, .1, (30, 8)), rng.normal(5, .1, (30, 8)),
                        rng.normal(-5, .1, (30, 8))]).astype(np.float32)
    centers, assign = kmeans_fit(x, 3, seed=0)
    assert len(np.unique(assign[:30])) == 1
    assert len(np.unique(assign[30:60])) == 1
    assert len(np.unique(assign)) == 3

    feats = {"txt_feats": x, "vp_feats": x, "gmap_feats": x}
    picker = FrontDoorPicker(feats, n_clusters=3, seed=0)
    pick = picker.random_pick()
    assert pick["txt_feats"].shape == (3, 8)
    # one pick per cluster -> the three rows come from different blobs
    blobs = sorted(int(r[0] // 2.5) for r in pick["txt_feats"])
    assert len(set(blobs)) == 3


def test_zdict_update_and_tsv(setup, tmp_path):
    s = setup
    data = []
    for i in range(6):
        data.append(dict(
            instruction="turn left at the door then go up the stairs",
            instr_encoding=[0] + list(range(4, 14)) + [2],
        ))

    def tokens_of(d):
        return ["turn", "left", "at", "the", "door", "then", "go", "up",
                "the", "stairs"]

    zd, lm_f, dr_f, lm_pz, dr_pz = update_instr_zdict(
        s["model"], s["params"], data, WordPicker(), tokens_of,
        is_continuation=lambda t: t.startswith("#"), batch_size=4)
    assert "door" in lm_f and ("stair" in lm_f or "stairs" in lm_f)
    assert "left" in dr_f and "up" in dr_f
    assert abs(sum(dr_pz.values()) - 1.0) < 1e-6

    tsv = str(tmp_path / "zdict.tsv")
    save_instr_zdict_tsv(tsv, lm_f, dr_f, lm_pz, dr_pz)
    loaded = load_instr_zdict_tsv(tsv)
    assert loaded["instr_direction_features"].shape[0] == len(dr_f)
    bro = broadcast_zdict(loaded, batch_size=3, dim=32)
    assert bro["instr_direction_features"].shape[0] == 3
    assert bro["instr_direction_pzs"].shape[-1] == 1


def test_make_blip_vqa_missing_weights_message():
    """The in-repo BLIP adapter surfaces a clear error when the local
    snapshot is absent (no weights ship with the framework)."""
    import pytest

    from vln_goat_tpu.tools.do_utils import make_blip_vqa

    with pytest.raises(RuntimeError, match="BLIP"):
        make_blip_vqa("/nonexistent/blip-vqa-base")


# ---------------------------------------------------------------------------
# multi-process room-type extraction driver (extract_room_type.py:109-156)

def _fake_render():
    def render(scan, vp, ix):
        # deterministic per (scan, vp, view): encodes ix in the pixel value
        return np.full((4, 4, 3), ix, np.uint8)
    return render


def _fake_vqa():
    def vqa(image, question):
        assert question  # the driver must pass the prompt through
        return f"room{int(image[0, 0, 0]) % 3}"
    return vqa


@pytest.mark.slow
def test_room_type_pool_and_resume(tmp_path):
    from vln_goat_tpu.tools.do_utils import (extract_room_types_pooled,
                                             load_room_types)

    scan_vps = [(f"s{i % 2}", f"vp{i}") for i in range(10)]
    out = str(tmp_path / "pano_roomtypes.tsv")
    n = extract_room_types_pooled(scan_vps, _fake_vqa, _fake_render, out,
                                  num_workers=3, batch_size=8)
    assert n == 10
    got = load_room_types(out)
    assert set(got) == set(scan_vps)
    # 36 answers per viewpoint, view ix encoded through render->vqa
    for answers in got.values():
        assert len(answers) == 36
        assert answers[:4] == ["room0", "room1", "room2", "room0"]

    # resume: a second run with 4 extra viewpoints only processes those
    more = scan_vps + [("s9", f"new{i}") for i in range(4)]
    n2 = extract_room_types_pooled(more, _fake_vqa, _fake_render, out,
                                   num_workers=2, batch_size=8)
    assert n2 == 4
    got2 = load_room_types(out)
    assert set(got2) == set(more)
    # fully-resumed run is a no-op
    assert extract_room_types_pooled(more, _fake_vqa, _fake_render, out,
                                     num_workers=2) == 0
