"""Real-file-format dry run (VERDICT r2 item 9): fixture-scale files in
the REFERENCE formats — Matterport connectivity JSON, HDF5 feature db
keyed '{scan}_{vp}', R2R_{split}_roberta_enc.json annotations, base64
z-dict TSVs, scanvp candidate-cache JSON — driven through the
NON-synthetic `--mode train` CLI path end-to-end, so the first run on real
Matterport data is not a format-debugging session.
"""
import base64
import json
import os
import sys

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from vln_goat_tpu.sim.graph_sim import dump_scanvp_cands, make_synthetic_scan

# multi-10s full-scale runs: slow tier (pytest -m 'not slow')
pytestmark = pytest.mark.slow


DF = 16


def _write_connectivity(graphs, out_dir):
    """Matterport schema (utils/data.py:76-101): pose 4x4 row-major with
    translation at 3/7/11, included, unobstructed adjacency row, height."""
    os.makedirs(out_dir, exist_ok=True)
    for scan, g in graphs.items():
        V = g.num_vps
        adj = np.zeros((V, V), bool)
        for v in range(V):
            for w in g.cand_local[v]:
                if w >= 0:
                    adj[v, int(w)] = adj[int(w), v] = True
        items = []
        for v in range(V):
            pose = [0.0] * 16
            pose[0] = pose[5] = pose[10] = pose[15] = 1.0
            pose[3], pose[7], pose[11] = map(float, g.pos[v])
            items.append(dict(image_id=g.vp_ids[v], pose=pose, included=True,
                              unobstructed=[bool(x) for x in adj[v]],
                              height=1.5))
        with open(os.path.join(out_dir, f"{scan}_connectivity.json"),
                  "w") as f:
            json.dump(items, f)


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("realfmt")
    rng = np.random.default_rng(0)
    scans = {f"fx{i}": make_synthetic_scan(f"fx{i}", num_vps=10, seed=40 + i)
             for i in range(2)}

    # connectivity JSONs
    conn = os.path.join(root, "connectivity")
    _write_connectivity(scans, conn)

    # HDF5 feature db: one [36, DF] float dataset per '{scan}_{vp}'
    h5path = os.path.join(root, "feats.h5")
    with h5py.File(h5path, "w") as f:
        for s, g in scans.items():
            for vp in g.vp_ids:
                f.create_dataset(f"{s}_{vp}",
                                 data=rng.standard_normal((36, DF))
                                 .astype(np.float32))

    # annotations in the reference naming/schema (R2R_{split}_roberta_enc
    # .json, data_utils.py:136-144): instructions + instr_encodings lists
    anno = os.path.join(root, "annotations")
    os.makedirs(anno)
    pid = 0

    def items_for(n, seed):
        nonlocal pid
        r = np.random.default_rng(seed)
        out = []
        for _ in range(n):
            s = list(scans)[int(r.integers(0, 2))]
            g = scans[s]
            start = int(r.integers(0, g.num_vps))
            path = [start]
            for _ in range(3):
                ns = [int(w) for w in g.cand_local[path[-1]] if w >= 0]
                path.append(int(ns[r.integers(0, len(ns))]))
            out.append(dict(
                path_id=pid, scan=s,
                path=[g.vp_ids[v] for v in path],
                heading=float(r.uniform(0, 6.28)), distance=5.0,
                instructions=["walk on", "turn and stop"],
                instr_encodings=[
                    [0] + [int(x) for x in r.integers(4, 1000, 8)] + [2],
                    [0] + [int(x) for x in r.integers(4, 1000, 6)] + [2]],
            ))
            pid += 1
        return out

    for split, n, seed in (("train", 8, 1), ("val_train_seen", 3, 2),
                           ("val_seen", 3, 3), ("val_unseen", 3, 4),
                           ("test", 3, 5)):
        with open(os.path.join(anno, f"R2R_{split}_roberta_enc.json"),
                  "w") as f:
            json.dump(items_for(n, seed), f)

    # z-dict TSVs, base64 features (tools/zdict.py TSV schemas)
    def b64(x):
        return base64.b64encode(np.asarray(x, np.float32).tobytes()).decode()

    H = 32  # matches --hidden_size below
    # image z-dict carries raw CLIP-feature-sized rows (image_feat_size),
    # the instr z-dict carries text-embedding (hidden) rows
    img_tsv = os.path.join(root, "image_z_dict.tsv")
    with open(img_tsv, "w") as f:
        for i in range(5):
            f.write(f"room{i}\t{b64(rng.standard_normal(DF))}\t{0.2}\n")
    instr_tsv = os.path.join(root, "instr_z_dict.tsv")
    with open(instr_tsv, "w") as f:
        for i in range(4):
            f.write(f"direction\tleft{i}\t{b64(rng.standard_normal(H))}"
                    f"\t{0.25}\n")
        for i in range(6):
            f.write(f"landmark\tdoor{i}\t{b64(rng.standard_normal(H))}"
                    f"\t{1/6}\n")

    # candidate cache in the reference scanvp_candview_relangles format
    cands = os.path.join(root, "scanvp_candview_relangles.json")
    with open(cands, "w") as f:
        json.dump(dump_scanvp_cands(scans), f)

    return dict(root=str(root), conn=conn, h5=h5path, anno=anno,
                img_tsv=img_tsv, instr_tsv=instr_tsv, cands=cands)


def test_nonsynthetic_train_cli_on_real_formats(fixture_dir, tmp_path):
    """`--mode train` end-to-end on the fixture files: loads every format,
    runs one train cycle + validation, writes checkpoints/metrics."""
    from vln_goat_tpu.cli import main

    fd = fixture_dir
    out = os.path.join(tmp_path, "out")
    main(["--mode", "train",
          "--anno_dir", fd["anno"],
          "--connectivity_dir", fd["conn"],
          "--img_ft_file", fd["h5"],
          "--scanvp_cands_file", fd["cands"],
          "--img_zdict_file", fd["img_tsv"],
          "--instr_zdict_file", fd["instr_tsv"],
          "--do_back_img", "--do_back_txt",
          "--image_feat_size", str(DF),
          "--hidden_size", "32", "--num_attention_heads", "2",
          "--intermediate_size", "64",
          "--num_l_layers", "1", "--num_pano_layers", "1",
          "--num_x_layers", "1",
          "--batch_size", "4", "--iters", "2", "--log_every", "2",
          "--num_nodes", "16", "--max_action_len", "6",
          "--max_instr_len", "12", "--dropout", "0",
          "--output_dir", out])
    # ran to completion: metrics + a best checkpoint for some split
    assert os.path.exists(os.path.join(out, "metrics.jsonl"))
    lines = [json.loads(l) for l in open(os.path.join(out, "metrics.jsonl"))]
    assert lines
    ckpts = [d for d in os.listdir(out) if d.startswith(("best_", "ckpt",
                                                         "train_state"))]
    assert ckpts, os.listdir(out)


def test_valid_mode_submission_on_real_formats(fixture_dir, tmp_path):
    """`--mode valid` writes per-split score records and a submission JSON
    in the reference format (main_nav.py:386-391)."""
    from vln_goat_tpu.cli import main

    fd = fixture_dir
    out = os.path.join(tmp_path, "outv")
    main(["--mode", "valid",
          "--anno_dir", fd["anno"],
          "--connectivity_dir", fd["conn"],
          "--img_ft_file", fd["h5"],
          "--image_feat_size", str(DF),
          "--hidden_size", "32", "--num_attention_heads", "2",
          "--intermediate_size", "64",
          "--num_l_layers", "1", "--num_pano_layers", "1",
          "--num_x_layers", "1",
          "--batch_size", "4",
          "--num_nodes", "16", "--max_action_len", "6",
          "--max_instr_len", "12", "--dropout", "0",
          "--submit",
          "--output_dir", out])
    subs = [f for f in os.listdir(out) if f.endswith("_submission.json")
            or "submit" in f]
    assert subs or os.path.exists(os.path.join(out, "valid.log")), \
        os.listdir(out)
