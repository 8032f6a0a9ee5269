"""Measure the REFERENCE's pre-training step per task on this host
(VERDICT r2 item 7: pretrain baseline anchors for BASELINE.md).

Drives the real pretrain stack — R2RTextPathData + task datasets/collates
+ GlocalTextPathCMTPreTraining — on fixture-scale files in the real
formats (jsonl annotations, connectivity JSONs + scans.txt, scanvp
candidate cache, in-memory '{scan}_{vp}' feature dict), CPU torch, at the
production model config (768 hidden, 6/2/3 layers).

One measured step per task = dataset __getitem__ xB + collate (host) +
forward + backward (model).  Like BASELINE.md's fine-tune derivation, the
host time bounds the reference's GPU throughput:

    ref GPU ex/s <= B / host_time_per_batch   (per task)

because the python dataset/collate work does not shrink on a GPU rig.
"""
import json
import math
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
REF = "/root/reference/pretrain_src"
sys.path.insert(0, REF)

import numpy as np
import torch

from vln_goat_tpu.sim.graph_sim import dump_scanvp_cands, make_synthetic_scan

B = 8
TASKS = ["mlm", "sap", "cfp"]


class _Tok:
    cls_token_id = 0
    sep_token_id = 2
    pad_token_id = 1
    mask_token_id = 50264
    vocab_size = 50265


def build_fixture(tmp):
    rng = np.random.default_rng(0)
    scans = {f"pb{i}": make_synthetic_scan(f"pb{i}", num_vps=30,
                                           seed=60 + i) for i in range(2)}
    conn = os.path.join(tmp, "connectivity")
    os.makedirs(conn)
    with open(os.path.join(conn, "scans.txt"), "w") as f:
        f.write("\n".join(scans) + "\n")
    for s, g in scans.items():
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
        with open(os.path.join(conn, f"{s}_connectivity.json"), "w") as f:
            json.dump(items, f)

    cands_path = os.path.join(tmp, "scanvp_cands.json")
    with open(cands_path, "w") as f:
        json.dump(dump_scanvp_cands(scans), f)

    img_ft_db = {}
    for s, g in scans.items():
        for vp in g.vp_ids:
            img_ft_db[f"{s}_{vp}"] = rng.standard_normal(
                (36, 768)).astype(np.float32)

    anno = os.path.join(tmp, "train.jsonl")
    with open(anno, "w") as f:
        r = np.random.default_rng(1)
        for pid in range(64):
            s = list(scans)[int(r.integers(0, 2))]
            g = scans[s]
            path = [int(r.integers(0, g.num_vps))]
            for _ in range(int(r.integers(3, 6))):
                ns = [int(w) for w in g.cand_local[path[-1]] if w >= 0]
                path.append(int(ns[r.integers(0, len(ns))]))
            item = dict(
                instr_id=f"{pid}_0", path_id=pid, scan=s,
                path=[g.vp_ids[v] for v in path],
                heading=float(r.uniform(0, 2 * math.pi)),
                instruction="walk forward and stop",
                instr_encoding=[0] + [int(x) for x in
                                      r.integers(4, 5000, 24)] + [2],
            )
            f.write(json.dumps(item) + "\n")
    return conn, cands_path, img_ft_db, anno


def main():
    import types as _types

    # absent-from-image leaf deps of the reference data package: pynvml is
    # only touched by the GPU-mem watchdog, lmdb is imported but unused
    if "pynvml" not in sys.modules:
        pn = _types.ModuleType("pynvml")
        pn.nvmlInit = lambda: None
        pn.nvmlDeviceGetHandleByIndex = lambda i: None
        pn.nvmlDeviceGetMemoryInfo = lambda h: _types.SimpleNamespace(
            total=1, used=0)
        sys.modules["pynvml"] = pn
    sys.modules.setdefault("lmdb", _types.ModuleType("lmdb"))
    import transformers.modeling_utils as mu
    if not hasattr(mu, "apply_chunking_to_forward"):
        from transformers.pytorch_utils import apply_chunking_to_forward
        mu.apply_chunking_to_forward = apply_chunking_to_forward
    from model.pretrain_goat import GlocalTextPathCMTPreTraining
    if "jsonlines" not in sys.modules:
        # not in the image; the dataset only uses jsonlines.open(path, 'r')
        # as an iterable context manager
        import types

        jl = types.ModuleType("jsonlines")

        class _JL:
            def __init__(self, path):
                self.path = path

            def __enter__(self):
                return [json.loads(l) for l in open(self.path)]

            def __exit__(self, *a):
                return False

        jl.open = lambda path, mode="r": _JL(path)
        sys.modules["jsonlines"] = jl
    from data.dataset import R2RTextPathData
    from data.tasks import (CfpDataset, MlmDataset, SapDataset, cfp_collate,
                            mlm_collate, sap_collate)
    from transformers import PretrainedConfig

    tmp = tempfile.mkdtemp(prefix="ref_pretrain_bench_")
    conn, cands_path, img_ft_db, anno = build_fixture(tmp)

    cfg = PretrainedConfig()
    for k, v in dict(
        attn_implementation="eager", _attn_implementation="eager",
        vocab_size=50265, hidden_size=768, num_attention_heads=12,
        intermediate_size=3072, max_position_embeddings=514,
        type_vocab_size=1, pad_token_id=1, layer_norm_eps=1e-12,
        hidden_act="gelu", hidden_dropout_prob=0.1,
        attention_probs_dropout_prob=0.1, initializer_range=0.02,
        is_decoder=False, add_cross_attention=False,
        chunk_size_feed_forward=0, num_l_layers=6, num_pano_layers=2, num_top_layer=3,
        num_x_layers=3, num_hidden_layers=6, name="R2R",
        max_action_steps=100, image_feat_size=768, angle_feat_size=4,
        obj_feat_size=0, obj_name_vocab_size=45, use_obj_name=False,
        graph_sprels=True, glocal_fuse=True, update_lang_bert=True,
        adaptive_pano_fusion=True, do_back_img=False, do_back_txt=False,
        do_front_txt=False, do_back_txt_type="type_2", do_add_method="door",
        z_cross_attn=False, pretrain_tasks=TASKS, image_prob_size=0,
        obj_prob_size=0, cfp_temperature=1.0, empty_cache=False,
        cuda_first_device=0, use_lang2visn_attn=False, debug=False,
        max_instr_len=100, correct_heading=True, cfp_extra_head=True,
    ).items():
        setattr(cfg, k, v)

    # the reference's forward_cfp hardcodes .cuda() on its InfoNCE targets
    # (pretrain_goat.py:520); neutralize for the CPU timing rig
    torch.Tensor.cuda = lambda self, *a, **k: self

    torch.manual_seed(0)
    model = GlocalTextPathCMTPreTraining(cfg).train()
    opt = torch.optim.AdamW(model.parameters(), lr=5e-5)

    nav_db = R2RTextPathData(
        [anno], img_ft_db, cands_path, conn, image_feat_size=768,
        image_prob_size=0, angle_feat_size=4, max_txt_len=80,
        in_memory=True, args=cfg, tok=None)
    print(f"nav_db: {len(nav_db)} items", flush=True)

    mk = {"mlm": (MlmDataset, mlm_collate), "sap": (SapDataset, sap_collate),
          "cfp": (CfpDataset, cfp_collate)}
    torch.set_num_threads(os.cpu_count() or 1)
    for task in TASKS:
        ds_cls, collate = mk[task]
        ds = ds_cls(nav_db, _Tok()) if task != "sap" else \
            ds_cls(nav_db, _Tok(), end_vp_pos_ratio=0.2)

        def one_batch():
            t0 = time.perf_counter()
            batch = collate([ds[i % len(ds)] for i in range(B)])
            host = time.perf_counter() - t0
            t0 = time.perf_counter()
            loss = model(batch, task=task, compute_loss=True)
            loss = loss.mean() if loss.dim() else loss
            opt.zero_grad()
            loss.backward()
            opt.step()
            return host, time.perf_counter() - t0

        one_batch()                      # warm caches
        hosts, models = [], []
        for _ in range(3):
            h, m = one_batch()
            hosts.append(h)
            models.append(m)
        h, m = float(np.mean(hosts)), float(np.mean(models))
        print(f"{task:4s}: host {h*1e3:7.1f} ms/batch  model(cpu) "
              f"{m*1e3:8.1f} ms  -> GPU ceiling {B/h:7.1f} ex/s "
              f"(cpu total {B/(h+m):5.2f} ex/s)", flush=True)


if __name__ == "__main__":
    main()
