"""Offline CFP front-door feature extraction (capability #6).

Reference: agent.extract_cfp_features (map_nav_src/r2r/agent.py:1008-1049)
+ the model's 'extract_cfp_features' mode — runs the whole training set of
ground-truth trajectories through the tim heads and dumps base64 TSV rows
(path_id, txt_feats, vp_feats, gmap_feats), later clustered by the
front-door KMeans picker.
"""
from __future__ import annotations

import base64
import csv
import sys
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from ..models.goat import GoatModel
from ..pretrain.data import TrajBatchBuilder, items_from_dataset

TSV_FIELDS = ["path_id", "txt_feats", "vp_feats", "gmap_feats"]


def extract_cfp_features(model: GoatModel, params, builder: TrajBatchBuilder,
                         items: List[dict], batch_size: int = 64,
                         out_tsv: str = None) -> Dict[str, np.ndarray]:
    """Ground-truth trajectories -> pooled txt/vp/gmap feature banks."""
    fn = jax.jit(lambda p, b: model.apply(p, b, method=GoatModel.extract_cfp))
    txt, vp, gmap, pids = [], [], [], []
    for i in range(0, len(items), batch_size):
        chunk = items[i:i + batch_size]
        batch = builder.build_batch(chunk, task="cfp")
        batch = jax.tree.map(jnp.asarray, batch)
        out = fn(params, batch)
        txt.append(np.asarray(out["txt_outputs"]))
        vp.append(np.asarray(out["vp_outputs"]))
        gmap.append(np.asarray(out["gmap_outputs"]))
        pids.extend([it.get("path_id", it.get("instr_id", str(i + j)))
                     for j, it in enumerate(chunk)])
    feats = {
        "txt_feats": np.concatenate(txt, 0),
        "vp_feats": np.concatenate(vp, 0),
        "gmap_feats": np.concatenate(gmap, 0),
    }
    if out_tsv:
        save_cfp_tsv(out_tsv, pids, feats)
    return feats


def save_cfp_tsv(path: str, path_ids: List[str], feats: Dict[str, np.ndarray]):
    with open(path, "wt") as f:
        w = csv.DictWriter(f, delimiter="\t", fieldnames=TSV_FIELDS)
        for i, pid in enumerate(path_ids):
            w.writerow({
                "path_id": pid,
                "txt_feats": base64.b64encode(
                    feats["txt_feats"][i].astype(np.float32)).decode(),
                "vp_feats": base64.b64encode(
                    feats["vp_feats"][i].astype(np.float32)).decode(),
                "gmap_feats": base64.b64encode(
                    feats["gmap_feats"][i].astype(np.float32)).decode(),
            })


def load_cfp_tsv(path: str, dim: int = 768) -> Dict[str, np.ndarray]:
    """read_tim_tsv equivalent (utils/data.py:430-449)."""
    csv.field_size_limit(sys.maxsize)
    out = {k: [] for k in TSV_FIELDS if k != "path_id"}
    ids = []
    with open(path) as f:
        for row in csv.DictReader(f, delimiter="\t", fieldnames=TSV_FIELDS):
            ids.append(row["path_id"])
            for k in out:
                out[k].append(np.frombuffer(
                    base64.b64decode(row[k]), np.float32)[:dim])
    return {"path_ids": ids,
            **{k: np.stack(v, 0) for k, v in out.items()}}
