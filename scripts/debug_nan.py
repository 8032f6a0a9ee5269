"""Isolate the NaN source in the oracle stack (torch side, CPU)."""
import sys

import jax

jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import tempfile

import numpy as np
import torch

import oracle_harness as OH
from vln_goat_tpu.rollout.env import make_synthetic_dataset
from vln_goat_tpu.sim.graph_sim import make_synthetic_scan

scans = [make_synthetic_scan(f"s{i}", num_vps=24, degree=3, seed=i)
         for i in range(2)]
graphs = {g.scan_id: g for g in scans}
vtot = sum(g.num_vps for g in scans)
features = np.random.default_rng(7).standard_normal(
    (vtot, 36, 768)).astype(np.float32)
data = make_synthetic_dataset(graphs, 16, vocab_size=50265, path_len=(3, 6),
                              seed=11)
for i, it in enumerate(data):
    it["path_id"] = i
tmp = tempfile.mkdtemp()
agent, env, args = OH.build_ref_stack(graphs, features, data, tmp,
                                      batch_size=4, num_l_layers=2,
                                      num_pano_layers=1, num_x_layers=1)
agent.vln_bert.eval()

# param sanity
bad = [n for n, p in agent.vln_bert.named_parameters()
       if not torch.isfinite(p).all()]
print("non-finite params:", bad)

obs = env.reset()
lang = agent._language_variable(obs, None, None)
with torch.no_grad():
    txt = agent.vln_bert("language", lang)
print("txt finite:", torch.isfinite(txt).all().item(), txt.shape)

pano_in = agent._panorama_feature_variable_do(obs, None, noise=None)
for k, v in pano_in.items():
    if isinstance(v, torch.Tensor):
        print("pano_in", k, v.shape, v.dtype,
              torch.isfinite(v.float()).all().item() if v.is_floating_point()
              else "int")
with torch.no_grad():
    pe, pm, pf = agent.vln_bert("panorama", pano_in)
print("pano finite:", torch.isfinite(pe).all().item(),
      "fused:", torch.isfinite(pf).all().item() if pf is not None else None)
