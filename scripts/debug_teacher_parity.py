"""Debug: per-step teacher-mode fused-logit comparison vs the reference."""
import sys

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import tempfile

import numpy as np

import oracle_harness as OH
from vln_goat_tpu.models.goat import GoatModel
from vln_goat_tpu.rollout.env import EpisodeBatcher, make_synthetic_dataset
from vln_goat_tpu.rollout.rollout import NavRollout, RolloutConfig
from vln_goat_tpu.rollout.world import NavWorld
from vln_goat_tpu.sim.graph_sim import make_synthetic_scan
from vln_goat_tpu.train.checkpoint import torch_to_flax

scans = [make_synthetic_scan(f"s{i}", num_vps=24, degree=3, seed=i)
         for i in range(2)]
graphs = {g.scan_id: g for g in scans}
scan_order = sorted(graphs)
vtot = sum(g.num_vps for g in scans)
features = np.random.default_rng(7).standard_normal(
    (vtot, 36, 768)).astype(np.float32)
data = make_synthetic_dataset(graphs, 64, vocab_size=50265, path_len=(3, 6),
                              seed=11)
for i, it in enumerate(data):
    it["path_id"] = i
tmp = tempfile.mkdtemp()
agent, env, args = OH.build_ref_stack(graphs, features, data, tmp,
                                      batch_size=8, num_l_layers=2,
                                      num_pano_layers=1, num_x_layers=1)
agent.vln_bert = OH.NavRecorder(agent.vln_bert)
agent.vln_bert.eval()
agent.critic.eval()
sd = {k: v.detach().numpy()
      for k, v in agent.vln_bert.vln_bert.state_dict().items()}
variables = torch_to_flax(sd)
model = GoatModel(OH.goat_config_from_ref_args(args))
rcfg = RolloutConfig(num_nodes=32, horizon=args.max_action_len, feat_dim=768)
world = NavWorld.build([graphs[s] for s in scan_order], features=features,
                       feat_dim=768)
ro = NavRollout(model, world, rcfg)
batcher = EpisodeBatcher(data, graphs, scan_order, batch_size=8,
                         max_instr_len=60, max_gt_len=10)

env.reset_epoch(shuffle=False)
agent.feedback = "teacher"
agent.loss = 0
trajs = agent.rollout(train_ml=1.0, test=True)
items = list(env.batch)
batch = batcher.make_batch(items)
out = jax.jit(ro.build_rollout("teacher", train_ml=True, deterministic=True,
                               record_logits=True))(
    variables, batch, jax.random.PRNGKey(0))
out_np = {k: np.asarray(v) for k, v in out.items()}
recs = agent.vln_bert.records
node_vp = out_np["node_vp"]
print("ml_loss ref", float(agent.loss), "ours", float(out_np["ml_loss"]))
for i in range(3):
    g = graphs[items[i]["scan"]]
    print("ep", items[i]["instr_id"], "gt", items[i]["path"])
    for t in range(len(recs)):
        if not out_np["active"][t, i]:
            break
        ref_row = recs[t]["logits"][i]
        vpids = recs[t]["gmap_vpids"][i]
        our_row = out_np["logits"][t, i]
        ref_map = {"<stop>": float(ref_row[0])}
        for j, vp in enumerate(vpids):
            if j > 0 and vp is not None and np.isfinite(ref_row[j]):
                ref_map[vp] = float(ref_row[j])
        our_map = {"<stop>": float(our_row[0])}
        for slot in range(32):
            if np.isfinite(our_row[slot + 2]):
                our_map[g.vp_ids[node_vp[i, slot]]] = float(our_row[slot + 2])
        keys_r, keys_o = set(ref_map), set(our_map)
        diff = {k: abs(ref_map[k] - our_map[k])
                for k in keys_r & keys_o}
        print(f"  t{t}: keys ref-only {keys_r-keys_o} ours-only "
              f"{keys_o-keys_r} maxdiff "
              f"{max(diff.values()) if diff else None:.5f} "
              f"stop ref={ref_map['<stop>']:.4f} ours={our_map['<stop>']:.4f}")
