"""Overflow-regime episode parity vs the UNBOUNDED reference GraphMap
(VERDICT r3 item 5).

The reference's episodic graph grows without bound
(map_nav_src/models/graph_utils.py:91-144); ours is a fixed num_nodes
table with a spill policy (rollout.py RolloutConfig.overflow_policy) that
evicts the farthest-from-current unvisited node when a new candidate
doesn't fit.  The one regime where our semantics intentionally diverge is
exactly the one the standard parity suite never reaches — this test drives
the unmodified torch reference agent on dense synthetic worlds against our
rollout at HALF-capacity tables, asserts the spill regime actually fires,
and bounds the path divergence it introduces.
"""
import os
import sys
import tempfile

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference/map_nav_src"
pytestmark = [pytest.mark.slow, pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference repo not mounted")]

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

import oracle_harness as OH
from vln_goat_tpu.models.goat import GoatModel
from vln_goat_tpu.rollout.env import EpisodeBatcher, make_synthetic_dataset
from vln_goat_tpu.rollout.rollout import (NavRollout, RolloutConfig,
                                          assemble_trajectories)
from vln_goat_tpu.rollout.world import NavWorld
from vln_goat_tpu.sim.graph_sim import make_synthetic_scan
from vln_goat_tpu.train.checkpoint import torch_to_flax

B = 8
N_EPS = 32
# Dense graphs (degree 6) discover far more nodes than sparse R2R worlds;
# a 20-slot table is roughly half of what argmax decode actually touches
# here, so candidates MUST spill.
N_NODES = 20


@pytest.fixture(scope="module")
def stack():
    scans = [make_synthetic_scan(f"d{i}", num_vps=60, degree=6, seed=40 + i)
             for i in range(2)]
    graphs = {g.scan_id: g for g in scans}
    scan_order = sorted(graphs)
    vtot = sum(g.num_vps for g in scans)
    rng = np.random.default_rng(17)
    features = rng.standard_normal((vtot, 36, 768)).astype(np.float32)
    data = make_synthetic_dataset(graphs, N_EPS, vocab_size=50265,
                                  path_len=(4, 7), seed=23)
    for i, it in enumerate(data):
        it["path_id"] = i

    tmp = tempfile.mkdtemp(prefix="spill_oracle_")
    agent, env, args = OH.build_ref_stack(
        graphs, features, data, tmp, batch_size=B,
        num_l_layers=2, num_pano_layers=1, num_x_layers=1)
    agent.vln_bert.eval()
    agent.critic.eval()

    sd = {k: v.detach().numpy()
          for k, v in agent.vln_bert.vln_bert.state_dict().items()}
    variables = torch_to_flax(sd)

    cfg = OH.goat_config_from_ref_args(args)
    model = GoatModel(cfg)
    rcfg = RolloutConfig(num_nodes=N_NODES, horizon=args.max_action_len,
                         feat_dim=768, overflow_policy="spill")
    ordered = [graphs[s] for s in scan_order]
    world = NavWorld.build(ordered, features=features, feat_dim=768)
    ro = NavRollout(model, world, rcfg)
    batcher = EpisodeBatcher(data, graphs, scan_order, batch_size=B,
                             max_instr_len=60, max_gt_len=10)
    return dict(agent=agent, env=env, graphs=graphs, scan_order=scan_order,
                variables=variables, ro=ro, batcher=batcher)


def _discovered_counts(g, arrivals):
    """Reference GraphMap node-discovery curve along a step-arrival
    sequence: after step s the map holds every visited pano plus every
    candidate it exposed (update_graph adds the current pano's candidates,
    graph_utils.py:102-108).  Returns counts[s] = |discovered after the
    arrival at step s| (s=0 is the start pano)."""
    idx = g.index
    seen = set()
    counts = []
    for vp in arrivals:
        v = idx[vp]
        seen.add(v)
        seen.update(int(w) for w in g.cand_local[v] if w >= 0)
        counts.append(len(seen))
    return counts


def test_spill_regime_path_parity(stack):
    """Half-capacity argmax decode vs the unbounded reference.

    Exact path identity is impossible by design once the table evicts a
    node the reference still offers (the one intentional semantic
    divergence), so the parity claim is causal, not blanket:

    - the spill path MUST actually fire (spilled_n > 0 over the run);
    - no candidate is ever dropped (spill absorbs all overflow);
    - episodes whose table never overflowed must match the reference
      exactly;
    - every divergence must BEGIN under capacity pressure: at the first
      step where our arrival differs from the reference's, the reference
      map must already hold more nodes than our table has slots.  A
      divergence while everything still fit is a plain parity bug.
    - the identical-episode rate is quantified and printed (VERDICT r3
      item 5 asked for the divergence rate, not a fixed bar)."""
    agent, env = stack["agent"], stack["env"]
    ro, batcher = stack["ro"], stack["batcher"]
    env.reset_epoch(shuffle=False)
    fn = jax.jit(ro.build_rollout("argmax", train_ml=False,
                                  deterministic=True))
    total = matches = 0
    spilled_total = 0
    clean_mismatch = []
    premature = []
    for _ in range(N_EPS // B):
        agent.feedback = "argmax"
        trajs = agent.rollout(test=True)
        items = list(env.batch)
        batch = batcher.make_batch(items)
        out = fn(stack["variables"], batch, jax.random.PRNGKey(0))
        out_np = {k: np.asarray(v) for k, v in out.items()}
        batch_np = {k: np.asarray(v) for k, v in batch.items()}
        paths = assemble_trajectories(batch_np, out_np)
        act = np.asarray(out_np["actions"])             # [T, B] local vps
        spilled = np.asarray(out_np["spilled_n"])       # [B]
        dropped = np.asarray(out_np["overflow_n"])      # [B]
        assert dropped.sum() == 0, "spill policy must absorb all overflow"
        spilled_total += int(spilled.sum())
        for i, (it, tr) in enumerate(zip(items, trajs)):
            g = stack["graphs"][it["scan"]]
            ref_path = OH.flatten_ref_traj(tr)
            our_path = [g.vp_ids[v] for v in paths[i]]
            same = ref_path == our_path
            total += 1
            matches += same
            if same:
                continue
            if spilled[i] == 0:
                clean_mismatch.append((it["instr_id"], ref_path, our_path))
                continue
            # step-arrival sequences (start + per-step pano arrivals)
            ref_arr = [seg[-1] for seg in tr["path"]]
            our_arr = [it["path"][0]] + [
                g.vp_ids[int(v)] for v in act[:, i] if v >= 0]
            d = next((k for k, (a, b)
                      in enumerate(zip(ref_arr, our_arr)) if a != b),
                     min(len(ref_arr), len(our_arr)))
            # the choice that diverged was made with the map state after
            # arrival d-1: capacity pressure must already exist there
            counts = _discovered_counts(g, ref_arr[:max(d, 1)])
            if counts[-1] <= N_NODES:
                premature.append((it["instr_id"], d, counts[-1],
                                  ref_arr, our_arr))
    assert total >= N_EPS
    assert spilled_total > 0, \
        "worlds not dense enough — the spill regime never fired"
    # a mismatch without any spill in that episode is a plain parity bug,
    # not a capacity-policy divergence
    assert not clean_mismatch, clean_mismatch[:2]
    assert not premature, \
        f"{len(premature)} episodes diverged BEFORE capacity pressure: " \
        f"{premature[:2]}"
    rate = matches / total
    print(f"\nspill-regime divergence: {matches}/{total} identical "
          f"({rate:.0%}), {spilled_total} spills over {total} episodes; "
          f"every divergence began under capacity pressure")
