"""Measure the REFERENCE's DAgger fine-tune iteration on this host
(VERDICT round-1 item 3: ground the episodes/sec baseline).

Runs the real reference stack (GMapNavAgent + GlocalTextPathNavCMT at the
full R2R recipe config: 6/2/3 layers, hidden 768, batch 12, dagger) on a
synthetic world via tests/oracle_harness.py, on CPU torch.  One iteration
is replicated exactly from agent_base.py:154-203: teacher rollout at
ml_weight + sampled rollout + backward + clip(40) + AdamW step x2.

Output: per-iteration wall time, split into model-forward time (inside
VLNBert calls) and everything else (the host loop: candidate sweep, numpy
packing, GraphMap bookkeeping, teacher actions).  The host-loop time is
hardware-independent-ish (same python work runs on a GPU rig's host), so

    ref GPU eps/s <= batch / host_loop_time

is a defensible upper bound on the reference's GPU throughput: on the
authors' hardware the model compute overlaps/accelerates but the per-step
python+packing does not.  BASELINE.md records the derivation.
"""
import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import torch

import oracle_harness as OH
from vln_goat_tpu.rollout.env import make_synthetic_dataset
from vln_goat_tpu.sim.graph_sim import make_synthetic_scan


class TimedVLNBert:
    """Accumulates wall time spent inside the model."""

    def __init__(self, inner):
        self.inner = inner
        self.fwd_s = 0.0

    def __call__(self, mode, batch):
        t0 = time.perf_counter()
        out = self.inner(mode, batch)
        self.fwd_s += time.perf_counter() - t0
        return out

    def train(self, mode=True):
        self.inner.train(mode)
        return self

    def eval(self):
        self.inner.eval()
        return self

    def parameters(self):
        return self.inner.parameters()

    @property
    def drop_env(self):
        return self.inner.drop_env

    @property
    def vln_bert(self):
        return self.inner.vln_bert


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="r2r",
                    choices=["r2r", "rxr", "reverie"])
    ap.add_argument("--B", type=int, default=None,
                    help="default: the dataset's recipe batch (r2r/reverie "
                         "12, rxr 5)")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--layers", type=str, default="6,2,3",
                    help="num_l,num_pano,num_x (recipe: 6,2,3)")
    a = ap.parse_args()
    nl, npano, nx = (int(x) for x in a.layers.split(","))
    # recipe batch sizes: run_r2r_goat.sh:38 / run_reverie_goat.sh:41 /
    # run_rxr_goat.sh:37
    if a.B is None:
        a.B = 5 if a.dataset == "rxr" else 12

    scans = [make_synthetic_scan(f"s{i}", num_vps=120, degree=4, seed=i)
             for i in range(4)]
    graphs = {g.scan_id: g for g in scans}
    vtot = sum(g.num_vps for g in scans)
    features = np.random.default_rng(0).standard_normal(
        (vtot, 36, 768)).astype(np.float32)
    # rxr paths are longer and deliberately non-shortest; its recipe also
    # reads 250-token instructions (run_rxr_goat.sh:30-37)
    plen = (8, 14) if a.dataset == "rxr" else (4, 7)
    ilen = 250 if a.dataset == "rxr" else 60
    data = make_synthetic_dataset(graphs, 256, vocab_size=50265,
                                  path_len=plen, seed=1, max_instr_len=ilen)
    for i, it in enumerate(data):
        it["path_id"] = i

    tmp = tempfile.mkdtemp(prefix="ref_bench_")
    # recipe flags (scripts/run_{r2r,reverie,rxr}_goat.sh): dagger,
    # ml_weight .2, dropout .1 (the parity harness forces 0; restore)
    if a.dataset == "reverie":
        for it in data:
            it["objId"] = f"{graphs[it['scan']].index[it['path'][-1]]}_0"
        agent, env, args, _ = OH.build_ref_reverie_stack(
            graphs, features, data, tmp, batch_size=a.B,
            num_l_layers=nl, num_pano_layers=npano, num_x_layers=nx,
            dropout=0.1, feat_dropout=0.6, train_alg="dagger",
            ml_weight=0.2, lr=2e-5, max_objects=20)
    else:
        kw = {}
        if a.dataset == "rxr":
            kw = dict(dataset="rxr", expert_policy="ndtw",
                      max_action_len=28, max_instr_len=250)
        agent, env, args = OH.build_ref_stack(
            graphs, features, data, tmp, batch_size=a.B,
            num_l_layers=nl, num_pano_layers=npano, num_x_layers=nx,
            dropout=0.1, feat_dropout=0.5, train_alg="dagger",
            ml_weight=0.2, lr=2e-5, **kw)
    agent.vln_bert = TimedVLNBert(agent.vln_bert)

    timings = []
    for it in range(a.iters + 1):  # first = warmup (env caches, allocs)
        agent.vln_bert.train()
        agent.critic.train()
        agent.vln_bert.fwd_s = 0.0
        t0 = time.perf_counter()
        agent.vln_bert_optimizer.zero_grad()
        agent.critic_optimizer.zero_grad()
        agent.loss = 0
        # agent_base.py:168-177 dagger branch
        agent.feedback = "teacher"
        agent.rollout(train_ml=args.ml_weight, train_rl=False)
        agent.feedback = "sample"
        agent.rollout(train_ml=1, train_rl=False)
        t_roll = time.perf_counter() - t0
        fwd_s = agent.vln_bert.fwd_s
        t1 = time.perf_counter()
        agent.loss.backward()
        torch.nn.utils.clip_grad_norm_(agent.vln_bert.parameters(), 40.0)
        agent.vln_bert_optimizer.step()
        agent.critic_optimizer.step()
        t_bwd = time.perf_counter() - t1
        total = time.perf_counter() - t0
        host = t_roll - fwd_s
        if it > 0:
            timings.append((total, fwd_s, t_bwd, host))
        print(f"iter{it}: total={total:.2f}s fwd={fwd_s:.2f}s "
              f"bwd+opt={t_bwd:.2f}s host_loop={host:.2f}s", flush=True)

    arr = np.array(timings)
    total, fwd, bwd, host = arr.mean(axis=0)
    print(f"\n=== reference {a.dataset} DAgger iteration "
          f"(CPU torch, this host) ===")
    print(f"B={a.B} layers={nl}/{npano}/{nx} iters={len(timings)}")
    print(f"total {total:.2f}s  model_fwd {fwd:.2f}s  bwd+opt {bwd:.2f}s  "
          f"host_loop {host:.2f}s")
    print(f"cpu eps/s (B/total)        : {a.B/total:.2f}")
    print(f"gpu eps/s upper bound (B/host_loop, compute->0): "
          f"{a.B/host:.2f}")


if __name__ == "__main__":
    main()
