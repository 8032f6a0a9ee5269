"""Quick plumbing check of tests/oracle_harness.py: build the reference
stack on synthetic data and run one argmax rollout batch."""
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import numpy as np

from vln_goat_tpu.sim.graph_sim import make_synthetic_scan
from vln_goat_tpu.rollout.env import make_synthetic_dataset
import oracle_harness as OH


def main():
    scans = [make_synthetic_scan(f"s{i}", num_vps=24, degree=3, seed=i)
             for i in range(2)]
    graphs = {g.scan_id: g for g in scans}
    scan_order = sorted(graphs)
    vtot = sum(g.num_vps for g in scans)
    rng = np.random.default_rng(0)
    features = rng.standard_normal((vtot, 36, 768)).astype(np.float32)
    data = make_synthetic_dataset(graphs, 16, vocab_size=50265,
                                  path_len=(3, 5), seed=1)
    for i, it in enumerate(data):
        it["path_id"] = i

    tmp = tempfile.mkdtemp(prefix="oracle_smoke_")
    t0 = time.time()
    agent, env, args = OH.build_ref_stack(
        graphs, features, data, tmp, batch_size=4,
        num_l_layers=1, num_pano_layers=1, num_x_layers=1)
    print(f"stack built in {time.time()-t0:.1f}s")
    agent.vln_bert.eval()
    agent.critic.eval()
    agent.feedback = "argmax"
    t0 = time.time()
    trajs = agent.rollout(test=True)
    print(f"rollout {time.time()-t0:.1f}s")
    for tr in trajs:
        flat = sum(tr["path"], [])
        print(tr["instr_id"], flat)
    print("OK")


if __name__ == "__main__":
    main()
