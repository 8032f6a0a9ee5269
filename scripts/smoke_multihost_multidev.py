"""Combined multi-host x multi-device smoke: 2 processes x 4 virtual CPU
devices each (8-device global ('dp',) mesh), exercising BOTH production
distributed paths in one run:

1. one fused-DAgger train step over the global mesh — the per-process batch
   quarter-shards onto local devices, XLA derives the cross-process gradient
   all-reduce; loss/grad_norm must be finite and IDENTICAL on every rank;
2. rank-sharded validation — each process decodes its share of the episodes
   (sel_data_idxs slicing, r2r/env.py:126-134), results merged with
   merge_dist_results(all_gather_objects(...)) like the reference's pickled
   NCCL all_gather (map_nav_src/utils/distributed.py:90-160): the merged
   prediction set must equal the full episode set, each episode exactly once.

Usage: python scripts/smoke_multihost_multidev.py        # forks both ranks
       python scripts/smoke_multihost_multidev.py <rank> # single worker
"""
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

COORD = "localhost:12377"
N_PROC = 2
DEV_PER_PROC = 4


def worker(rank: int):
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=COORD,
                               num_processes=N_PROC, process_id=rank)
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from vln_goat_tpu.config import GoatConfig
    from vln_goat_tpu.models.goat import GoatModel
    from vln_goat_tpu.parallel.distributed import (all_gather_objects,
                                                   merge_dist_results,
                                                   shard_data_for_process)
    from vln_goat_tpu.rollout.env import EpisodeBatcher, make_synthetic_dataset
    from vln_goat_tpu.rollout.rollout import NavRollout, RolloutConfig, \
        assemble_trajectories
    from vln_goat_tpu.rollout.world import NavWorld
    from vln_goat_tpu.sim.graph_sim import make_synthetic_scan
    from vln_goat_tpu.train.params import init_goat_params
    from vln_goat_tpu.train.trainer import (fuse_dagger_batches,
                                            init_train_state, make_optimizer,
                                            make_train_step)

    assert jax.process_count() == N_PROC
    assert jax.local_device_count() == DEV_PER_PROC, jax.local_devices()
    assert jax.device_count() == N_PROC * DEV_PER_PROC

    cfg = GoatConfig(num_l_layers=1, num_x_layers=1, num_pano_layers=1,
                     hidden_size=32, num_attention_heads=2,
                     intermediate_size=64, vocab_size=64,
                     max_position_embeddings=64, image_feat_size=16,
                     feat_dropout=0.0)
    rcfg = RolloutConfig(num_nodes=12, horizon=4, feat_dim=16)
    scans = [make_synthetic_scan("mh0", num_vps=12, seed=1)]
    graphs = {g.scan_id: g for g in scans}
    world = NavWorld.build(scans, feat_dim=16, seed=0)
    model = GoatModel(cfg)
    params = init_goat_params(model, jax.random.PRNGKey(0), max_cands=16,
                              num_nodes=rcfg.num_nodes)
    ro = NavRollout(model, world, rcfg)
    data = make_synthetic_dataset(graphs, 24, vocab_size=cfg.vocab_size,
                                  path_len=(2, 3), max_instr_len=16, seed=2)
    for i, it in enumerate(data):
        it["instr_id"] = f"ep{i}"

    mesh = Mesh(np.asarray(jax.devices()).reshape(-1), ("dp",))

    # ---- 1. fused-DAgger step over the global mesh ----
    B_GLOBAL = 16   # 8 teacher + 8 sample episodes, 2 per device
    batcher = EpisodeBatcher(data, graphs, ["mh0"], batch_size=B_GLOBAL // 2,
                             max_instr_len=16, max_gt_len=4, seed=0)
    b1 = batcher.make_batch(data[:B_GLOBAL // 2])
    b2 = batcher.make_batch(data[B_GLOBAL // 2:B_GLOBAL])
    fused = fuse_dagger_batches(b1, b2)

    def shard(x):
        x = np.asarray(x)
        if x.ndim == 0 or x.shape[0] != B_GLOBAL:
            return jax.device_put(x, NamedSharding(mesh, P()))
        lo = rank * (B_GLOBAL // N_PROC)
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, P("dp")), x[lo:lo + B_GLOBAL // N_PROC],
            x.shape)

    fused = {k: shard(v) for k, v in fused.items()}
    tx = make_optimizer(lr=1e-4)
    step = jax.jit(make_train_step(ro, tx, train_alg="dagger_fused",
                                   ml_weight=0.2))
    state = init_train_state(params, tx)
    state = jax.device_put(state, NamedSharding(mesh, P()))
    with mesh:
        state, metrics = step(state, fused, jax.random.PRNGKey(0))
    loss = float(metrics["loss"])
    gnorm = float(metrics["grad_norm"])
    assert np.isfinite(loss) and np.isfinite(gnorm), (loss, gnorm)
    losses = all_gather_objects(loss)
    assert all(abs(l - losses[0]) < 1e-6 for l in losses), losses

    # ---- 2. rank-sharded validation + merge_dist_results ----
    my_items = shard_data_for_process(data)
    assert 0 < len(my_items) < len(data)
    vb = batcher.make_batch(my_items)
    decode = jax.jit(ro.build_rollout("argmax", train_ml=False))
    out = decode(state.params, vb, jax.random.PRNGKey(1))
    out_np = {k: np.asarray(v) for k, v in out.items()}
    batch_np = {k: np.asarray(v) for k, v in vb.items()}
    paths = assemble_trajectories(batch_np, out_np)
    preds = [{"instr_id": it["instr_id"], "trajectory": p}
             for it, p in zip(my_items, paths)]
    merged = merge_dist_results(all_gather_objects(preds))
    ids = [p["instr_id"] for p in merged]
    assert sorted(ids) == sorted(it["instr_id"] for it in data), ids
    assert len(set(ids)) == len(ids)     # each episode exactly once
    if rank == 0:
        print(f"MULTIHOST_MULTIDEV_OK loss={loss:.4f} "
              f"grad_norm={gnorm:.4f} merged={len(merged)}", flush=True)


def main():
    if len(sys.argv) > 1:
        worker(int(sys.argv[1]))
        return
    env = dict(os.environ)
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "host_platform_device_count" not in f]
    flags.append(f"--xla_force_host_platform_device_count={DEV_PER_PROC}")
    env["XLA_FLAGS"] = " ".join(flags)
    env["JAX_PLATFORMS"] = "cpu"
    for k in list(env):
        if k.startswith("PALLAS_AXON") or k.startswith("AXON_"):
            env.pop(k)
    procs = [subprocess.Popen([sys.executable, __file__, str(r)],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, env=env)
             for r in range(N_PROC)]
    ok = True
    for r, p in enumerate(procs):
        out, _ = p.communicate(timeout=900)
        text = out.decode()
        if p.returncode != 0:
            ok = False
            print(f"rank {r} FAILED:\n{text[-3000:]}")
        elif "MULTIHOST_MULTIDEV_OK" in text:
            print(f"rank {r}: {text.strip().splitlines()[-1]}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
