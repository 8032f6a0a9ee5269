"""Sweep DAgger train-step configs on the real chip: algorithm
(two-rollout dagger vs fused 2B single-scan), batch size, remat policy,
compute dtype.  Prints episodes/sec per config; episodes/sec counts the
SAMPLE-half episodes per optimizer step (one reference 'iteration' at
batch B consumes B teacher + B sample episodes; the reference's it/s * B
convention counts B per iteration, map_nav_src/scripts/run_r2r_goat.sh).
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("GOAT_PRNG"):
    # 'rbg' is ~an order of magnitude cheaper than threefry on TPU for the
    # per-step dropout masks (the rollout regenerates them in the remat
    # backward too)
    jax.config.update("jax_default_prng_impl", os.environ["GOAT_PRNG"])
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)


def build(B, alg, remat, bf16, num_nodes=48):
    from vln_goat_tpu.config import GoatConfig
    from vln_goat_tpu.models.goat import GoatModel
    from vln_goat_tpu.rollout.env import EpisodeBatcher, make_synthetic_dataset
    from vln_goat_tpu.rollout.rollout import NavRollout, RolloutConfig
    from vln_goat_tpu.rollout.world import NavWorld
    from vln_goat_tpu.sim.graph_sim import make_synthetic_scan
    from vln_goat_tpu.train.params import init_goat_params
    from vln_goat_tpu.train import trainer as TR

    cfg = GoatConfig.for_dataset(
        "r2r",
        use_pallas_attention=os.environ.get("GOAT_PALLAS", "0") == "1")
    rcfg = RolloutConfig(num_nodes=num_nodes, horizon=15, feat_dim=768)
    scans = [make_synthetic_scan(f"s{i}", num_vps=120, degree=4, seed=i)
             for i in range(4)]
    world = NavWorld.build(scans, feat_dim=768, seed=0)
    model = GoatModel(cfg, dtype=jnp.bfloat16 if bf16 else jnp.float32)
    params = init_goat_params(model, jax.random.PRNGKey(0), max_cands=16,
                              num_nodes=rcfg.num_nodes)
    ro = NavRollout(model, world, rcfg)
    graphs = {g.scan_id: g for g in scans}
    data = make_synthetic_dataset(graphs, 512, vocab_size=cfg.vocab_size,
                                  path_len=(4, 7), seed=1)
    # GOAT_BUCKET="5,8": gt-length-homogeneous minibatches, teacher scan
    # at each bucket's cap (loss-identical; one compile per cap)
    caps = tuple(int(c) for c in
                 os.environ.get("GOAT_BUCKET", "").split(",") if c.strip())
    batcher = EpisodeBatcher(data, graphs, [g.scan_id for g in scans],
                             batch_size=B, max_instr_len=60, max_gt_len=8,
                             bucket_caps=caps or None)
    tx = TR.make_optimizer(lr=2e-5)
    state = TR.init_train_state(params, tx)
    step = jax.jit(TR.make_train_step(
        ro, tx, train_alg=alg, ml_weight=0.2, remat=remat,
        teacher_horizon="auto" if caps else
        (None if alg == "dagger_fused" else 8)))
    return step, state, batcher


def run(B, alg, remat, bf16, iters=8):
    from vln_goat_tpu.train.trainer import fuse_dagger_batches
    step, state, batcher = build(B, alg, remat, bf16)
    rng = jax.random.PRNGKey(0)

    def next_fused():
        _, b1 = batcher.next_batch()
        _, b2 = batcher.next_batch()
        return fuse_dagger_batches(b1, b2)

    nb = next_fused if alg == "dagger_fused" else \
        (lambda: batcher.next_batch()[1])
    batch = nb()
    t0 = time.perf_counter()
    state, m = step(state, batch, rng)
    caps = tuple(int(c) for c in
                 os.environ.get("GOAT_BUCKET", "").split(",") if c.strip())
    for cap in caps:  # compile every bucket shape before the timed loop
        bb = batcher.make_batch(batcher.next_minibatch(), gt_cap=cap)
        state, m = step(state, bb, rng)
    jax.block_until_ready(m["loss"])
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for i in range(iters):
        batch = nb()
        state, m = step(state, batch, jax.random.fold_in(rng, i))
    jax.block_until_ready(m["loss"])
    dt = (time.perf_counter() - t0) / iters
    # paranoia vs tunneled backends: a device->host scalar fetch cannot
    # return before every chained step has executed, so dt_fetch is a
    # trustworthy upper bound even if block_until_ready were a no-op
    loss = float(m["loss"])
    dt_fetch = (time.perf_counter() - t0) / iters
    eps = B / dt
    print(f"alg={alg:13s} B={B:4d} remat={remat:5s} bf16={int(bf16)} "
          f"step={dt*1e3:8.1f} ms  eps/s={eps:8.1f}  "
          f"(fetch-incl {dt_fetch*1e3:.1f} ms, compile {compile_s:.0f}s, "
          f"loss {loss:.3f})",
          flush=True)
    return eps


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--alg", default="dagger_fused")
    ap.add_argument("--B", type=int, default=64)
    ap.add_argument("--remat", default="full")
    ap.add_argument("--fp32", action="store_true")
    ap.add_argument("--iters", type=int, default=8)
    a = ap.parse_args()
    run(a.B, a.alg, a.remat, not a.fp32, iters=a.iters)
