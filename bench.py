"""Throughput benchmarks at R2R scale.  Prints TWO JSON lines:

1. greedy-decode rollout episodes/sec/chip (secondary);
2. DAgger fine-tune episodes/sec/chip (the BASELINE.json north-star
   metric) — LAST, so line-parsers record the primary metric.

Baseline anchors (BASELINE.md "Measured baseline" section; measured with
scripts/bench_reference.py driving the UNMODIFIED reference stack on a
fake MatterSim):
- fine-tune: one reference DAgger iteration at B=12 spends 0.47s in the
  host loop (candidate sweep, numpy packing, GraphMap bookkeeping) and
  ~44.5s in CPU model compute.  On the authors' single GPU the compute
  shrinks but the host loop does not, so eps/s <= 12/0.47 = 25.5.  We use
  REF_TRAIN_EPS = 25.5 (the reference's zero-compute-time ceiling — every
  vs_baseline number is therefore a LOWER bound on the true speedup).
- decode: the same host-loop bound applies to test-mode rollouts (the
  loop is identical minus backward); greedy decode runs ~1 rollout per
  iteration instead of 2, so the ceiling is 2x the train bound.
"""
import json
import os
import time

import jax

# persistent compile cache: the rollout graph is large, recompiles are free
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
# rbg PRNG: ~10x cheaper than threefry on TPU for the per-step dropout
# masks (regenerated again in the remat backward); measured +41% train-step
# throughput.  Same Bernoulli distributions, different draws (randomness
# parity: documented divergence).  GOAT_PRNG=threefry restores the default.
jax.config.update("jax_default_prng_impl",
                  os.environ.get("GOAT_PRNG", "rbg"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

REF_TRAIN_EPS = 25.5   # measured host-loop ceiling (B/host_s), see above
REF_DECODE_EPS = 51.0  # one rollout per iteration instead of two


def build(B, bf16=True, real_shapes=False):
    """real_shapes=True uses R2R val_unseen-like shapes (200-token
    instructions, gt paths 5-10) instead of the synthetic-average 60/4-7 —
    quantifying the shape-realism gap the synthetic headline hides."""
    import jax.numpy as jnp

    from vln_goat_tpu.config import GoatConfig
    from vln_goat_tpu.models.goat import GoatModel
    from vln_goat_tpu.rollout.env import EpisodeBatcher, make_synthetic_dataset
    from vln_goat_tpu.rollout.rollout import NavRollout, RolloutConfig
    from vln_goat_tpu.rollout.world import NavWorld
    from vln_goat_tpu.sim.graph_sim import make_synthetic_scan
    from vln_goat_tpu.train.params import init_goat_params

    cfg = GoatConfig.for_dataset(
        "r2r",
        use_pallas_attention=os.environ.get("GOAT_PALLAS", "0") == "1")
    rcfg = RolloutConfig(num_nodes=48, horizon=15, feat_dim=768)
    # Matterport-like scale: 4 scans x 120 viewpoints
    scans = [make_synthetic_scan(f"s{i}", num_vps=120, degree=4, seed=i)
             for i in range(4)]
    world = NavWorld.build(scans, feat_dim=768, seed=0)
    model = GoatModel(cfg, dtype=jnp.bfloat16 if bf16 else jnp.float32)
    params = init_goat_params(model, jax.random.PRNGKey(0), max_cands=16,
                              num_nodes=rcfg.num_nodes)
    ro = NavRollout(model, world, rcfg)
    graphs = {g.scan_id: g for g in scans}
    instr_len, plen, gt_cap = (200, (5, 10), 11) if real_shapes \
        else (60, (4, 7), 8)
    data = make_synthetic_dataset(graphs, 512, vocab_size=cfg.vocab_size,
                                  path_len=plen, seed=1,
                                  max_instr_len=instr_len)
    batcher = EpisodeBatcher(data, graphs, [g.scan_id for g in scans],
                             batch_size=B, max_instr_len=instr_len,
                             max_gt_len=gt_cap)
    return model, params, ro, batcher


def bench_decode(B=None):
    B = B or int(os.environ.get("GOAT_BENCH_B", "128"))
    _, params, ro, batcher = build(B)
    batcher.batch_size = B
    fn = ro.jitted(feedback="argmax", train_ml=False)
    _, batch = batcher.next_batch()
    rng = jax.random.PRNGKey(0)
    out = fn(params, batch, rng)
    jax.block_until_ready(out)
    iters = 10
    t0 = time.perf_counter()
    for i in range(iters):
        _, batch = batcher.next_batch()
        out = fn(params, batch, jax.random.fold_in(rng, i))
    jax.block_until_ready(out)
    # time through a device->host scalar fetch: cannot complete before the
    # chained steps have executed, even if a tunneled backend's
    # block_until_ready returned early
    float(out["ml_loss"]) if "ml_loss" in out else \
        int(jax.device_get(out["final_cur"])[0])
    dt = time.perf_counter() - t0
    return B * iters / dt


def bench_train(B=None, real_shapes=False):
    """DAgger optimizer step (teacher rollout at the short gt-bounded
    horizon + sampled rollout at the full horizon + backward + AdamW;
    GOAT_BENCH_ALG=dagger_fused benches the single-scan variant).
    Episodes/sec counted as B per iteration — the reference's it/s * batch
    convention (one iteration consumes B teacher + B sample episodes on
    both sides)."""
    import jax.numpy as jnp  # noqa: F401

    from vln_goat_tpu.train import trainer as TR

    B = B or int(os.environ.get("GOAT_BENCH_TRAIN_B", "64"))
    _, params, ro, batcher = build(B, real_shapes=real_shapes)
    tx = TR.make_optimizer(lr=2e-5)
    state = TR.init_train_state(params, tx)
    alg = os.environ.get("GOAT_BENCH_ALG", "dagger")
    step = jax.jit(TR.make_train_step(
        ro, tx, train_alg=alg, ml_weight=0.2,
        remat=os.environ.get("GOAT_BENCH_REMAT", "full"),
        # A/B lever: 0 restores the per-step scan teacher
        vectorized_teacher=os.environ.get("GOAT_VEC_TEACHER", "1") == "1",
        # teacher scan at the batcher's gt cap is loss-identical
        teacher_horizon=None if alg == "dagger_fused"
        else batcher.max_gt_len))
    rng = jax.random.PRNGKey(0)

    def nb():
        if alg == "dagger_fused":
            _, b1 = batcher.next_batch()
            _, b2 = batcher.next_batch()
            return TR.fuse_dagger_batches(b1, b2)
        return batcher.next_batch()[1]

    first = nb()
    state, m = step(state, first, rng)
    jax.block_until_ready(m["loss"])
    iters = 8
    t0 = time.perf_counter()
    for i in range(iters):
        state, m = step(state, nb(), jax.random.fold_in(rng, i))
    jax.block_until_ready(m["loss"])
    float(m["loss"])  # fetch guard: see bench_decode
    dt = (time.perf_counter() - t0) / iters
    # hardware FLOP utilization vs the v5e bf16 peak (197 TFLOP/s), from
    # the compiled executable's own flop count (includes remat recompute —
    # i.e. how busy the MXU actually is).  VERDICT r2: publish MFU.
    util = None
    try:
        cost = step.lower(state, first, rng).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        util = float(cost.get("flops", 0.0)) / dt / 197e12 * 100.0
    except Exception:
        pass
    return B / dt, util


def bench_rxr_overflow(B=32, episodes=256):
    """RxR-scale sampled rollouts (horizon 28, 96-node table, nDTW expert):
    measure node-table pressure — spill events per episode (policy 'spill')
    and dropped candidates (must be 0 with spill).  Sampled feedback at
    random params wanders maximally: a worst-case bound for the table."""
    import jax.numpy as jnp

    from vln_goat_tpu.config import GoatConfig
    from vln_goat_tpu.models.goat import GoatModel
    from vln_goat_tpu.rollout.env import EpisodeBatcher, make_synthetic_dataset
    from vln_goat_tpu.rollout.rollout import NavRollout, RolloutConfig
    from vln_goat_tpu.rollout.world import NavWorld
    from vln_goat_tpu.sim.graph_sim import make_synthetic_scan
    from vln_goat_tpu.train.params import init_goat_params

    cfg = GoatConfig.for_dataset("rxr")
    rcfg = RolloutConfig(num_nodes=96, horizon=28, feat_dim=768,
                         expert_policy="ndtw", overflow_policy="spill")
    scans = [make_synthetic_scan(f"x{i}", num_vps=120, degree=4, seed=i)
             for i in range(4)]
    world = NavWorld.build(scans, feat_dim=768, seed=0)
    model = GoatModel(cfg, dtype=jnp.bfloat16)
    params = init_goat_params(model, jax.random.PRNGKey(0), max_cands=16,
                              num_nodes=rcfg.num_nodes)
    ro = NavRollout(model, world, rcfg)
    graphs = {g.scan_id: g for g in scans}
    data = make_synthetic_dataset(graphs, episodes, vocab_size=cfg.vocab_size,
                                  path_len=(8, 14), seed=2)
    batcher = EpisodeBatcher(data, graphs, [g.scan_id for g in scans],
                             batch_size=B, max_instr_len=120, max_gt_len=15)
    fn = ro.jitted(feedback="sample", train_ml=False, deterministic=True)
    rng = jax.random.PRNGKey(0)
    tot_spill = tot_drop = n = 0
    for i in range(episodes // B):
        _, batch = batcher.next_batch()
        out = fn(params, batch, jax.random.fold_in(rng, i))
        tot_spill += int(jax.device_get(out["spilled_n"]).sum())
        tot_drop += int(jax.device_get(out["overflow_n"]).sum())
        n += B
    return tot_spill / n, tot_drop / n


def main():
    decode = bench_decode()
    print(json.dumps({
        "metric": "r2r_greedy_decode_episodes_per_sec_per_chip",
        "value": round(decode, 2),
        "unit": "episodes/s",
        "vs_baseline": round(decode / REF_DECODE_EPS, 2),
    }), flush=True)
    spill_rate, drop_rate = bench_rxr_overflow()
    print(json.dumps({
        "metric": "rxr_node_table_spills_per_episode",
        "value": round(spill_rate, 4),
        "unit": "spills/episode",
        "dropped_per_episode": round(drop_rate, 4),
        "note": "96-node table, horizon 28, sampled rollouts; spill "
                "policy evicts farthest unvisited (reference GraphMap is "
                "unbounded)",
    }), flush=True)
    real, _ = bench_train(real_shapes=True)
    print(json.dumps({
        "metric": "r2r_dagger_finetune_eps_per_sec_real_shapes",
        "value": round(real, 2),
        "unit": "episodes/s",
        "vs_baseline": round(real / REF_TRAIN_EPS, 2),
        "note": "val_unseen-like shapes: 200-token instructions, gt 5-10 "
                "(the headline line uses synthetic-average 60-token/4-7)",
    }), flush=True)
    # headline: best of the known-good 'full' remat and the round-3
    # 'probs' policy (saved softmax outputs + dropout masks — skips their
    # backward recompute; loss/grad-identical, tests/test_fused_dagger.py).
    # 'probs' is guarded: it could not be A/B'd on-chip in-session (TPU
    # tunnel outage), so an OOM/compile failure falls back cleanly.
    base_policy = os.environ.get("GOAT_BENCH_REMAT", "full")
    train, util = bench_train()
    policy = base_policy
    if base_policy != "probs":
        try:
            os.environ["GOAT_BENCH_REMAT"] = "probs"
            t2, u2 = bench_train()
            if t2 > train:
                train, util, policy = t2, u2, "probs"
        except Exception as e:  # noqa: BLE001 — OOM/compile -> base policy
            print(json.dumps({"note": "remat=probs bench failed",
                              "error": f"{type(e).__name__}: "
                                       f"{str(e)[:160]}"}), flush=True)
        finally:
            os.environ["GOAT_BENCH_REMAT"] = base_policy
    line = {
        "metric": "r2r_dagger_finetune_episodes_per_sec_per_chip",
        "value": round(train, 2),
        "unit": "episodes/s",
        "vs_baseline": round(train / REF_TRAIN_EPS, 2),
        "decode_eps_per_sec": round(decode, 2),
        "decode_vs_baseline": round(decode / REF_DECODE_EPS, 2),
        "remat_policy": policy,
    }
    if util is not None:
        # XLA cost_analysis flops / step time / v5e bf16 peak; the step is
        # elementwise/data-movement bound, not FLOP bound (ROADMAP r3)
        line["hw_flops_util_pct"] = round(util, 2)
    print(json.dumps(line), flush=True)


if __name__ == "__main__":
    main()
