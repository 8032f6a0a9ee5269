"""Throughput benchmarks at production scale.  Prints one JSON line per
metric.  The north-star metric (R2R DAgger fine-tune episodes/sec/chip)
is measured and printed FIRST — a driver timeout can no longer destroy
it (BENCH_r04 died at rc=124 mid-pretrain and lost the headline) — and
the same line is re-printed LAST so last-line parsers still record the
primary metric.  Every subsequent section is gated on a wall-clock
budget (GOAT_BENCH_BUDGET seconds, default 780) and prints a loud
{"skipped": "budget"} line when cut.  Each train line carries a k=3
spread (median + min/max) and the artifact opens with a tunnel-health
probe, because day-to-day chip/tunnel variance is ±30% (ROADMAP r4) and
a single-shot number is meaningless against the 5x bar.

Baseline anchors (BASELINE.md "Measured baseline" sections; measured with
scripts/bench_reference.py driving the UNMODIFIED reference stack on a
fake MatterSim, per dataset):
- fine-tune: one reference DAgger iteration spends `host_s` in the python
  host loop (candidate sweep, numpy packing, GraphMap bookkeeping) that
  does NOT shrink on the authors' GPU rig, so eps/s <= B/host_s.  We use
  that zero-compute-time ceiling as the anchor — every vs_baseline number
  is therefore a LOWER bound on the true speedup.
  R2R: 12/0.47 = 25.5.  REVERIE: 12/0.61 = 19.5.  RxR: 5/0.61 = 8.2.
- decode: same host loop minus backward, ~1 rollout per iteration instead
  of 2 -> ceiling is 2x the train bound.
- pretrain: B/host_time ceilings per task (BASELINE.md round-3 table):
  MLM 394.9 / SAP 985.2 / CFP 270.4 ex/s.
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

# measured-best rollout-scan unroll (r4 on-chip A/B: unroll=2 beats 1 for
# every remat policy; ROADMAP round-4 table).  Explicit env wins.
os.environ.setdefault("GOAT_SCAN_UNROLL", "2")

REF = {
    "r2r": dict(train=25.5, decode=51.0),
    "reverie": dict(train=19.5, decode=39.0),
    "rxr": dict(train=8.2, decode=16.4),
}
REF_TRAIN_EPS = REF["r2r"]["train"]
REF_DECODE_EPS = REF["r2r"]["decode"]
REF_PRETRAIN = {"mlm": 394.9, "sap": 985.2, "cfp": 270.4}

LO = 20  # REVERIE objects per viewpoint (run_reverie_goat.sh:44 max 20)

# synthetic gt-path caps per benchmark config (build() below): bucket
# defaults' TOP cap must equal these, or bucketing would TRUNCATE long
# supervision paths and silently change the workload being measured
GT_CAP = {("r2r", False): 8, ("r2r", True): 11, ("reverie", False): 8,
          ("rxr", False): 15}


def default_bucket_caps(dataset: str, real_shapes: bool = False) -> str:
    """Measured-winning gt-length bucket config (ROADMAP round-5 A/B:
    +9-11% same-session, loss-identical).  GOAT_BUCKET overrides;
    GOAT_BUCKET="" disables."""
    env = os.environ.get("GOAT_BUCKET")
    if env is not None:
        return env
    if dataset == "rxr":
        return "10,15"
    return "7,11" if real_shapes else "5,8"


def build(B, dataset="r2r", bf16=True, real_shapes=False, bucket_caps=None):
    """Production-scale synthetic rig per dataset.  real_shapes=True uses
    R2R val_unseen-like shapes (200-token instructions, gt paths 5-10)
    instead of the synthetic-average 60/4-7 — quantifying the shape-realism
    gap the synthetic headline hides."""
    import numpy as np
    import jax.numpy as jnp

    from vln_goat_tpu.config import GoatConfig
    from vln_goat_tpu.models.goat import GoatModel
    from vln_goat_tpu.rollout.env import EpisodeBatcher, make_synthetic_dataset
    from vln_goat_tpu.rollout.rollout import NavRollout, RolloutConfig
    from vln_goat_tpu.rollout.world import NavWorld
    from vln_goat_tpu.sim.graph_sim import make_synthetic_scan
    from vln_goat_tpu.train.params import init_goat_params

    cfg = GoatConfig.for_dataset(
        dataset,
        use_pallas_attention=os.environ.get("GOAT_PALLAS", "0") == "1")
    # Matterport-like scale: 4 scans x 120 viewpoints
    scans = [make_synthetic_scan(f"s{i}", num_vps=120, degree=4, seed=i)
             for i in range(4)]
    objects = None
    max_obj = 0
    if dataset == "reverie":
        vtot = sum(g.num_vps for g in scans)
        rng = np.random.default_rng(3)
        objects = dict(
            feat=rng.standard_normal((vtot, LO, 768)).astype(np.float32),
            loc=rng.standard_normal((vtot, LO, 7)).astype(np.float32),
            dir=rng.uniform(-np.pi, np.pi, (vtot, LO, 2)).astype(np.float32),
            mask=np.ones((vtot, LO), bool),
            name=rng.integers(0, 45, (vtot, LO)),
            oid=np.arange(vtot * LO).reshape(vtot, LO),
        )
        max_obj = LO
    world = NavWorld.build(scans, feat_dim=768, objects=objects, seed=0)
    if dataset == "rxr":
        rcfg = RolloutConfig(num_nodes=96, horizon=28, feat_dim=768,
                             expert_policy="ndtw", overflow_policy="spill")
        instr_len, plen, gt_cap = 250, (8, 14), 15
    else:
        rcfg = RolloutConfig(num_nodes=48, horizon=15, feat_dim=768)
        instr_len, plen, gt_cap = (200, (5, 10), 11) if real_shapes \
            else (60, (4, 7), 8)
    model = GoatModel(cfg, dtype=jnp.bfloat16 if bf16 else jnp.float32)
    params = init_goat_params(model, jax.random.PRNGKey(0), max_cands=16,
                              num_nodes=rcfg.num_nodes, max_obj=max_obj)
    ro = NavRollout(model, world, rcfg)
    graphs = {g.scan_id: g for g in scans}
    data = make_synthetic_dataset(graphs, 512, vocab_size=cfg.vocab_size,
                                  path_len=plen, seed=1,
                                  max_instr_len=instr_len)
    batcher = EpisodeBatcher(data, graphs, [g.scan_id for g in scans],
                             batch_size=B, max_instr_len=instr_len,
                             max_gt_len=gt_cap, bucket_caps=bucket_caps)
    if dataset == "reverie":
        # OG supervision: gt object slot at the goal viewpoint (local-branch
        # token offset cls+cands+36 views, cli.causal_batch)
        off = 2 + world.max_cands + 36
        rng = np.random.default_rng(4)
        orig = batcher.make_batch

        def make_batch_obj(items):
            b = dict(orig(items))
            b["gt_obj_slot"] = jnp.asarray(
                off + rng.integers(0, LO, len(items)).astype(np.int32))
            return b

        batcher.make_batch = make_batch_obj
    return model, params, ro, batcher


def bench_decode(B=None, dataset="r2r"):
    B = B or int(os.environ.get("GOAT_BENCH_B", "128"))
    _, params, ro, batcher = build(B, dataset=dataset)
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


def bench_train(B=None, dataset="r2r", real_shapes=False, k=1, iters=8):
    """DAgger optimizer step (teacher rollout at the short gt-bounded
    horizon + sampled rollout at the full horizon + backward + AdamW;
    GOAT_BENCH_ALG=dagger_fused benches the single-scan variant).
    Episodes/sec counted as B per iteration — the reference's it/s * batch
    convention (one iteration consumes B teacher + B sample episodes on
    both sides).  Returns (list of k eps/s measurements, hw-util%)."""
    from vln_goat_tpu.train import trainer as TR

    B = B or int(os.environ.get("GOAT_BENCH_TRAIN_B", "64"))
    # gt-length-bucketed minibatches won their on-chip A/B: the teacher
    # scan runs at each bucket's cap, one compile per cap
    caps = tuple(int(c) for c in
                 default_bucket_caps(dataset, real_shapes).split(",")
                 if c.strip())
    _, params, ro, batcher = build(B, dataset=dataset,
                                   real_shapes=real_shapes,
                                   bucket_caps=caps or None)
    tx = TR.make_optimizer(lr=2e-5)
    state = TR.init_train_state(params, tx)
    alg = os.environ.get("GOAT_BENCH_ALG", "dagger")
    th = "auto" if caps else \
        (None if alg == "dagger_fused" else batcher.max_gt_len)
    step = jax.jit(TR.make_train_step(
        ro, tx, train_alg=alg, ml_weight=0.2,
        remat=os.environ.get("GOAT_BENCH_REMAT", "model"),
        # A/B lever: 0 restores the per-step scan teacher
        vectorized_teacher=os.environ.get("GOAT_VEC_TEACHER", "1") == "1",
        # teacher scan at the batcher's gt cap is loss-identical
        teacher_horizon=th))
    rng = jax.random.PRNGKey(0)

    def nb():
        if alg == "dagger_fused":
            _, b1 = batcher.next_batch()
            _, b2 = batcher.next_batch()
            return TR.fuse_dagger_batches(b1, b2)
        return batcher.next_batch()[1]

    first = nb()
    state, m = step(state, first, rng)
    if caps:  # compile every bucket shape before the timed loop
        for cap in caps:
            items = batcher.next_minibatch()
            bb = batcher.make_batch(items, gt_cap=cap)
            state, m = step(state, bb, rng)
    jax.block_until_ready(m["loss"])
    runs = []
    for rep in range(k):
        t0 = time.perf_counter()
        for i in range(iters):
            state, m = step(state, nb(),
                            jax.random.fold_in(rng, rep * iters + i))
        jax.block_until_ready(m["loss"])
        float(m["loss"])  # fetch guard: see bench_decode
        runs.append(B * iters / (time.perf_counter() - t0))
    # hardware FLOP utilization vs the v5e bf16 peak (197 TFLOP/s), from
    # the compiled executable's own flop count (includes remat recompute —
    # i.e. how busy the MXU actually is).  VERDICT r2: publish MFU.
    util = None
    try:
        dt = B / max(runs)
        cost = step.lower(state, first, rng).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        util = float(cost.get("flops", 0.0)) / dt / 197e12 * 100.0
    except Exception:
        pass
    return runs, util


def bench_rxr_overflow(B=32, episodes=256):
    """RxR-scale sampled rollouts (horizon 28, 96-node table, nDTW expert):
    measure node-table pressure — spill events per episode (policy 'spill')
    and dropped candidates (must be 0 with spill).  Sampled feedback at
    random params wanders maximally: a worst-case bound for the table."""
    _, params, ro, batcher = build(B, dataset="rxr")
    batcher.batch_size = B
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


def bench_pretrain(tasks=("mlm", "sap", "cfp"), B=48, iters=12,
                   num_workers=None):
    """END-TO-END pretrain steady state: the real batch stream (multi-
    process BatchWorkerPool, shared-memory feature tables — the reference
    build_dataloader(num_workers) analogue) feeding each task's jitted
    train step.  ex/s includes host batch building, unlike the device-only
    numbers in BASELINE.md's round-3 table.  B=48 = the reference pretrain
    recipe batch (r2r_GOAT_pretrain.json:7).  num_workers=None scales to
    the host: this rig exposes ONE core, where extra workers only deepen
    the pipeline into device-step waits."""
    from functools import partial

    if num_workers is None:
        ncpu = len(os.sched_getaffinity(0))
        num_workers = 2 if ncpu <= 2 else min(6, ncpu - 1)

    import jax.numpy as jnp

    from vln_goat_tpu.config import PretrainConfig
    from vln_goat_tpu.data.worker_pool import BatchWorkerPool, share_tree
    from vln_goat_tpu.pretrain.cli import (_pool_build, _pool_init, build,
                                           parse_args)
    from vln_goat_tpu.pretrain.train import (PretrainState,
                                             init_pretrain_params,
                                             make_pretrain_optimizer,
                                             make_pretrain_steps)

    pargs = parse_args(["--synthetic", "--dataset", "r2r",
                        "--tasks", *tasks, "--train_batch_size", str(B)])
    rt = build(pargs)
    model, builder, items = rt["model"], rt["builder"], rt["items"]
    batches = {t: jax.tree.map(
        jnp.asarray, builder.build_batch(items["train"][:B], t))
        for t in tasks}
    params = init_pretrain_params(model, jax.random.PRNGKey(0), batches)
    pcfg = PretrainConfig(tasks=tuple(tasks), mix_ratio=(1,) * len(tasks),
                          train_batch_size=B)
    tx = make_pretrain_optimizer(pcfg)
    steps = make_pretrain_steps(model, tx, list(tasks))
    state0 = PretrainState(params, tx.init(params), jnp.zeros((), jnp.int32))

    arrays, shm_owners = share_tree(dict(
        features=builder.features, aug_features=builder.aug_features,
        view_probs=builder.view_probs, objects=builder.objects))
    spec = dict(arrays=arrays, graphs=builder.graphs,
                order=builder.scan_order, shapes=builder.sh,
                items={"train": items["train"]}, B=B, seed=0,
                kw=dict(vocab_size=builder.vocab_size, objnav=builder.objnav,
                        angle_feat_size=builder.afs,
                        correct_heading=builder.correct_heading,
                        mask_token_id=builder.mask_token_id,
                        mlm_prob=builder.mlm_prob, mrc_prob=builder.mrc_prob,
                        zdicts=builder.zdicts or None,
                        obj_prob_logits=builder.obj_prob_logits))
    pool = BatchWorkerPool(partial(_pool_init, spec), _pool_build,
                           num_workers=num_workers)
    out = {}
    try:
        for t in tasks:
            state = state0
            # warmup: compile + fill the pool pipeline
            state, m = steps[t](state, batches[t], jax.random.PRNGKey(0))
            jax.block_until_ready(m["loss"])
            it = pool.imap((("train", t, s) for s in range(iters + 4)))
            for _ in range(2):  # pipeline warm
                _, nb = next(it)
                state, m = steps[t](state, jax.tree.map(jnp.asarray, nb),
                                    jax.random.PRNGKey(1))
            jax.block_until_ready(m["loss"])
            t0 = time.perf_counter()
            for i in range(iters):
                _, nb = next(it)
                state, m = steps[t](state, jax.tree.map(jnp.asarray, nb),
                                    jax.random.PRNGKey(i))
            jax.block_until_ready(m["loss"])
            float(m["loss"])  # fetch guard
            out[t] = B * iters / (time.perf_counter() - t0)
    finally:
        pool.close()
        for h in shm_owners:
            h.close()
            h.unlink()
    return out


def probe_tunnel(deadline_s=600.0):
    """Run scripts/tpu_health.py as a deadline-bounded SUBPROCESS so a
    dead tunnel (client hangs at backend init — observed r3) can't hang
    the whole bench into an rc=124 corpse (BENCH_r04).  Returns the
    chained-matmul seconds, or None if the probe child never answered
    within the deadline.  The child early-exits after ONE matmul+fetch
    when that single RPC already blows the budget, so even the severe
    degraded mode (46s/RPC, 2026-08-20) answers in ~1 RPC."""
    import subprocess
    import sys
    here = os.path.dirname(os.path.abspath(__file__))
    try:
        p = subprocess.run(
            [sys.executable, os.path.join(here, "scripts", "tpu_health.py"),
             "--budget", "3.0", "--json"],
            capture_output=True, text=True, timeout=deadline_s)
    except subprocess.TimeoutExpired:
        return None
    for line in (p.stdout or "").splitlines():
        if line.startswith("{"):
            try:
                return float(json.loads(line)["seconds"])
            except (ValueError, KeyError):
                pass
    return None


def _spread(runs):
    s = sorted(runs)
    return dict(value=round(s[len(s) // 2], 2),
                spread=[round(s[0], 2), round(s[-1], 2)], k=len(s))


def main():
    import signal
    # a driver SIGTERM must still run the `finally` blocks (shm cleanup in
    # bench_pretrain leaked semaphores in BENCH_r04)
    signal.signal(signal.SIGTERM, lambda *_: (_ for _ in ()).throw(
        SystemExit(143)))
    t_start = time.perf_counter()
    budget = float(os.environ.get("GOAT_BENCH_BUDGET", "780"))

    def room(est):
        return (time.perf_counter() - t_start) + est <= budget

    def skip(metric, est):
        print(json.dumps({"metric": metric, "skipped": "budget",
                          "est_s": est, "elapsed_s":
                          round(time.perf_counter() - t_start, 1)}),
              flush=True)

    th = probe_tunnel()
    print(json.dumps({
        "metric": "tunnel_health_chained_matmul_s",
        "value": None if th is None else round(th, 2), "unit": "s",
        "healthy": th is not None and th < 3.0,
        "note": "chained 1024^2 matmuls + fetch (subprocess probe); "
                "healthy <0.5s, DEGRADED ~1-46s/RPC, null = the probe "
                "child hung past its deadline (tunnel dead)",
    }), flush=True)

    # Dead or severely degraded tunnel: measuring would either hang past
    # the driver's timeout (losing the whole artifact — BENCH_r04 rc=124)
    # or record dispatch latency instead of compute (meaningless vs the
    # 5x bar).  Land an rc=0 artifact that says so, with the last verified
    # on-chip headline quoted AS PROVENANCE, not as this run's value.
    if th is None or th >= 30.0:
        print(json.dumps({
            "metric": "r2r_dagger_finetune_episodes_per_sec_per_chip",
            "value": None,
            "unit": "episodes/s",
            "skipped": "tunnel_dead" if th is None else "tunnel_degraded",
            "tunnel_health_s": th if th is None else round(th, 2),
            "last_verified": {"value": 114.4, "vs_baseline": 4.49,
                              "artifact": "ROADMAP.md round-5 A/B table "
                                          "(2026-08-20, same-session "
                                          "control 104.7, bucket 5,8)"},
            "note": "every RPC round-trips through a degraded relay; "
                    "step timings would measure dispatch latency, not "
                    "compute — see ROADMAP.md round-4 tunnel notes",
        }), flush=True)
        return

    # headline FIRST (median of k=3), so a driver timeout can't lose it
    runs, util = bench_train(k=3)
    headline = {
        "metric": "r2r_dagger_finetune_episodes_per_sec_per_chip",
        **_spread(runs),
        "unit": "episodes/s",
        "vs_baseline": round(_spread(runs)["value"] / REF_TRAIN_EPS, 2),
        "remat_policy": os.environ.get("GOAT_BENCH_REMAT", "model"),
        "scan_unroll": int(os.environ["GOAT_SCAN_UNROLL"]),
        "alg": os.environ.get("GOAT_BENCH_ALG", "dagger"),
        "bucket_caps": os.environ.get("GOAT_BUCKET", "5,8"),
        "tunnel_health_s": round(th, 2),
    }
    if util is not None:
        # XLA cost_analysis flops / step time / v5e bf16 peak; the step is
        # elementwise/data-movement bound, not FLOP bound (ROADMAP r3)
        headline["hw_flops_util_pct"] = round(util, 2)
    print(json.dumps(headline), flush=True)

    decode = None
    if room(90):
        decode = bench_decode()
        print(json.dumps({
            "metric": "r2r_greedy_decode_episodes_per_sec_per_chip",
            "value": round(decode, 2),
            "unit": "episodes/s",
            "vs_baseline": round(decode / REF_DECODE_EPS, 2),
        }), flush=True)
        headline["decode_eps_per_sec"] = round(decode, 2)
        headline["decode_vs_baseline"] = round(decode / REF_DECODE_EPS, 2)
    else:
        skip("r2r_greedy_decode_episodes_per_sec_per_chip", 90)

    if room(120):
        real, _ = bench_train(real_shapes=True, k=1)
        print(json.dumps({
            "metric": "r2r_dagger_finetune_eps_per_sec_real_shapes",
            "value": round(real[0], 2),
            "unit": "episodes/s",
            "vs_baseline": round(real[0] / REF_TRAIN_EPS, 2),
            "note": "val_unseen-like shapes: 200-token instructions, gt "
                    "5-10 (the headline uses synthetic-average 60/4-7)",
        }), flush=True)
    else:
        skip("r2r_dagger_finetune_eps_per_sec_real_shapes", 120)

    # per-dataset fine-tune + decode (VERDICT r3 item 3): REVERIE carries
    # 20 object tokens + the OG head; RxR runs horizon 28, 250-token
    # instructions, 96-node table, nDTW expert
    for ds, trB, decB, est in (("reverie", 64, 128, 150),
                               ("rxr", 32, 64, 150)):
        name = f"{ds}_dagger_finetune_episodes_per_sec_per_chip"
        if not room(est):
            skip(name, est)
            continue
        try:
            tr, _ = bench_train(B=trB, dataset=ds, k=3, iters=4)
            dec = bench_decode(B=decB, dataset=ds)
            print(json.dumps({
                "metric": name,
                **_spread(tr),
                "unit": "episodes/s",
                "vs_baseline": round(_spread(tr)["value"]
                                     / REF[ds]["train"], 2),
                "decode_eps_per_sec": round(dec, 2),
                "decode_vs_baseline": round(dec / REF[ds]["decode"], 2),
            }), flush=True)
        except Exception as e:  # noqa: BLE001 — publish the failure loudly
            print(json.dumps({
                "metric": name, "value": None,
                "error": f"{type(e).__name__}: {str(e)[:200]}",
            }), flush=True)

    # end-to-end pretrain steady state vs the reference per-task ceilings
    if room(240):
        try:
            pre = bench_pretrain()
            for t, eps in pre.items():
                print(json.dumps({
                    "metric": f"pretrain_{t}_examples_per_sec_end_to_end",
                    "value": round(eps, 1),
                    "unit": "examples/s",
                    "vs_baseline": round(eps / REF_PRETRAIN[t], 2),
                    "note": "includes host batch building (worker pool); "
                            "baseline = reference zero-compute GPU ceiling",
                }), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps(
                {"metric": "pretrain_examples_per_sec_end_to_end",
                 "value": None,
                 "error": f"{type(e).__name__}: {str(e)[:200]}"}),
                flush=True)
    else:
        skip("pretrain_examples_per_sec_end_to_end", 240)

    if room(60):
        spill_rate, drop_rate = bench_rxr_overflow()
        print(json.dumps({
            "metric": "rxr_node_table_spills_per_episode",
            "value": round(spill_rate, 4),
            "unit": "spills/episode",
            "dropped_per_episode": round(drop_rate, 4),
            "note": "96-node table, horizon 28, sampled rollouts; spill "
                    "policy evicts farthest unvisited (reference GraphMap "
                    "is unbounded)",
        }), flush=True)
    else:
        skip("rxr_node_table_spills_per_episode", 60)

    # headline re-printed LAST so last-line parsers record the north star
    headline["total_bench_s"] = round(time.perf_counter() - t_start, 1)
    print(json.dumps(headline), flush=True)


if __name__ == "__main__":
    main()
