"""Round-3 perf probes on the real chip, one process (tunnel discipline).

Each probe isolates one suspected cost in the DAgger train step:
- base:      rbg PRNG, remat=full, B=64 (the production config)
- donate:    jit with donate_argnums=0 (train state buffers reused)
- nodrop:    deterministic rollouts (measures total dropout cost:
             mask generation + selects + their remat recompute)
- bf16sm:    bf16 softmax (measures the f32-softmax upcast tax)
- pallas:    fused qkv attention kernel at the Lq>=32 gate
"""
import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_default_prng_impl", "rbg")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

B = 64
ITERS = 8


def run(tag, *, env=None, deterministic=False, donate=False):
    env = env or {}
    old = {}
    for k, v in env.items():
        old[k] = os.environ.get(k)
        os.environ[k] = v
    try:
        import jax.numpy as jnp

        from vln_goat_tpu.config import GoatConfig
        from vln_goat_tpu.models.goat import GoatModel
        from vln_goat_tpu.rollout.env import EpisodeBatcher, \
            make_synthetic_dataset
        from vln_goat_tpu.rollout.rollout import NavRollout, RolloutConfig
        from vln_goat_tpu.rollout.world import NavWorld
        from vln_goat_tpu.sim.graph_sim import make_synthetic_scan
        from vln_goat_tpu.train.params import init_goat_params
        from vln_goat_tpu.train import trainer as TR

        cfg = GoatConfig.for_dataset(
            "r2r", use_pallas_attention=env.get("GOAT_PALLAS") == "1")
        rcfg = RolloutConfig(num_nodes=48, horizon=15, feat_dim=768)
        scans = [make_synthetic_scan(f"s{i}", num_vps=120, degree=4, seed=i)
                 for i in range(4)]
        world = NavWorld.build(scans, feat_dim=768, seed=0)
        model = GoatModel(cfg, dtype=jnp.bfloat16)
        params = init_goat_params(model, jax.random.PRNGKey(0), max_cands=16,
                                  num_nodes=rcfg.num_nodes)
        ro = NavRollout(model, world, rcfg)
        graphs = {g.scan_id: g for g in scans}
        data = make_synthetic_dataset(graphs, 512, vocab_size=cfg.vocab_size,
                                      path_len=(4, 7), seed=1)
        batcher = EpisodeBatcher(data, graphs, [g.scan_id for g in scans],
                                 batch_size=B, max_instr_len=60, max_gt_len=8)
        tx = TR.make_optimizer(lr=2e-5)
        state = TR.init_train_state(params, tx)

        # deterministic probe: rebuild the step with deterministic rollouts
        import dataclasses as dc

        t_ro = NavRollout(model, world, dc.replace(rcfg, horizon=8))
        teacher_fn = t_ro.build_rollout("teacher", train_ml=True,
                                        deterministic=deterministic,
                                        remat="full")
        sample_fn = ro.build_rollout("sample", train_ml=True,
                                     deterministic=deterministic,
                                     remat="full")
        import optax

        def loss_fn(params, batch, rng):
            r1, r2 = jax.random.split(rng)
            out_t = teacher_fn(params, batch, r1)
            out_s = sample_fn(params, batch, r2)
            return 0.2 * out_t["ml_loss"] + out_s["ml_loss"], {}

        def train_step(state, batch, rng):
            (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, batch, rng)
            updates, opt_state = tx.update(grads, state.opt_state,
                                           state.params)
            new = optax.apply_updates(state.params, updates)
            return TR.TrainState(new, opt_state, state.step + 1), \
                {"loss": loss}

        step = jax.jit(train_step, donate_argnums=(0,) if donate else ())
        rng = jax.random.PRNGKey(0)
        t0 = time.time()
        state, m = step(state, batcher.next_batch()[1], rng)
        jax.block_until_ready(m["loss"])
        compile_s = time.time() - t0
        t0 = time.perf_counter()
        for i in range(ITERS):
            state, m = step(state, batcher.next_batch()[1],
                            jax.random.fold_in(rng, i))
        jax.block_until_ready(m["loss"])
        dt = (time.perf_counter() - t0) / ITERS
        print(f"{tag:8s}: step {dt*1e3:7.1f} ms  eps/s {B/dt:7.1f}  "
              f"(compile {compile_s:.0f}s)", flush=True)
    except Exception as e:
        print(f"{tag:8s}: FAILED {type(e).__name__}: {str(e)[:160]}",
              flush=True)
    finally:
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
        gc.collect()


if __name__ == "__main__":
    run("base")
    run("donate", donate=True)
    run("nodrop", deterministic=True)
    run("bf16sm", env={"GOAT_BF16_SOFTMAX": "1"})
    run("pallas", env={"GOAT_PALLAS": "1"})
    run("pal+sm", env={"GOAT_PALLAS": "1", "GOAT_BF16_SOFTMAX": "1"})
