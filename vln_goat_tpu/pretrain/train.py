"""Pre-training loop pieces: deterministic multi-task sampling, LR schedule,
jitted per-task train steps, validation.

Reference: pretrain_src/train_r2r_goat.py (:75 main, :301-401 task loop),
data/loader.py MetaLoader (:54-60), optim/sched.py get_lr_sched (:24-30).

TPU-native notes:
- MetaLoader's `dist.broadcast(task_id)` collective becomes a seeded
  host-side sampler: every process derives the same task from (seed, step)
  — deterministic, no communication;
- the GPU-memory watchdog (data/common.py:171-210 + empty_cache) has no TPU
  analogue: XLA preallocates HBM, so the subsystem is intentionally absent;
- one jitted step per task (static task string), batch sharded over ('dp',).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import GoatConfig, PretrainConfig
from .model import GoatPretrainModel


class MetaTaskSampler:
    """Seeded multinomial task choice per step (loader.py:54-60 equivalent,
    same sequence on every host)."""

    def __init__(self, tasks: Sequence[str], mix_ratio: Sequence[int],
                 seed: int = 0):
        self.tasks = list(tasks)
        p = np.asarray(mix_ratio, np.float64)
        self.p = p / p.sum()
        self.seed = seed

    def task_at(self, step: int) -> str:
        rng = np.random.default_rng((self.seed, step))
        return self.tasks[rng.choice(len(self.tasks), p=self.p)]


def get_lr_schedule(lr: float, warmup_steps: int, total_steps: int):
    """Linear warmup then linear decay with 1e-8 floor (optim/sched.py:24-30)."""

    def fn(step):
        warm = lr * jnp.minimum(step, warmup_steps) / jnp.maximum(warmup_steps, 1)
        decay = lr * (total_steps - step) / jnp.maximum(total_steps - warmup_steps, 1)
        out = jnp.where(step < warmup_steps, warm, decay)
        return jnp.maximum(out, 1e-8)

    return fn


def make_pretrain_optimizer(cfg: PretrainConfig):
    sched = get_lr_schedule(cfg.learning_rate, cfg.warmup_steps,
                            cfg.num_train_steps)
    # no-decay groups for bias/LayerNorm params (optim/misc.py:12-37)
    def decay_mask(params):
        def f(path, x):
            name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
            return name not in ("bias", "scale")
        return jax.tree_util.tree_map_with_path(f, params)

    from .optimizers import build_optimizer

    return optax.chain(
        optax.clip_by_global_norm(cfg.grad_norm),
        build_optimizer(cfg.optim, sched, b1=cfg.betas[0], b2=cfg.betas[1],
                        eps=1e-8, weight_decay=cfg.weight_decay,
                        decay_mask=decay_mask),
    )


def init_pretrain_params(model: GoatPretrainModel, rng,
                         batches: Dict[str, Any]):
    """Init by running every task once and deep-merging the trees."""
    from ..train.params import _merge

    params = {}
    for i, (task, batch) in enumerate(batches.items()):
        v = model.init(jax.random.fold_in(rng, i), batch, task)
        params = _merge(params, v["params"])
    return {"params": params}


@dataclass
class PretrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray

    def tree_flatten(self):
        return (self.params, self.opt_state, self.step), None

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves)


jax.tree_util.register_pytree_node_class(PretrainState)


def make_pretrain_steps(model: GoatPretrainModel, tx,
                        tasks: Sequence[str]) -> Dict[str, Any]:
    """One jitted update function per task."""

    def make(task):
        def loss_fn(params, batch, rng):
            loss, metrics = model.apply({"params": params["params"]}, batch,
                                        task, deterministic=False,
                                        rngs={"dropout": rng})
            return loss, metrics

        def step_fn(state: PretrainState, batch, rng):
            (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, batch, rng)
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            metrics = dict(metrics)
            metrics["loss"] = loss
            return PretrainState(params, opt_state, state.step + 1), metrics

        return jax.jit(step_fn)

    return {t: make(t) for t in tasks}


def make_eval_steps(model: GoatPretrainModel,
                    tasks: Sequence[str]) -> Dict[str, Any]:
    def make(task):
        def eval_fn(params, batch):
            loss, metrics = model.apply({"params": params["params"]}, batch,
                                        task, deterministic=True)
            metrics = dict(metrics)
            metrics["loss"] = loss
            return metrics

        return jax.jit(eval_fn)

    return {t: make(t) for t in tasks}
