"""Fine-tuning train step: IL / DAgger over the scan-compiled rollout.

Reference semantics (map_nav_src/r2r/agent.py:422-445, agent_base.py:154-203):
- 'imitation': one teacher-forced rollout, weight 1.
- 'dagger': teacher rollout at ml_weight (0.2) + on-policy sampled rollout at
  weight 1, both imitation-loss only (no RL loss is ever computed in the
  reference: the Critic exists but rollout only accumulates IL loss,
  agent.py:614-621).
- loss: sum-CE over steps/batch divided by batch size (criterion
  reduction='sum', agent_base.py:133; scaling agent.py:696-699).
- grad clip 40 (agent_base.py:193), AdamW lr 1e-5/2e-5.

TPU-native: the whole update (two rollouts + backward + optimizer) is one
jitted function; under a ('dp',) mesh the batch is sharded and XLA derives
the gradient all-reduce.  Rollout model calls are rematerialized
(jax.checkpoint) so the 15-step backward fits comfortably in HBM.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, Optional, Union

import jax
import jax.numpy as jnp
import optax

from ..rollout.rollout import NavRollout


@dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray

    def tree_flatten(self):
        return (self.params, self.opt_state, self.step), None

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves)


jax.tree_util.register_pytree_node_class(TrainState)


def make_lr_schedule(name: str, lr: float, warmup_steps: int,
                     total_steps: int, lr_end: float = 1e-8):
    """The reference's --lr_sch options (transformers get_scheduler,
    map_nav_src/r2r/agent_base.py:125-130: warmup 3000, steps=iters,
    lr_end=1e-8) as optax schedules.  'linear' decays to 0 and
    'polynomial' (power 1) decays to lr_end, matching transformers."""
    warm = [optax.linear_schedule(0.0, lr, warmup_steps)] \
        if warmup_steps else []
    decay = max(1, total_steps - warmup_steps)
    if name == "constant":
        return lr
    if name == "constant_with_warmup":
        tail = [optax.constant_schedule(lr)]
    elif name == "linear":
        tail = [optax.linear_schedule(lr, 0.0, decay)]
    elif name == "polynomial":
        tail = [optax.polynomial_schedule(lr, lr_end, 1.0, decay)]
    elif name == "cosine":
        tail = [optax.cosine_decay_schedule(lr, decay)]
    else:
        raise ValueError(f"unknown lr_sch {name!r}")
    if not warm:
        return tail[0]
    return optax.join_schedules(warm + tail, [warmup_steps])


def make_optimizer(lr: float = 2e-5, weight_decay: float = 0.01,
                   grad_clip: float = 40.0,
                   warmup_steps: int = 0, total_steps: Optional[int] = None,
                   accumulate_steps: int = 1, finite_guard: bool = False,
                   lr_sch: Optional[str] = None):
    """AdamW + global-norm clip (reference defaults).  accumulate_steps>1
    = the reference's --accumulateGrad (agent.py:407-445) as
    optax.MultiSteps; finite_guard skips non-finite updates; lr_sch names
    a reference --lr_sch schedule (see make_lr_schedule)."""
    if lr_sch is not None:
        sched = make_lr_schedule(lr_sch, lr, warmup_steps,
                                 total_steps or 1)
    elif warmup_steps and total_steps:
        sched = optax.warmup_cosine_decay_schedule(
            0.0, lr, warmup_steps, total_steps, end_value=lr * 0.01)
    else:
        sched = lr
    tx = optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.adamw(sched, b1=0.9, b2=0.999, eps=1e-8,
                    weight_decay=weight_decay),
    )
    if finite_guard:
        tx = optax.apply_if_finite(tx, max_consecutive_errors=10)
    if accumulate_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accumulate_steps)
    return tx


def make_train_step(rollout: NavRollout, tx,
                    train_alg: str = "dagger", ml_weight: float = 0.2,
                    sample_feedback: str = "sample",
                    expl_max_ratio: float = 0.6, remat: str = "full",
                    teacher_horizon: Union[int, str, None] = None,
                    vectorized_teacher: bool = True):
    """sample_feedback='expl_sample' replicates --expl_sample runs
    (agent.py:436).

    train_alg='dagger_fused' runs the teacher + sample rollouts as ONE
    2B-episode scan (rollout feedback='fused_dagger'): the reference pulls
    a fresh minibatch for each of the two rollouts (env.reset inside
    rollout, agent_base.py:154-203), so the fused batch is simply both
    minibatches concatenated with batch['is_teacher'] marking the
    teacher-forced half.  Each half's summed CE is divided by its own
    half-size, exactly like the two separate rollouts.

    teacher_horizon: scan length for the teacher-forced rollout
    ('imitation' / 'dagger' algs).  Teacher episodes deterministically end
    once the gt path is exhausted (<= max_gt_len steps: last hop arrives,
    next step emits stop), so a horizon of the batcher's max_gt_len is
    loss-identical to the full horizon while skipping the dead tail of the
    scan.  None keeps the rollout's configured horizon.  "auto" derives
    the horizon from each batch's gt_path width at trace time — with
    length-bucketed batches (EpisodeBatcher bucket_caps) short buckets
    run a proportionally shorter teacher scan, one compile per cap."""
    import dataclasses as _dc

    def _teacher_at(horizon: Optional[int]):
        t_ro = rollout
        if horizon is not None and horizon < rollout.rcfg.horizon:
            t_ro = NavRollout(rollout.model, rollout.world,
                              _dc.replace(rollout.rcfg, horizon=horizon))
        # vectorized teacher: under teacher forcing the trajectory is
        # parameter-independent, so the pano encoder runs ONCE over all
        # steps and only the nav branch scans
        # (rollout.build_teacher_rollout_vec).  Loss-identical without
        # dropout; under dropout the draws differ (documented randomness
        # divergence, like the rbg PRNG).
        if vectorized_teacher:
            return t_ro.build_teacher_rollout_vec(deterministic=False,
                                                  remat=remat)
        return t_ro.build_rollout("teacher", train_ml=True,
                                  deterministic=False, remat=remat)

    _tcache: Dict[Optional[int], Any] = {}

    def teacher_fn(params, batch, rng, txt=None):
        h = teacher_horizon
        if h == "auto":
            h = min(int(batch["gt_path"].shape[1]), rollout.rcfg.horizon)
        if h not in _tcache:
            _tcache[h] = _teacher_at(h)
        return _tcache[h](params, batch, rng, txt=txt)
    sample_fn = rollout.build_rollout(sample_feedback, train_ml=True,
                                     deterministic=False,
                                     expl_max_ratio=expl_max_ratio,
                                     remat=remat)
    fused_fn = rollout.build_rollout("fused_dagger", train_ml=True,
                                     deterministic=False,
                                     expl_max_ratio=expl_max_ratio,
                                     sample_feedback=sample_feedback,
                                     remat=remat)

    def loss_fn(params, batch, rng):
        r1, r2 = jax.random.split(rng)
        loss = jnp.zeros(())
        metrics = {}
        if train_alg == "imitation":
            out = teacher_fn(params, batch, r1)
            loss = out["ml_loss"]
            metrics["il_loss"] = out["ml_loss"]
            metrics["node_overflow"] = jnp.sum(out["overflow_n"])
        elif train_alg == "dagger":
            # both rollouts run on the SAME minibatch here (the fused alg
            # carries the reference's two-minibatch semantics), so the
            # instruction encoding is computed once and shared — exact
            # when deterministic, one dropout draw instead of two
            # otherwise (randomness-parity policy: documented divergence)
            txt = rollout.encode_text(params, batch,
                                      jax.random.fold_in(rng, 3))
            if ml_weight != 0:
                out_t = teacher_fn(params, batch, r1, txt=txt)
                loss = loss + ml_weight * out_t["ml_loss"]
                metrics["il_loss"] = out_t["ml_loss"]
            out_s = sample_fn(params, batch, r2, txt=txt)
            loss = loss + out_s["ml_loss"]
            metrics["sample_loss"] = out_s["ml_loss"]
            # dropped-candidate counter: nonzero means the fixed node table
            # (RolloutConfig.num_nodes) is too small for these episodes
            metrics["node_overflow"] = jnp.sum(out_s["overflow_n"])
            metrics["node_spilled"] = jnp.sum(out_s["spilled_n"])
        elif train_alg == "dagger_fused":
            out = fused_fn(params, batch, r1)
            is_t = batch["is_teacher"]
            n_t = jnp.maximum(jnp.sum(is_t), 1)
            n_s = jnp.maximum(jnp.sum(~is_t), 1)
            l_t = jnp.sum(jnp.where(is_t, out["loss_per_ep"], 0.0)) / n_t
            l_s = jnp.sum(jnp.where(is_t, 0.0, out["loss_per_ep"])) / n_s
            loss = ml_weight * l_t + l_s
            metrics["il_loss"] = l_t
            metrics["sample_loss"] = l_s
            metrics["node_overflow"] = jnp.sum(out["overflow_n"])
        else:
            raise ValueError(train_alg)
        return loss, metrics

    def train_step(state: TrainState, batch, rng):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics["loss"] = loss
        metrics["grad_norm"] = optax.global_norm(grads)
        return TrainState(params, opt_state, state.step + 1), metrics

    return train_step


def init_train_state(params, tx) -> TrainState:
    return TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))


def fuse_dagger_batches(batch_t: Dict[str, Any],
                        batch_s: Dict[str, Any]) -> Dict[str, Any]:
    """Concatenate a teacher minibatch and a sample minibatch into one
    fused-DAgger batch (per-episode arrays stacked, shared banks like
    feat_noise kept from the teacher batch) and mark the teacher half."""
    import numpy as np

    b_t = int(np.asarray(batch_t["scan_idx"]).shape[0])
    b_s = int(np.asarray(batch_s["scan_idx"]).shape[0])
    shared = {"feat_noise"}
    out = {}
    for k, v in batch_t.items():
        if k in shared or k not in batch_s:
            out[k] = v
        else:
            a, b = jnp.asarray(v), jnp.asarray(batch_s[k])
            if k in ("gt_path",) and a.shape[1] != b.shape[1]:
                # length-bucketed halves: pad gt to the wider cap
                Tg = max(a.shape[1], b.shape[1])
                a = jnp.pad(a, ((0, 0), (0, Tg - a.shape[1])),
                            constant_values=-1)
                b = jnp.pad(b, ((0, 0), (0, Tg - b.shape[1])),
                            constant_values=-1)
            out[k] = jnp.concatenate([a, b], axis=0)
    out["is_teacher"] = jnp.concatenate(
        [jnp.ones((b_t,), bool), jnp.zeros((b_s,), bool)])
    return out
