"""Pre-training CLI.

Reference: pretrain_src/train_r2r_goat.py (+ train_reverie_goat.py) with
the JSON-config overlay of pretrain_src/parser.py:144-155 (CLI wins).

  python -m vln_goat_tpu.pretrain.cli --config cfg.json --synthetic
  python -m vln_goat_tpu.pretrain.cli --anno_dir ... --img_ft_file ...

Orchestration preserved: multinomial task mixing (deterministic seeded
sampler instead of the broadcast MetaLoader), warmup+linear-decay LR,
grad-norm 5.0, per-task validation every valid_steps, best checkpoint on
val_unseen SAP fused accuracy `facc` (:389-399).
"""
from __future__ import annotations

import argparse
import json
import os
import time
from typing import Dict

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser("vln_goat_tpu.pretrain")
    p.add_argument("--config", default=None, help="JSON run config overlay")
    p.add_argument("--model_config", default=None, help="JSON model config")
    p.add_argument("--output_dir", default="out_pretrain")
    p.add_argument("--dataset", default="r2r",
                   choices=["r2r", "rxr", "reverie"])
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--anno_dir", default=None)
    p.add_argument("--img_ft_file", default=None)
    p.add_argument("--aug_img_ft_file", default=None,
                   help="EnvEdit augmented features; when set, each example "
                        "samples original/augmented 50/50 "
                        "(pretrain dataset.py:226-233)")
    p.add_argument("--connectivity_dir", default=None)
    p.add_argument("--scanvp_cands_file", default=None,
                   help="reference scanvp_candview_relangles.json cache "
                        "(pretrain dataset.py:171); overrides computed "
                        "candidate tables")
    p.add_argument("--tasks", nargs="+", default=["mlm", "sap", "cfp"])
    p.add_argument("--mix_ratio", nargs="+", type=int, default=[1, 1, 1])
    p.add_argument("--train_batch_size", type=int, default=48)
    p.add_argument("--learning_rate", type=float, default=5e-5)
    p.add_argument("--num_train_steps", type=int, default=200000)
    p.add_argument("--warmup_steps", type=int, default=10000)
    p.add_argument("--grad_norm", type=float, default=5.0)
    p.add_argument("--log_steps", type=int, default=1500)
    p.add_argument("--valid_steps", type=int, default=3000)
    p.add_argument("--seed", type=int, default=0)
    # reference TRAIN_MAX_STEP=20 (pretrain_src/data/dataset.py:371-373)
    p.add_argument("--max_steps_traj", type=int, default=20)
    # --- init from an external checkpoint with key surgery
    # (train_r2r_goat.py:113-172) ---
    p.add_argument("--init_from", default=None,
                   help="torch .pt/.ckpt to initialize the encoder from")
    p.add_argument("--init_format", default="goat",
                   choices=["goat", "meter", "lxmert", "bert"],
                   help="key space of --init_from (goat = reference "
                        "pretrain/fine-tune .pt, no rename)")
    # --- MRC real soft labels ---
    p.add_argument("--image_prob_size", type=int, default=0,
                   help="CLIP-class logit columns appended to each view "
                        "row of --img_ft_file (reference image_prob_size, "
                        "dataset.py:420-422); enables real MRC targets")
    p.add_argument("--mrc_prob_file", default=None,
                   help="separate HDF5 of per-view class logits keyed "
                        "'{scan}_{vp}' -> [36, P] (alternative to in-file "
                        "prob columns)")
    # --- REVERIE objects / OG task ---
    p.add_argument("--obj_ft_file", default=None,
                   help="REVERIE object feature HDF5 (enables the og task)")
    p.add_argument("--obj_feat_size", type=int, default=768)
    p.add_argument("--max_objects", type=int, default=20)
    p.add_argument("--max_txt_len", type=int, default=80)
    p.add_argument("--max_gmap", type=int, default=64)
    p.add_argument("--num_workers", type=int, default=0,
                   help="batch-builder worker processes (reference "
                        "build_dataloader(num_workers), loader.py:127-164). "
                        "0 = single background prefetch thread.  The batch "
                        "stream is identical for any value (each batch is "
                        "a pure function of (seed, task, step)).")
    args = p.parse_args(argv)
    # JSON overlay where CLI wins (parser.py:144-155): only fill values the
    # user left at their defaults
    if args.config:
        with open(args.config) as f:
            cfg = json.load(f)
        defaults = {a.dest: a.default for a in p._actions}
        for k, v in cfg.items():
            if hasattr(args, k) and getattr(args, k) == defaults.get(k):
                setattr(args, k, v)
    return args


def build(args):
    import jax

    from ..config import GoatConfig, PretrainConfig
    from .data import PretrainShapes, TrajBatchBuilder, items_from_dataset
    from .model import GoatPretrainModel
    from .train import init_pretrain_params

    mkw = {}
    if args.model_config:
        with open(args.model_config) as f:
            mj = json.load(f)
        known = GoatConfig.__dataclass_fields__
        mkw = {k: v for k, v in mj.items() if k in known}
    cfg = GoatConfig.for_dataset(args.dataset, **mkw)

    if args.synthetic:
        from ..rollout.env import make_synthetic_dataset
        from ..sim.graph_sim import make_synthetic_scan

        scans = [make_synthetic_scan(f"t{i}", num_vps=30, seed=i)
                 for i in range(2)]
        graphs = {g.scan_id: g for g in scans}
        vtot = sum(g.num_vps for g in scans)
        feats = np.random.default_rng(0).standard_normal(
            (vtot, 36, cfg.image_feat_size)).astype(np.float32)
        data = {
            "train": make_synthetic_dataset(graphs, 64, cfg.vocab_size,
                                            path_len=(3, 6), seed=1),
            "val_seen": make_synthetic_dataset(graphs, 16, cfg.vocab_size,
                                               path_len=(3, 6), seed=2),
            "val_unseen": make_synthetic_dataset(graphs, 16, cfg.vocab_size,
                                                 path_len=(3, 6), seed=3),
        }
        aug_feats = None
        view_probs = None
        objects = None
        if "og" in args.tasks or args.dataset == "reverie":
            # synthetic REVERIE objects (same layout as cli.py synthetic)
            orng = np.random.default_rng(7)
            Lo = args.max_objects
            cfg = cfg.replace(obj_feat_size=args.obj_feat_size or 768)
            objects = dict(
                feat=orng.standard_normal(
                    (vtot, Lo, cfg.obj_feat_size)).astype(np.float32),
                loc=np.concatenate([
                    orng.standard_normal((vtot, Lo, 4)).astype(np.float32),
                    orng.random((vtot, Lo, 3)).astype(np.float32)], -1),
                dir=orng.uniform(-3, 3, (vtot, Lo, 2)).astype(np.float32),
                mask=orng.random((vtot, Lo)) < 0.7,
                name=orng.integers(0, cfg.obj_name_vocab_size,
                                   (vtot, Lo)).astype(np.int32),
                oid=orng.integers(0, 50, (vtot, Lo)).astype(np.int32),
            )
            # attach a gt object id per item so OG labels exist
            offs = {}
            tot = 0
            for s in (g.scan_id for g in scans):
                offs[s] = tot
                tot += graphs[s].num_vps
            for split in data.values():
                for it in split:
                    goal = graphs[it["scan"]].index[it["path"][-1]]
                    row = offs[it["scan"]] + goal
                    if objects["mask"][row].any():
                        k = int(np.argmax(objects["mask"][row]))
                        it["objid"] = int(objects["oid"][row, k])
    else:
        from ..data.annotations import construct_instrs
        from ..data.feature_db import ImageFeaturesDB
        from ..sim.graph_sim import load_connectivity

        data = construct_instrs(args.anno_dir, args.dataset,
                                ["train", "val_seen", "val_unseen"])
        scan_ids = sorted({it["scan"] for s in data.values() for it in s})
        graphs = load_connectivity(args.connectivity_dir, scan_ids)
        if args.scanvp_cands_file:
            from ..sim.graph_sim import load_scanvp_cands

            load_scanvp_cands(args.scanvp_cands_file, graphs)
        db = ImageFeaturesDB(args.img_ft_file, cfg.image_feat_size)
        feats = db.as_packed_array(graphs, scan_ids)
        aug_feats = None
        if getattr(args, "aug_img_ft_file", None):
            # EnvEdit 50/50 feature alternation (dataset.py:226-233)
            aug_feats = ImageFeaturesDB(
                args.aug_img_ft_file, cfg.image_feat_size) \
                .as_packed_array(graphs, scan_ids)
        # MRC soft labels: in-file prob columns (dataset.py:420-422) or a
        # separate prob h5
        view_probs = None
        if args.image_prob_size > 0:
            view_probs = db.as_packed_probs(graphs, scan_ids,
                                            args.image_prob_size)
        elif args.mrc_prob_file:
            pdb = ImageFeaturesDB(args.mrc_prob_file, 10 ** 9)
            logits = pdb.as_packed_array(graphs, scan_ids)
            e = np.exp(logits - logits.max(-1, keepdims=True))
            view_probs = (e / e.sum(-1, keepdims=True)).astype(np.float32)
        objects = None
        if args.obj_ft_file:
            from ..data.feature_db import ObjectFeaturesDB

            cfg = cfg.replace(obj_feat_size=args.obj_feat_size)
            objects = ObjectFeaturesDB(
                args.obj_ft_file, args.obj_feat_size,
                max_objects=args.max_objects).as_packed_arrays(
                    graphs, scan_ids)

    order = list(graphs)
    prob_dim = (args.image_prob_size or
                (view_probs.shape[-1] if view_probs is not None else 1000))
    shapes = PretrainShapes(max_txt_len=args.max_txt_len,
                            max_steps=args.max_steps_traj,
                            max_gmap=args.max_gmap,
                            mrc_prob_dim=prob_dim,
                            max_objs=(args.max_objects
                                      if objects is not None else 0))
    builder = TrajBatchBuilder(graphs, order, feats, shapes,
                               vocab_size=cfg.vocab_size,
                               view_probs=view_probs,
                               objnav=objects is not None, objects=objects,
                               aug_features=aug_feats, seed=args.seed)
    items = {k: items_from_dataset(v, graphs) for k, v in data.items()}
    model = GoatPretrainModel(cfg, tasks=tuple(args.tasks),
                              image_prob_size=prob_dim)
    return dict(cfg=cfg, model=model, builder=builder, items=items)


def make_batch_np(builder, pool_items, B: int, seed: int,
                  split: str, task: str, step: int):
    """Build one batch as numpy, as a PURE function of
    (seed, split, task, step): item selection and every stochastic choice
    inside the builder derive from one rng keyed on the tuple.  Same
    batches on rerun, on every host (MetaLoader broadcast analogue), and
    from any worker process.  crc32, not hash() — python string hashing
    is salted per process."""
    import zlib

    rng = np.random.default_rng(
        (seed, zlib.crc32(split.encode()), zlib.crc32(task.encode()), step))
    chunk = [pool_items[i] for i in rng.integers(0, len(pool_items), B)]
    return builder.build_batch(chunk, task, rng=rng)


def _pool_init(spec):
    """Worker-side state: rebuild the TrajBatchBuilder on shared-memory
    feature views (numpy only — workers never touch jax)."""
    from ..data.worker_pool import resolve_tree
    from .data import TrajBatchBuilder

    arrs = resolve_tree(spec["arrays"])
    builder = TrajBatchBuilder(
        spec["graphs"], spec["order"], arrs["features"], spec["shapes"],
        view_probs=arrs["view_probs"], aug_features=arrs["aug_features"],
        objects=arrs["objects"], **spec["kw"])
    return dict(builder=builder, items=spec["items"], B=spec["B"],
                seed=spec["seed"])


def _pool_build(state, desc):
    split, task, step = desc
    return make_batch_np(state["builder"], state["items"][split],
                         state["B"], state["seed"], split, task, step)


def train(args):
    import jax
    import jax.numpy as jnp

    from ..config import PretrainConfig
    from ..train.checkpoint import save_orbax
    from ..utils.logger import MetricsLogger, RunningMeter, \
        write_to_record_file
    from .train import (MetaTaskSampler, PretrainState, init_pretrain_params,
                        make_eval_steps, make_pretrain_optimizer,
                        make_pretrain_steps)

    os.makedirs(args.output_dir, exist_ok=True)
    record = os.path.join(args.output_dir, "pretrain.log")
    mlog = MetricsLogger(os.path.join(args.output_dir, "metrics.jsonl"),
                         tb_dir=os.path.join(args.output_dir, "tb"))

    rt = build(args)
    model, builder, items = rt["model"], rt["builder"], rt["items"]
    B = args.train_batch_size
    if len(args.mix_ratio) < len(args.tasks):   # pad to uniform
        args.mix_ratio = list(args.mix_ratio) + \
            [1] * (len(args.tasks) - len(args.mix_ratio))

    def sample_batch(split, task, step=0):
        return jax.tree.map(jnp.asarray, make_batch_np(
            builder, items[split], B, args.seed, split, task, step))

    init_batches = {t: sample_batch("train", t) for t in args.tasks}
    params = init_pretrain_params(model, jax.random.PRNGKey(args.seed),
                                  init_batches)
    if args.init_from:
        # reference pretrain-entry init: load + key surgery + tolerant
        # overlay (train_r2r_goat.py:113-172)
        from ..train.checkpoint import init_pretrain_from

        params, missing, extra = init_pretrain_from(
            args.init_from, args.init_format, params)
        write_to_record_file(
            f"init_from {args.init_from} ({args.init_format}): "
            f"{len(missing)} missing, {len(extra)} unused keys", record)
    pcfg = PretrainConfig(
        tasks=tuple(args.tasks), mix_ratio=tuple(args.mix_ratio),
        train_batch_size=B, learning_rate=args.learning_rate,
        num_train_steps=args.num_train_steps, warmup_steps=args.warmup_steps,
        grad_norm=args.grad_norm)
    tx = make_pretrain_optimizer(pcfg)
    steps = make_pretrain_steps(model, tx, args.tasks)
    evals = make_eval_steps(model, args.tasks)
    sampler = MetaTaskSampler(args.tasks, args.mix_ratio, seed=args.seed)
    state = PretrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    # data-parallel over all devices when the batch divides them
    mesh = None
    n_dev = len(jax.devices())
    if n_dev > 1 and B % n_dev == 0:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.mesh import make_mesh, shard_batch

        mesh = make_mesh()
        state = jax.device_put(state, NamedSharding(mesh, P()))
    meters = {t: RunningMeter(t) for t in args.tasks}
    best_facc = -1.0

    # overlap host batch assembly with device steps: a worker-process pool
    # when --num_workers > 0 (build_dataloader analogue, loader.py:127-164)
    # or a single background prefetch thread (PrefetchLoader analogue,
    # loader.py:90).  Identical batch streams either way — every batch is
    # a pure function of (seed, task, step).
    pool = None
    shm_owners = []
    if args.num_workers > 0:
        from ..data.worker_pool import BatchWorkerPool, share_tree
        from functools import partial

        arrays, shm_owners = share_tree(dict(
            features=builder.features, aug_features=builder.aug_features,
            view_probs=builder.view_probs, objects=builder.objects))
        spec = dict(
            arrays=arrays, graphs=builder.graphs, order=builder.scan_order,
            shapes=builder.sh, items={"train": items["train"]}, B=B,
            seed=args.seed,
            kw=dict(vocab_size=builder.vocab_size, objnav=builder.objnav,
                    angle_feat_size=builder.afs,
                    correct_heading=builder.correct_heading,
                    mask_token_id=builder.mask_token_id,
                    mlm_prob=builder.mlm_prob, mrc_prob=builder.mrc_prob,
                    zdicts=builder.zdicts or None,
                    obj_prob_logits=builder.obj_prob_logits))
        pool = BatchWorkerPool(partial(_pool_init, spec), _pool_build,
                               num_workers=args.num_workers)

        def stream():
            descs = ((("train", sampler.task_at(s), s))
                     for s in range(args.num_train_steps))
            for (split, t, s), nb in pool.imap(descs):
                yield s, t, jax.tree.map(jnp.asarray, nb)

        batch_iter = stream()
    else:
        from ..data.prefetch import PrefetchIterator

        step_iter = iter(range(args.num_train_steps))

        def produce():
            s = next(step_iter)          # StopIteration ends the stream
            t = sampler.task_at(s)
            return s, t, sample_batch("train", t, s)

        batch_iter = PrefetchIterator(produce, depth=2)

    t0 = time.time()
    for step, task, batch in batch_iter:
        if mesh is not None:
            from ..parallel.mesh import shard_batch

            batch = shard_batch(batch, mesh)
        state, m = steps[task](state, batch, jax.random.PRNGKey(step))
        meters[task](float(m["loss"]))
        if (step + 1) % args.log_steps == 0:
            msg = f"step {step+1}: " + " ".join(
                f"{t}={meters[t].val:.4f}" for t in args.tasks)
            msg += f" ({(step+1)/(time.time()-t0):.2f} it/s)"
            write_to_record_file(msg, record)
            mlog.set_step(step + 1)
            mlog.log_scalar_dict({t: meters[t].val for t in args.tasks},
                                 prefix="train")
        if (step + 1) % args.valid_steps == 0:
            facc = None
            for split in ("val_seen", "val_unseen"):
                scores = {}
                for t in args.tasks:
                    vb = sample_batch(split, t, step + 1)
                    em = evals[t](state.params, vb)
                    scores.update({f"{t}_{k}": float(v)
                                   for k, v in em.items()})
                write_to_record_file(f"  {split}: {scores}", record)
                mlog.log_scalar_dict(scores, prefix=split)
                if split == "val_unseen":
                    # model selection on unseen SAP fused accuracy
                    # (train_r2r_goat.py:389-399); without a sap task fall
                    # back to negative total loss (higher = better)
                    facc = scores.get("sap_sap_facc")
                    if facc is None:
                        facc = -sum(v for k, v in scores.items()
                                    if k.endswith("_loss"))
            save_orbax(os.path.abspath(os.path.join(
                args.output_dir, "ckpt_latest")), state.params)
            if facc is not None and facc > best_facc:
                best_facc = facc
                save_orbax(os.path.abspath(os.path.join(
                    args.output_dir, f"ckpt_best_{step+1}")), state.params)
                write_to_record_file(f"  best facc {facc:.4f} @ {step+1}",
                                     record)
    if pool is not None:
        pool.close()
    for h in shm_owners:
        h.unlink()
    return state


def main(argv=None):
    args = parse_args(argv)
    os.makedirs(args.output_dir, exist_ok=True)
    with open(os.path.join(args.output_dir, "args.json"), "w") as f:
        json.dump(vars(args), f, indent=2)
    train(args)


if __name__ == "__main__":
    main()
