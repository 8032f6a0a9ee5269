"""Fine-tuning / validation / CFP-extraction CLI.

Reference: map_nav_src/r2r/main_nav.py (+ reverie/main_nav_obj.py) and
r2r/parser.py.  Usage:

  python -m vln_goat_tpu.cli --mode train --dataset r2r \
      --connectivity_dir ... --anno_dir ... --img_ft_file ... --output_dir out
  python -m vln_goat_tpu.cli --mode valid --resume_file ckpt ...
  python -m vln_goat_tpu.cli --mode extract_cfp_features ...
  python -m vln_goat_tpu.cli --mode train --synthetic   # fixture smoke run

Orchestration preserved from the reference (main_nav.py:140-401):
log_every train cycles, per-split greedy validation, best-checkpoint
selection on SPL+SR (nDTW+SDTW for RxR), periodic back-door z-dict refresh
(--z_instr_update every --update_iter), front-door dict resampling per
cycle, submission JSON dumps.  Multi-process: `jax.distributed.initialize`
+ ('dp',) mesh replaces torch DDP/NCCL (SURVEY.md section 2.5).
"""
from __future__ import annotations

import argparse
import json
import os
import time
from typing import Dict, Optional

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser("vln_goat_tpu")
    p.add_argument("--mode", required=True,
                   choices=["train", "valid", "extract_cfp_features",
                            "speaker"])
    p.add_argument("--speaker_iters", type=int, default=2000)
    p.add_argument("--speaker_lr", type=float, default=1e-4)
    p.add_argument("--speaker_angle_size", type=int, default=128)
    p.add_argument("--dataset", default="r2r",
                   choices=["r2r", "rxr", "reverie", "soon"])
    p.add_argument("--output_dir", default="out")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--synthetic", action="store_true",
                   help="run on the synthetic fixture world (no datasets)")

    # data paths (postprocess_args equivalents, r2r/parser.py:159-217)
    p.add_argument("--connectivity_dir", default=None)
    p.add_argument("--scanvp_cands_file", default=None,
                   help="reference scanvp_candview_relangles.json candidate "
                        "cache; overrides computed candidate tables")
    p.add_argument("--sweep_visibility", action="store_true",
                   help="apply the MatterSim view-frustum rule when "
                        "computing candidates (36-view sweep semantics)")
    p.add_argument("--anno_dir", default=None)
    p.add_argument("--img_ft_file", default=None)
    p.add_argument("--aug_ft_file", default=None)
    # aug-trajectory training env + speaker back-translation
    # (main_nav.py:82-97 build, :220-252 interleave, agent.py:459-474)
    p.add_argument("--aug", default=None,
                   help="aug trajectory annotation file; 'synthetic' builds "
                        "a fixture aug split on the synthetic world")
    p.add_argument("--aug_times", type=int, default=1,
                   help="aug updates per GT update in the interleave")
    p.add_argument("--accumulate_grad", action="store_true",
                   help="one optimizer step per GT+aug group "
                        "(--accumulateGrad, agent.py:407-445)")
    p.add_argument("--use_transpeaker", action="store_true",
                   help="re-caption aug paths with the speaker "
                        "(back-translation, agent.py:459-474)")
    p.add_argument("--speaker_ckpt_file", default=None,
                   help="orbax dir with trained speaker params")
    p.add_argument("--obj_ft_file", default=None)
    p.add_argument("--bbox_file", default=None,
                   help="REVERIE BBoxes json for obj2vps goal mapping")
    p.add_argument("--img_zdict_file", default=None)
    p.add_argument("--instr_zdict_file", default=None)
    p.add_argument("--front_feat_file", default=None)
    p.add_argument("--resume_file", default=None)
    p.add_argument("--bert_ckpt_file", default=None,
                   help="reference .pt to initialize from (key surgery)")

    # model
    p.add_argument("--num_l_layers", type=int, default=6)
    p.add_argument("--num_pano_layers", type=int, default=2)
    p.add_argument("--num_x_layers", type=int, default=3)
    # width overrides (fixture-scale runs / ablations; defaults are the
    # reference architecture, vlnbert_init.py:89-155)
    p.add_argument("--hidden_size", type=int, default=None)
    p.add_argument("--num_attention_heads", type=int, default=None)
    p.add_argument("--intermediate_size", type=int, default=None)
    p.add_argument("--image_feat_size", type=int, default=768)
    p.add_argument("--obj_feat_size", type=int, default=0)
    p.add_argument("--angle_feat_size", type=int, default=4)
    p.add_argument("--dropout", type=float, default=0.1)
    p.add_argument("--feat_dropout", type=float, default=None,
                   help="None keeps the dataset preset (0.4 r2r, 0.6 reverie)")
    p.add_argument("--fusion", default="dynamic",
                   choices=["global", "local", "avg", "dynamic"])
    p.add_argument("--expert_policy", default="spl", choices=["spl", "ndtw"])
    p.add_argument("--compute_dtype", default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--use_pallas", action="store_true",
                   help="fused Pallas sublayer kernels (attention + FFN "
                        "blocks; ops/attention.py) on TPU")

    # causal flags
    p.add_argument("--do_back_img", action="store_true")
    p.add_argument("--do_back_txt", action="store_true")
    p.add_argument("--do_front_img", action="store_true")
    p.add_argument("--do_front_his", action="store_true")
    p.add_argument("--do_front_txt", action="store_true")
    p.add_argument("--do_back_txt_type", default="type_2")
    p.add_argument("--do_back_img_type", default="type_1")
    p.add_argument("--do_add_method", default="door")
    p.add_argument("--z_instr_update", action="store_true")
    p.add_argument("--update_iter", type=int, default=3000)
    p.add_argument("--front_n_clusters", type=int, default=24)
    p.add_argument("--expl_sample", action="store_true")
    p.add_argument("--expl_max_ratio", type=float, default=0.6)
    p.add_argument("--cat_file", default=None,
                   help="category_mapping.tsv for the landmark word picker")
    p.add_argument("--tokenizer_vocab", default=None,
                   help="HF tokenizer vocab.json (token -> id); enables "
                        "reference-exact subword alignment in the z-dict "
                        "update (agent.py:778-799)")
    # multi-host (jax.distributed; replaces --world_size/NCCL)
    p.add_argument("--num_processes", type=int, default=1)
    p.add_argument("--process_id", type=int, default=0)
    p.add_argument("--coordinator", default="localhost:12391")

    # training
    p.add_argument("--iters", type=int, default=150000)
    p.add_argument("--log_every", type=int, default=1000)
    p.add_argument("--batch_size", type=int, default=12)
    p.add_argument("--lr", type=float, default=2e-5)
    p.add_argument("--bucket_caps", default="",
                   help="comma-separated gt-length caps (e.g. '5,8'): train "
                        "minibatches become length-homogeneous and the "
                        "teacher scan runs at the bucket cap instead of the "
                        "dataset max (loss-identical per batch; one compile "
                        "per cap).  Empty = off")
    # dagger (default): two rollouts per update; the teacher scan runs at
    # the dataset's max gt length (loss-identical, ~25% fewer FLOPs).
    # dagger_fused: both rollouts as ONE 2B-episode scan — same semantics,
    # wins at small per-chip batch, loses the teacher-horizon cut.
    p.add_argument("--train_alg", default="dagger",
                   choices=["imitation", "dagger", "dagger_fused"])
    p.add_argument("--remat", default="full",
                   choices=["full", "dots", "ffn", "bounds", "none", "model",
                            "probs", "wide"],
                   help="rollout rematerialization policy for training "
                        "(probs: save attention softmax outputs + dropout "
                        "masks, skip their backward recompute)")
    # rbg: ~10x cheaper than threefry on TPU for per-step dropout masks
    # (+41%% train throughput measured); same Bernoulli distributions,
    # different draws — randomness parity is a documented divergence
    p.add_argument("--prng", default="rbg",
                   choices=["rbg", "threefry2x32"],
                   help="jax PRNG implementation for dropout/sampling")
    p.add_argument("--ml_weight", type=float, default=0.2)
    p.add_argument("--grad_clip", type=float, default=40.0)
    # LR schedule (--use_lr_sch/--lr_sch via transformers get_scheduler,
    # agent_base.py:125-130: warmup 3000, num_training_steps=iters)
    p.add_argument("--use_lr_sch", action="store_true")
    p.add_argument("--lr_sch", default="polynomial",
                   choices=["constant", "constant_with_warmup", "linear",
                            "polynomial", "cosine"])
    p.add_argument("--warmup_steps", type=int, default=3000,
                   help="lr warmup steps when --use_lr_sch (reference "
                        "hardcodes 3000)")
    p.add_argument("--max_action_len", type=int, default=None)
    p.add_argument("--max_instr_len", type=int, default=None)
    p.add_argument("--num_nodes", type=int, default=48)
    p.add_argument("--max_cands", type=int, default=16)
    p.add_argument("--eval_first", action="store_true")
    p.add_argument("--submit", action="store_true")
    p.add_argument("--save_torch_ckpt", action="store_true",
                   help="also write reference-format .pt checkpoints")
    p.add_argument("--for_debug", action="store_true")
    p.add_argument("--tokenizer", default="roberta")
    return p.parse_args(argv)


# ----------------------------------------------------------------------
def build_runtime(args):
    import jax

    from .config import GoatConfig
    from .models.goat import GoatModel
    from .rollout.env import EpisodeBatcher, make_synthetic_dataset
    from .rollout.rollout import NavRollout, RolloutConfig
    from .rollout.world import NavWorld
    from .train.params import init_goat_params

    cfg = GoatConfig.for_dataset(
        args.dataset,
        num_l_layers=args.num_l_layers, num_pano_layers=args.num_pano_layers,
        num_x_layers=args.num_x_layers, image_feat_size=args.image_feat_size,
        angle_feat_size=args.angle_feat_size,
        hidden_dropout_prob=args.dropout,
        glocal_fuse=args.fusion == "dynamic", fusion=args.fusion,
        do_back_img=args.do_back_img, do_back_txt=args.do_back_txt,
        do_front_img=args.do_front_img, do_front_his=args.do_front_his,
        do_front_txt=args.do_front_txt,
        do_back_txt_type=args.do_back_txt_type,
        do_back_img_type=args.do_back_img_type,
        do_add_method=args.do_add_method,
        mode=args.mode,
        use_pallas_attention=args.use_pallas,
    )
    if args.hidden_size:
        cfg = cfg.replace(hidden_size=args.hidden_size)
    if args.num_attention_heads:
        cfg = cfg.replace(num_attention_heads=args.num_attention_heads)
    if args.intermediate_size:
        cfg = cfg.replace(intermediate_size=args.intermediate_size)
    if args.obj_feat_size:
        cfg = cfg.replace(obj_feat_size=args.obj_feat_size)
    if args.feat_dropout is not None:
        cfg = cfg.replace(feat_dropout=args.feat_dropout)
    if args.max_action_len:
        cfg = cfg.replace(max_action_len=args.max_action_len)
    if args.max_instr_len:
        cfg = cfg.replace(max_instr_len=args.max_instr_len)

    objects = None
    if args.synthetic:
        from .sim.graph_sim import make_synthetic_scan

        scans = [make_synthetic_scan(f"s{i}", num_vps=40, seed=i)
                 for i in range(3)]
        graphs = {g.scan_id: g for g in scans}
        if cfg.is_objnav:
            # synthetic object store (REVERIE fixture)
            orng = np.random.default_rng(7)
            vtot = sum(g.num_vps for g in scans)
            Lo = 8
            objects = dict(
                feat=orng.standard_normal(
                    (vtot, Lo, cfg.obj_feat_size)).astype(np.float32),
                loc=orng.standard_normal(
                    (vtot, Lo, cfg.angle_feat_size + 3)).astype(np.float32),
                dir=orng.uniform(-np.pi, np.pi,
                                 (vtot, Lo, 2)).astype(np.float32),
                mask=orng.random((vtot, Lo)) < 0.8,
                name=orng.integers(0, cfg.obj_name_vocab_size, (vtot, Lo)),
                oid=np.arange(vtot * Lo).reshape(vtot, Lo),
            )
        world = NavWorld.build(scans, feat_dim=cfg.image_feat_size,
                               objects=objects, seed=0)
        splits = {}
        for name, n, seed in [("train", 64, 1), ("val_seen", 16, 2),
                              ("val_unseen", 16, 3)]:
            splits[name] = make_synthetic_dataset(
                graphs, n, vocab_size=cfg.vocab_size,
                max_instr_len=min(cfg.max_instr_len, 48),
                path_len=(3, 6), seed=seed)
        # val_train_seen = slice of train (r2r/data_utils.py:149-151)
        splits["val_train_seen"] = splits["train"][:16]
        if args.aug:
            splits["aug"] = make_synthetic_dataset(
                graphs, 64, vocab_size=cfg.vocab_size,
                max_instr_len=min(cfg.max_instr_len, 48),
                path_len=(3, 6), seed=11)
        if objects is not None:
            # attach a gt object id visible at the goal viewpoint
            offs, total = {}, 0
            for g in scans:
                offs[g.scan_id] = total
                total += g.num_vps
            for data in splits.values():
                for it in data:
                    g = graphs[it["scan"]]
                    goal = g.index[it["path"][-1]]
                    row = offs[it["scan"]] + goal
                    k = int(np.argmax(objects["mask"][row]))
                    it["objId"] = int(objects["oid"][row, k])
    else:
        from .data.annotations import construct_instrs
        from .data.feature_db import ImageFeaturesDB
        from .sim.graph_sim import load_connectivity

        # split roster per dataset (main_nav.py:113-120)
        split_names = ["train", "val_train_seen", "val_seen", "val_unseen"]
        if args.dataset == "rxr":
            split_names.remove("val_train_seen")
            if not args.submit:
                split_names.remove("val_seen")
        if args.submit and args.dataset != "rxr":
            split_names.append("test")
        splits = construct_instrs(args.anno_dir, args.dataset, split_names,
                                  tokenizer=args.tokenizer,
                                  max_instr_len=cfg.max_instr_len,
                                  for_debug=args.for_debug)
        if args.aug and args.aug != "synthetic":
            # aug annotation file given as an explicit path
            # (main_nav.py:82-97: R2RNavBatch over args.aug)
            from .data.annotations import load_annotation_file

            splits["aug"] = load_annotation_file(
                args.aug, args.dataset, tokenizer=args.tokenizer,
                max_instr_len=cfg.max_instr_len, for_debug=args.for_debug)
        scan_ids = sorted({it["scan"] for s in splits.values() for it in s})
        graphs = load_connectivity(args.connectivity_dir, scan_ids,
                                   max_cands=args.max_cands,
                                   sweep_visibility=args.sweep_visibility)
        if args.scanvp_cands_file:
            # exact candidate sets from the reference's sweep cache
            # (scanvp_candview_relangles.json, r2r/parser.py:192) override
            # the graph-adjacency approximation
            from .sim.graph_sim import load_scanvp_cands

            load_scanvp_cands(args.scanvp_cands_file, graphs)
        feat_db = ImageFeaturesDB(args.img_ft_file, cfg.image_feat_size)
        features = feat_db.as_packed_array(graphs, scan_ids)
        aug_features = None
        if args.aug_ft_file:
            aug_features = ImageFeaturesDB(
                args.aug_ft_file, cfg.image_feat_size
            ).as_packed_array(graphs, scan_ids)
        if cfg.is_objnav and args.obj_ft_file:
            from .data.feature_db import ObjectFeaturesDB

            objects = ObjectFeaturesDB(
                args.obj_ft_file, cfg.obj_feat_size,
                cfg.angle_feat_size).as_packed_arrays(graphs, scan_ids)
        world = NavWorld.build([graphs[s] for s in scan_ids],
                               features=features, objects=objects,
                               aug_features=aug_features,
                               feat_dim=cfg.image_feat_size)

    # rank-sharded validation (sel_data_idxs, r2r/env.py:126-134)
    from .parallel.distributed import process_count, shard_data_for_process

    if process_count() > 1:
        for name in list(splits):
            if name not in ("train", "aug"):
                splits[name] = shard_data_for_process(splits[name])

    scan_order = list(graphs)
    import jax.numpy as jnp

    dtype = jnp.bfloat16 if args.compute_dtype == "bfloat16" else jnp.float32
    cfg = cfg.replace(compute_dtype=args.compute_dtype)
    model = GoatModel(cfg, dtype=dtype)
    params = init_goat_params(model, jax.random.PRNGKey(args.seed),
                              max_cands=args.max_cands,
                              num_nodes=args.num_nodes,
                              max_obj=max(world.num_objs, 1))
    if args.bert_ckpt_file or args.resume_file:
        from .train.checkpoint import (is_train_state_dir,
                                       load_reference_checkpoint,
                                       load_train_state_params, merge_loaded,
                                       torch_to_flax, load_orbax)

        path = args.resume_file or args.bert_ckpt_file
        if is_train_state_dir(path):
            if args.mode == "train":
                pass  # full restore (params+opt_state+step) happens in train()
            else:
                params = load_train_state_params(os.path.abspath(path))
        elif os.path.isdir(path):
            params = load_orbax(path, params)
        else:
            loaded = torch_to_flax(load_reference_checkpoint(path))
            params, missing, extra = merge_loaded(params, loaded)
            print(f"loaded {path}: {len(missing)} missing, "
                  f"{len(extra)} extra keys")

    rcfg = RolloutConfig(num_nodes=args.num_nodes, horizon=cfg.max_action_len,
                         expert_policy=args.expert_policy,
                         feat_dim=cfg.image_feat_size,
                         angle_feat_size=cfg.angle_feat_size)
    rollout = NavRollout(model, world, rcfg)

    # pad gt paths to the datasets' true maximum (bounded by the horizon):
    # a tight cap shrinks the batch arrays and lets the teacher-forced scan
    # run at the shortest loss-identical horizon (make_train_step
    # teacher_horizon); one cap across splits keeps one compiled shape
    gt_cap = max((len(it["path"]) for data in splits.values()
                  for it in data), default=2)
    gt_cap = min(max(gt_cap, 2), cfg.max_action_len + 1)

    # --bucket_caps: length-homogeneous train minibatches; caps above the
    # dataset max would just duplicate the top bucket, so clamp to gt_cap
    caps = sorted({min(int(c), gt_cap)
                   for c in args.bucket_caps.split(",") if c.strip()})
    batchers = {
        name: EpisodeBatcher(
            data, graphs, scan_order, args.batch_size,
            max_instr_len=min(cfg.max_instr_len, 64 if args.synthetic else 512),
            max_gt_len=gt_cap,
            # bucketing shortens the TRAIN teacher scan; eval batchers keep
            # one shape (decode has no teacher scan to shorten)
            bucket_caps=(caps if caps and name in ("train", "aug") else None),
            # EnvEdit alternation on the training envs only (r2r/env.py:78-84)
            env_edit=(name in ("train", "aug") and world.has_aug),
            seed=args.seed + i)
        for i, (name, data) in enumerate(splits.items())
    }
    rt = dict(cfg=cfg, model=model, params=params, world=world,
              rollout=rollout, batchers=batchers, graphs=graphs,
              scan_order=scan_order, objects=objects, args=args)
    if args.bbox_file:
        from .data.annotations import load_obj2vps

        raw = load_obj2vps(args.bbox_file)
        rt["obj2vps"] = {
            (scan, oid): [graphs[scan].index[vp] for vp in vps
                          if vp in graphs[scan].index]
            for (scan, oid), vps in raw.items() if scan in graphs}
    _load_causal_banks(args, rt)
    return rt


def _load_causal_banks(args, rt):
    """Load BACL z-dict TSVs + FACL front-door picker (main_nav.py:31-137
    build_dataset equivalents)."""
    from .tools.zdict import load_img_zdict_tsv, load_instr_zdict_tsv

    banks = {}
    if args.instr_zdict_file and (args.do_back_txt or args.do_front_txt):
        # TSV keys follow the reference file schema (instr_direction_*);
        # the rollout consumes the agent-side names (instr_z_direction_*,
        # agent.py:53-64) — rename here like _language_variable does
        for k, v in load_instr_zdict_tsv(args.instr_zdict_file).items():
            banks[k.replace("instr_", "instr_z_", 1)] = v
    if args.img_zdict_file and args.do_back_img:
        img = load_img_zdict_tsv(args.img_zdict_file)
        banks["img_z_features"] = img["img_features"]
        banks["img_z_pzs"] = img["img_pzs"]
    rt["banks"] = banks
    rt["front_picker"] = None
    if args.front_feat_file and (args.do_front_txt or args.do_front_img
                                 or args.do_front_his):
        from .tools.cfp_extract import load_cfp_tsv
        from .tools.kmeans import FrontDoorPicker

        feats = load_cfp_tsv(args.front_feat_file,
                             dim=rt["cfg"].hidden_size)
        rt["front_picker"] = FrontDoorPicker(
            {k: feats[k] for k in ("txt_feats", "vp_feats", "gmap_feats")},
            n_clusters=args.front_n_clusters, seed=args.seed)
    _refresh_front_dict(args, rt)


def _refresh_front_dict(args, rt):
    """Per-cycle front-door resampling (utils/data.py:450-480 +
    main_nav.py picker refresh)."""
    if rt.get("front_picker") is None:
        return
    pick = rt["front_picker"].random_pick()
    names = {"txt_feats": ("front_txt_feats", args.do_front_txt),
             "vp_feats": ("front_vp_feats", args.do_front_img),
             "gmap_feats": ("front_gmap_feats", args.do_front_his)}
    for src, (dst, on) in names.items():
        if on:
            rt["banks"][dst] = pick[src]


def causal_batch(rt, batch, items=None):
    """Attach causal banks (+REVERIE gt object slots) to an episode batch."""
    import jax.numpy as jnp

    from .tools.zdict import broadcast_zdict

    B = int(batch["scan_idx"].shape[0])
    out = dict(batch)
    if rt.get("banks"):
        out.update(broadcast_zdict(rt["banks"], B))
    if items is not None and rt.get("objects") is not None and \
            all("objId" in it for it in items):
        # gt object slot at the goal viewpoint (reverie OG supervision)
        off = 2 + rt["world"].max_cands + 36
        gt_slot = np.full((B,), -1, np.int32)
        offsets, total = {}, 0
        for s in rt["scan_order"]:
            offsets[s] = total
            total += rt["graphs"][s].num_vps
        for b, it in enumerate(items):
            g = rt["graphs"][it["scan"]]
            goal = g.index[it["path"][-1]]
            row = rt["objects"]["oid"][offsets[it["scan"]] + goal]
            hit = np.nonzero(row == int(it["objId"]))[0]
            if len(hit):
                gt_slot[b] = off + int(hit[0])
        out["gt_obj_slot"] = jnp.asarray(gt_slot)
    return out


# ----------------------------------------------------------------------
def run_validation(rt, split: str, max_batches: Optional[int] = None):
    """Greedy decode a whole split -> metrics + per-item predictions
    (main_nav.py:338-391 / agent_base.py:44-67)."""
    import jax

    from .eval.metrics import (eval_item, eval_metrics, reverie_eval_item,
                               reverie_eval_metrics)
    from .rollout.rollout import assemble_trajectories

    batcher = rt["batchers"][split]
    batcher.reset_epoch(shuffle=False)
    fn = rt["rollout"].jitted(feedback="argmax", train_ml=False)
    seen = set()
    per_item, preds = [], []
    objnav = rt["cfg"].is_objnav and rt.get("objects") is not None
    obj2vps = rt.get("obj2vps") or {}
    n_batches = int(np.ceil(batcher.size() / batcher.batch_size))
    if max_batches:
        n_batches = min(n_batches, max_batches)
    for bi in range(n_batches):
        items, batch = batcher.next_batch()
        batch = causal_batch(rt, batch, items)
        out = jax.tree.map(np.asarray, fn(rt["params"], batch,
                                          jax.random.PRNGKey(bi)))
        batch_np = jax.tree.map(np.asarray, batch)
        paths = assemble_trajectories(batch_np, out)
        for b, it in enumerate(items):
            if it["instr_id"] in seen:
                continue
            seen.add(it["instr_id"])
            g = rt["graphs"][it["scan"]]
            gt_local = [g.index[v] for v in it["path"]]
            pred = {"instr_id": it["instr_id"],
                    "trajectory": [[g.vp_ids[v]] for v in paths[b]]}
            if objnav and "objId" in it:
                # REVERIE metrics (reverie/env.py:530-553); obj2vps falls
                # back to the gt goal viewpoint when no mapping is loaded
                goals = obj2vps.get(
                    (it["scan"], str(it["objId"])), [gt_local[-1]])
                pred_oid = int(out.get("pred_obj_id", np.full(1, -1))[b]) \
                    if "pred_obj_id" in out else -1
                per_item.append(reverie_eval_item(
                    g.dist, paths[b], pred_oid, gt_local, goals,
                    it["objId"]))
                pred["pred_objid"] = pred_oid
            else:
                per_item.append(eval_item(g.dist, paths[b], gt_local))
            preds.append(pred)
    agg = reverie_eval_metrics(per_item) if (objnav and per_item
                                             and "rgs" in per_item[0]) \
        else eval_metrics(per_item)
    return agg, preds


def _load_speaker(args, rt):
    """Trained speaker for back-translation (main_nav.py:194-198 loads it
    when --use_transpeaker).  -> (Speaker, params, cfg, features, offsets)."""
    import jax

    from .speaker.model import SpeakerConfig
    from .speaker.speaker import Speaker
    from .train.checkpoint import (load_orbax, load_reference_speaker,
                                   merge_loaded, speaker_torch_to_flax)

    cfg = rt["cfg"]
    scfg = SpeakerConfig(
        vocab_size=cfg.vocab_size,
        feature_size=cfg.image_feat_size + args.speaker_angle_size,
        image_feat_size=cfg.image_feat_size,
        max_decode=min(120, cfg.max_instr_len))
    sp = Speaker(scfg, rng=jax.random.PRNGKey(args.seed + 7))
    params = sp.params
    if args.speaker_ckpt_file:
        path = os.path.abspath(args.speaker_ckpt_file)
        if path.endswith((".pt", ".pth")):
            # reference transpeaker wrapper (transpeaker.py:329-344)
            tree, _ = speaker_torch_to_flax(load_reference_speaker(path))
            params, missing, _ = merge_loaded(params, {"params": tree})
            if missing:
                raise ValueError(
                    f"speaker ckpt left params uncovered: {missing[:5]}")
        else:
            params = load_orbax(path, params)
    features = np.asarray(rt["world"].feat, np.float32)
    offsets, total = {}, 0
    for s in rt["scan_order"]:
        offsets[s] = total
        total += rt["graphs"][s].num_vps
    return sp, params, scfg, features, offsets


def train(args, rt):
    import jax
    import jax.numpy as jnp

    from .train.checkpoint import save_orbax, flax_to_torch
    from .train.trainer import (init_train_state, make_optimizer,
                                make_train_step)
    from .utils.logger import MetricsLogger, RunningMeter, write_to_record_file

    os.makedirs(args.output_dir, exist_ok=True)
    record_file = os.path.join(args.output_dir, "train.log")
    mlog = MetricsLogger(os.path.join(args.output_dir, "metrics.jsonl"),
                         tb_dir=os.path.join(args.output_dir, "tb"))

    aug_batcher = rt["batchers"].get("aug")
    # --accumulate_grad: one optimizer step per GT+aug group
    # (agent.py:407-445 zero_grad/accumulate/optim_step)
    accum = (args.aug_times + 1) if (args.accumulate_grad
                                     and aug_batcher is not None) else 1
    # --use_lr_sch: reference schedules (agent_base.py:125-130); without
    # it the reference (and we) run constant lr
    sch_kw = dict(lr_sch=args.lr_sch, warmup_steps=args.warmup_steps,
                  total_steps=args.iters) if args.use_lr_sch else {}
    tx = make_optimizer(lr=args.lr, grad_clip=args.grad_clip,
                        accumulate_steps=accum, **sch_kw)
    # teacher-forced episodes end within max_gt_len steps — shorten that
    # scan (loss-identical; trainer.py make_train_step docstring).  With
    # --bucket_caps the horizon follows each batch's bucket cap instead.
    if args.bucket_caps.strip():
        th = "auto"
    else:
        th = max((b.max_gt_len for k, b in rt["batchers"].items()
                  if k in ("train", "aug")), default=None)
    step_fn = jax.jit(make_train_step(
        rt["rollout"], tx, train_alg=args.train_alg,
        ml_weight=args.ml_weight,
        sample_feedback="expl_sample" if args.expl_sample else "sample",
        expl_max_ratio=args.expl_max_ratio, remat=args.remat,
        teacher_horizon=th))
    state = init_train_state(rt["params"], tx)
    fused = args.train_alg == "dagger_fused"

    # full-state resume: continue the iteration counter
    # (agent_base.py:205-253 --resume_file semantics)
    start_iter = 0
    from .train.checkpoint import (is_train_state_dir, load_train_state,
                                   save_train_state)

    if args.resume_file and is_train_state_dir(args.resume_file):
        state, start_iter = load_train_state(
            os.path.abspath(args.resume_file), state)
        write_to_record_file(
            f"resumed train state from {args.resume_file} @ iter "
            f"{start_iter}", record_file)

    speaker = None
    if args.use_transpeaker and aug_batcher is not None:
        speaker = _load_speaker(args, rt)
    # data-parallel over all devices when more than one exists (('dp',)
    # mesh; XLA derives the gradient all-reduce from the batch sharding)
    from .parallel.mesh import make_mesh, shard_batch

    mesh = None
    n_dev = len(jax.devices())
    if n_dev > 1 and args.batch_size % n_dev == 0:
        from jax.sharding import NamedSharding, PartitionSpec as P

        mesh = make_mesh()
        state = jax.device_put(state, NamedSharding(mesh, P()))
    elif n_dev > 1:
        print(f"[train] {n_dev} devices but batch_size {args.batch_size} "
              f"not divisible; running on one device")
    batcher = rt["batchers"]["train"]
    meter = RunningMeter("loss")
    # model selection metric (main_nav.py:296-308)
    sel = (lambda m: m["nDTW"] + m["SDTW"]) if args.dataset == "rxr" \
        else (lambda m: m["spl"] + m["sr"])
    best = {"score": -1.0, "iter": 0}

    if args.eval_first:
        for split in ("val_train_seen", "val_seen", "val_unseen"):
            if split in rt["batchers"]:
                rt["params"] = state.params
                m, _ = run_validation(rt, split, max_batches=4)
                write_to_record_file(f"[eval_first] {split}: {m}", record_file)

    from .train.trainer import fuse_dagger_batches

    def one_update(state, items, batch, key, feat_noise=None):
        batch = causal_batch(rt, batch, items)
        if fused:
            # the reference's two DAgger rollouts consume two minibatches
            # (env.reset per rollout, agent_base.py:168-177); the fused
            # step takes both at once, first half teacher-forced
            items2, batch2 = batcher.next_batch()
            batch = fuse_dagger_batches(batch,
                                        causal_batch(rt, batch2, items2))
        if feat_noise is not None:
            batch["feat_noise"] = jnp.asarray(feat_noise)
        if mesh is not None:
            batch = shard_batch(batch, mesh)
        return step_fn(state, batch, key)

    def aug_update(state, key, bt_rng):
        """One aug-env update, optionally with speaker-re-captioned
        instructions + shared feature-dropout noise (agent.py:459-474).
        When fused, both DAgger halves come from the aug batcher and are
        re-captioned in one speaker pass sharing one noise vector."""
        items = aug_batcher.next_minibatch()
        if fused:
            items = items + aug_batcher.next_minibatch()
        noise = None
        if speaker is not None:
            from .speaker.backtranslate import backtranslate, swap_instructions

            sp, sp_params, scfg, features, offsets = speaker
            bt_items = [{**d, "path_local":
                         [rt["graphs"][d["scan"]].index[v]
                          for v in d["path"]]} for d in items]
            toks, noise = backtranslate(
                sp, sp_params, rt["graphs"], features, offsets, bt_items,
                max_steps=rt["cfg"].max_action_len, rng=bt_rng,
                feat_drop=rt["cfg"].feat_dropout,
                angle_feat_size=args.speaker_angle_size,
                image_feat_size=rt["cfg"].image_feat_size)
            items = swap_instructions(items, toks, eos_id=scfg.eos_id,
                                      bos_id=scfg.bos_id)
        if fused:
            half = len(items) // 2
            b1 = causal_batch(rt, aug_batcher.make_batch(items[:half]),
                              items[:half])
            b2 = causal_batch(rt, aug_batcher.make_batch(items[half:]),
                              items[half:])
            batch = fuse_dagger_batches(b1, b2)
            if noise is not None:
                batch["feat_noise"] = jnp.asarray(noise)
            if mesh is not None:
                batch = shard_batch(batch, mesh)
            return step_fn(state, batch, key)
        batch = aug_batcher.make_batch(items)
        return one_update(state, items, batch, key, feat_noise=noise)

    per = args.aug_times + 1
    # fast-forward the (seeded, deterministic) batch iterators so a resumed
    # run sees the same data sequence as the uninterrupted one
    pulls = 2 if fused else 1  # minibatches consumed per update
    if start_iter:
        if aug_batcher is None:
            for _ in range(start_iter * pulls):
                batcher.next_minibatch()
        else:
            for _ in range(start_iter // per):
                for _ in range(pulls):
                    batcher.next_minibatch()
                for _ in range(args.aug_times * pulls):
                    aug_batcher.next_minibatch()

    t0 = time.time()
    it = start_iter
    while it < args.iters:
        interval = min(args.log_every, args.iters - it)
        cycle_losses = []
        if aug_batcher is None:
            consumed = interval
            for j in range(interval):
                items, batch = batcher.next_batch()
                state, metrics = one_update(state, items, batch,
                                            jax.random.PRNGKey(it + j))
                # keep the loss on device: float() here would sync every
                # iteration and serialize host packing into the step time
                cycle_losses.append(metrics["loss"])
        else:
            # GT/aug interleave: 1 train update + aug_times aug updates per
            # group (main_nav.py:220-252); each update counts as one iter
            groups = max(interval // per, 1)
            consumed = groups * per
            for j in range(groups):
                base = it + j * per
                items, batch = batcher.next_batch()
                state, metrics = one_update(state, items, batch,
                                            jax.random.PRNGKey(base))
                cycle_losses.append(metrics["loss"])
                for k in range(args.aug_times):
                    state, metrics = aug_update(
                        state, jax.random.PRNGKey(base + 1 + k),
                        jax.random.PRNGKey(7_000_003 + base + k))
                    cycle_losses.append(metrics["loss"])
        for v in jax.device_get(cycle_losses):
            meter(float(v))
        step = it + consumed
        mlog.set_step(step)
        mlog.log_scalar_dict({"loss": meter.val,
                              "grad_norm": float(metrics["grad_norm"]),
                              "node_overflow":
                                  float(metrics.get("node_overflow", 0))},
                             prefix="train")
        write_to_record_file(
            f"iter {step}: loss {meter.val:.4f} "
            f"({(time.time()-t0)/max(step,1)*1000:.0f} ms/iter)", record_file)

        rt["params"] = state.params
        scores = {}
        for split in ("val_train_seen", "val_seen", "val_unseen"):
            if split in rt["batchers"]:
                m, _ = run_validation(rt, split)
                scores[split] = m
                mlog.log_scalar_dict(m, prefix=split)
                write_to_record_file(f"  {split}: {m}", record_file)
        save_orbax(os.path.abspath(
            os.path.join(args.output_dir, "ckpt_latest")), state.params)
        # full state (params+opt_state+step) for kill-and-resume
        save_train_state(os.path.abspath(
            os.path.join(args.output_dir, "train_state_latest")), state)
        if args.save_torch_ckpt:
            _save_torch(state.params,
                        os.path.join(args.output_dir, "latest_dict.pt"), step)
        if "val_unseen" in scores and sel(scores["val_unseen"]) > best["score"]:
            best = {"score": sel(scores["val_unseen"]), "iter": step}
            save_orbax(os.path.abspath(
                os.path.join(args.output_dir, "ckpt_best_val_unseen")),
                state.params)
            write_to_record_file(f"  new best @ {step}: {best['score']:.2f}",
                                 record_file)
        _refresh_front_dict(args, rt)  # per-cycle FACL resampling
        # fire on every update_iter boundary crossed within this cycle
        # (steps only take multiples of log_every)
        if args.z_instr_update and \
                step // args.update_iter > it // args.update_iter:
            _update_zdict(args, rt, state.params, record_file)
        it = step
    return state


def _update_zdict(args, rt, params, record_file):
    """Online BACL instruction z-dict refresh (main_nav.py:192,311-324 +
    agent.update_z_dict)."""
    from .tools.zdict import WordPicker, update_instr_zdict
    from .utils.logger import write_to_record_file

    data = rt["batchers"]["train"].data
    if not data or "instruction" not in data[0]:
        return
    picker = WordPicker(cat_file=args.cat_file)
    if args.tokenizer_vocab:
        # reference-exact harvest walk (agent.py:778-799): subword tokens
        # from the encoding via the tokenizer vocab, '#'-prefix
        # continuation rule (BERT '##...' skipped; RoBERTa 'Ġ...' tokens
        # never match, reproducing the reference's roberta behavior)
        import json as _json

        from .tools.zdict import subword_tokens_of

        with open(args.tokenizer_vocab, encoding="utf-8") as f:
            vocab = _json.load(f)
        id_to_token = {int(v): k for k, v in vocab.items()}
        tokens_of = lambda d: subword_tokens_of(d["instr_encoding"],
                                                id_to_token)
        is_cont = lambda t: t.startswith("#")
    else:
        # tokenizer-free fallback: whitespace words, no continuations
        tokens_of = lambda d: d["instruction"].split()
        is_cont = lambda t: False
    zd, lm_f, dr_f, lm_pz, dr_pz = update_instr_zdict(
        rt["model"], params, data[:512], picker,
        tokens_of=tokens_of,
        is_continuation=is_cont,
        max_len=min(rt["cfg"].max_instr_len, 64))
    for k, v in zd["instr_zdict"].items():
        if len(v):
            rt["banks"][k.replace("instr_", "instr_z_", 1)] = v
    from .tools.zdict import save_instr_zdict_tsv

    out = os.path.join(args.output_dir, "backdoor_update_features.tsv")
    save_instr_zdict_tsv(out, lm_f, dr_f, lm_pz, dr_pz)
    write_to_record_file(f"  z-dict refreshed: {len(lm_f)} landmarks, "
                         f"{len(dr_f)} directions -> {out}", record_file)


def _save_torch(params, path: str, epoch: int):
    import torch

    from .train.checkpoint import flax_to_torch

    sd = {k: torch.from_numpy(np.asarray(v))
          for k, v in flax_to_torch(params).items()}
    torch.save({"vln_bert": {"epoch": epoch, "state_dict": sd}}, path)


def valid(args, rt):
    from .utils.logger import write_to_record_file

    os.makedirs(args.output_dir, exist_ok=True)
    record_file = os.path.join(args.output_dir, "valid.log")
    for split in ("val_train_seen", "val_seen", "val_unseen", "test"):
        if split not in rt["batchers"]:
            continue
        t0 = time.time()
        m, preds = run_validation(rt, split)
        # gather sharded predictions across processes
        # (merge_dist_results, utils/distributed.py:160)
        from .parallel.distributed import (all_gather_objects,
                                           merge_dist_results, process_index)

        preds = merge_dist_results(all_gather_objects(preds))
        # no gt paths on the test split: dump predictions only
        # (main_nav.py:376-385 guards eval_metrics the same way)
        write_to_record_file(
            f"{split} ({time.time()-t0:.1f}s): "
            f"{'predictions only' if split == 'test' else m}", record_file)
        if args.submit and process_index() == 0:
            out = os.path.join(args.output_dir, f"submit_{split}.json")
            with open(out, "w") as f:
                json.dump(preds, f)
            write_to_record_file(f"wrote {out}", record_file)


def extract_cfp(args, rt):
    from .pretrain.data import PretrainShapes, TrajBatchBuilder, \
        items_from_dataset
    from .tools.cfp_extract import extract_cfp_features

    shapes = PretrainShapes(
        max_txt_len=min(rt["cfg"].max_instr_len, 64),
        max_steps=min(rt["cfg"].max_action_len + 1, 12),
        max_cands=args.max_cands, max_gmap=args.num_nodes)
    features = np.asarray(rt["world"].feat)
    builder = TrajBatchBuilder(rt["graphs"], rt["scan_order"], features,
                               shapes, seed=args.seed)
    items = items_from_dataset(rt["batchers"]["train"].data, rt["graphs"])
    out_tsv = os.path.join(args.output_dir,
                           f"{args.dataset}_cfp_features.tsv")
    os.makedirs(args.output_dir, exist_ok=True)
    feats = extract_cfp_features(rt["model"], rt["params"], builder, items,
                                 out_tsv=out_tsv)
    print(f"wrote {out_tsv}: {feats['txt_feats'].shape[0]} trajectories")


def train_speaker(args, rt):
    """Speaker training with BLEU-gated model selection
    (reverie/main_nav_obj.py:258-404 + bleu gate :338-371)."""
    import jax
    import jax.numpy as jnp

    from .eval.bleu import corpus_bleu
    from .speaker.model import SpeakerConfig
    from .speaker.speaker import Speaker, build_path_batch
    from .train.checkpoint import save_orbax
    from .utils.logger import write_to_record_file

    cfg = rt["cfg"]
    record = os.path.join(args.output_dir, "speaker.log")
    scfg = SpeakerConfig(
        vocab_size=cfg.vocab_size,
        feature_size=cfg.image_feat_size + args.speaker_angle_size,
        image_feat_size=cfg.image_feat_size,
        max_decode=min(120, cfg.max_instr_len))
    sp = Speaker(scfg, rng=jax.random.PRNGKey(args.seed))
    step_fn, opt_state = sp.make_train_step(lr=args.speaker_lr)
    params = sp.params

    graphs = rt["graphs"]
    features = np.asarray(rt["world"].feat, np.float32)
    offsets = {}
    total = 0
    for s in rt["scan_order"]:
        offsets[s] = total
        total += graphs[s].num_vps

    def to_items(data):
        return [{**d, "path_local": [graphs[d["scan"]].index[v]
                                     for v in d["path"]]} for d in data]

    def make_speaker_batch(items, L):
        fb = build_path_batch(graphs, features, offsets, items,
                              max_steps=cfg.max_action_len,
                              angle_feat_size=args.speaker_angle_size,
                              image_feat_size=cfg.image_feat_size)
        toks = np.zeros((len(items), L + 1), np.int32)
        for i, it in enumerate(items):
            enc = [scfg.bos_id] + list(it["instr_encoding"])[:L - 1]
            enc.append(scfg.eos_id)
            toks[i, :len(enc)] = enc
        import jax.numpy as jnp
        return {**jax.tree.map(jnp.asarray, fb), "tokens": jnp.asarray(toks)}

    train_items = to_items(rt["batchers"]["train"].data)
    L = min(cfg.max_instr_len, 60)
    rng = np.random.default_rng(args.seed)
    # id -> surface-token decode for text-level SPICE (the speaker emits
    # model-vocab ids; --tokenizer_vocab is the HF vocab.json for them)
    id2tok = None
    if args.tokenizer_vocab:
        import json as _json

        with open(args.tokenizer_vocab, encoding="utf-8") as f:
            id2tok = {v: k for k, v in _json.load(f).items()}

    def _decode(ids):
        words = [id2tok.get(int(i), "") for i in ids]
        return "".join(w.replace("Ġ", " ") for w in words).strip()

    best_bleu = -1.0
    for it in range(args.speaker_iters):
        idx = rng.integers(0, len(train_items), args.batch_size)
        batch = make_speaker_batch([train_items[i] for i in idx], L)
        params, opt_state, loss = step_fn(params, opt_state, batch,
                                          jax.random.PRNGKey(it))
        if (it + 1) % max(args.log_every // 10, 1) == 0:
            # BLEU + SPICE gates on val splits (the reference logs BLEU-4
            # via reverie/spice_scorer.py:28; SPICE is the metric that
            # filename promises — see eval/spice.py)
            from .eval.spice import SpiceScorer, spice_from_ids

            hyps, refs = [], []
            for split in ("val_seen", "val_unseen"):
                if split not in rt["batchers"]:
                    continue
                v_items = to_items(rt["batchers"][split].data)[:32]
                vb = make_speaker_batch(v_items, L)
                toks = np.asarray(sp.infer(params, vb))
                for row, item in zip(toks, v_items):
                    seq = list(row)
                    if scfg.eos_id in seq:
                        seq = seq[:seq.index(scfg.eos_id)]
                    hyps.append(seq)
                    refs.append([list(item["instr_encoding"])])
            bleu4, _ = corpus_bleu(hyps, refs, smooth=True)
            if id2tok is not None:
                # real vocab: decode to text and score scene-graph tuples
                data = [{"Inference": [_decode(h)],
                         "Ground Truth": [_decode(r[0])]}
                        for h, r in zip(hyps, refs)]
                spice, _ = SpiceScorer().compute_scores(data)
            else:
                spice = float(np.mean([spice_from_ids(h, r)
                                       for h, r in zip(hyps, refs)])) \
                    if hyps else 0.0
            write_to_record_file(
                f"speaker iter {it+1}: loss {float(loss):.4f} "
                f"bleu4 {bleu4:.4f} spice {spice:.4f}", record)
            if bleu4 > best_bleu:
                best_bleu = bleu4
                save_orbax(os.path.abspath(os.path.join(
                    args.output_dir, "speaker_best")), params)
    return params


def main(argv=None):
    args = parse_args(argv)
    from .utils.misc import set_seed

    try:
        jax.config.update("jax_default_prng_impl", args.prng)
    except Exception:
        pass  # keys already created with another impl (embedded use)

    if args.num_processes and args.num_processes > 1:
        # multi-host rendezvous (replaces file:// NCCL init,
        # utils/distributed.py:56-61); validation splits shard per process
        from .parallel.distributed import init_distributed

        init_distributed(args.coordinator, args.num_processes,
                         args.process_id)
    set_seed(args.seed)
    os.makedirs(args.output_dir, exist_ok=True)
    # snapshot the config like the reference run dirs (utils/save.py:12-20)
    with open(os.path.join(args.output_dir, "args.json"), "w") as f:
        json.dump(vars(args), f, indent=2)

    rt = build_runtime(args)
    if args.mode == "train":
        train(args, rt)
    elif args.mode == "valid":
        valid(args, rt)
    elif args.mode == "speaker":
        train_speaker(args, rt)
    else:
        extract_cfp(args, rt)


if __name__ == "__main__":
    main()
