"""Golden parity of the PRE-TRAINING stack vs the reference oracle
(pretrain_src imported from /root/reference at test time; skipped if
absent).

This pins the hardest vectorization: the dict-keyed trajectory->gmap
feature aggregation (vilmodel_goat.py:430-468) vs our index-map scatter,
plus the SAP fused-logits loop and CFP pooling, through the checkpoint
converter.
"""
import math
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference/pretrain_src"
pytestmark = [pytest.mark.slow, pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference repo not mounted")]

import jax
import jax.numpy as jnp

from vln_goat_tpu.config import GoatConfig
from vln_goat_tpu.core import geometry as G
from vln_goat_tpu.pretrain.data import PretrainShapes, TrajBatchBuilder, \
    items_from_dataset
from vln_goat_tpu.pretrain.model import GoatPretrainModel
from vln_goat_tpu.rollout.env import make_synthetic_dataset
from vln_goat_tpu.sim.graph_sim import make_synthetic_scan
from vln_goat_tpu.train.checkpoint import torch_to_flax

H, HEADS, FF, VOCAB, DF = 64, 4, 128, 120, 32
TASKS = ("mlm", "mrc", "sap", "cfp")


def _ref_config():
    from transformers import PretrainedConfig

    c = PretrainedConfig()
    c.attn_implementation = "eager"
    c._attn_implementation = "eager"
    c.vocab_size = VOCAB
    c.hidden_size = H
    c.num_attention_heads = HEADS
    c.intermediate_size = FF
    c.max_position_embeddings = 80
    c.type_vocab_size = 1
    c.pad_token_id = 1
    c.layer_norm_eps = 1e-5
    c.hidden_act = "gelu"
    c.hidden_dropout_prob = 0.0
    c.attention_probs_dropout_prob = 0.0
    c.initializer_range = 0.02
    c.is_decoder = False
    c.add_cross_attention = False
    c.chunk_size_feed_forward = 0
    c.num_l_layers = 1
    c.num_pano_layers = 1
    c.num_x_layers = 1
    c.num_top_layer = 1
    c.num_hidden_layers = 1
    c.name = "R2R"
    c.max_action_steps = 20
    c.image_feat_size = DF
    c.angle_feat_size = 4
    c.obj_feat_size = 0
    c.obj_name_vocab_size = 45
    c.use_obj_name = False
    c.graph_sprels = True
    c.glocal_fuse = True
    c.update_lang_bert = True
    c.adaptive_pano_fusion = True
    c.do_back_img = False
    c.do_back_txt = False
    c.do_front_txt = False
    c.do_back_txt_type = "type_2"
    c.do_add_method = "door"
    c.z_cross_attn = False
    c.pretrain_tasks = list(TASKS)
    c.image_prob_size = 16
    c.obj_prob_size = 0
    c.cfp_temperature = 1.0
    c.empty_cache = False
    c.cuda_first_device = 0
    c.use_lang2visn_attn = False
    return c


def _our_config():
    return GoatConfig(
        dataset="r2r", name="R2R", vocab_size=VOCAB, hidden_size=H,
        num_attention_heads=HEADS, intermediate_size=FF,
        max_position_embeddings=80, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, num_l_layers=1, num_pano_layers=1,
        num_x_layers=1, image_feat_size=DF, max_action_steps=20,
        graph_sprels=True, glocal_fuse=True, adaptive_pano_fusion=True,
        feat_dropout=0.0, cfp_temperature=1.0,
    )


@pytest.fixture(scope="module")
def oracle():
    sys.path.insert(0, REF)
    import transformers.modeling_utils as mu
    if not hasattr(mu, "apply_chunking_to_forward"):
        from transformers.pytorch_utils import apply_chunking_to_forward
        mu.apply_chunking_to_forward = apply_chunking_to_forward
    # pretrain_goat imports data.common (pynvml) — only used when
    # empty_cache is on; stub it if missing
    try:
        from model.pretrain_goat import GlocalTextPathCMTPreTraining
    except ModuleNotFoundError:
        import types

        fake = types.ModuleType("data.common")
        fake.check_gpu_mem_usedRate = lambda *a, **k: (0, 0.0, 1)
        sys.modules.setdefault("data", types.ModuleType("data"))
        sys.modules["data.common"] = fake
        from model.pretrain_goat import GlocalTextPathCMTPreTraining

    torch.manual_seed(0)
    cfg = _ref_config()
    tm = GlocalTextPathCMTPreTraining(cfg).eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    variables = torch_to_flax(sd)
    ours = GoatPretrainModel(_our_config(), tasks=TASKS, image_prob_size=16)

    # fixture world + static batch.  Candidates sharing a nearest view are
    # dropped so every step packs exactly 36 views — otherwise the
    # reference's ragged pano pack pads shorter steps and its UNMASKED
    # adaptive-fusion/pooling softmaxes (vilmodel_goat.py:310-ish,
    # pretrain_goat.py:501-515) make its outputs depend on that padding
    # (the divergence we deliberately fixed; see models/panorama.py).
    g = make_synthetic_scan("gp0", num_vps=12, seed=11)
    for v in range(g.num_vps):
        keep = []
        seen = set()
        for k in range(g.cand_local.shape[1]):
            if not g.cand_mask[v, k]:
                continue
            pt = int(g.cand_ptid[v, k])
            if pt not in seen:
                seen.add(pt)
                keep.append(k)
        for arr in (g.cand_local, g.cand_ptid, g.cand_heading, g.cand_elev,
                    g.cand_dist, g.cand_mask):
            packed = arr[v, keep].copy()
            arr[v] = 0 if arr.dtype != np.int32 else -1
            arr[v, :len(keep)] = packed
        g.cand_mask[v] = False
        g.cand_mask[v, :len(keep)] = True
    graphs = {"gp0": g}
    feats = np.random.default_rng(3).standard_normal(
        (g.num_vps, 36, DF)).astype(np.float32)
    shapes = PretrainShapes(max_txt_len=16, max_steps=4, max_cands=16,
                            max_gmap=24, max_mlm=4, mrc_prob_dim=16)
    builder = TrajBatchBuilder(graphs, ["gp0"], feats, shapes,
                               vocab_size=VOCAB, seed=0)
    data = make_synthetic_dataset(graphs, 3, vocab_size=VOCAB - 1,
                                  path_len=(3, 4), max_instr_len=14, seed=12)
    items = items_from_dataset(data, graphs)
    return dict(tm=tm, variables=variables, ours=ours, builder=builder,
                items=items, g=g, feats=feats, shapes=shapes)


def _ragged_from_static(o, ex):
    """Rebuild the reference's ragged inputs from one static example +
    the underlying tables (same data, two layouts)."""
    g, feats, sh = o["g"], o["feats"], o["shapes"]
    K = sh.max_cands
    T = int(ex["traj_len"])

    step_views, step_lens, cand_vpids, vpids = [], [], [], []
    loc_rows = []
    nav_types = []
    # recover per-step vp from gmap_visited_step
    slot_of_step = {}
    for slot in range(sh.max_gmap):
        t = int(ex["gmap_visited_step"][slot])
        if t >= 0:
            slot_of_step.setdefault(t, slot)

    # vp ids per gmap slot: visited slots carry step ids; the builder placed
    # [stop]+visited+unvisited in insertion order — we rebuild names
    # per step from the static arrays instead of the graph
    for t in range(T):
        vm = ex["traj_view_masks"][t]
        n_cand = int(ex["traj_nav_types"][t][:K].sum())
        rows = list(range(n_cand)) + \
            [K + ix for ix in range(36) if vm[K + ix]]
        step_views.append(np.stack([ex["traj_view_img_fts"][t][r]
                                    for r in rows], 0))
        loc_rows.append(np.stack([ex["traj_loc_fts"][t][r] for r in rows], 0))
        nav_types.append([1] * n_cand + [0] * (len(rows) - n_cand))
        step_lens.append(len(rows))
        cand_vpids.append([f"c{t}_{k}" for k in range(n_cand)])
    return dict(step_views=step_views, loc_rows=loc_rows,
                nav_types=nav_types, step_lens=step_lens,
                cand_vpids=cand_vpids)


def _build_ref_kwargs(o, ex_batch, items):
    """Rebuild the reference's ragged kwargs from a static batch (same
    underlying episode, two layouts).  Returns (kwargs, aux) where aux
    carries gmap_lens / vp_rows / txt lens / per-step view row maps."""
    B = ex_batch["scan_idx"].shape[0]
    sh = o["shapes"]
    K = sh.max_cands
    g = o["g"]
    # the reference packs text ragged to max(txt_lens)
    lens_np = ex_batch["txt_masks"].sum(1).astype(np.int64)
    txt_ids = torch.from_numpy(
        ex_batch["txt_ids"][:, :int(lens_np.max())].astype(np.int64))
    txt_lens = torch.from_numpy(lens_np)

    Lo = sh.max_objs if ex_batch.get("traj_obj_img_fts") is not None else 0
    all_views, all_locs, all_nav, vp_view_lens = [], [], [], []
    all_objs, all_obj_names, vp_obj_lens = [], [], []
    step_lens, traj_vpids, traj_cand_vpids, gmap_vpids = [], [], [], []
    gmap_lens = []
    row_maps = []        # per (b): static slot -> ragged view row, end step
    for b in range(B):
        ex = {k: v[b] for k, v in ex_batch.items()}
        T = int(ex["traj_len"])
        step_lens.append(T)
        item = items[b]
        path = item["path_local"][:T]
        traj_vpids.append([str(v) for v in path])
        cands_per_step = []
        for t, vp in enumerate(path):
            n_cand = int(g.cand_mask[vp].sum())
            vm = ex["traj_view_masks"][t]
            rows = list(range(n_cand)) + \
                [K + ix for ix in range(36) if vm[K + ix]]
            all_views.append(np.stack(
                [ex["traj_view_img_fts"][t][r] for r in rows], 0))
            loc_rows = rows + [K + 36 + j for j in range(Lo)] if Lo else rows
            all_locs.append(np.stack(
                [ex["traj_loc_fts"][t][r] for r in loc_rows], 0))
            all_nav.append([1] * n_cand + [0] * (len(rows) - n_cand)
                           + [2] * Lo)
            vp_view_lens.append(len(rows))
            if Lo:
                all_objs.append(np.asarray(ex["traj_obj_img_fts"][t]))
                all_obj_names.append(
                    np.asarray(ex["traj_obj_names"][t], np.int64))
                vp_obj_lens.append(Lo)
            cands_per_step.append(
                [str(int(w)) for w in g.cand_local[vp][:n_cand]])
            if t == T - 1:
                row_maps.append({r: i for i, r in enumerate(rows)})
        traj_cand_vpids.append(cands_per_step)

        # gmap vp names per slot: visited slots -> path[t]; unvisited ->
        # re-derive insertion order exactly like the builder
        visited_step = {}
        unvisited = {}
        for t, vp in enumerate(path):
            visited_step[vp] = t
            unvisited.pop(vp, None)
            for w in [int(x) for x in
                      g.cand_local[vp][:int(g.cand_mask[vp].sum())]]:
                if w not in visited_step:
                    unvisited[w] = True
        names = [None] + [str(v) for v in visited_step] + \
            [str(v) for v in unvisited]
        gmap_vpids.append(names)
        gmap_lens.append(len(names))

    maxlen = max(vp_view_lens)

    def pad_stack(arrs, width):
        out = np.zeros((len(arrs), width) + arrs[0].shape[1:], np.float32)
        for i, a in enumerate(arrs):
            out[i, :len(a)] = a
        return out

    t_views = torch.from_numpy(pad_stack(all_views, maxlen))
    loc_maxlen = max(len(a) for a in all_locs)
    t_locs = torch.from_numpy(pad_stack(all_locs, loc_maxlen))
    nav_pad = np.zeros((len(all_nav), loc_maxlen), np.int64)
    for i, a in enumerate(all_nav):
        nav_pad[i, :len(a)] = a
    t_nav = torch.from_numpy(nav_pad)
    t_vp_view_lens = torch.from_numpy(np.asarray(vp_view_lens, np.int64))
    t_objs = t_obj_names = t_vp_obj_lens = None
    if Lo:
        t_objs = torch.from_numpy(pad_stack(all_objs, Lo))
        onames = np.zeros((len(all_obj_names), Lo), np.int64)
        for i, a in enumerate(all_obj_names):
            onames[i, :len(a)] = a
        t_obj_names = torch.from_numpy(onames)
        t_vp_obj_lens = torch.from_numpy(np.asarray(vp_obj_lens, np.int64))

    Gm = max(gmap_lens)
    gmap_step_ids = torch.from_numpy(
        ex_batch["gmap_step_ids"][:, :Gm].astype(np.int64))
    gmap_pos_fts = torch.from_numpy(ex_batch["gmap_pos_fts"][:, :Gm])
    gmap_pair = torch.from_numpy(ex_batch["gmap_pair_dists"][:, :Gm, :Gm])
    gmap_visited = torch.from_numpy(ex_batch["gmap_visited_masks"][:, :Gm])
    t_gmap_lens = torch.from_numpy(np.asarray(gmap_lens, np.int64))

    # vp_pos_fts ragged: [stop] + cand rows + unused-view rows
    vp_rows = []
    for b in range(B):
        ex = {k: v[b] for k, v in ex_batch.items()}
        T = int(ex["traj_len"])
        vp = items[b]["path_local"][:T][-1]
        n_cand = int(g.cand_mask[vp].sum())
        vm = ex["traj_view_masks"][T - 1]
        rows = [0] + [1 + r for r in range(n_cand)] + \
            [1 + K + ix for ix in range(36) if vm[K + ix]] + \
            [1 + K + 36 + j for j in range(Lo)]
        vp_rows.append(np.stack([ex["vp_pos_fts"][r] for r in rows], 0))
    vp_maxlen = max(len(r) for r in vp_rows)
    t_vp_pos = torch.from_numpy(pad_stack(vp_rows, vp_maxlen))

    kwargs = dict(
        txt_ids=txt_ids, txt_lens=txt_lens, traj_view_img_fts=t_views,
        traj_obj_img_fts=t_objs, traj_loc_fts=t_locs, traj_nav_types=t_nav,
        traj_step_lens=step_lens, traj_vp_view_lens=t_vp_view_lens,
        traj_vp_obj_lens=t_vp_obj_lens, traj_vpids=traj_vpids,
        traj_cand_vpids=traj_cand_vpids, gmap_lens=t_gmap_lens,
        gmap_step_ids=gmap_step_ids, gmap_pos_fts=gmap_pos_fts,
        gmap_pair_dists=gmap_pair, gmap_vpids=gmap_vpids,
        vp_pos_fts=t_vp_pos,
    )
    if Lo:
        kwargs["traj_reverie_obj_names"] = t_obj_names
    aux = dict(gmap_lens=gmap_lens, gmap_visited=gmap_visited,
               vp_rows=vp_rows, lens_np=lens_np, row_maps=row_maps, Lo=Lo)
    return kwargs, aux


def test_pretrain_sap_and_cfp_parity(oracle):
    """End-to-end SAP logits + CFP pooled outputs: reference ragged inputs
    vs our static batch, same underlying episode."""
    o = oracle
    builder, items = o["builder"], o["items"]
    items = items[:2]
    ex_batch = builder.build_batch(items, task="cfp")  # pos end vps
    B = 2
    g = o["g"]
    sh = o["shapes"]
    K = sh.max_cands
    kwargs, aux = _build_ref_kwargs(o, ex_batch, items)
    gmap_lens, gmap_visited = aux["gmap_lens"], aux["gmap_visited"]
    vp_rows, lens_np = aux["vp_rows"], aux["lens_np"]
    Gm = max(gmap_lens)

    tm = o["tm"]
    with torch.no_grad():
        ref_g, ref_l, ref_f, _, _ = tm.forward_sap(
            **kwargs, gmap_visited_masks=gmap_visited,
            global_act_labels=torch.zeros(B, dtype=torch.long),
            local_act_labels=torch.zeros(B, dtype=torch.long),
            compute_loss=False)

    ours_batch = jax.tree.map(jnp.asarray, ex_batch)
    gl, ll, fused = o["ours"].apply(
        o["variables"], ours_batch, method=GoatPretrainModel.forward_sap)

    for name, ref_t, our_t, width in [("global", ref_g, gl, Gm),
                                      ("fused", ref_f, fused, Gm)]:
        r = ref_t.numpy()
        ot = np.asarray(our_t)[:, :Gm]
        for b in range(B):
            n = gmap_lens[b]
            rb, ob = r[b, :n], ot[b, :n]
            finite = np.isfinite(rb)
            assert (finite == np.isfinite(ob)).all(), (name, b)
            np.testing.assert_allclose(ob[finite], rb[finite], atol=1e-4,
                                       rtol=1e-3, err_msg=f"{name} b={b}")

    # local logits: compare stop + candidate slots (slot j+1 <-> our 1+k)
    rl = ref_l.numpy()
    ol = np.asarray(ll)
    for b in range(B):
        ex = {k: v[b] for k, v in ex_batch.items()}
        T = int(ex["traj_len"])
        vp = items[b]["path_local"][:T][-1]
        n_cand = int(g.cand_mask[vp].sum())
        np.testing.assert_allclose(ol[b, 0], rl[b, 0], atol=1e-4, rtol=1e-3)
        np.testing.assert_allclose(ol[b, 1:1 + n_cand], rl[b, 1:1 + n_cand],
                                   atol=1e-4, rtol=1e-3)

    # ---- CFP pooled outputs ----
    with torch.no_grad():
        rg, rv, rf, rt = tm.forward_cfp(
            **kwargs, gmap_visited_masks=gmap_visited,
            global_act_labels=None, local_act_labels=None,
            compute_loss=False, extra_heads=True)
    og, ov, ofu, ot = o["ours"].apply(
        o["variables"], ours_batch, method=GoatPretrainModel.forward_cfp,
        extra_heads=True)
    # documented divergence: the reference CFP pooling softmax runs over
    # padded tokens too (pretrain_goat.py:501-515), ours is masked — so the
    # outputs agree exactly only for batch rows with no padding in that
    # modality. Compare those rows; shorter rows are reference-pad-dependent.
    txt_l = lens_np
    full_txt = txt_l == txt_l.max()
    full_gmap = np.asarray(gmap_lens) == max(gmap_lens)
    vp_l = np.asarray([len(r) for r in vp_rows])
    full_vp = vp_l == vp_l.max()
    assert full_txt.any() and full_gmap.any() and full_vp.any()
    np.testing.assert_allclose(np.asarray(ot)[full_txt],
                               rt.numpy()[full_txt], atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(og)[full_gmap],
                               rg.numpy()[full_gmap], atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(ov)[full_vp],
                               rv.numpy()[full_vp], atol=1e-4, rtol=1e-3)
    both = full_gmap & full_vp
    if both.any():
        np.testing.assert_allclose(np.asarray(ofu)[both],
                                   rf.numpy()[both], atol=1e-4, rtol=1e-3)

    # ---- MLM text streams (vilmodel_goat.forward_mlm:597-648: text as
    # query over gmap/vp keys, summed) ----
    kw = kwargs
    with torch.no_grad():
        ref_txt = o["tm"].bert.forward_mlm(
            kw["txt_ids"], kw["txt_lens"], kw["traj_view_img_fts"], None,
            kw["traj_loc_fts"], kw["traj_nav_types"], kw["traj_step_lens"],
            kw["traj_vp_view_lens"], None, kw["traj_vpids"],
            kw["traj_cand_vpids"], kw["gmap_lens"], kw["gmap_step_ids"],
            kw["gmap_pos_fts"], kw["gmap_pair_dists"], kw["gmap_vpids"],
            kw["vp_pos_fts"])
        # project two positions through the tied MLM head
        pos = torch.tensor([[1, 2], [1, 2]])
        gathered = ref_txt[torch.arange(B)[:, None], pos]
        ref_logits = o["tm"].mlm_head(gathered)

    mlm_batch = dict(ex_batch)
    mlm_batch["mlm_pos"] = np.asarray([[1, 2], [1, 2]], np.int32)
    mlm_batch["mlm_tgt"] = np.zeros((B, 2), np.int32)
    our_logits = o["ours"].apply(
        o["variables"], jax.tree.map(jnp.asarray, mlm_batch),
        method=GoatPretrainModel.forward_mlm)
    np.testing.assert_allclose(np.asarray(our_logits),
                               ref_logits.numpy(), atol=2e-4, rtol=1e-3)


def test_pretrain_mrc_parity(oracle):
    """MRC golden parity vs pretrain_goat.forward_mrc (:226-284): masked
    view inputs -> RegionClassification logits + gathered soft targets."""
    o = oracle
    builder, items = o["builder"], o["items"]
    items = items[:2]
    ex_batch = builder.build_batch(items, task="mrc")
    B = 2
    sh = o["shapes"]
    kwargs, aux = _build_ref_kwargs(o, ex_batch, items)
    row_maps = aux["row_maps"]

    # ragged mrc mask + soft-label targets for the END step (36 view rows
    # in the fixture world: all candidates own distinct views)
    view_len = 36
    masks = np.zeros((B, view_len), bool)
    probs = np.zeros((B, view_len, sh.mrc_prob_dim), np.float32)
    for b in range(B):
        for slot, row in row_maps[b].items():
            masks[b, row] = ex_batch["mrc_masks"][b, slot]
            probs[b, row] = ex_batch["mrc_targets"][b, slot]
    assert masks.any()

    tm = o["tm"]
    with torch.no_grad():
        ref_pred, ref_tgt, _, _ = tm.forward_mrc(
            **kwargs,
            vp_view_mrc_masks=torch.from_numpy(masks),
            vp_view_probs=torch.from_numpy(probs),
            vp_obj_mrc_masks=None, vp_obj_probs=None, compute_loss=False)

    ours_batch = jax.tree.map(jnp.asarray, ex_batch)
    our_logits = np.asarray(o["ours"].apply(
        o["variables"], ours_batch, method=GoatPretrainModel.forward_mrc))

    # reference gathers masked rows in (b, row) order
    ref_rows = ref_pred.numpy()
    ref_tgts = ref_tgt.numpy()
    i = 0
    for b in range(B):
        inv = {row: slot for slot, row in row_maps[b].items()}
        for row in range(view_len):
            if masks[b, row]:
                slot = inv[row]
                np.testing.assert_allclose(
                    our_logits[b, slot], ref_rows[i], atol=1e-4, rtol=1e-3,
                    err_msg=f"mrc pred b={b} row={row}")
                np.testing.assert_allclose(
                    ex_batch["mrc_targets"][b, slot], ref_tgts[i],
                    atol=1e-6, err_msg=f"mrc tgt b={b} row={row}")
                i += 1
    assert i == masks.sum()

    # loss parity: KL summed per masked row, averaged over rows
    our_loss, _ = o["ours"].apply(
        o["variables"], ours_batch, method=GoatPretrainModel.mrc_loss)
    with torch.no_grad():
        ref_losses = tm.forward_mrc(
            **kwargs,
            vp_view_mrc_masks=torch.from_numpy(masks),
            vp_view_probs=torch.from_numpy(probs),
            vp_obj_mrc_masks=None, vp_obj_probs=None, compute_loss=True)
    np.testing.assert_allclose(float(our_loss),
                               float(ref_losses.mean()), atol=1e-4,
                               rtol=1e-3)


# ----------------------------------------------------------------------
# OG (REVERIE object grounding) oracle
@pytest.fixture(scope="module")
def oracle_obj(oracle):
    """REVERIE-config twin of the oracle with synthetic objects on every
    viewpoint (full obj slots -> no ragged-pad divergence)."""
    cfg = _ref_config()
    cfg.name = "REVERIE"
    cfg.obj_feat_size = DF
    cfg.obj_prob_size = 0
    cfg.use_obj_name = True
    cfg.pretrain_tasks = ["mlm", "mrc", "sap", "og", "cfp"]
    from model.pretrain_goat import GlocalTextPathCMTPreTraining

    torch.manual_seed(1)
    tm = GlocalTextPathCMTPreTraining(cfg).eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    variables = torch_to_flax(sd)

    ours = GoatPretrainModel(
        _our_config().replace(dataset="reverie", name="REVERIE",
                              obj_feat_size=DF, use_obj_name=True),
        tasks=("mlm", "mrc", "sap", "og", "cfp"), image_prob_size=16)

    g = oracle["g"]
    Lo = 3
    orng = np.random.default_rng(9)
    objects = dict(
        feat=orng.standard_normal((g.num_vps, Lo, DF)).astype(np.float32),
        loc=np.concatenate(
            [orng.standard_normal((g.num_vps, Lo, 4)).astype(np.float32),
             orng.random((g.num_vps, Lo, 3)).astype(np.float32)], -1),
        dir=orng.uniform(-3, 3, (g.num_vps, Lo, 2)).astype(np.float32),
        mask=np.ones((g.num_vps, Lo), bool),
        name=orng.integers(0, 45, (g.num_vps, Lo)).astype(np.int32),
        oid=np.arange(g.num_vps * Lo, dtype=np.int32).reshape(g.num_vps, Lo),
    )
    shapes = PretrainShapes(max_txt_len=16, max_steps=4, max_cands=16,
                            max_gmap=24, max_mlm=4, mrc_prob_dim=16,
                            max_objs=Lo)
    builder = TrajBatchBuilder({"gp0": g}, ["gp0"], oracle["feats"], shapes,
                               vocab_size=VOCAB, objnav=True,
                               objects=objects, seed=0)
    items = []
    for it in oracle["items"]:
        it = dict(it)
        goal = it["path_local"][-1]
        it["objid"] = int(objects["oid"][goal, 1])   # gt obj = slot 1
        items.append(it)
    return dict(tm=tm, variables=variables, ours=ours, builder=builder,
                items=items, g=g, feats=oracle["feats"], shapes=shapes,
                Lo=Lo)


def test_pretrain_og_parity(oracle_obj):
    """OG golden parity vs pretrain_goat.forward_og (:356-391): object
    logits at the end viewpoint + CE loss with -100 ignore."""
    o = oracle_obj
    builder, items = o["builder"], o["items"]
    items = items[:2]
    ex_batch = builder.build_batch(items, task="og")
    B = 2
    sh = o["shapes"]
    Lo = o["Lo"]
    Lp = sh.pano_len
    kwargs, aux = _build_ref_kwargs(o, ex_batch, items)
    assert aux["Lo"] == Lo and kwargs["traj_obj_img_fts"] is not None

    # reference obj labels: index among end-vp objects (-100 if missing)
    ref_labels = []
    for b in range(B):
        l = int(ex_batch["obj_labels"][b])
        ref_labels.append(l - (1 + Lp) if l >= 0 else -100)

    tm = o["tm"]
    with torch.no_grad():
        ref_logits = tm.forward_og(
            **kwargs, obj_labels=torch.tensor(ref_labels),
            compute_loss=False)
        ref_losses = tm.forward_og(
            **kwargs, obj_labels=torch.tensor(ref_labels),
            compute_loss=True)

    ours_batch = jax.tree.map(jnp.asarray, ex_batch)

    def fwd_logits(m, batch):
        _, vp_embeds, _, _ = m.encode(batch, return_gmap=False)
        import jax.numpy as jnp2
        logits = m.og_head(vp_embeds).squeeze(-1)
        return jnp2.where(batch["vp_obj_masks"], logits, -jnp2.inf)

    our_logits = np.asarray(o["ours"].apply(o["variables"], ours_batch,
                                            method=fwd_logits))
    rl = ref_logits.numpy()
    for b in range(B):
        np.testing.assert_allclose(
            our_logits[b, 1 + Lp:1 + Lp + Lo], rl[b, :Lo], atol=1e-4,
            rtol=1e-3, err_msg=f"og logits b={b}")
        # every non-object slot is masked out on our side
        assert not np.isfinite(np.delete(our_logits[b],
                                         np.arange(1 + Lp, 1 + Lp + Lo))).any()

    our_loss, m = o["ours"].apply(o["variables"], ours_batch,
                                  method=GoatPretrainModel.og_loss)
    ok = np.asarray(ref_labels) >= 0
    want = float(ref_losses.numpy()[ok].mean()) if ok.any() else 0.0
    np.testing.assert_allclose(float(our_loss), want, atol=1e-4, rtol=1e-3)
