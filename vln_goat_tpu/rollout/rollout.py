"""Scan-compiled episodic rollout: the TPU replacement for the reference's
host-driven step loop (map_nav_src/r2r/agent.py:448-710).

The reference alternates per step between C++ simulator calls, numpy
packing, `.cuda()` copies, and dict-keyed graph bookkeeping.  Here the whole
episode — candidate lookup, panorama encoding, topological-map maintenance
(episodic incremental Floyd–Warshall mirroring FloydGraph,
models/graph_utils.py:43-89), navigation forward, teacher supervision,
action selection and camera state — runs inside one `lax.scan` over fixed
horizon T with static shapes.  The only host work per *batch* of episodes is
assembling the final trajectories from recorded node sequences.

State layout (all fixed capacity; N = node capacity, slot N is a write
trash-can for masked scatters):
  node_vp   [B, N+1]      local viewpoint index of node i (-1 empty)
  visited   [B, N+1]      True once the agent has stood on the node
  step_id   [B, N+1]      1 + step of (latest) visit (gmap.node_step_ids)
  embed_sum [B, N+1, D], embed_cnt [B, N+1]   running node embeddings
  stop_prob [B, N+1]      per-node stop probability (for backtrack)
  edist/ehops/enext [B, N+1, N+1]  episodic shortest-path tables
Token layout of the global map: [stop, MEM, node_0..node_{N-1}] (G = N+2),
matching agent.py:175-186; slot 1 is the [MEM] token carrying the previous
step's fused CLS embedding and is masked from attention (agent.py:209).
"""
from __future__ import annotations

import dataclasses
import os
from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import GoatConfig
from ..core import geometry as G
from ..models.goat import GoatModel
from .world import NavWorld, INF_DIST

IGNORE_ID = -100


@dataclass(frozen=True)
class RolloutConfig:
    num_nodes: int = 48        # episodic graph capacity (gmap tokens = +2)
    horizon: int = 15          # max_action_len (r2r parser default)
    seg_len: int = 12          # max hops recorded per move
    back_len: int = 16         # max hops of the final stop-backtrack
    expert_policy: str = "spl"  # spl | ndtw (RxR, agent.py:333-342)
    ndtw_future_len: int = 10  # DTW lookahead hops per candidate
    feat_dim: int = 768
    angle_feat_size: int = 4
    # full-table policy (the reference GraphMap is unbounded,
    # models/graph_utils.py:91): 'spill' reuses the slot of the
    # farthest-from-current unvisited node for each candidate that would
    # not fit (never evicting the start node, the current node, a visited
    # node, or a node matched by this step's candidates); 'drop' discards
    # the candidate.  Both count the event (spilled_n / overflow_n).
    overflow_policy: str = "spill"  # spill | drop


BIG = 1e9


def dtw_extend_row(row, cost, valid=None):
    """One DTW row update as two associative scans (no O(Tg) sequential
    inner loop): dp[j] = cost[j] + min(min(prev[j], prev[j-1]), dp[j-1])
    rewrites to dp[j] = C[j] + cummin_j(a[j] - C[j-1]) with C = cumsum(cost)
    — log-depth on the VPU instead of a 21-step scalar chain.

    row: [..., Tg+1] previous DP row; cost: [..., Tg] pairwise distances of
    the appended path node to each reference node; valid broadcasts over the
    leading dims (masked rows keep the old DP).
    """
    a = jnp.minimum(row[..., 1:], row[..., :-1])
    C = jnp.cumsum(cost, axis=-1)
    Cs = jnp.concatenate([jnp.zeros_like(C[..., :1]), C[..., :-1]], axis=-1)
    x = a - Cs
    m = jax.lax.cummin(x, axis=x.ndim - 1)  # cummin rejects negative axes
    dp = C + m
    new = jnp.concatenate([jnp.full_like(row[..., :1], BIG), dp], axis=-1)
    if valid is None:
        return new
    return jnp.where(valid[..., None], new, row)


def dtw_init_row(shape_prefix, Tg1):
    row = jnp.full(shape_prefix + (Tg1,), BIG)
    return row.at[..., 0].set(0.0)


def _nav_embed_assemble(embed_sum, embed_cnt, last_embeds, pano_embeds,
                        N, D):
    """Parameter-dependent nav-input tensors: gmap token embeddings
    [stop, MEM, node_0..N-1] from the running node sums, and the local
    [stop, MEM, pano...] embeddings (None if pano_embeds is None).
    Split out of _nav_inputs so the vectorized teacher path can rebuild
    them inside its embedding-only scan (graph_utils.py:110-121)."""
    B = embed_sum.shape[0]
    cnt = jnp.maximum(embed_cnt[:, :N], 1.0)
    node_embeds = embed_sum[:, :N] / cnt[:, :, None]
    gmap_img_embeds = jnp.concatenate([
        jnp.zeros((B, 1, D)), last_embeds[:, None, :], node_embeds], axis=1)
    vp_img_embeds = None
    if pano_embeds is not None:
        vp_img_embeds = jnp.concatenate([
            jnp.zeros((B, 1, D)), last_embeds[:, None, :], pano_embeds],
            axis=1)
    return gmap_img_embeds, vp_img_embeds


def _scan_unroll() -> int:
    """Unroll factor for the rollout scans (GOAT_SCAN_UNROLL, default 1).
    Unrolling lets XLA's scheduler overlap adjacent steps' copies/compute
    at the cost of compile time; measured on chip before changing the
    default."""
    return int(os.environ.get("GOAT_SCAN_UNROLL", "1"))


# batch entries that are SHARED banks, not per-episode rows — consumers
# that slice/permute a batch by episode (the two-pass DAgger replay's
# length sort) must carry these through untouched
_SHARED_BANKS = frozenset({
    "feat_noise", "img_z_features", "img_z_pzs",
    "front_txt_feats", "front_vp_feats", "front_gmap_feats",
})


# (bf16 storage for the non-semantic scan carries — GOAT_BF16_CARRY —
# was tried in round 5 and measured +1% alone / +0.2% stacked on
# bucketing, within session noise: the carried-embed HBM traffic is
# not the bottleneck.  Pruned per the promote-or-prune rule; ROADMAP
# round-5 carry A/B table.)


def _use_onehot() -> bool:
    """One-hot (compare + contraction) replacements for the episodic
    bookkeeping's scalar-granular gathers/scatters (GOAT_ONEHOT, default 1).

    The round-2 device profile attributed ~265k async copy ops per DAgger
    iteration to these sites: every `table.at[b_idx, idx].set/add` with
    per-element indices lowers to one tiny (4-byte) DMA per index on TPU —
    ~12k serialized copies per `_arrive` alone at B=64 — and the full-remat
    backward re-runs all of them.  Rewriting each as a broadcast-compare
    mask plus an einsum/`where` turns the update into one vectorized
    VPU/MXU op over the table.  Selection through a 0/1 f32 one-hot is
    EXACT (each output element is one value plus zeros; int payloads stay
    below 2^24), so losses/paths are bit-identical — verified against the
    scatter path by tests/test_onehot_parity.py.  Sites whose source can
    hold ±inf (stop_prob, log-probs) use masked `where`, never multiply."""
    return os.environ.get("GOAT_ONEHOT", "1") == "1"


def _sg(x):
    """Identity seam at the geometry-feature model boundary.  In the
    reference these tensors (pano loc features, gmap/vp position features,
    pair-distance biases) are host-built numpy constants (agent.py:86-304)
    with no gradient; here they are jnp values derived from the scan
    carries.  A round-4 A/B (scripts/ab_sg_geo.py) proved that inserting
    stop_gradient here is a no-op: grads are bit-identical and the
    optimized HLO is byte-identical — JAX's symbolic-zero propagation
    already prunes the geometry VJP chains.  The hook stays so
    ab_sg_geo.py can re-assert that invariant by monkeypatching it."""
    return x


def _esum(spec, *ops):
    """One-hot selection einsum, forced to ``Precision.HIGHEST``.

    On TPU the DEFAULT matmul precision truncates f32 dot operands to
    bf16, which silently breaks the exactness argument these selections
    rely on: viewpoint-id payloads above 256 and f32 distance payloads
    (edist rows near INF_DIST, world.dist, positions, d_k*updf) would
    round, flipping FloydGraph relaxations, teacher argmin/argmax choices
    and DTW costs.  HIGHEST keeps the contraction in true f32, so picking
    one value through a 0/1 one-hot is exact again (each output element is
    a single addend plus zeros).  Every bookkeeping einsum in this module
    must go through this helper, never bare ``jnp.einsum``."""
    return jnp.einsum(spec, *ops, precision=jax.lax.Precision.HIGHEST)


def _oh_eq(idx, n):
    """Boolean one-hot [..., n] via broadcast compare (no gather at all).
    Out-of-range indices (e.g. -1 pads) produce an all-zero row."""
    return idx[..., None] == jnp.arange(n, dtype=jnp.int32)


def _ohf(idx, n):
    return _oh_eq(idx, n).astype(jnp.float32)


def _pick1(x, idx):
    """x[bidx, idx] for x [B, N, *rest], idx [B] -> [B, *rest] (exact)."""
    oh = _ohf(idx, x.shape[1])
    out = _esum("bn,bn...->b...", oh, x.astype(jnp.float32))
    return out.astype(x.dtype)


def _pickk(x, idx):
    """x[bidx[:,None], idx] for x [B, N], idx [B, K] -> [B, K] (exact)."""
    oh = _ohf(idx, x.shape[1])
    return _esum("bkn,bn->bk", oh, x.astype(jnp.float32)).astype(x.dtype)


def _pick_col(x, idx):
    """x[bidx, :, idx] for x [B, M, N], idx [B] -> [B, M] (exact)."""
    oh = _ohf(idx, x.shape[2])
    return _esum("bn,bmn->bm", oh, x.astype(jnp.float32)).astype(x.dtype)


def _set1(x, idx, val, act=None):
    """Masked-set x[bidx, idx] = val (where act) for x [B, N, *rest];
    val [B, *rest].  `where`-form: safe for ±inf payloads, grads flow
    through `val` only at the written positions (scatter-set parity)."""
    m = _oh_eq(idx, x.shape[1])
    if act is not None:
        m = m & act[:, None]
    extra = x.ndim - 2
    if extra:
        m = m.reshape(m.shape + (1,) * extra)
        val = jnp.expand_dims(val, 1)
    else:
        val = val[:, None]
    return jnp.where(m, val, x)


# 36x36 table: angle features of view v relative to base view b
_PANO_ANG = None


def pano_angle_table(angle_feat_size: int = 4) -> jnp.ndarray:
    global _PANO_ANG
    if _PANO_ANG is None or _PANO_ANG.shape[-1] != angle_feat_size:
        rel_h = G.VIEW_HEADINGS[None, :] - G.VIEW_HEADINGS[:, None]
        rel_e = G.VIEW_ELEVATIONS[None, :] - G.VIEW_ELEVATIONS[:, None]
        _PANO_ANG = G.angle_feature_np(rel_h, rel_e, angle_feat_size)
    # keep the cache in numpy — caching a jnp array created under a trace
    # would leak tracers across jit boundaries
    return jnp.asarray(_PANO_ANG)


class NavRollout:
    """Builds jitted rollout functions for a (model, world, config) triple."""

    def __init__(self, model: GoatModel, world: NavWorld, rcfg: RolloutConfig):
        self.model = model
        self.world = world
        self.rcfg = rcfg
        self.mcfg: GoatConfig = model.config
        self._jitted = {}

    # ------------------------------------------------------------------
    # episode initialisation
    def init_state(self, batch, need_dtw: bool = True) -> Dict[str, jnp.ndarray]:
        r = self.rcfg
        B = batch["scan_idx"].shape[0]
        N1 = r.num_nodes + 1
        D = self.mcfg.hidden_size
        st = dict(
            node_vp=jnp.full((B, N1), -1, jnp.int32),
            n_nodes=jnp.ones((B,), jnp.int32),
            visited=jnp.zeros((B, N1), bool),
            step_id=jnp.zeros((B, N1), jnp.int32),
            embed_sum=jnp.zeros((B, N1, D), jnp.float32),
            embed_cnt=jnp.zeros((B, N1), jnp.float32),
            stop_prob=jnp.full((B, N1), -jnp.inf, jnp.float32),
            edist=jnp.full((B, N1, N1), INF_DIST, jnp.float32)
                  * (1 - jnp.eye(N1)[None]),
            # hop counts are small ints (<= 2*horizon << 256): exact in
            # bf16, so the carry-compaction flag covers this table too
            ehops=jnp.zeros((B, N1, N1), jnp.float32),
            enext=jnp.broadcast_to(jnp.arange(N1, dtype=jnp.int32)[None, None, :]
                                   * jnp.eye(N1, dtype=jnp.int32)[None]
                                   - (1 - jnp.eye(N1, dtype=jnp.int32)[None]),
                                   (B, N1, N1)),
            cur=jnp.zeros((B,), jnp.int32),
            view_ix=batch["start_view"].astype(jnp.int32),
            ended=jnp.zeros((B,), bool),
            # stable per-episode id: sampling keys derive from it so the
            # draws are invariant to batch position — sampled rollouts
            # reproduce identically under any batch recomposition
            # (shuffling, slicing, bucketing)
            uid=jnp.arange(B, dtype=jnp.int32),
            last_embeds=jnp.zeros((B, D), jnp.float32),
            # candidates dropped because the fixed node table was full
            # (reference GraphMap is unbounded; surfacing this makes the
            # capacity degradation observable instead of silent)
            overflow_n=jnp.zeros((B,), jnp.int32),
            # candidates that displaced a far unvisited node (spill policy)
            spilled_n=jnp.zeros((B,), jnp.int32),
        )
        if self.world.num_objs > 0 and self.mcfg.is_objnav:
            st["og_oid"] = jnp.full((B, N1), -1, jnp.int32)
        st["node_vp"] = st["node_vp"].at[:, 0].set(batch["start_vp"].astype(jnp.int32))
        if r.expert_policy == "ndtw" and need_dtw:
            # incremental DTW bottom row for the flattened trajectory
            # (expert: cal_dtw over traj + candidate lookahead, agent.py:333)
            Tg1 = batch["gt_path"].shape[1] + 1
            row = dtw_init_row((B,), Tg1)
            cost0 = self._gt_cost(batch, batch["start_vp"])
            st["dtw_row"] = dtw_extend_row(row, cost0)
        # arrival bookkeeping for the start node (EnvBatch.reset + update_graph)
        st = self._arrive(st, batch, jnp.zeros((B,), jnp.int32),
                          jnp.zeros((B,), bool))
        return st

    def _gt_cost(self, batch, vp):
        """dist(vp, gt_j) rows for DTW: vp [...] local ids -> [..., Tg]."""
        gt = jnp.maximum(batch["gt_path"], 0)              # [B, Tg]
        scan = batch["scan_idx"]
        if _use_onehot():
            # [B,Tg]/[B,N,Tg] scalar-granular gathers -> contractions over
            # per-scan distance rows (see _use_onehot); vp >= 0 here
            V = self.world.dist.shape[1]
            oh_g = _ohf(gt, V)                             # [B, Tg, V]
            if vp.ndim == 1:
                row = self.world.dist[scan, vp]            # [B, V]
                return _esum("btv,bv->bt", oh_g, row)
            rows = _esum("bnv,bvw->bnw", _ohf(vp % V, V),
                              self.world.dist[scan])
            return _esum("bnw,btw->bnt", rows, oh_g)  # [B, N, Tg]
        if vp.ndim == 1:                                   # [B]
            return self.world.dist[scan[:, None], vp[:, None], gt]
        return self.world.dist[scan[:, None, None], vp[..., None],
                               gt[:, None, :]]             # [B, N, Tg]

    def rcfg_obj_offset(self) -> int:
        """Local-token slot where object tokens start (after stop+MEM is
        added separately): K candidate slots + 36 views."""
        return self.world.max_cands + 36

    # ------------------------------------------------------------------
    # graph update on arrival at node `arr` (GraphMap.update_graph,
    # models/graph_utils.py:102-108: add_edge to all candidates + FW update)
    def _arrive(self, st, batch, arr, skip):
        w, r = self.world, self.rcfg
        B = arr.shape[0]
        bidx = jnp.arange(B)
        N1 = r.num_nodes + 1
        TRASH = r.num_nodes
        scan = batch["scan_idx"]

        act = ~skip
        onehot = _use_onehot()
        arr_vp = _pick1(st["node_vp"], arr) if onehot \
            else st["node_vp"][bidx, arr]
        cands = w.get_cands(scan, arr_vp)            # each [B, K]
        cmask = cands["mask"] & act[:, None]

        # --- insert unseen candidate nodes into the node table
        slot_valid = (jnp.arange(N1)[None, :] < st["n_nodes"][:, None])
        known = jnp.where(slot_valid, st["node_vp"], -2)
        match = known[:, None, :] == cands["local"][:, :, None]      # [B,K,N1]
        exists = match.any(-1) & cmask
        idx_exist = jnp.argmax(match, axis=-1).astype(jnp.int32)
        isnew = cmask & ~exists
        rank = jnp.cumsum(isnew, axis=1) - 1
        idx_new = st["n_nodes"][:, None] + rank
        overflow = idx_new >= r.num_nodes
        cidx = jnp.where(exists, idx_exist,
                         jnp.where(isnew & ~overflow, idx_new, TRASH)).astype(jnp.int32)

        edist, ehops, enext = st["edist"], st["ehops"], st["enext"]
        spilled = jnp.zeros((B,), jnp.int32)
        emb_clear = None
        need = isnew & overflow
        if r.overflow_policy == "spill":
            # reuse the slots of the farthest-from-arrival unvisited nodes
            # for candidates that would not fit (the reference GraphMap is
            # unbounded; 'drop' would make those nodes permanently
            # unreachable).  Never evicted: start (slot 0), the arrival
            # node, visited nodes, slots matched by this step's candidates.
            # The whole machinery (argsort + O(N^2) route severing) runs
            # under lax.cond — overflow is rare (R2R decode: never), and
            # paying it unconditionally per step cost 19% decode
            # throughput when it was inlined.
            def do_spill(cidx, need, edist, ehops, enext):
                N = r.num_nodes
                nslot = jnp.arange(N)[None, :]
                matched = jnp.zeros((B, N1), bool).at[
                    bidx[:, None], jnp.where(exists, idx_exist, TRASH)
                ].set(True)[:, :N]
                evictable = (nslot < st["n_nodes"][:, None]) & (nslot != 0) \
                    & (nslot != arr[:, None]) & ~matched
                d_arr = edist[bidx, arr, :N]
                # two-tier preference: ANY unvisited (farthest first)
                # before ANY visited (last resort — loses that node's
                # stop/backtrack record, but keeps the current step's
                # candidates navigable)
                vis = st["visited"][:, :N]
                score = jnp.where(
                    evictable,
                    jnp.where(vis, d_arr - 2.0 * INF_DIST, d_arr), -jnp.inf)
                order = jnp.argsort(-score, axis=1).astype(jnp.int32)
                ov_rank = jnp.cumsum(need, axis=1) - 1
                n_evict = jnp.sum(evictable, axis=1)
                slot_for = order[bidx[:, None], jnp.clip(ov_rank, 0, N - 1)]
                ok_spill = need & (ov_rank < n_evict[:, None])
                cidx = jnp.where(ok_spill, slot_for, cidx).astype(jnp.int32)
                need = need & ~ok_spill        # only true drops remain
                spilled = jnp.sum(ok_spill, axis=1)

                # clear the evicted slots' episodic state: their distance
                # rows/cols, any next-hop pointer THROUGH them (stale
                # routes via a reused slot would splice a wrong viewpoint
                # into the recorded trajectory; severing them makes path
                # expansion truncate instead — re-relaxed by later
                # arrivals), and their embeddings/bookkeeping.  Deeper
                # stale paths (evictee as a mid-path hop of an unrelated
                # pair) keep a stale distance until re-relaxation: a
                # documented approximation of the unbounded reference.
                tgt_e = jnp.where(ok_spill, slot_for, TRASH)
                er = jnp.zeros((B, N1), bool).at[bidx[:, None], tgt_e].set(
                    ok_spill)
                er = er.at[:, TRASH].set(False)
                eye = jnp.eye(N1)
                thru = er[bidx[:, None, None], jnp.clip(enext, 0, N1 - 1)]
                cm = er[:, None, :] | er[:, :, None] | thru
                edist = jnp.where(cm, (INF_DIST * (1 - eye))[None], edist)
                ehops = jnp.where(cm, 0.0, ehops)
                diag_next = (jnp.arange(N1, dtype=jnp.int32)[None, :]
                             * jnp.eye(N1, dtype=jnp.int32)
                             - (1 - jnp.eye(N1, dtype=jnp.int32)))[None]
                enext = jnp.where(cm, diag_next, enext)
                return cidx, need, spilled, edist, ehops, enext, er

            def no_spill(cidx, need, edist, ehops, enext):
                return (cidx, need, jnp.zeros((B,), jnp.int32),
                        edist, ehops, enext, jnp.zeros((B, N1), bool))

            (cidx, need, spilled, edist, ehops, enext,
             emb_clear) = jax.lax.cond(jnp.any(need), do_spill, no_spill,
                                       cidx, need, edist, ehops, enext)

        write = cmask & (cidx != TRASH)
        n_nodes = st["n_nodes"] + jnp.sum(isnew & ~overflow, axis=1)
        d_k = cands["dist"]
        if onehot:
            # one broadcast-compare mask + einsum per update instead of
            # [B,K] scalar-granular scatter/gather DMAs (see _use_onehot)
            oh_arr = _oh_eq(arr, N1)                     # [B, N1] bool
            oh_c = _ohf(cidx, N1)                        # [B, K, N1] f32
            wf = write.astype(jnp.float32)
            hitw = _esum("bkn,bk->bn", oh_c, wf) > 0
            vp_new = _esum(
                "bkn,bk->bn", oh_c, cands["local"].astype(jnp.float32) * wf)
            node_vp = jnp.where(hitw, vp_new.astype(jnp.int32),
                                st["node_vp"])

            # --- add edges arr<->cand (FloydGraph.add_edge: keep if
            # shorter).  `set` semantics as masked `where`: positions with
            # no improving candidate keep their old value (the scatter
            # wrote the old value back there — identical result).
            row_d = _pick1(edist, arr)                   # edist[b, arr, :]
            old = _esum("bkn,bn->bk", oh_c, row_d)
            upd = write & (d_k < old)
            updf = upd.astype(jnp.float32)
            m_row = _esum("bkn,bk->bn", oh_c, updf) > 0    # [B, N1]
            val_row = _esum("bkn,bk->bn", oh_c, d_k * updf)
            upd3 = oh_arr[:, :, None] & m_row[:, None, :]       # (arr, j)
            upd3t = m_row[:, :, None] & oh_arr[:, None, :]      # (j, arr)
            edist = jnp.where(upd3, val_row[:, None, :], edist)
            edist = jnp.where(upd3t, val_row[:, :, None], edist)
            ehops = jnp.where(upd3 | upd3t, 1.0, ehops)
            jidx = jnp.arange(N1, dtype=jnp.int32)
            enext = jnp.where(upd3, jidx[None, None, :], enext)
            enext = jnp.where(upd3t, arr[:, None, None], enext)

            # --- one Floyd–Warshall relax through arr (FloydGraph.update)
            dxc = _pick_col(edist, arr)      # [B, N1] x -> arr
            dcy = _pick1(edist, arr)         # [B, N1] arr -> y
            cand_d = dxc[:, :, None] + dcy[:, None, :]
            better = (cand_d < edist) & act[:, None, None]
            hxc, hcy = _pick_col(ehops, arr), _pick1(ehops, arr)
            nxc = _pick_col(enext, arr)
            edist = jnp.where(better, cand_d, edist)
            ehops = jnp.where(better, hxc[:, :, None] + hcy[:, None, :],
                              ehops)
            enext = jnp.where(better,
                              jnp.broadcast_to(nxc[:, :, None], enext.shape),
                              enext)
            visited = st["visited"] | (oh_arr & act[:, None])
        else:
            node_vp = st["node_vp"].at[bidx[:, None], cidx].set(
                jnp.where(write, cands["local"],
                          st["node_vp"][bidx[:, None], cidx]))

            # --- add edges arr<->cand (FloydGraph.add_edge: keep if shorter)
            old = edist[bidx[:, None], arr[:, None], cidx]
            upd = write & (d_k < old)
            nd = jnp.where(upd, d_k, old)
            nh = jnp.where(upd, 1.0, ehops[bidx[:, None], arr[:, None], cidx])
            nn_fwd = jnp.where(upd, cidx,
                               enext[bidx[:, None], arr[:, None], cidx])
            nn_bwd = jnp.where(upd, arr[:, None],
                               enext[bidx[:, None], cidx, arr[:, None]])
            edist = edist.at[bidx[:, None], arr[:, None], cidx].set(nd)
            edist = edist.at[bidx[:, None], cidx, arr[:, None]].set(nd)
            ehops = ehops.at[bidx[:, None], arr[:, None], cidx].set(nh)
            ehops = ehops.at[bidx[:, None], cidx, arr[:, None]].set(nh)
            enext = enext.at[bidx[:, None], arr[:, None], cidx].set(nn_fwd)
            enext = enext.at[bidx[:, None], cidx, arr[:, None]].set(nn_bwd)

            # --- one Floyd–Warshall relax through arr (FloydGraph.update)
            dxc = edist[bidx, :, arr]        # [B, N1] x -> arr
            dcy = edist[bidx, arr, :]        # [B, N1] arr -> y
            cand_d = dxc[:, :, None] + dcy[:, None, :]
            better = (cand_d < edist) & act[:, None, None]
            hxc, hcy = ehops[bidx, :, arr], ehops[bidx, arr, :]
            nxc = enext[bidx, :, arr]
            edist = jnp.where(better, cand_d, edist)
            ehops = jnp.where(better, hxc[:, :, None] + hcy[:, None, :],
                              ehops)
            enext = jnp.where(better,
                              jnp.broadcast_to(nxc[:, :, None], enext.shape),
                              enext)
            visited = st["visited"].at[bidx, arr].set(
                st["visited"][bidx, arr] | act)
        out = {**st, "node_vp": node_vp,
               "n_nodes": jnp.where(act, n_nodes, st["n_nodes"]),
               "visited": visited, "edist": edist, "ehops": ehops,
               "enext": enext,
               "overflow_n": st["overflow_n"] + jnp.sum(need, axis=1),
               "spilled_n": st["spilled_n"] + spilled}
        if emb_clear is not None:
            # evicted slots start fresh: no inherited embeddings/bookkeeping
            keep = ~emb_clear
            if "embed_sum" in st:
                out["embed_sum"] = st["embed_sum"] * keep[..., None]
                out["embed_cnt"] = st["embed_cnt"] * keep
            if "stop_prob" in st:
                out["stop_prob"] = jnp.where(emb_clear, -jnp.inf,
                                             st["stop_prob"])
            out["step_id"] = st["step_id"] * keep
            out["visited"] = out["visited"] & keep
            if "og_oid" in st:
                out["og_oid"] = jnp.where(emb_clear, -1, st["og_oid"])
            # recorded by the vectorized teacher's geometry scan so its
            # embedding scan can replay the clear (popped from the carry)
            out["emb_clear"] = emb_clear
        return out

    # ------------------------------------------------------------------
    def encode_text(self, params, batch, rng, deterministic: bool = False):
        """Per-episode instruction encoding bundle: txt_embeds + the
        hoisted cross-attention K/V caches (+ grouped nav weights when
        enabled).  Computed once per rollout; the trainer's 'dagger' alg
        computes it once and SHARES it across its teacher+sample rollouts
        (both run on the same minibatch there) — exact when deterministic,
        one dropout draw instead of two otherwise.

        BACL/FACL banks ride the batch when configured (broadcast by
        tools.zdict.broadcast_zdict; agent.py:51-64, 496-512)."""
        model = self.model
        tkw = {}
        for src, dst in (("instr_z_direction_features", "z_direc_embeds"),
                         ("instr_z_direction_pzs", "z_direc_pzs"),
                         ("instr_z_landmark_features", "z_landm_embeds"),
                         ("instr_z_landmark_pzs", "z_landm_pzs"),
                         ("front_txt_feats", "front_txt_embeds")):
            if src in batch:
                tkw[dst] = batch[src]
        tkw["deterministic"] = deterministic
        rngs = None if deterministic else {"dropout": rng}
        txt_embeds = model.apply(params, batch["txt_ids"],
                                 batch["txt_masks"],
                                 method=GoatModel.forward_text,
                                 **({} if rngs is None else {"rngs": rngs}),
                                 **tkw)
        # hoist the cross-attention K/V projections of the instruction out
        # of the scan: the text is constant across steps, so these
        # per-layer matmuls are done once per episode instead of once per
        # step (exact same math; no rngs — projections only).
        # GOAT_TXT_KV=0 restores per-step projections (A/B lever).
        txt_kv = None
        if os.environ.get("GOAT_TXT_KV", "1") == "1":
            txt_kv = model.apply(params, txt_embeds,
                                 method=GoatModel.forward_text_kv)
        # (a grouped dual-branch nav encoder — stacked [2,...] weights
        # hoisted out of the scan — was tried in r3/r4 and measured SLOWER
        # on chip, 84.8 vs 96.5 eps/s train; pruned in r5)
        return dict(embeds=txt_embeds, kv=txt_kv)

    # ------------------------------------------------------------------
    def _pano_inputs(self, st, batch, cur_vp=None, view_ix=None,
                     scan=None, use_aug=None):
        """Build padded panorama tokens: [K candidate slots | 36 view slots]
        (agent.py:86-149 packing, static-shape variant).

        All inputs are pure functions of (scan, cur_vp, view_ix) — st is
        only consulted for those when not given explicitly, which lets the
        vectorized teacher path call this once over a flattened [T*B]
        batch instead of per scan step."""
        w, r = self.world, self.rcfg
        if scan is None:
            scan = batch["scan_idx"]
        if cur_vp is None:
            if _use_onehot():
                cur_vp = _pick1(st["node_vp"], st["cur"])
            else:
                bq = jnp.arange(st["cur"].shape[0])
                cur_vp = st["node_vp"][bq, st["cur"]]
        if view_ix is None:
            view_ix = st["view_ix"]
        if use_aug is None:
            use_aug = batch.get("use_aug")
        B = cur_vp.shape[0]
        bidx = jnp.arange(B)
        feats = w.get_feat(scan, cur_vp, use_aug)        # [B, 36, Df]
        cands = w.get_cands(scan, cur_vp)
        K = cands["local"].shape[1]
        vi = view_ix
        cam_h = G.VIEW_HEADINGS[0] + (vi % 12).astype(jnp.float32) * (jnp.pi / 6)
        cam_e = ((vi // 12).astype(jnp.float32) - 1.0) * (jnp.pi / 6)

        onehot = _use_onehot()
        if onehot:
            # [B,K] row-gathers -> one MXU contraction (see _use_onehot)
            cand_img = _esum("bkv,bvd->bkd", _ohf(cands["ptid"], 36),
                                  feats.astype(jnp.float32)
                                  ).astype(feats.dtype)
        else:
            cand_img = jnp.take_along_axis(feats, cands["ptid"][:, :, None],
                                           axis=1)
        cand_ang = G.angle_feature_jnp(cands["heading"] - cam_h[:, None],
                                       cands["elev"] - cam_e[:, None],
                                       r.angle_feat_size)
        view_img = feats                                  # [B, 36, Df]
        ang_tab = pano_angle_table(r.angle_feat_size)     # [36, 36, A]
        view_ang = _esum("bv,vwa->bwa", _ohf(vi, 36), ang_tab) \
            if onehot else ang_tab[vi]                    # [B, 36, A]

        img = jnp.concatenate([cand_img, view_img], axis=1).astype(jnp.float32)
        ang = jnp.concatenate([cand_ang, view_ang], axis=1)
        box = jnp.ones(ang.shape[:-1] + (3,), jnp.float32)
        loc = jnp.concatenate([ang, box], axis=-1)

        # mask out the views claimed by candidates (used_viewidxs,
        # agent.py:99-119); pad slots scatter 0 via add (set would race)
        if onehot:
            used = _esum("bkv,bk->bv", _ohf(cands["ptid"], 36),
                              cands["mask"].astype(jnp.float32)) > 0
        else:
            used = jnp.zeros((B, 36), jnp.int32).at[
                bidx[:, None], cands["ptid"]].add(
                cands["mask"].astype(jnp.int32)) > 0
        view_mask = jnp.concatenate([cands["mask"], ~used], axis=1)
        nav_types = jnp.concatenate(
            [cands["mask"].astype(jnp.int32),
             jnp.zeros((B, 36), jnp.int32)], axis=1)

        objs = None
        if w.num_objs > 0 and self.mcfg.is_objnav:
            # REVERIE object tokens (reverie/env.py:452-457 obs assembly)
            objs = w.get_objs(scan, cur_vp)
            Lo = objs["feat"].shape[1]
            obj_loc = objs["loc"]
            if objs.get("dir") is not None:
                # camera-relative object angles, recomputed per step like
                # the reference (reverie/data_utils.py:90-93:
                # angle_feature(obj_ang - base_heading, ...)); the stored
                # loc keeps only the box features
                A = r.angle_feat_size
                oang = G.angle_feature_jnp(
                    objs["dir"][..., 0] - cam_h[:, None],
                    objs["dir"][..., 1] - cam_e[:, None], A)
                obj_loc = jnp.concatenate([oang, obj_loc[..., A:]], axis=-1)
            loc = jnp.concatenate([loc, obj_loc], axis=1)
            nav_types = jnp.concatenate(
                [nav_types, jnp.full((B, Lo), 2, jnp.int32)], axis=1)
        return dict(img=_sg(img), loc=_sg(loc), nav_types=nav_types,
                    mask=view_mask, objs=objs, cands=cands, cam_h=cam_h,
                    cam_e=cam_e, cur_vp=cur_vp)

    # ------------------------------------------------------------------
    def _nav_inputs(self, st, batch, pano, pano_embeds, cnode=None,
                    has=None, embeds=True):
        """Assemble global-map + local-branch tensors (agent.py:151-304).
        cnode/has: candidate->node-table matches, precomputed by the step
        to avoid recomputing the [B,K,N] broadcast equality.

        embeds=False skips the parameter-dependent tensors
        (gmap_img_embeds / vp_img_embeds) so the vectorized teacher path
        can record the pure-geometry inputs in a model-free scan and
        assemble the embedding tensors later (_nav_embed_assemble)."""
        w, r = self.world, self.rcfg
        c = self.mcfg
        B = st["cur"].shape[0]
        bidx = jnp.arange(B)
        N, N1 = r.num_nodes, r.num_nodes + 1
        scan = batch["scan_idx"]
        D = c.hidden_size

        nslot = jnp.arange(N)[None, :]
        real = nslot < st["n_nodes"][:, None]            # [B, N]
        node_vp = st["node_vp"][:, :N]
        visited = st["visited"][:, :N] & real
        cur = st["cur"]
        cur_vp = pano["cur_vp"]

        # node embeddings (sum/count average; graph_utils.py:110-121)
        if embeds:
            gmap_img_embeds, _ = _nav_embed_assemble(
                st["embed_sum"], st["embed_cnt"], st["last_embeds"], None,
                N, D)

        # positions & episodic metrics relative to the current node
        onehot = _use_onehot()
        if onehot:
            # per-scan position rows once (64 contiguous DMAs), then
            # one-hot contractions instead of [B,N]/[B,K] 12-byte gathers.
            # `% V` replicates fancy-indexing wrap for -1 pad slots.
            V = w.pos.shape[1]
            pos_scan = w.pos[scan]                       # [B, V, 3]
            npos = _esum("bnv,bvc->bnc", _ohf(node_vp % V, V), pos_scan)
            ed_row = _pick1(st["edist"], cur)            # [B, N1]
            eh_row = _pick1(st["ehops"], cur)
            ed_cur, eh_cur = ed_row[:, :N], eh_row[:, :N]
        else:
            npos = w.pos[scan[:, None], node_vp]         # [B, N, 3]
            ed_cur = st["edist"][bidx, cur, :N]
            eh_cur = st["ehops"][bidx, cur, :N]
        cpos = w.pos[scan, cur_vp][:, None, :]
        cam_h, cam_e = pano["cam_h"], pano["cam_e"]
        node_pos_fts = G.pos_features_jnp(
            cpos, npos, cam_h[:, None], cam_e[:, None], ed_cur, eh_cur,
            r.angle_feat_size)
        # None-token features: angle fts of (0,0), zero dists
        # (graph_utils.py:127-130)
        null_ft = jnp.tile(jnp.asarray([0., 1., 0., 1., 0., 0., 0.],
                                       jnp.float32)[None, None, :], (B, 2, 1))
        gmap_pos_fts = jnp.concatenate([null_ft, node_pos_fts], axis=1)

        gmap_step_ids = jnp.concatenate(
            [jnp.zeros((B, 2), jnp.int32), st["step_id"][:, :N] * real], axis=1)
        gmap_masks = jnp.concatenate(
            [jnp.ones((B, 1), bool), jnp.zeros((B, 1), bool), real], axis=1)
        gmap_visited = jnp.concatenate(
            [jnp.zeros((B, 1), bool), jnp.ones((B, 1), bool), visited], axis=1)

        pair = st["edist"][:, :N, :N]
        pair = jnp.where(real[:, :, None] & real[:, None, :]
                         & (pair < INF_DIST * 0.5), pair, 0.0)
        Gtok = N + 2
        gmap_pair_dists = jnp.zeros((B, Gtok, Gtok)).at[:, 2:, 2:].set(pair)

        # ---- local branch (agent.py:266-304) ----
        cands = pano["cands"]
        K = cands["local"].shape[1]
        Lo0 = 0 if pano.get("objs") is None else pano["objs"]["feat"].shape[1]
        L = 2 + pano["mask"].shape[1] + Lo0
        if embeds:
            vp_img_embeds = jnp.concatenate([
                jnp.zeros((B, 1, D)), st["last_embeds"][:, None, :],
                pano_embeds], axis=1)

        # candidate gmap slots: node index of each candidate (all candidates
        # are in the node table after _arrive)
        if cnode is None:
            known = jnp.where(real, node_vp, -2)
            cmatch = known[:, None, :] == cands["local"][:, :, None]  # [B,K,N]
            has = cmatch.any(-1) & cands["mask"]
            cnode = jnp.argmax(cmatch, -1).astype(jnp.int32)
        local_to_gmap = jnp.full((B, L), -1, jnp.int32)
        local_to_gmap = local_to_gmap.at[:, 2:2 + K].set(
            jnp.where(has, cnode + 2, -1))

        # vp_pos_fts: [:, :7] start-node relative, [2:2+K, 7:] candidates
        start_pos = w.pos[scan, batch["start_vp"]]
        if onehot:
            sd, sh = ed_row[:, 0], eh_row[:, 0]
        else:
            sd = st["edist"][bidx, cur, 0]
            sh = st["ehops"][bidx, cur, 0]
        start_ft = G.pos_features_jnp(w.pos[scan, cur_vp], start_pos, cam_h,
                                      cam_e, sd, sh, r.angle_feat_size)
        if onehot:
            cand_pos = _esum("bkv,bvc->bkc",
                                  _ohf(cands["local"] % V, V), pos_scan)
            oh_cn = _ohf(cnode, N1)
            cd = _esum("bkn,bn->bk", oh_cn, ed_row)
            ch = _esum("bkn,bn->bk", oh_cn, eh_row)
        else:
            cand_pos = w.pos[scan[:, None], cands["local"]]
            cd = st["edist"][bidx[:, None], cur[:, None], cnode]
            ch = st["ehops"][bidx[:, None], cur[:, None], cnode]
        cand_ft = G.pos_features_jnp(
            w.pos[scan, cur_vp][:, None], cand_pos, cam_h[:, None],
            cam_e[:, None], cd, ch, r.angle_feat_size)
        cand_ft = jnp.where(cands["mask"][..., None], cand_ft, 0.0)
        A7 = r.angle_feat_size + 3
        vp_pos_fts = jnp.zeros((B, L, 2 * A7))
        vp_pos_fts = vp_pos_fts.at[:, :, :A7].set(start_ft[:, None, :])
        vp_pos_fts = vp_pos_fts.at[:, 2:2 + K, A7:].set(cand_ft)

        pano_mask_full = pano["mask"]
        Lo = 0
        if pano.get("objs") is not None:
            Lo = pano["objs"]["feat"].shape[1]
            pano_mask_full = jnp.concatenate(
                [pano_mask_full, pano["objs"]["mask"]], axis=1)
        vp_masks = jnp.concatenate([jnp.ones((B, 2), bool), pano_mask_full],
                                   axis=1)
        vp_nav_masks = jnp.concatenate(
            [jnp.ones((B, 1), bool), jnp.zeros((B, 1), bool), cands["mask"],
             jnp.zeros((B, 36 + Lo), bool)], axis=1)
        vp_obj_masks = None
        if Lo > 0:
            vp_obj_masks = jnp.concatenate(
                [jnp.zeros((B, 2 + K + 36), bool), pano["objs"]["mask"]],
                axis=1)

        no_vp_left = ~jnp.any(real & ~visited, axis=1)

        nav_in = dict(
            gmap_step_ids=gmap_step_ids,
            gmap_pos_fts=_sg(gmap_pos_fts), gmap_masks=gmap_masks,
            gmap_pair_dists=_sg(gmap_pair_dists),
            gmap_visited_masks=gmap_visited,
            vp_pos_fts=_sg(vp_pos_fts),
            vp_masks=vp_masks, vp_nav_masks=vp_nav_masks,
            local_to_gmap=local_to_gmap,
        )
        if embeds:
            nav_in["gmap_img_embeds"] = gmap_img_embeds
            nav_in["vp_img_embeds"] = vp_img_embeds
        if vp_obj_masks is not None:
            nav_in["vp_obj_masks"] = vp_obj_masks
        return nav_in, dict(real=real, visited=visited, node_vp=node_vp,
                            no_vp_left=no_vp_left, cnode=cnode, has=has)

    # ------------------------------------------------------------------
    def _teacher(self, st, batch, aux, t, imitation):
        """Expert action in gmap-token space (agent.py:306-349)."""
        w, r = self.world, self.rcfg
        B = st["cur"].shape[0]
        bidx = jnp.arange(B)
        scan = batch["scan_idx"]
        onehot = _use_onehot()
        cur_vp = _pick1(st["node_vp"], st["cur"]) if onehot \
            else st["node_vp"][bidx, st["cur"]]
        goal = _pick1(batch["gt_path"], batch["gt_len"] - 1) if onehot \
            else batch["gt_path"][bidx, batch["gt_len"] - 1]

        if imitation:
            is_last = t >= batch["gt_len"] - 1
            nxt_i = jnp.minimum(t + 1, batch["gt_len"] - 1)
            nxt = _pick1(batch["gt_path"], nxt_i) if onehot \
                else batch["gt_path"][bidx, nxt_i]
            match = (aux["node_vp"] == nxt[:, None]) & aux["real"]
            slot = jnp.argmax(match, axis=1).astype(jnp.int32) + 2
            found = match.any(1)
            a = jnp.where(is_last, 0, jnp.where(found, slot, IGNORE_ID))
        elif r.expert_policy == "ndtw":
            # nDTW expert (agent.py:333-340): for each unvisited node,
            # score the flattened trajectory + full-graph shortest path to
            # it against the gt path; pick the best nDTW.
            node_vp = aux["node_vp"]                     # [B, N]
            B, N = node_vp.shape
            if onehot:
                V = w.hops.shape[1]
                oh_n = _ohf(node_vp % V, V)              # [B, N, V]
                hops = _esum("bnv,bv->bn", oh_n,
                                  w.hops[scan, cur_vp].astype(jnp.float32)
                                  ).astype(w.hops.dtype)
                # next-hop columns toward each node, hoisted out of the
                # loop: col_n[b, w, n] = nexthop[b, w, node_vp[b, n]]
                col_n = _esum("bnv,bwv->bwn", oh_n,
                                   w.nexthop[scan].astype(jnp.float32))
            else:
                hops = w.hops[scan[:, None], cur_vp[:, None], node_vp]
            row = jnp.broadcast_to(st["dtw_row"][:, None, :],
                                   (B, N, st["dtw_row"].shape[-1]))

            def body(k, carry):
                row, p = carry
                if onehot:
                    oh_p = _ohf(p % V, V)                # [B, N, V]
                    nxt = _esum("bnw,bwn->bn", oh_p,
                                     col_n).astype(jnp.int32)
                else:
                    nxt = w.nexthop[scan[:, None], p, node_vp]
                nxt = jnp.where(nxt < 0, p, nxt)
                cost = self._gt_cost(batch, nxt)
                row = dtw_extend_row(row, cost, valid=(k < hops))
                return (row, nxt)

            row, _ = jax.lax.fori_loop(
                0, r.ndtw_future_len, body,
                (row, jnp.broadcast_to(cur_vp[:, None], (B, N))))
            gl = batch["gt_len"]
            dtw = jnp.take_along_axis(row, gl[:, None, None], axis=2)[..., 0]
            ndtw = jnp.exp(-dtw / (3.0 * gl[:, None].astype(jnp.float32)))
            cand = aux["real"] & ~aux["visited"]
            score = jnp.where(cand, ndtw, -jnp.inf)
            best = jnp.argmax(score, axis=1).astype(jnp.int32) + 2
            any_cand = jnp.isfinite(score).any(1)
            arrived = cur_vp == goal
            a = jnp.where(arrived, 0, jnp.where(any_cand, best, IGNORE_ID))
        else:
            # SPL expert: nearest-to-goal unvisited node by
            # dist(cur->node)+dist(node->goal) over the full scan graph
            node_vp = aux["node_vp"]
            if onehot:
                V = w.dist.shape[1]
                oh_n = _ohf(node_vp % V, V)              # [B, N, V]
                col_g = _pick_col(w.dist[scan], goal)    # dist[b, :, goal]
                row_c = w.dist[scan, cur_vp]             # [B, V]
                d_goal = _esum("bnv,bv->bn", oh_n, col_g)
                d_cur = _esum("bnv,bv->bn", oh_n, row_c)
            else:
                d_goal = w.dist[scan[:, None], node_vp, goal[:, None]]
                d_cur = w.dist[scan[:, None], cur_vp[:, None], node_vp]
            cost = d_goal + d_cur
            cand = aux["real"] & ~aux["visited"]
            cost = jnp.where(cand, cost, jnp.inf)
            best = jnp.argmin(cost, axis=1).astype(jnp.int32) + 2
            any_cand = jnp.isfinite(cost).any(1)
            arrived = cur_vp == goal
            a = jnp.where(arrived, 0, jnp.where(any_cand, best, IGNORE_ID))
        a = jnp.where(st["ended"], IGNORE_ID, a)
        return a

    # ------------------------------------------------------------------
    def _expand_path(self, st, tgt_node, max_len):
        """Follow episodic next-hop pointers cur -> tgt (FloydGraph.path)."""
        B = st["cur"].shape[0]
        bidx = jnp.arange(B)
        if _use_onehot():
            # hoist the [B, N1] next-hop column toward tgt once; each hop
            # is then a single one-hot contraction over it (the scalar
            # gather chain serialized 2x64 tiny DMAs per hop)
            ncol = _pick_col(st["enext"], tgt_node).astype(jnp.float32)

            def body(i, carry):
                p, out, prev = carry
                nxt = _esum("bn,bn->b", _ohf(p, ncol.shape[1]),
                                 ncol).astype(jnp.int32)
                nxt = jnp.where(nxt < 0, p, nxt)
                out = out.at[:, i].set(nxt)
                prev = jnp.where(nxt != p, p, prev)
                return (nxt, out, prev)
        else:
            def body(i, carry):
                p, out, prev = carry
                nxt = st["enext"][bidx, p, tgt_node]
                nxt = jnp.where(nxt < 0, p, nxt)
                out = out.at[:, i].set(nxt)
                prev = jnp.where(nxt != p, p, prev)
                return (nxt, out, prev)

        out = jnp.full((B, max_len), -1, jnp.int32)
        p, out, prev = jax.lax.fori_loop(
            0, max_len, body, (st["cur"], out, st["cur"]))
        return out, prev

    # ------------------------------------------------------------------
    def build_rollout(self, feedback: str = "argmax", train_ml: bool = False,
                      deterministic: bool = True,
                      expl_max_ratio: float = 0.6,
                      sample_feedback: str = "sample",
                      remat: str = "full", record_logits: bool = False,
                      exit_chunk: int = 0):
        """Returns rollout(params, batch, rng) -> outputs dict.  `feedback`
        in {teacher, sample, argmax, expl_sample, fused_dagger}
        (agent.py:624-647).

        feedback='fused_dagger' runs the reference's two DAgger rollouts
        (teacher-forced at ml_weight + on-policy `sample_feedback`,
        agent_base.py:154-203) as ONE batched scan: episodes where
        batch['is_teacher'] is True follow the imitation expert, the rest
        sample from the policy.  One 2B-batch model call per step keeps the
        MXU fed with matmuls twice as large as two separate B-batch scans
        and halves the scan/backward bookkeeping; per-episode losses come
        back in out['loss_per_ep'] for ml_weight mixing.

        remat: 'full' re-runs the whole step in the backward (min HBM),
        'dots' saves matmul outputs (jax.checkpoint_policies
        .dots_with_no_batch_dims_saveable — faster when HBM allows),
        'none' stores all activations, 'model' checkpoints only the
        transformer calls so the backward never recomputes the
        bookkeeping/supervision op soup (saves its primals instead).

        exit_chunk: the training scan runs in chunks of this many steps,
        each wrapped in lax.cond(any episode still active) — the
        static-shape analogue of the reference's `if ended.all(): break`
        (agent.py:693-694): once every episode has stopped, remaining
        chunks skip all model compute (forward AND backward).  0 (default)
        disables chunking: the skip only fires when the WHOLE batch has
        ended, which is rare at production batch sizes (measured: no win at
        B>=32 on v5e, while compile time of the chunked graph ~doubles) —
        enable for small-batch runs that mirror the reference's B=12."""
        model, w, r, c = self.model, self.world, self.rcfg, self.mcfg
        # remat='model': checkpoint ONLY the transformer calls inside the
        # scan step.  The backward then rematerializes just the model
        # forwards; every bookkeeping primal (teacher DTW sweep, episodic
        # Floyd-Warshall relax, candidate gathers, path expansion — the
        # profiled elementwise/copy soup) is saved in the forward and never
        # recomputed.  Saved residuals are the per-step model inputs/outputs
        # (~tens of MB per step at B=64) — far under HBM, unlike
        # remat='none' which also stores model internals.
        model_ckpt = remat.startswith("model") and train_ml

        def apply(params, rng, method, *args, ckpt=False, **kw):
            kw["deterministic"] = deterministic
            static_kw = {k: v for k, v in kw.items()
                         if v is None or isinstance(v, (bool, int, float, str))}
            arr_kw = {k: v for k, v in kw.items() if k not in static_kw}

            def call(params, rng, args, arr_kw):
                kw2 = {**arr_kw, **static_kw}
                if deterministic:
                    return model.apply(params, *args, method=method, **kw2)
                return model.apply(params, *args, method=method,
                                   rngs={"dropout": rng}, **kw2)

            if ckpt and model_ckpt:
                # 'model_probs'/'model_wide': per-call checkpoint like
                # 'model', but ALSO save the named softmax outputs /
                # dropout keep-masks (/ 4x-wide FFN tensors) inside each
                # call, so the backward's model recompute skips the
                # exp/normalize, PRNG mask regeneration (and gelu + the
                # up-projection matmul) — the bookkeeping primals are
                # already saved by the call boundary itself.
                if remat == "model_probs":
                    call = jax.checkpoint(
                        call, policy=jax.checkpoint_policies
                        .save_only_these_names("blk", "attn_probs",
                                               "drop_mask"))
                elif remat == "model_wide":
                    call = jax.checkpoint(
                        call, policy=jax.checkpoint_policies
                        .save_only_these_names("blk", "attn_probs",
                                               "drop_mask", "ffn_wide"))
                else:
                    call = jax.checkpoint(call)
            return call(params, rng, args, arr_kw)

        def rollout(params, batch, rng, txt=None):
            B = batch["scan_idx"].shape[0]
            bidx = jnp.arange(B)
            rng_txt, rng_loop = jax.random.split(rng)

            # txt: optionally precomputed by the caller (trainer 'dagger'
            # shares one instruction encoding across its teacher+sample
            # rollouts — both run on the same minibatch there)
            if txt is None:
                txt = self.encode_text(params, batch, rng_txt,
                                       deterministic=deterministic)
            txt_embeds, txt_kv = txt["embeds"], txt["kv"]
            txt_masks = batch["txt_masks"]

            st = self.init_state(
                batch, need_dtw=train_ml and feedback != "teacher")

            onehot = _use_onehot()

            # `cur` holds the per-episode tensors the step body reads;
            # every row-level computation in the step is episode-
            # independent, so a step traced on any slice/permutation of
            # these computes bit-identical per-episode values.
            cur = dict(batch=batch, txt_embeds=txt_embeds, txt_kv=txt_kv,
                       txt_masks=txt_masks, B0=B)

            def step(st, xs):
                batch = cur["batch"]
                txt_embeds, txt_kv = cur["txt_embeds"], cur["txt_kv"]
                txt_masks = cur["txt_masks"]
                B = batch["scan_idx"].shape[0]
                bidx = jnp.arange(B)
                t, rng_t = xs
                rp, rn = jax.random.split(jax.random.fold_in(rng_loop, t), 2)
                act = ~st["ended"]

                # step bookkeeping: step_id[cur] = t + 1
                if onehot:
                    tb = jnp.broadcast_to(t + 1, (B,)).astype(jnp.int32)
                    st = {**st, "step_id": _set1(st["step_id"], st["cur"],
                                                 tb, act)}
                else:
                    st = {**st,
                          "step_id": st["step_id"].at[bidx, st["cur"]].set(
                              jnp.where(act, t + 1,
                                        st["step_id"][bidx, st["cur"]]))}

                pano = self._pano_inputs(st, batch)
                obj_kw = {}
                if pano.get("objs") is not None:
                    obj_kw = dict(obj_fts=pano["objs"]["feat"],
                                  obj_masks=pano["objs"]["mask"],
                                  obj_names=pano["objs"]["name"])
                if "img_z_features" in batch:
                    obj_kw["z_img_features"] = batch["img_z_features"]
                    obj_kw["z_img_pzs"] = batch["img_z_pzs"]
                pano_img = pano["img"]
                if "feat_noise" in batch:
                    # back-translation: shared per-episode dropout noise
                    # replaces the model's own feature dropout
                    # (agent.py:459-474, already_dropout=True)
                    pano_img = pano_img * batch["feat_noise"][None, None, :]
                    obj_kw["already_dropout"] = True
                pano_embeds, pano_masks, pano_fused = apply(
                    params, rp, GoatModel.forward_panorama,
                    pano_img, pano["loc"], pano["nav_types"], pano["mask"],
                    ckpt=True, **obj_kw)
                if pano_fused is None:  # avg fallback (agent.py:550-552)
                    m = pano_masks[..., None].astype(pano_embeds.dtype)
                    pano_fused = (jnp.sum(pano_embeds * m, 1)
                                  / jnp.maximum(jnp.sum(m, 1), 1.0))

                # node embedding updates (agent.py:556-564)
                N = r.num_nodes
                cands = pano["cands"]
                K = cands["local"].shape[1]
                # current node: rewrite with fused embedding
                if onehot:
                    es = _set1(st["embed_sum"], st["cur"],
                               pano_fused.astype(st["embed_sum"].dtype), act)
                    ec = _set1(st["embed_cnt"], st["cur"],
                               jnp.ones((B,), st["embed_cnt"].dtype), act)
                else:
                    es = st["embed_sum"].at[bidx, st["cur"]].set(
                        jnp.where(act[:, None], pano_fused,
                                  st["embed_sum"][bidx, st["cur"]]))
                    ec = st["embed_cnt"].at[bidx, st["cur"]].set(
                        jnp.where(act, 1.0, st["embed_cnt"][bidx, st["cur"]]))
                st = {**st, "embed_sum": es, "embed_cnt": ec}
                # candidates: accumulate unless already visited.  The match
                # is computed ONCE here (over N real slots) and reused by
                # _nav_inputs for local_to_gmap and position features.
                known = jnp.where(
                    jnp.arange(N)[None, :] < st["n_nodes"][:, None],
                    st["node_vp"][:, :N], -2)
                cmatch = known[:, None, :] == cands["local"][:, :, None]
                cnode = jnp.argmax(cmatch, -1).astype(jnp.int32)
                chas = cmatch.any(-1) & cands["mask"]
                cand_vis = _pickk(st["visited"], cnode) if onehot \
                    else st["visited"][bidx[:, None], cnode]
                add = cands["mask"] & ~cand_vis & act[:, None] & cmatch.any(-1)
                tgt = jnp.where(add, cnode, r.num_nodes)
                if onehot:
                    # scatter-add -> MXU contraction: only the discarded
                    # TRASH row (slot N) can receive >1 candidate, so the
                    # sum-then-add reassociation is exact on live slots
                    oh_t = _ohf(tgt, r.num_nodes + 1)    # [B, K, N1]
                    addf = add.astype(jnp.float32)
                    pe = pano_embeds[:, :K].astype(jnp.float32) \
                        * addf[..., None]
                    st = {**st,
                          "embed_sum": st["embed_sum"] + _esum(
                              "bkn,bkd->bnd", oh_t, pe
                              ).astype(st["embed_sum"].dtype),
                          "embed_cnt": st["embed_cnt"] + _esum(
                              "bkn,bk->bn", oh_t, addf)}
                else:
                    st = {**st,
                          "embed_sum": st["embed_sum"].at[
                              bidx[:, None], tgt].add(
                              jnp.where(add[..., None], pano_embeds[:, :K],
                                        0.0)),
                          "embed_cnt": st["embed_cnt"].at[
                              bidx[:, None], tgt].add(
                              add.astype(jnp.float32))}

                nav_in, aux = self._nav_inputs(st, batch, pano, pano_embeds,
                                               cnode=cnode, has=chas)
                if "front_vp_feats" in batch:
                    nav_in["front_vp_feats"] = batch["front_vp_feats"]
                if "front_gmap_feats" in batch:
                    nav_in["front_gmap_feats"] = batch["front_gmap_feats"]
                outs = apply(params, rn, GoatModel.forward_navigation,
                             txt_embeds, txt_masks, ckpt=True,
                             txt_kv=txt_kv, **nav_in)
                logits = outs["fused_logits"]
                st = {**st, "last_embeds": jnp.where(
                    act[:, None],
                    outs["cls_embeds"].astype(st["last_embeds"].dtype),
                    st["last_embeds"])}

                probs = jax.nn.softmax(logits, axis=1)
                if onehot:
                    # where-form set: stop_prob holds -inf, never multiply
                    st = {**st, "stop_prob": _set1(
                        st["stop_prob"], st["cur"],
                        probs[:, 0].astype(st["stop_prob"].dtype), act)}
                else:
                    st = {**st,
                          "stop_prob": st["stop_prob"].at[bidx, st["cur"]].set(
                              jnp.where(act, probs[:, 0],
                                        st["stop_prob"][bidx, st["cur"]]))}

                # object grounding bookkeeping (reverie agent: og pred of the
                # eventual stop node, agent_obj_goat.py:676-690)
                og_loss = jnp.zeros((B,))
                if outs.get("obj_logits") is not None:
                    obj_off = 2 + self.rcfg_obj_offset()
                    oslot = jnp.argmax(outs["obj_logits"], axis=1)
                    k_obj = jnp.clip(oslot - obj_off, 0,
                                     pano["objs"]["oid"].shape[1] - 1)
                    oid = _pick1(pano["objs"]["oid"], k_obj) if onehot \
                        else pano["objs"]["oid"][bidx, k_obj]
                    if onehot:
                        st = {**st, "og_oid": _set1(st["og_oid"], st["cur"],
                                                    oid, act)}
                    else:
                        st = {**st,
                              "og_oid": st["og_oid"].at[bidx, st["cur"]].set(
                                  jnp.where(act, oid,
                                            st["og_oid"][bidx, st["cur"]]))}
                    if train_ml and "gt_obj_slot" in batch:
                        gt_slot = batch["gt_obj_slot"]
                        at_goal = pano["cur_vp"] == batch["gt_path"][
                            bidx, batch["gt_len"] - 1]
                        has_obj = jnp.any(jnp.isfinite(outs["obj_logits"]),
                                          axis=1)
                        ok = act & at_goal & (gt_slot >= 0) & has_obj
                        # sanitize all--inf rows BEFORE log_softmax: its VJP
                        # is NaN there and jnp.where does not block NaN grads
                        safe = jnp.where(has_obj[:, None],
                                         outs["obj_logits"], 0.0)
                        ologp = jax.nn.log_softmax(safe, axis=1)
                        oli = jnp.take_along_axis(
                            ologp, jnp.maximum(gt_slot, 0)[:, None], 1)[:, 0]
                        og_loss = -jnp.where(ok, oli, 0.0)

                # supervision — skipped entirely in pure inference (the
                # ndtw expert in particular costs a per-step DTW sweep)
                if feedback == "fused_dagger":
                    t_im = self._teacher(st, batch, aux, t, imitation=True)
                    t_ex = self._teacher(st, batch, aux, t, imitation=False)
                    target = jnp.where(batch["is_teacher"], t_im, t_ex)
                elif train_ml or feedback == "teacher":
                    target = self._teacher(st, batch, aux, t,
                                           imitation=(feedback == "teacher"))
                else:
                    target = jnp.full((B,), IGNORE_ID, jnp.int32)
                if train_ml:
                    # CE in fp32 even under bf16 compute (loss numerics)
                    logp = jax.nn.log_softmax(logits.astype(jnp.float32),
                                              axis=1)
                    tgt_ok = target >= 0
                    li = jnp.take_along_axis(
                        logp, jnp.maximum(target, 0)[:, None], axis=1)[:, 0]
                    step_loss = -jnp.where(tgt_ok, li, 0.0) + og_loss
                else:
                    step_loss = jnp.zeros((B,))

                # action selection
                def uid_rows(salt, shape, sampler):
                    # draws keyed by EPISODE UID, not batch row: one
                    # vectorized draw over the full uid space, gathered by
                    # st['uid'] — invariant to batch position/composition
                    # (shuffled/sliced batches resample identically).
                    # Per-row vmap(fold_in)+vmap(sample) was measured
                    # ~40x slower on TPU.
                    k = jax.random.fold_in(rng_t, salt)
                    full = sampler(k, (cur["B0"],) + shape)
                    return full[st["uid"]]

                def select_sample(mode):
                    if mode == "argmax":
                        return jnp.argmax(logits, axis=1).astype(jnp.int32)
                    G = logits.shape[1]
                    if mode == "sample":
                        # categorical == argmax(logits + gumbel) (the
                        # same trick jax.random.categorical uses)
                        g = uid_rows(7, (G,), jax.random.gumbel)
                        return jnp.argmax(logits + g, axis=1).astype(
                            jnp.int32)
                    if mode == "expl_sample":
                        # argmax, but with prob (1 - expl_max_ratio) jump to
                        # a uniformly random reachable unvisited node
                        # (agent.py:634-644)
                        am = jnp.argmax(logits, axis=1).astype(jnp.int32)
                        explore = uid_rows(11, (), jax.random.uniform) \
                            > expl_max_ratio
                        ok = jnp.isfinite(logits)
                        g = uid_rows(13, (G,), jax.random.gumbel)
                        rnd = jnp.argmax(jnp.where(ok, 0.0, -jnp.inf) + g,
                                         axis=1).astype(jnp.int32)
                        return jnp.where(explore, rnd, am)
                    raise ValueError(mode)

                if feedback == "teacher":
                    a = jnp.maximum(target, 0)
                elif feedback == "fused_dagger":
                    a = jnp.where(batch["is_teacher"], jnp.maximum(target, 0),
                                  select_sample(sample_feedback))
                else:
                    a = select_sample(feedback)

                # stop determination (agent.py:649-662): in teacher/sample
                # mode the episode ends at the goal OR when the chosen
                # action is the stop token (nav_vpids[0] is None ->
                # cpu_a_t=None, agent.py:657-662); argmax/expl use a==0 only
                cur_vp = pano["cur_vp"]
                goal = batch["gt_path"][bidx, batch["gt_len"] - 1]
                if feedback in ("teacher", "sample"):
                    a_stop = (cur_vp == goal) | (a == 0)
                elif feedback == "fused_dagger":
                    samp_stop = ((cur_vp == goal) | (a == 0)) \
                        if sample_feedback == "sample" else (a == 0)
                    a_stop = jnp.where(batch["is_teacher"],
                                       (cur_vp == goal) | (a == 0), samp_stop)
                else:
                    a_stop = a == 0
                just_ended = act & (a_stop | aux["no_vp_left"]
                                    | (t == r.horizon - 1))
                moves = act & ~just_ended
                tgt_node = jnp.clip(a - 2, 0, r.num_nodes - 1)

                # record trajectory segment (episodic path cur -> action)
                seg, prev = self._expand_path(st, tgt_node, r.seg_len)
                seg = jnp.where(moves[:, None], seg, -1)
                hops_ct = _esum(
                    "bn,bn->b", _ohf(st["cur"], N + 1),
                    _pick_col(st["ehops"], tgt_node)) if onehot \
                    else st["ehops"][bidx, st["cur"], tgt_node]
                seg_hops = jnp.where(moves, hops_ct,
                                     0.0).astype(jnp.float32)

                # extend the incremental DTW row with the traversed segment
                if "dtw_row" in st:
                    def dtw_body(k, row):
                        node = jnp.clip(seg[:, k], 0, r.num_nodes)
                        vp_k = _pick1(st["node_vp"], node) if onehot \
                            else st["node_vp"][bidx, node]
                        cost = self._gt_cost(batch, vp_k)
                        return dtw_extend_row(row, cost,
                                              valid=seg[:, k] >= 0)

                    st = {**st, "dtw_row": jax.lax.fori_loop(
                        0, r.seg_len, dtw_body, st["dtw_row"])}

                # camera update: view index of the arrival edge
                # prev->action.  prev = last-but-one node on the episodic
                # path; derived from the REVERSE next-hop (first hop from
                # target toward cur) so it stays correct even when the
                # recorded segment is longer than seg_len
                scan = batch["scan_idx"]
                if onehot:
                    rev = _esum(
                        "bn,bn->b", _ohf(tgt_node, N + 1),
                        _pick_col(st["enext"], st["cur"]).astype(jnp.float32)
                    ).astype(jnp.int32)
                    prev = jnp.where(rev >= 0, rev, prev)
                    prev_vp = _pick1(st["node_vp"], prev)
                    tgt_vp = _pick1(st["node_vp"], tgt_node)
                    pc = w.get_cands(scan, prev_vp)
                    pk = jnp.argmax(
                        (pc["local"] == tgt_vp[:, None]) & pc["mask"], axis=1)
                    new_view = _pick1(pc["ptid"], pk)
                else:
                    rev = st["enext"][bidx, tgt_node, st["cur"]]
                    prev = jnp.where(rev >= 0, rev, prev)
                    prev_vp = st["node_vp"][bidx, prev]
                    pc = w.get_cands(scan, prev_vp)
                    pk = jnp.argmax(
                        (pc["local"] == st["node_vp"][bidx, tgt_node][:, None])
                        & pc["mask"], axis=1)
                    new_view = pc["ptid"][bidx, pk]
                # seg/action record LOCAL VIEWPOINT ids resolved BEFORE the
                # arrival update — slot indices decoded through the final
                # table (or even post-arrive) would read the wrong node
                # once the spill policy reuses a slot
                if onehot:
                    seg_vp = jnp.where(
                        seg >= 0,
                        _pickk(st["node_vp"], jnp.clip(seg, 0, r.num_nodes)),
                        -1)
                    act_vp = jnp.where(moves, tgt_vp, -1)
                else:
                    seg_vp = jnp.where(seg >= 0, st["node_vp"][
                        bidx[:, None], jnp.clip(seg, 0, r.num_nodes)], -1)
                    act_vp = jnp.where(moves, st["node_vp"][bidx, tgt_node],
                                       -1)

                st = {**st,
                      "view_ix": jnp.where(moves, new_view, st["view_ix"]),
                      "cur": jnp.where(moves, tgt_node, st["cur"]),
                      "ended": st["ended"] | just_ended}

                # arrival graph update for movers
                st = self._arrive(st, batch, st["cur"], skip=~moves)

                # records are float32 regardless of the compute dtype so
                # the early-exit skip branch (and the loss sum) are stable.
                rec = dict(action_node=act_vp,
                           seg=seg_vp, seg_hops=seg_hops,
                           target=target,
                           logits_stop=logits[:, 0].astype(jnp.float32),
                           just_ended=just_ended,
                           loss=step_loss.astype(jnp.float32))
                if os.environ.get("GOAT_DBG_REC") == "1":
                    rec["dbg_txt"] = jnp.sum(
                        txt_embeds.astype(jnp.float32), axis=(1, 2))
                    rec["dbg_gtlen"] = batch["gt_len"].astype(jnp.int32)
                    rec["dbg_uid"] = st["uid"]
                    rec["dbg_pano"] = jnp.sum(
                        pano_fused.astype(jnp.float32), axis=1)
                    rec["dbg_gmap"] = jnp.sum(
                        nav_in["gmap_img_embeds"].astype(jnp.float32),
                        axis=(1, 2)) if "gmap_img_embeds" in nav_in else \
                        jnp.zeros((B,))
                if record_logits:
                    # full fused-logit rows + per-step gmap tables for
                    # oracle parity tests (expert-decision replay)
                    rec["logits"] = logits.astype(jnp.float32)
                    rec["active"] = act
                    rec["node_vp_t"] = aux["node_vp"]
                    rec["visited_t"] = aux["visited"]
                    rec["cur_vp_t"] = pano["cur_vp"]
                return st, rec

            keys = jax.random.split(rng_loop, r.horizon)
            if train_ml:
                # rematerialize each step during training: the backward
                # through T=15 full model forwards recomputes instead of
                # storing activations (HBM is the bottleneck, FLOPs cheap).
                # remat='dots' keeps matmul outputs (recompute only the
                # cheap elementwise glue), 'none' stores everything.
                def wrap(fn):
                    if remat == "full":
                        return jax.checkpoint(fn)
                    if remat == "dots":
                        return jax.checkpoint(
                            fn, policy=jax.checkpoint_policies
                            .dots_with_no_batch_dims_saveable)
                    if remat == "ffn":
                        # save every step intermediate EXCEPT the 4x-wide
                        # FFN tensors (named "ffn_wide" in models/layers).
                        # Measured: still OOMs at B=64 (~41G) — kept for
                        # small-batch experiments; prefer 'bounds'.
                        return jax.checkpoint(
                            fn, policy=jax.checkpoint_policies
                            .save_anything_except_these_names("ffn_wide"))
                    if remat == "bounds":
                        # save ONLY the transformer layer-boundary tensors
                        # (named "blk": post-LN outputs, [*, 768] — a few
                        # MB per step), recompute everything else within
                        # the layer in the backward
                        return jax.checkpoint(
                            fn, policy=jax.checkpoint_policies
                            .save_only_these_names("blk"))
                    if remat == "probs":
                        # 'bounds' + attention-softmax outputs and dropout
                        # keep masks: the backward skips the exp/normalize
                        # recompute and the PRNG mask regeneration
                        return jax.checkpoint(
                            fn, policy=jax.checkpoint_policies
                            .save_only_these_names("blk", "attn_probs",
                                                   "drop_mask"))
                    if remat == "wide":
                        # 'probs' + the 4x-wide FFN tensors ("ffn_wide")
                        return jax.checkpoint(
                            fn, policy=jax.checkpoint_policies
                            .save_only_these_names("blk", "attn_probs",
                                                   "drop_mask", "ffn_wide"))
                    if remat in ("none", "model", "model_probs",
                                 "model_wide"):
                        # 'model*': per-call checkpoints already applied
                        # inside `apply`; the step itself is NOT
                        # rematerialized, so all bookkeeping primals are
                        # saved rather than recomputed
                        return fn
                    raise ValueError(remat)

                step_fn = wrap(step)
                T = r.horizon
                G = r.num_nodes + 2

                def zero_recs(C, Bz=B):
                    z = dict(
                        action_node=jnp.full((C, Bz), -1, jnp.int32),
                        seg=jnp.full((C, Bz, r.seg_len), -1, jnp.int32),
                        seg_hops=jnp.zeros((C, Bz)),
                        target=jnp.full((C, Bz), IGNORE_ID, jnp.int32),
                        logits_stop=jnp.zeros((C, Bz)),
                        just_ended=jnp.zeros((C, Bz), bool),
                        loss=jnp.zeros((C, Bz)),
                    )
                    if os.environ.get("GOAT_DBG_REC") == "1":
                        z["dbg_txt"] = jnp.zeros((C, Bz))
                        z["dbg_gtlen"] = jnp.zeros((C, Bz), jnp.int32)
                        z["dbg_uid"] = jnp.full((C, Bz), -1, jnp.int32)
                        z["dbg_pano"] = jnp.zeros((C, Bz))
                        z["dbg_gmap"] = jnp.zeros((C, Bz))
                    if record_logits:
                        z["logits"] = jnp.full((C, Bz, G), -jnp.inf)
                        z["active"] = jnp.zeros((C, Bz), bool)
                        z["node_vp_t"] = jnp.full((C, Bz, r.num_nodes),
                                                  -1, jnp.int32)
                        z["visited_t"] = jnp.zeros((C, Bz, r.num_nodes),
                                                   bool)
                        z["cur_vp_t"] = jnp.full((C, Bz), -1, jnp.int32)
                    return z

                if exit_chunk and exit_chunk < T:
                    # chunked early exit: skip whole chunks (fwd + bwd)
                    # once every episode in the batch has ended
                    chunks = []
                    for c0 in range(0, T, exit_chunk):
                        C = min(exit_chunk, T - c0)
                        xs_c = (jnp.arange(c0, c0 + C), keys[c0:c0 + C])

                        def run(st_c, xs_c=xs_c):
                            return jax.lax.scan(step_fn, st_c, xs_c)

                        def skip(st_c, C=C):
                            return st_c, zero_recs(C)

                        st, rc = jax.lax.cond(
                            ~jnp.all(st["ended"]), run, skip, st)
                        chunks.append(rc)
                    recs = jax.tree_util.tree_map(
                        lambda *xs: jnp.concatenate(xs, axis=0), *chunks)
                else:
                    xs = (jnp.arange(T), keys)
                    st, recs = jax.lax.scan(step_fn, st, xs,
                                            unroll=_scan_unroll())
            else:
                # inference: early-exit while_loop — episodes average far
                # fewer than `horizon` steps (the reference breaks when all
                # ended, agent.py:693-694); skipped steps were masked no-ops
                # anyway, so records keep their defaults
                T = r.horizon
                B = batch["scan_idx"].shape[0]

                def mk_rec():
                    recs = dict(
                        action_node=jnp.full((T, B), -1, jnp.int32),
                        seg=jnp.full((T, B, r.seg_len), -1, jnp.int32),
                        seg_hops=jnp.zeros((T, B)),
                        target=jnp.full((T, B), IGNORE_ID, jnp.int32),
                        logits_stop=jnp.zeros((T, B)),
                        just_ended=jnp.zeros((T, B), bool),
                        loss=jnp.zeros((T, B)),
                    )
                    if record_logits:
                        recs["logits"] = jnp.full((T, B, r.num_nodes + 2),
                                                  -jnp.inf)
                        recs["active"] = jnp.zeros((T, B), bool)
                        recs["node_vp_t"] = jnp.full(
                            (T, B, r.num_nodes), -1, jnp.int32)
                        recs["visited_t"] = jnp.zeros(
                            (T, B, r.num_nodes), bool)
                        recs["cur_vp_t"] = jnp.full((T, B), -1, jnp.int32)
                    return recs

                def cond(carry):
                    st_c, recs_c, t = carry
                    return (t < T) & ~jnp.all(st_c["ended"])

                def body(carry):
                    st_c, recs_c, t = carry
                    st_c, rec = step(st_c, (t, keys[jnp.minimum(t, T - 1)]))
                    recs_c = {k: recs_c[k].at[t].set(v)
                              for k, v in rec.items()}
                    return (st_c, recs_c, t + 1)

                st, recs, _ = jax.lax.while_loop(
                    cond, body, (st, mk_rec(), jnp.zeros((), jnp.int32)))

            # final stop-node backtrack (agent.py:666-681)
            best_stop = jnp.argmax(st["stop_prob"][:, :r.num_nodes],
                                   axis=1).astype(jnp.int32)
            back, _ = self._expand_path(st, best_stop, r.back_len)
            do_back = best_stop != st["cur"]
            back = jnp.where(do_back[:, None], back, -1)

            out = dict(
                ml_loss=jnp.sum(recs["loss"]) / B,
                # per-episode summed CE (for fused_dagger ml_weight mixing)
                loss_per_ep=jnp.sum(recs["loss"], axis=0),
                actions=recs["action_node"], segs=recs["seg"],
                seg_hops=recs["seg_hops"], targets=recs["target"],
                node_vp=st["node_vp"], stop_node=best_stop,
                back_seg=back,
                back_hops=st["ehops"][bidx, st["cur"],
                                      best_stop].astype(jnp.float32),
                final_cur=st["cur"], n_nodes=st["n_nodes"],
                overflow_n=st["overflow_n"], spilled_n=st["spilled_n"],
            )
            for dk in recs:
                if dk.startswith("dbg_"):
                    out[dk] = recs[dk]
            if "og_oid" in st:
                # predicted object id at the chosen stop node
                out["pred_obj_id"] = st["og_oid"][bidx, best_stop]
            if record_logits:
                out["logits"] = recs["logits"]
                out["active"] = recs["active"]
                out["node_vp_t"] = recs["node_vp_t"]
                out["visited_t"] = recs["visited_t"]
                out["cur_vp_t"] = recs["cur_vp_t"]
            return out

        return rollout

    def build_teacher_rollout_vec(self, deterministic: bool = False,
                                  remat: str = "model"):
        """Teacher-forced IL rollout with the panorama encoder VECTORIZED
        over steps (training-only twin of build_rollout('teacher',
        train_ml=True)).

        Under teacher forcing the trajectory — and therefore every
        geometric model input — is independent of the parameters: the
        expert follows batch['gt_path'] (agent.py:306-331) and the node
        table evolves deterministically.  So the rollout splits into:

          A. a model-free geometry scan producing all per-step pano/nav
             inputs, expert targets and embedding scatter indices;
          B. ONE batched forward_panorama over the flattened [T*B] steps
             (T small matmuls become one MXU-sized call, and the feature
             gathers coalesce into single DMAs);
          C. a nav-only scan (the [MEM] token feeds the next step's
             global/local branches, vilmodel_GOAT.py:822-826, so this part
             stays sequential) that rebuilds the running node embeddings
             from recorded indices and accumulates the CE loss.

        Loss/grad are EXACTLY equal to the scan rollout when
        deterministic=True (tests/test_vec_teacher.py); under dropout the
        draws differ (one mask per phase-B call instead of per step) —
        same Bernoulli distributions, documented randomness divergence.
        Returns the training subset of build_rollout's outputs.

        (A forced-replay variant of this decomposition — two-pass DAgger,
        where a grad-free sampled pass recorded actions and this rollout
        replayed them with prefix chunking — was built and measured in
        round 5: 0.9 eps/s vs the 104.7 same-session control, killed by
        host-keyed (T2, chunk-spec) shape churn.  Pruned per the
        promote-or-prune rule; see ROADMAP round-5 A/B table.)"""
        model, w, r, c = self.model, self.world, self.rcfg, self.mcfg
        # every policy except 'none' checkpoints the model calls: the
        # batched [T*B] pano forward and the per-step nav forwards must
        # not store their internals (the pano FFN-wide tensors alone are
        # ~220MB each at B=64) — save inputs/outputs, recompute in bwd
        model_ckpt = remat != "none"

        def apply(params, rng, method, *args, ckpt=False, **kw):
            kw["deterministic"] = deterministic
            static_kw = {k: v for k, v in kw.items()
                         if v is None or isinstance(v, (bool, int, float, str))}
            arr_kw = {k: v for k, v in kw.items() if k not in static_kw}

            def call(params, rng, args, arr_kw):
                kw2 = {**arr_kw, **static_kw}
                if deterministic:
                    return model.apply(params, *args, method=method, **kw2)
                return model.apply(params, *args, method=method,
                                   rngs={"dropout": rng}, **kw2)

            if ckpt and model_ckpt:
                if remat in ("probs", "model_probs"):
                    call = jax.checkpoint(
                        call, policy=jax.checkpoint_policies
                        .save_only_these_names("blk", "attn_probs",
                                               "drop_mask"))
                elif remat in ("wide", "model_wide"):
                    call = jax.checkpoint(
                        call, policy=jax.checkpoint_policies
                        .save_only_these_names("blk", "attn_probs",
                                               "drop_mask", "ffn_wide"))
                else:
                    call = jax.checkpoint(call)
            return call(params, rng, args, arr_kw)

        T = r.horizon
        N, N1 = r.num_nodes, r.num_nodes + 1
        objnav = w.num_objs > 0 and c.is_objnav

        def rollout(params, batch, rng, txt=None):
            B = batch["scan_idx"].shape[0]
            bidx = jnp.arange(B)
            rng_txt, rng_pano, rng_loop = jax.random.split(rng, 3)

            if txt is None:
                txt = self.encode_text(params, batch, rng_txt,
                                       deterministic=deterministic)
            txt_embeds, txt_kv = txt["embeds"], txt["kv"]
            txt_masks = batch["txt_masks"]

            st = self.init_state(batch, need_dtw=False)
            # the embedding state lives in phase C; the geometry scan only
            # records the scatter indices that drive it
            for k in ("embed_sum", "embed_cnt", "stop_prob", "last_embeds"):
                st.pop(k, None)

            # ---------------- phase A: geometry scan (no model) --------
            onehot = _use_onehot()

            def geo_step(st, t):
                act = ~st["ended"]
                if onehot:
                    tb = jnp.broadcast_to(t + 1, (B,)).astype(jnp.int32)
                    st = {**st, "step_id": _set1(st["step_id"], st["cur"],
                                                 tb, act)}
                else:
                    st = {**st,
                          "step_id": st["step_id"].at[bidx, st["cur"]].set(
                              jnp.where(act, t + 1,
                                        st["step_id"][bidx, st["cur"]]))}
                cur_slot = st["cur"]
                cur_vp = _pick1(st["node_vp"], cur_slot) if onehot \
                    else st["node_vp"][bidx, cur_slot]
                vi = st["view_ix"]
                # full pano-input trace: the img/loc gathers are unused
                # here and dead-code-eliminated by XLA; only the candidate
                # tables / camera / masks survive into the recorded ys
                pano = self._pano_inputs(st, batch)
                cands = pano["cands"]
                K = cands["local"].shape[1]
                known = jnp.where(
                    jnp.arange(N)[None, :] < st["n_nodes"][:, None],
                    st["node_vp"][:, :N], -2)
                cmatch = known[:, None, :] == cands["local"][:, :, None]
                cnode = jnp.argmax(cmatch, -1).astype(jnp.int32)
                chas = cmatch.any(-1) & cands["mask"]
                cand_vis = _pickk(st["visited"], cnode) if onehot \
                    else st["visited"][bidx[:, None], cnode]
                add = cands["mask"] & ~cand_vis & act[:, None] & cmatch.any(-1)
                tgt = jnp.where(add, cnode, r.num_nodes)

                nav_geo, aux = self._nav_inputs(st, batch, pano, None,
                                                cnode=cnode, has=chas,
                                                embeds=False)
                target = self._teacher(st, batch, aux, t, imitation=True)
                a = jnp.maximum(target, 0)
                goal = _pick1(batch["gt_path"], batch["gt_len"] - 1) \
                    if onehot else batch["gt_path"][bidx, batch["gt_len"] - 1]
                a_stop = (cur_vp == goal) | (a == 0)
                just_ended = act & (a_stop | aux["no_vp_left"]
                                    | (t == T - 1))
                moves = act & ~just_ended
                tgt_node = jnp.clip(a - 2, 0, r.num_nodes - 1)

                # camera update (arrival-edge view of prev->action)
                _, prev = self._expand_path(st, tgt_node, r.seg_len)
                scan = batch["scan_idx"]
                if onehot:
                    rev = _esum(
                        "bn,bn->b", _ohf(tgt_node, N1),
                        _pick_col(st["enext"], st["cur"]).astype(jnp.float32)
                    ).astype(jnp.int32)
                    prev = jnp.where(rev >= 0, rev, prev)
                    prev_vp = _pick1(st["node_vp"], prev)
                    tgt_vp = _pick1(st["node_vp"], tgt_node)
                    pc = w.get_cands(scan, prev_vp)
                    pk = jnp.argmax(
                        (pc["local"] == tgt_vp[:, None]) & pc["mask"], axis=1)
                    new_view = _pick1(pc["ptid"], pk)
                else:
                    rev = st["enext"][bidx, tgt_node, st["cur"]]
                    prev = jnp.where(rev >= 0, rev, prev)
                    prev_vp = st["node_vp"][bidx, prev]
                    pc = w.get_cands(scan, prev_vp)
                    pk = jnp.argmax(
                        (pc["local"] == st["node_vp"][bidx, tgt_node][:, None])
                        & pc["mask"], axis=1)
                    new_view = pc["ptid"][bidx, pk]

                st = {**st,
                      "view_ix": jnp.where(moves, new_view, st["view_ix"]),
                      "cur": jnp.where(moves, tgt_node, st["cur"]),
                      "ended": st["ended"] | just_ended}
                st = self._arrive(st, batch, st["cur"], skip=~moves)
                keep = ~st["emb_clear"] if "emb_clear" in st \
                    else jnp.ones((B, N1), bool)

                ys = dict(cur_vp=cur_vp, view_ix=vi, act=act,
                          cur_slot=cur_slot, add=add, tgt=tgt, keep=keep,
                          target=target, geo=nav_geo)
                if objnav and "gt_obj_slot" in batch:
                    ys["at_goal"] = cur_vp == goal
                return st, ys

            st, ys = jax.lax.scan(geo_step, st, jnp.arange(T),
                                  unroll=_scan_unroll())

            # ---------------- phase B: batched panorama ----------------
            def flat(x):
                return x.reshape((T * B,) + x.shape[2:])

            def tile(x):
                return jnp.tile(jnp.asarray(x),
                                (T,) + (1,) * (jnp.asarray(x).ndim - 1))

            scan_f = tile(batch["scan_idx"])
            use_aug = batch.get("use_aug")
            pano_f = self._pano_inputs(
                None, batch, cur_vp=flat(ys["cur_vp"]),
                view_ix=flat(ys["view_ix"]), scan=scan_f,
                use_aug=None if use_aug is None else tile(use_aug))
            obj_kw = {}
            if pano_f.get("objs") is not None:
                obj_kw = dict(obj_fts=pano_f["objs"]["feat"],
                              obj_masks=pano_f["objs"]["mask"],
                              obj_names=pano_f["objs"]["name"])
            if "img_z_features" in batch:
                obj_kw["z_img_features"] = tile(batch["img_z_features"])
                obj_kw["z_img_pzs"] = tile(batch["img_z_pzs"])
            pano_img = pano_f["img"]
            if "feat_noise" in batch:
                pano_img = pano_img * batch["feat_noise"][None, None, :]
                obj_kw["already_dropout"] = True
            pano_embeds_f, pano_masks_f, pano_fused_f = apply(
                params, rng_pano, GoatModel.forward_panorama,
                pano_img, pano_f["loc"], pano_f["nav_types"],
                pano_f["mask"], ckpt=True, **obj_kw)
            if pano_fused_f is None:
                m = pano_masks_f[..., None].astype(pano_embeds_f.dtype)
                pano_fused_f = (jnp.sum(pano_embeds_f * m, 1)
                                / jnp.maximum(jnp.sum(m, 1), 1.0))

            def unflat(x):
                return x.reshape((T, B) + x.shape[1:])

            pano_embeds = unflat(pano_embeds_f)
            pano_fused = unflat(pano_fused_f)
            K = pano_f["cands"]["local"].shape[1]
            oid = None
            if objnav and pano_f.get("objs") is not None:
                oid = unflat(pano_f["objs"]["oid"])

            # ---------------- phase C: nav-only scan -------------------
            D = c.hidden_size
            xs = dict(pe=pano_embeds, pf=pano_fused, act=ys["act"],
                      cur=ys["cur_slot"], add=ys["add"], tgt=ys["tgt"],
                      keep=ys["keep"], target=ys["target"], geo=ys["geo"],
                      t=jnp.arange(T))
            if oid is not None and "at_goal" in ys:
                xs["oid"] = oid
                xs["at_goal"] = ys["at_goal"]

            def make_nav_step(Bj, txt_e, txt_m, txt_k, batch_j):
                bidx_j = jnp.arange(Bj)

                def nav_step(carry, xs_t):
                    es, ec, last = carry
                    act = xs_t["act"]
                    cur = xs_t["cur"]
                    if onehot:
                        es = _set1(es, cur, xs_t["pf"].astype(es.dtype), act)
                        ec = _set1(ec, cur, jnp.ones((Bj,), ec.dtype), act)
                        oh_t = _ohf(xs_t["tgt"], N1)
                        addf = xs_t["add"].astype(jnp.float32)
                        pe = xs_t["pe"][:, :K].astype(jnp.float32) \
                            * addf[..., None]
                        es = es + _esum("bkn,bkd->bnd", oh_t, pe
                                        ).astype(es.dtype)
                        ec = ec + _esum("bkn,bk->bn", oh_t, addf)
                    else:
                        es = es.at[bidx_j, cur].set(
                            jnp.where(act[:, None], xs_t["pf"],
                                      es[bidx_j, cur]))
                        ec = ec.at[bidx_j, cur].set(
                            jnp.where(act, 1.0, ec[bidx_j, cur]))
                        es = es.at[bidx_j[:, None], xs_t["tgt"]].add(
                            jnp.where(xs_t["add"][..., None],
                                      xs_t["pe"][:, :K].astype(jnp.float32),
                                      0.0))
                        ec = ec.at[bidx_j[:, None], xs_t["tgt"]].add(
                            xs_t["add"].astype(jnp.float32))

                    gmap_img, vp_img = _nav_embed_assemble(
                        es, ec, last, xs_t["pe"], N, D)
                    nav_in = dict(xs_t["geo"], gmap_img_embeds=gmap_img,
                                  vp_img_embeds=vp_img)
                    if "front_vp_feats" in batch_j:
                        nav_in["front_vp_feats"] = batch_j["front_vp_feats"]
                    if "front_gmap_feats" in batch_j:
                        nav_in["front_gmap_feats"] = \
                            batch_j["front_gmap_feats"]
                    rn = jax.random.split(
                        jax.random.fold_in(rng_loop, xs_t["t"]), 2)[1]
                    outs = apply(params, rn, GoatModel.forward_navigation,
                                 txt_e, txt_m, ckpt=True,
                                 txt_kv=txt_k, **nav_in)
                    logits = outs["fused_logits"]
                    last = jnp.where(act[:, None],
                                     outs["cls_embeds"].astype(last.dtype),
                                     last)

                    og_loss = jnp.zeros((Bj,))
                    if "oid" in xs_t and "gt_obj_slot" in batch_j:
                        gt_slot = batch_j["gt_obj_slot"]
                        has_obj = jnp.any(jnp.isfinite(outs["obj_logits"]),
                                          axis=1)
                        ok = act & xs_t["at_goal"] & (gt_slot >= 0) & has_obj
                        safe = jnp.where(has_obj[:, None],
                                         outs["obj_logits"], 0.0)
                        ologp = jax.nn.log_softmax(safe, axis=1)
                        oli = jnp.take_along_axis(
                            ologp, jnp.maximum(gt_slot, 0)[:, None], 1)[:, 0]
                        og_loss = -jnp.where(ok, oli, 0.0)

                    target = xs_t["target"]
                    logp = jax.nn.log_softmax(logits.astype(jnp.float32),
                                              axis=1)
                    tgt_ok = target >= 0
                    li = jnp.take_along_axis(
                        logp, jnp.maximum(target, 0)[:, None], axis=1)[:, 0]
                    step_loss = -jnp.where(tgt_ok, li, 0.0) + og_loss

                    keep = xs_t["keep"]
                    es = es * keep[..., None]
                    ec = ec * keep
                    return (es, ec, last), step_loss.astype(jnp.float32)

                return nav_step

            carry0 = (jnp.zeros((B, N1, D), jnp.float32),
                      jnp.zeros((B, N1), jnp.float32),
                      jnp.zeros((B, D), jnp.float32))
            batch_full = {k: batch[k]
                          for k in ("front_vp_feats", "front_gmap_feats",
                                    "gt_obj_slot", "feat_noise")
                          if k in batch}
            _, losses = jax.lax.scan(
                make_nav_step(B, txt_embeds, txt_masks, txt_kv, batch_full),
                carry0, xs, unroll=_scan_unroll())

            return dict(
                ml_loss=jnp.sum(losses) / B,
                loss_per_ep=jnp.sum(losses, axis=0),
                targets=ys["target"],
                overflow_n=st["overflow_n"], spilled_n=st["spilled_n"],
                n_nodes=st["n_nodes"],
            )

        return rollout

    def jitted(self, feedback="argmax", train_ml=False, deterministic=True,
               sample_feedback="sample", remat="full"):
        # trace-time env flags must key the cache too, or flipping them
        # in-process silently returns a stale trace (ADVICE r3)
        key = (feedback, train_ml, deterministic, sample_feedback, remat,
               _use_onehot(), _scan_unroll())
        if key not in self._jitted:
            self._jitted[key] = jax.jit(
                self.build_rollout(feedback, train_ml, deterministic,
                                   sample_feedback=sample_feedback,
                                   remat=remat))
        return self._jitted[key]


# host-side trajectory postprocessing lives in rollout/trajectory.py;
# re-exported here for the existing import surface
from .trajectory import assemble_trajectories, trajectory_to_json  # noqa: E402,F401
