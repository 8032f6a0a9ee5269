"""NavWorld: device-resident packed navigation tables for a set of scans.

This replaces the reference's per-step host pipeline (MatterSim C++ calls +
h5py feature reads + numpy packing + .cuda() copies per step — the single
biggest throughput sink, SURVEY.md section 3 boundaries) with one upfront
host->device transfer; the episode loop then never leaves the device.

Layout: scans padded to Vmax viewpoints; features flattened to a global
[Vtot, 36, Df] array addressed by vp_offset[scan] + local index.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..sim.graph_sim import ScanGraph

INF_DIST = 9.5e5  # sentinel for "no path yet" (FloydGraph uses 95959595)


@jax.tree_util.register_pytree_node_class
@dataclass
class NavWorld:
    """All arrays live on device; every field is a leaf of one pytree so the
    whole world can be passed straight into jit/scan."""

    # per-scan, padded to Vmax
    pos: jnp.ndarray          # [S, Vmax, 3]
    cand_local: jnp.ndarray   # [S, Vmax, K] int32 (-1 pad)
    cand_ptid: jnp.ndarray    # [S, Vmax, K] int32
    cand_heading: jnp.ndarray # [S, Vmax, K] f32 (absolute direction)
    cand_elev: jnp.ndarray    # [S, Vmax, K] f32
    cand_dist: jnp.ndarray    # [S, Vmax, K] f32
    cand_mask: jnp.ndarray    # [S, Vmax, K] bool
    dist: jnp.ndarray         # [S, Vmax, Vmax] f32 full-graph shortest dist
    hops: jnp.ndarray         # [S, Vmax, Vmax] i32
    nexthop: jnp.ndarray      # [S, Vmax, Vmax] i32 full-graph first hop
    n_vps: jnp.ndarray        # [S] i32
    vp_offset: jnp.ndarray    # [S] i32 into feat
    # features
    feat: jnp.ndarray         # [Vtot, 36, Df]
    # EnvEdit augmented features, zero-width [0, 36, Df] when absent
    # (r2r/env.py:78-84 alternation)
    feat_aug: jnp.ndarray = None
    # objects (REVERIE/SOON; zero-width when absent)
    obj_feat: jnp.ndarray = None     # [Vtot, Lo, Dobj]
    obj_loc: jnp.ndarray = None      # [Vtot, Lo, A+3] (angle + box fts)
    obj_dir: jnp.ndarray = None      # [Vtot, Lo, 2] absolute (heading, elev)
    obj_mask: jnp.ndarray = None     # [Vtot, Lo]
    obj_name: jnp.ndarray = None     # [Vtot, Lo] i32 category id
    obj_id: jnp.ndarray = None       # [Vtot, Lo] i32 dataset object id

    def tree_flatten(self):
        # NOTE all leaves must be arrays (None would vanish from the pytree
        # and break unflatten); build() materializes zero-width arrays.
        leaves = (self.pos, self.cand_local, self.cand_ptid, self.cand_heading,
                  self.cand_elev, self.cand_dist, self.cand_mask, self.dist,
                  self.hops, self.nexthop, self.n_vps, self.vp_offset,
                  self.feat, self.feat_aug, self.obj_feat, self.obj_loc,
                  self.obj_dir, self.obj_mask, self.obj_name, self.obj_id)
        return leaves, None

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves)

    @property
    def max_cands(self) -> int:
        return self.cand_local.shape[-1]

    @property
    def feat_dim(self) -> int:
        return self.feat.shape[-1]

    # ------------------------------------------------------------------
    @property
    def num_objs(self) -> int:
        return 0 if self.obj_feat is None else self.obj_feat.shape[1]

    @property
    def has_aug(self) -> bool:
        return self.feat_aug is not None and self.feat_aug.shape[0] > 0

    def get_objs(self, scan, vp):
        """Object tables for (scan, vp): each [B, Lo, ...]."""
        g = self.vp_offset[scan] + vp
        d = self.obj_dir[g]
        return dict(feat=self.obj_feat[g], loc=self.obj_loc[g],
                    dir=d if d.shape[1] else None,
                    mask=self.obj_mask[g], name=self.obj_name[g],
                    oid=self.obj_id[g])

    @classmethod
    def build(cls, scans: Sequence[ScanGraph],
              features: Optional[np.ndarray] = None,
              feat_dim: int = 768, feat_dtype=jnp.float32,
              objects: Optional[dict] = None,
              aug_features: Optional[np.ndarray] = None,
              seed: int = 0) -> "NavWorld":
        """Pack ScanGraphs (+ per-viewpoint 36-view features) onto device.

        features: [sum(V_s), 36, Df] in scan order, or None for random
        synthetic features (test fixtures).
        objects: optional dict of arrays {feat [Vtot, Lo, Dobj],
        loc [Vtot, Lo, A+3], mask [Vtot, Lo], name [Vtot, Lo],
        oid [Vtot, Lo]} (REVERIE object store,
        reverie/env.py:452-457 ObjectFeatureDB equivalent).
        """
        S = len(scans)
        Vmax = max(g.num_vps for g in scans)
        K = scans[0].cand_local.shape[1]

        def pad2(x, fill):
            out = np.full((S, Vmax) + x[0].shape[1:], fill, x[0].dtype)
            for s, a in enumerate(x):
                out[s, :a.shape[0]] = a
            return out

        pos = pad2([g.pos for g in scans], 0.0)
        cand_local = pad2([g.cand_local for g in scans], -1)
        cand_ptid = pad2([g.cand_ptid for g in scans], 0)
        cand_heading = pad2([g.cand_heading for g in scans], 0.0)
        cand_elev = pad2([g.cand_elev for g in scans], 0.0)
        cand_dist = pad2([g.cand_dist for g in scans], 0.0)
        cand_mask = pad2([g.cand_mask for g in scans], False)

        dist = np.full((S, Vmax, Vmax), INF_DIST, np.float32)
        hops = np.zeros((S, Vmax, Vmax), np.int32)
        nexthop = np.full((S, Vmax, Vmax), -1, np.int32)
        for s, g in enumerate(scans):
            V = g.num_vps
            d = np.where(np.isinf(g.dist), INF_DIST, g.dist)
            dist[s, :V, :V] = d
            hops[s, :V, :V] = g.hops
            nexthop[s, :V, :V] = g.nexthop

        n_vps = np.array([g.num_vps for g in scans], np.int32)
        vp_offset = np.concatenate([[0], np.cumsum(n_vps)[:-1]]).astype(np.int32)
        vtot = int(n_vps.sum())
        if features is None:
            rng = np.random.default_rng(seed)
            features = rng.standard_normal((vtot, 36, feat_dim)).astype(np.float32)
        assert features.shape[0] == vtot, (features.shape, vtot)

        if objects is not None:
            obj_kw = dict(
                obj_feat=jnp.asarray(objects["feat"], feat_dtype),
                obj_loc=jnp.asarray(objects["loc"]),
                # zero-width when the caller has no raw directions (legacy
                # static-loc convention); see tree_flatten NOTE on None
                obj_dir=(jnp.asarray(objects["dir"], jnp.float32)
                         if objects.get("dir") is not None
                         else jnp.zeros((vtot, 0, 2))),
                obj_mask=jnp.asarray(objects["mask"]),
                obj_name=jnp.asarray(objects["name"], jnp.int32),
                obj_id=jnp.asarray(objects["oid"], jnp.int32),
            )
        else:
            obj_kw = dict(
                obj_feat=jnp.zeros((vtot, 0, 1), feat_dtype),
                obj_loc=jnp.zeros((vtot, 0, 7)),
                obj_dir=jnp.zeros((vtot, 0, 2)),
                obj_mask=jnp.zeros((vtot, 0), bool),
                obj_name=jnp.zeros((vtot, 0), jnp.int32),
                obj_id=jnp.zeros((vtot, 0), jnp.int32),
            )
        obj_kw["feat_aug"] = (
            jnp.asarray(aug_features, feat_dtype) if aug_features is not None
            else jnp.zeros((0, 36, feat_dim), feat_dtype))
        return cls(
            pos=jnp.asarray(pos), cand_local=jnp.asarray(cand_local),
            cand_ptid=jnp.asarray(cand_ptid),
            cand_heading=jnp.asarray(cand_heading),
            cand_elev=jnp.asarray(cand_elev), cand_dist=jnp.asarray(cand_dist),
            cand_mask=jnp.asarray(cand_mask), dist=jnp.asarray(dist),
            hops=jnp.asarray(hops), nexthop=jnp.asarray(nexthop),
            n_vps=jnp.asarray(n_vps),
            vp_offset=jnp.asarray(vp_offset),
            feat=jnp.asarray(features, feat_dtype), **obj_kw,
        )

    # ------------------------------------------------------------------
    # gathers used by the rollout (scan = [B] scan index, vp = [B] local idx)
    def get_feat(self, scan, vp, use_aug=None):
        idx = self.vp_offset[scan] + vp
        base = self.feat[idx]
        if use_aug is None or not self.has_aug:
            return base
        return jnp.where(use_aug[:, None, None], self.feat_aug[idx], base)

    def get_pos(self, scan, vp):
        return self.pos[scan, vp]

    def get_cands(self, scan, vp):
        """All candidate tables for (scan, vp): each [B, K]."""
        return dict(
            local=self.cand_local[scan, vp],
            ptid=self.cand_ptid[scan, vp],
            heading=self.cand_heading[scan, vp],
            elev=self.cand_elev[scan, vp],
            dist=self.cand_dist[scan, vp],
            mask=self.cand_mask[scan, vp],
        )

    def get_dist(self, scan, a, b):
        return self.dist[scan, a, b]
