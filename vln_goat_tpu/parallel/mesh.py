"""Device mesh + sharding helpers.

The reference's only live distribution strategy is single-node DDP over NCCL
(SURVEY.md section 2.5).  The TPU-native equivalent: a 1-D data-parallel mesh
over ICI; batches sharded on the leading axis, parameters replicated, and
XLA inserts the gradient all-reduce from sharding propagation — no explicit
collectives, no file:// rendezvous (utils/distributed.py:56-61 has no
analogue here; multi-host init is `jax.distributed.initialize`).

The GOAT model is ~160M params (hidden 768) — far below the threshold where
tensor/pipeline sharding pays off, so DP is the first-class strategy; the
mesh axes are still written ('dp',) so a 2-D ('dp','mp') extension slots in.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), ("dp",))


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Shard every batch-leading leaf across 'dp'; replicate the rest.

    The batch size is inferred from the episode batch's `scan_idx` leaf when
    present; leaves without that leading dim (e.g. the shared
    back-translation `feat_noise` vector [Df]) are replicated."""
    data_sh = NamedSharding(mesh, P("dp"))
    repl_sh = NamedSharding(mesh, P())
    B = None
    if isinstance(batch, dict) and "scan_idx" in batch:
        B = batch["scan_idx"].shape[0]

    def put(x):
        if B is None or (hasattr(x, "ndim") and x.ndim >= 1
                         and x.shape[0] == B):
            return jax.device_put(x, data_sh)
        return jax.device_put(x, repl_sh)

    return jax.tree.map(put, batch)


def replicate_tree(tree: Any, mesh: Mesh) -> Any:
    sh = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
