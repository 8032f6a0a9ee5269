"""Multi-host distributed runtime.

Reference: map_nav_src/utils/distributed.py — NCCL process group with
file:// rendezvous (:56-61), pickled-object all_gather over padded byte
tensors (:90-130), reduce_dict (:133), merge_dist_results (:160), and
rank-sharded validation (main_nav.py:132 + env.py:126-134).

TPU-native equivalents:
- `init_distributed` -> jax.distributed.initialize (coordinator rendezvous
  over DCN; no sync files);
- the pickled all_gather of eval predictions ->
  multihost_utils.process_allgather on host arrays, plus a generic
  object gather built on it (pickle -> uint8 -> allgather);
- reduce_dict -> psum under pjit (gradients already handled by sharding
  propagation — SURVEY.md section 2.5).
"""
from __future__ import annotations

import pickle
from typing import Any, Dict, List, Optional

import numpy as np


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None):
    """jax.distributed.initialize wrapper; no-op in single-process runs."""
    import jax

    if num_processes is None or num_processes <= 1:
        return False
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def process_count() -> int:
    import jax

    return jax.process_count()


def process_index() -> int:
    import jax

    return jax.process_index()


def shard_data_for_process(data: List, t_split: Optional[int] = None,
                           n_splits: Optional[int] = None) -> List:
    """Rank-sharded validation data (sel_data_idxs slicing,
    r2r/env.py:126-134)."""
    t = process_index() if t_split is None else t_split
    n = process_count() if n_splits is None else n_splits
    if n <= 1:
        return data
    per = len(data) // n
    start = per * t
    end = None if t == n - 1 else start + per
    return data[start:end]


def all_gather_objects(obj: Any) -> List[Any]:
    """Gather arbitrary pickled objects from every process
    (utils/distributed.py:90-130 equivalent)."""
    import jax

    if jax.process_count() <= 1:
        return [obj]
    from jax.experimental import multihost_utils

    buf = np.frombuffer(pickle.dumps(obj), np.uint8)
    size = np.array([len(buf)], np.int64)
    sizes = np.asarray(multihost_utils.process_allgather(size)).reshape(-1)
    maxlen = int(sizes.max())
    padded = np.zeros((maxlen,), np.uint8)
    padded[:len(buf)] = buf
    gathered = np.asarray(multihost_utils.process_allgather(padded))
    return [pickle.loads(gathered[i, :int(sizes[i])].tobytes())
            for i in range(len(sizes))]


def merge_dist_results(results: List[List]) -> List:
    """Flatten per-process prediction lists (utils/distributed.py:160)."""
    out = []
    for r in results:
        out.extend(r)
    return out
