"""ctypes bindings for the native runtime (csrc/goat_native.cpp).

Builds on demand via `make -C csrc` when the shared object is missing and a
compiler is available; every entry point has a pure-python fallback
elsewhere in the package (sim/graph_sim.py, eval/bleu.py, tools/kmeans.py),
so the framework stays importable without a toolchain.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_CSRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "csrc")
_SO = os.path.join(_CSRC, "libgoat_native.so")
_lib = None


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    src = os.path.join(_CSRC, "goat_native.cpp")
    stale = (not os.path.exists(_SO)
             or (os.path.exists(src)
                 and os.path.getmtime(src) > os.path.getmtime(_SO)))
    if stale:
        try:
            subprocess.run(["make", "-C", _CSRC], check=True,
                           capture_output=True)
        except Exception:
            if not os.path.exists(_SO):
                return None
    try:
        _lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    _lib.bucket_by_size.restype = ctypes.c_int
    return _lib


def available() -> bool:
    return _load() is not None


def _i32(a):
    return np.ascontiguousarray(a, np.int32)


def _f32(a):
    return np.ascontiguousarray(a, np.float32)


def _ptr(a):
    return a.ctypes.data_as(ctypes.c_void_p)


def apsp(V: int, edges: np.ndarray, weights: np.ndarray
         ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """edges [E,2] int, weights [E] -> (dist [V,V] f32, hops, nexthop i32)."""
    lib = _load()
    assert lib is not None, "native library unavailable"
    E = len(edges)
    ea, eb = _i32(edges[:, 0]), _i32(edges[:, 1])
    w = _f32(weights)
    dist = np.empty((V, V), np.float32)
    hops = np.empty((V, V), np.int32)
    nexthop = np.empty((V, V), np.int32)
    lib.apsp(V, E, _ptr(ea), _ptr(eb), _ptr(w), _ptr(dist), _ptr(hops),
             _ptr(nexthop))
    return dist, hops, nexthop


def nearest_view(heading: np.ndarray, elev: np.ndarray) -> np.ndarray:
    lib = _load()
    assert lib is not None
    h, e = _f32(np.ravel(heading)), _f32(np.ravel(elev))
    out = np.empty(h.shape, np.int32)
    lib.nearest_view(len(h), _ptr(h), _ptr(e), _ptr(out))
    return out.reshape(np.shape(heading))


def bleu_stats(hyp: np.ndarray, refs: list, max_n: int = 4):
    """-> (clipped [max_n] i64, totals [max_n] i64, closest_ref_len)."""
    lib = _load()
    assert lib is not None
    hyp = _i32(hyp)
    ref_lens = _i32([len(r) for r in refs])
    flat = _i32(np.concatenate([np.asarray(r, np.int32) for r in refs])
                if refs else np.zeros(0, np.int32))
    clipped = np.zeros(max_n, np.int64)
    totals = np.zeros(max_n, np.int64)
    closest = np.zeros(1, np.int32)
    lib.bleu_stats(len(hyp), _ptr(hyp), len(refs), _ptr(ref_lens), _ptr(flat),
                   max_n, _ptr(clipped), _ptr(totals), _ptr(closest))
    return clipped, totals, int(closest[0])


def edit_distance_batch(a_list: list, b_list: list) -> np.ndarray:
    lib = _load()
    assert lib is not None
    B = len(a_list)
    maxa = max((len(a) for a in a_list), default=1) or 1
    maxb = max((len(b) for b in b_list), default=1) or 1
    a = np.zeros((B, maxa), np.int32)
    b = np.zeros((B, maxb), np.int32)
    la = np.zeros(B, np.int32)
    lb = np.zeros(B, np.int32)
    for i, (x, y) in enumerate(zip(a_list, b_list)):
        a[i, :len(x)] = x
        b[i, :len(y)] = y
        la[i], lb[i] = len(x), len(y)
    out = np.empty(B, np.int32)
    lib.edit_distance_batch(B, maxa, maxb, _ptr(a), _ptr(la), _ptr(b),
                            _ptr(lb), _ptr(out))
    return out


def bucket_by_size(sizes: np.ndarray, max_tokens: int,
                   max_items: int = 1 << 30) -> np.ndarray:
    lib = _load()
    assert lib is not None
    s = _i32(sizes)
    out = np.empty(len(s), np.int32)
    lib.bucket_by_size(len(s), _ptr(s), max_tokens, max_items, _ptr(out))
    return out


def kmeans_lloyd(x: np.ndarray, centers: np.ndarray,
                 iters: int = 50) -> Tuple[np.ndarray, np.ndarray]:
    lib = _load()
    assert lib is not None
    x = _f32(x)
    centers = _f32(centers).copy()
    assign = np.empty(len(x), np.int32)
    lib.kmeans_lloyd(x.shape[0], x.shape[1], centers.shape[0], iters,
                     _ptr(x), _ptr(centers), _ptr(assign))
    return centers, assign


_TB_MODES = {"none": 0, None: 0, "complete": 1, "complete_doc": 2,
             "eos": 3}


def token_block_slices(sizes: np.ndarray, block_size: int,
                       break_mode: str = "none",
                       document_sep_len: int = 1,
                       block_multiple_min: int = 1,
                       block_multiple_max: int = 1,
                       block_sizes: Optional[np.ndarray] = None
                       ) -> np.ndarray:
    """Token-block slicing (fairseq token_block_utils_fast
    _get_slice_indices_fast): -> [n_blocks, 2] int64 (start, end)."""
    lib = _load()
    assert lib is not None
    lib.token_block_slices.restype = ctypes.c_int
    s = np.ascontiguousarray(sizes, np.int64)
    mode = _TB_MODES[break_mode]
    bs_arr = (np.ascontiguousarray(block_sizes, np.int64)
              if block_sizes is not None else None)
    bs_ptr = _ptr(bs_arr) if bs_arr is not None else None
    n = lib.token_block_slices(
        len(s), _ptr(s), mode, ctypes.c_int64(block_size),
        ctypes.c_int64(document_sep_len), block_multiple_min,
        block_multiple_max, bs_ptr, None, 0)
    out = np.empty((n, 2), np.int64)
    lib.token_block_slices(
        len(s), _ptr(s), mode, ctypes.c_int64(block_size),
        ctypes.c_int64(document_sep_len), block_multiple_min,
        block_multiple_max, bs_ptr, _ptr(out), n)
    return out


def block_to_dataset_index(sizes: np.ndarray,
                           slices: np.ndarray) -> np.ndarray:
    """(start_ds_idx, start_offset, end_ds_idx) per block
    (_get_block_to_dataset_index_fast)."""
    lib = _load()
    assert lib is not None
    s = np.ascontiguousarray(sizes, np.int64)
    sl = np.ascontiguousarray(slices, np.int64)
    out = np.empty((len(sl), 3), np.int64)
    lib.block_to_dataset_index(len(s), _ptr(s), len(sl), _ptr(sl), _ptr(out))
    return out
