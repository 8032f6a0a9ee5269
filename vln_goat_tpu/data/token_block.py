"""Token-block slicing for LM-style datasets — the TPU-era equivalent of
fairseq's token_block_utils_fast.pyx (the one remaining native component of
the reference's vendored fairseq, SURVEY.md section 2.4; dead code there,
rebuilt here as mandated).

Pure-numpy reference implementation; the C++ fast path
(csrc/goat_native.cpp token_block_slices / block_to_dataset_index) is used
when the native library is built.  Break modes follow
_get_slice_indices_fast:

- 'none':          fixed block_size windows over the flat token stream
- 'complete':      blocks of whole sentences, <= block_size tokens
- 'complete_doc':  like complete, but document_sep_len-sized sentences mark
                   document boundaries; only blocks with > 1 token are kept
- 'eos':           one block per sentence
"""
from __future__ import annotations

from typing import Optional

import numpy as np


def token_block_slices(sizes, block_size: int, break_mode: str = "none",
                       document_sep_len: int = 1,
                       block_multiple_min: int = 1,
                       block_multiple_max: int = 1,
                       block_sizes: Optional[np.ndarray] = None,
                       use_native: bool = True) -> np.ndarray:
    sizes = np.asarray(sizes, np.int64)
    if use_native:
        try:
            from ..native import available, token_block_slices as nat

            if available():
                return nat(sizes, block_size, break_mode, document_sep_len,
                           block_multiple_min, block_multiple_max,
                           block_sizes)
        except Exception:
            pass
    total = int(sizes.sum())
    if break_mode in (None, "none"):
        length = -(-total // block_size)
        starts = np.arange(length, dtype=np.int64) * block_size
        ends = np.minimum(starts + block_size, total)
        return np.stack([starts, ends], axis=1)
    if break_mode == "eos":
        cum = np.cumsum(sizes)
        out = np.zeros((len(sizes), 2), np.int64)
        out[1:, 0] = cum[:-1]
        out[:, 1] = cum
        return out

    def next_bs(counter):
        if block_multiple_max > 1 and block_sizes is not None:
            return int(block_sizes[counter])
        return block_multiple_min * block_size

    counter = 0
    bs = next_bs(counter)
    out, tok, curr, i = [], 0, 0, 0
    if break_mode == "complete":
        while i < len(sizes):
            if curr + sizes[i] <= bs or curr == 0:
                curr += int(sizes[i])
                i += 1
            else:
                out.append((tok, tok + curr))
                tok += curr
                curr = 0
                counter += 1
                bs = next_bs(counter)
        if curr > 0:
            out.append((tok, tok + curr))
    elif break_mode == "complete_doc":
        while i < len(sizes):
            if (curr + sizes[i] <= bs or curr == 0) \
                    and sizes[i] != document_sep_len:
                curr += int(sizes[i])
                i += 1
            else:
                if curr > 1:
                    out.append((tok, tok + curr))
                tok += curr
                curr = 0
                counter += 1
                bs = next_bs(counter)
                if sizes[i] == document_sep_len:
                    tok += int(sizes[i])
                    i += 1
        if curr > 1:
            out.append((tok, tok + curr))
    else:
        raise ValueError(f"invalid break_mode {break_mode}")
    return np.asarray(out, np.int64).reshape(-1, 2)


def block_to_dataset_index(sizes, slices, use_native: bool = True
                           ) -> np.ndarray:
    """Map flat (start, end) slices to (start_ds_idx, start_offset,
    end_ds_idx) (_get_block_to_dataset_index_fast)."""
    sizes = np.asarray(sizes, np.int64)
    slices = np.asarray(slices, np.int64)
    if use_native:
        try:
            from ..native import available, block_to_dataset_index as nat

            if available():
                return nat(sizes, slices)
        except Exception:
            pass
    cum = np.concatenate([[0], np.cumsum(sizes)])
    out = np.zeros((len(slices), 3), np.int64)
    for b, (s, e) in enumerate(slices):
        sdi = int(np.searchsorted(cum, s, side="right")) - 1
        edi = sdi if e <= s else int(np.searchsorted(cum, e - 1,
                                                     side="right")) - 1
        out[b] = (sdi, s - cum[sdi], edi)
    return out
