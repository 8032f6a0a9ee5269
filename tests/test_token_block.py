"""Token-block slicing parity: numpy reference vs C++ fast path, plus
hand-checked semantics per break mode (fairseq token_block_utils_fast)."""
import numpy as np
import pytest

from vln_goat_tpu.data.token_block import (block_to_dataset_index,
                                           token_block_slices)


SIZES = np.array([5, 3, 1, 7, 2, 1, 4], np.int64)  # doc-sep sentences = 1


def test_none_mode():
    s = token_block_slices(SIZES, 6, "none", use_native=False)
    total = SIZES.sum()
    assert s[0].tolist() == [0, 6]
    assert s[-1, 1] == total
    assert np.all(s[1:, 0] == s[:-1, 1])


def test_eos_mode():
    s = token_block_slices(SIZES, 6, "eos", use_native=False)
    assert len(s) == len(SIZES)
    assert np.all(s[:, 1] - s[:, 0] == SIZES)


def test_complete_mode():
    s = token_block_slices(SIZES, 8, "complete", use_native=False)
    # greedy fill: [5,3], [1,7(oversize forces own? 1+7=8)], [2,1,4]
    assert s[0].tolist() == [0, 8]
    assert np.all(s[:, 1] > s[:, 0])
    assert s[-1, 1] == SIZES.sum()


def test_complete_doc_mode():
    s = token_block_slices(SIZES, 8, "complete_doc",
                           document_sep_len=1, use_native=False)
    # sep-length sentences break documents and are skipped; single-token
    # blocks dropped
    assert np.all(s[:, 1] - s[:, 0] > 1)


@pytest.mark.parametrize("mode", ["none", "eos", "complete",
                                  "complete_doc"])
def test_native_matches_python(mode):
    pytest.importorskip("ctypes")
    from vln_goat_tpu.native import available

    if not available():
        pytest.skip("native library not built")
    rng = np.random.default_rng(0)
    sizes = rng.integers(1, 12, 64).astype(np.int64)
    py = token_block_slices(sizes, 16, mode, use_native=False)
    cc = token_block_slices(sizes, 16, mode, use_native=True)
    np.testing.assert_array_equal(py, cc)
    bi_py = block_to_dataset_index(sizes, py, use_native=False)
    bi_cc = block_to_dataset_index(sizes, py, use_native=True)
    np.testing.assert_array_equal(bi_py, bi_cc)


def test_block_to_dataset_index_values():
    sizes = np.array([4, 2, 3], np.int64)
    slices = np.array([[0, 4], [4, 6], [2, 8]], np.int64)
    out = block_to_dataset_index(sizes, slices, use_native=False)
    assert out[0].tolist() == [0, 0, 0]
    assert out[1].tolist() == [1, 0, 1]
    assert out[2].tolist() == [0, 2, 2]
