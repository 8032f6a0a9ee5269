"""Native C++ components vs their python reference implementations."""
import math

import numpy as np
import pytest

from vln_goat_tpu import native
from vln_goat_tpu.core.geometry import nearest_view_index_np
from vln_goat_tpu.sim.graph_sim import make_synthetic_scan

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


def test_apsp_matches_scipy():
    g = make_synthetic_scan("n0", num_vps=25, seed=1)
    edges, weights = [], []
    for v in range(g.num_vps):
        for k in range(int(g.cand_mask[v].sum())):
            w = int(g.cand_local[v, k])
            if v < w:
                edges.append((v, w))
                weights.append(float(g.cand_dist[v, k]))
    dist, hops, nexthop = native.apsp(g.num_vps,
                                      np.asarray(edges), np.asarray(weights))
    np.testing.assert_allclose(dist, g.dist, atol=1e-4)
    np.testing.assert_array_equal(hops, g.hops)
    # nexthop reconstructs identical-length paths
    for a in range(0, g.num_vps, 5):
        for b in range(0, g.num_vps, 7):
            if a == b:
                continue
            cur, n = a, 0
            while cur != b and n <= g.num_vps:
                cur = int(nexthop[cur, b])
                n += 1
            assert cur == b and n == g.hops[a, b]


def test_nearest_view_matches_python():
    rng = np.random.default_rng(0)
    h = rng.uniform(-2 * math.pi, 2 * math.pi, 200).astype(np.float32)
    e = rng.uniform(-0.9, 0.9, 200).astype(np.float32)
    np.testing.assert_array_equal(native.nearest_view(h, e),
                                  nearest_view_index_np(h, e))


def test_bleu_stats_matches_python():
    from vln_goat_tpu.eval.bleu import corpus_bleu

    rng = np.random.default_rng(1)
    hyps = [list(rng.integers(0, 20, rng.integers(5, 15))) for _ in range(8)]
    refs = [[list(rng.integers(0, 20, rng.integers(5, 15)))
             for _ in range(2)] for _ in range(8)]
    # corpus reduction using native per-sentence stats
    clipped = np.zeros(4, np.int64)
    totals = np.zeros(4, np.int64)
    hyp_len = ref_len = 0
    for h, rs in zip(hyps, refs):
        c, t, cl = native.bleu_stats(np.asarray(h, np.int32), rs)
        clipped += c
        totals += t
        hyp_len += len(h)
        ref_len += cl
    import math as m
    precisions = [clipped[n] / totals[n] if totals[n] else 0.0
                  for n in range(4)]
    bp = 1.0 if hyp_len > ref_len else m.exp(1 - ref_len / hyp_len)
    # same zero-precision convention as eval.bleu.corpus_bleu
    native_bleu = 0.0 if precisions[3] == 0 else \
        bp * m.exp(sum(m.log(p) for p in precisions) / 4)
    py_bleu, _ = corpus_bleu(hyps, refs)
    assert abs(native_bleu - py_bleu) < 1e-9
    # and the smoothed variant agrees on raw counts (checked above via
    # identical clipped/totals); spot-check bleu1
    assert abs(precisions[0] * bp
               - corpus_bleu(hyps, refs)[1][0]) < 1e-9


def test_edit_distance():
    a = [[1, 2, 3], [1, 2, 3, 4], [5]]
    b = [[1, 2, 3], [1, 3, 4], [6, 7]]
    out = native.edit_distance_batch(a, b)
    np.testing.assert_array_equal(out, [0, 1, 2])


def test_bucket_by_size():
    sizes = np.array([10, 10, 10, 50, 10], np.int32)
    ids = native.bucket_by_size(sizes, max_tokens=30)
    # 10,10,10 fit (3*10=30); 50 alone; final 10 next batch
    np.testing.assert_array_equal(ids, [0, 0, 0, 1, 2])


def test_kmeans_lloyd_matches_jax():
    from vln_goat_tpu.tools.kmeans import kmeans_fit

    rng = np.random.default_rng(2)
    x = np.concatenate([rng.normal(0, .1, (20, 4)),
                        rng.normal(4, .1, (20, 4))]).astype(np.float32)
    centers0 = np.stack([x[0], x[-1]], 0)
    c_native, a_native = native.kmeans_lloyd(x, centers0, iters=20)
    assert len(np.unique(a_native[:20])) == 1
    assert len(np.unique(a_native)) == 2
    _, a_jax = kmeans_fit(x, 2, seed=0)
    # same partition up to label permutation
    same = (a_native == a_jax).all() or (a_native == 1 - a_jax).all()
    assert same
