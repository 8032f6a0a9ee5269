"""The vectorized pretrain batch builder must be BIT-identical to the
per-example slow path: same rng consumption order (evt, aug, end-vp, then
mlm/mrc draws per example), same float ops elementwise.  Also pins the
pure-function-of-rng contract build_batch(rng=...) that the worker pool
relies on (same (seed, step) rng -> same batch on any worker)."""
import numpy as np
import pytest

from vln_goat_tpu.pretrain.data import (PretrainShapes, TrajBatchBuilder,
                                        items_from_dataset)
from vln_goat_tpu.rollout.env import make_synthetic_dataset
from vln_goat_tpu.sim.graph_sim import make_synthetic_scan


def _make(seed=0, aug=False):
    scans = [make_synthetic_scan(f"s{i}", num_vps=40, degree=3, seed=i)
             for i in range(3)]
    graphs = {g.scan_id: g for g in scans}
    order = [g.scan_id for g in scans]
    Vtot = sum(g.num_vps for g in scans)
    r = np.random.default_rng(7)
    feats = r.standard_normal((Vtot, 36, 96), np.float32)
    aug_feats = r.standard_normal((Vtot, 36, 96), np.float32) if aug else None
    sh = PretrainShapes(max_txt_len=32, max_steps=10, max_cands=16,
                        max_gmap=24, max_mlm=8, mrc_prob_dim=16)
    b = TrajBatchBuilder(graphs, order, feats, sh, seed=seed,
                         vocab_size=1000, aug_features=aug_feats,
                         zdicts={"instr_z_direction_features":
                                 r.standard_normal((4, 8), np.float32)})
    data = make_synthetic_dataset(graphs, 64, vocab_size=1000,
                                  path_len=(3, 9), seed=1, max_instr_len=32)
    return b, items_from_dataset(data, graphs)


@pytest.mark.parametrize("task", ["mlm", "mrc", "sap", "cfp"])
@pytest.mark.parametrize("aug", [False, True])
def test_fast_equals_slow_bitwise(task, aug):
    b, items = _make(aug=aug)
    chunk = items[:12]
    fast = b._build_batch_fast(chunk, task, 0.2, np.random.default_rng(42))
    slow = b._build_batch_slow(chunk, task, 0.2, np.random.default_rng(42))
    assert set(fast.keys()) == set(slow.keys())
    for k in slow:
        assert fast[k].shape == slow[k].shape, k
        assert fast[k].dtype == slow[k].dtype, k
        assert (np.asarray(fast[k]) == np.asarray(slow[k])).all(), k


def test_batch_is_pure_function_of_rng():
    b, items = _make()
    chunk = items[:8]
    a1 = b.build_batch(chunk, "mlm", rng=np.random.default_rng(5))
    # interleave unrelated builds to perturb the builder's own stream
    b.build_batch(items[8:16], "sap", rng=np.random.default_rng(9))
    b.build_batch(items[4:12], "mrc")
    a2 = b.build_batch(chunk, "mlm", rng=np.random.default_rng(5))
    for k in a1:
        assert (np.asarray(a1[k]) == np.asarray(a2[k])).all(), k


def test_dispatch_uses_fast_path(monkeypatch):
    b, items = _make()
    called = {}

    orig = b._build_batch_fast

    def spy(*a, **kw):
        called["fast"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(b, "_build_batch_fast", spy)
    b.build_batch(items[:4], "sap")
    assert called.get("fast")
