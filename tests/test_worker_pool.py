"""Multi-process batch pool (reference build_dataloader(num_workers) +
PrefetchLoader, pretrain_src/data/loader.py:90-164): the worker pool must
produce the EXACT inline batch stream for any worker count (each batch is
a pure function of its descriptor), propagate worker errors, and survive
shared-memory round trips."""
import numpy as np
import pytest

from vln_goat_tpu.data.worker_pool import (BatchWorkerPool, ShmArray,
                                           resolve_tree, share_tree)


def test_shm_array_roundtrip():
    a = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
    h = ShmArray.create(a)
    try:
        import pickle

        h2 = pickle.loads(pickle.dumps(h))
        b = h2.array()
        assert (b == a).all() and b.dtype == a.dtype
        h2.close()
    finally:
        h.unlink()


def test_share_tree_nested():
    tree = {"x": np.ones((3,)), "sub": {"y": np.zeros((2, 2))}, "z": None,
            "s": 5}
    handles, owners = share_tree(tree)
    try:
        out = resolve_tree(handles)
        assert (out["x"] == 1).all() and (out["sub"]["y"] == 0).all()
        assert out["z"] is None and out["s"] == 5
    finally:
        for h in owners:
            h.unlink()


def _init():
    return {"scale": 3}


def _build(state, desc):
    rng = np.random.default_rng(desc)
    return rng.integers(0, 1000, 4) * state["scale"]


@pytest.mark.parametrize("workers", [0, 2])
def test_pool_stream_order_and_determinism(workers):
    with BatchWorkerPool(_init, _build, num_workers=workers) as pool:
        got = list(pool.imap(range(17)))
    assert [d for d, _ in got] == list(range(17))
    for d, b in got:
        assert (b == _build({"scale": 3}, d)).all()


def _boom(state, desc):
    if desc == 3:
        raise ValueError("intentional")
    return desc


def test_pool_error_propagates():
    with BatchWorkerPool(_init, _boom, num_workers=1) as pool:
        with pytest.raises(RuntimeError, match="intentional"):
            list(pool.imap(range(8)))


def test_pretrain_pool_matches_inline_stream():
    """Drive the real pretrain worker path: pool batches == inline batches
    bit-for-bit."""
    from functools import partial

    from vln_goat_tpu.pretrain import cli as PC

    args = PC.parse_args(["--synthetic", "--tasks", "mlm", "sap",
                          "--mix_ratio", "1", "1",
                          "--train_batch_size", "6",
                          "--output_dir", "/tmp/_pool_test"])
    rt = PC.build(args)
    builder, items = rt["builder"], rt["items"]
    arrays, owners = share_tree(dict(
        features=builder.features, aug_features=builder.aug_features,
        view_probs=builder.view_probs, objects=builder.objects))
    spec = dict(
        arrays=arrays, graphs=builder.graphs, order=builder.scan_order,
        shapes=builder.sh, items={"train": items["train"]}, B=6, seed=0,
        kw=dict(vocab_size=builder.vocab_size, objnav=builder.objnav,
                angle_feat_size=builder.afs,
                correct_heading=builder.correct_heading,
                mask_token_id=builder.mask_token_id,
                mlm_prob=builder.mlm_prob, mrc_prob=builder.mrc_prob,
                zdicts=builder.zdicts or None,
                obj_prob_logits=builder.obj_prob_logits))
    descs = [("train", ["mlm", "sap"][s % 2], s) for s in range(6)]
    try:
        with BatchWorkerPool(partial(PC._pool_init, spec), PC._pool_build,
                             num_workers=2) as pool:
            pooled = list(pool.imap(descs))
        for (split, task, step), nb in pooled:
            ref = PC.make_batch_np(builder, items[split], 6, 0,
                                   split, task, step)
            assert set(nb) == set(ref)
            for k in ref:
                assert (np.asarray(nb[k]) == np.asarray(ref[k])).all(), \
                    (task, step, k)
    finally:
        for h in owners:
            h.unlink()
