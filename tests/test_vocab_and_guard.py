"""Speaker vocabulary/tokenizer + finite-update guard + obj2vps loader."""
import json

import numpy as np
import jax
import jax.numpy as jnp
import optax

from vln_goat_tpu.data.annotations import load_obj2vps
from vln_goat_tpu.speaker.vocab import (SpeakerTokenizer, build_vocab,
                                        split_sentence)
from vln_goat_tpu.utils.guard import finite_guard, grad_finite_fraction


def test_split_sentence():
    assert split_sentence("Turn left, then stop!") == \
        ["turn", "left", ",", "then", "stop", "!"]
    assert split_sentence("wait... go") == ["wait", "...", "go"]


def test_vocab_and_tokenizer_roundtrip():
    sents = ["turn left at the door"] * 5 + ["go up the stairs now"] * 5
    vocab = build_vocab(sents, min_count=5)
    tok = SpeakerTokenizer(vocab, encoding_length=12)
    assert tok.pad_id == 0 and tok.vocab[-1] == "<BOS>"
    ids = tok.encode_sentence("turn left at the door")
    assert len(ids) == 12
    assert ids[0] == tok.bos_id
    assert tok.eos_id in ids
    assert tok.decode_sentence(ids) == "turn left at the door"
    # OOV maps to <UNK>
    ids2 = tok.encode_sentence("zebra door")
    assert tok.unk_id in ids2


def test_finite_guard_skips_bad_update():
    tx = finite_guard(optax.sgd(0.1))
    params = {"w": jnp.ones((3,))}
    state = tx.init(params)
    good = {"w": jnp.ones((3,))}
    bad = {"w": jnp.asarray([jnp.nan, 1.0, 1.0])}
    upd, state = tx.update(bad, state, params)
    p1 = optax.apply_updates(params, upd)
    np.testing.assert_array_equal(np.asarray(p1["w"]), np.ones(3))  # skipped
    assert int(state.notfinite_count) == 1
    upd, state = tx.update(good, state, params)
    p2 = optax.apply_updates(params, upd)
    np.testing.assert_allclose(np.asarray(p2["w"]), 0.9 * np.ones(3))
    assert float(grad_finite_fraction(bad)) < 1.0


def test_load_obj2vps(tmp_path):
    data = {
        "scanA_vp1": {"17": {"visible_pos": [1, 2]}, "18": {"visible_pos": []}},
        "scanA_vp2": {"17": {"visible_pos": [3]}},
        "scanB_vp9": {"17": {"visible_pos": [0]}},
    }
    path = str(tmp_path / "bboxes.json")
    with open(path, "w") as f:
        json.dump(data, f)
    m = load_obj2vps(path)
    assert sorted(m[("scanA", "17")]) == ["vp1", "vp2"]
    assert ("scanA", "18") not in m
    assert m[("scanB", "17")] == ["vp9"]
