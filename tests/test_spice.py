"""SPICE-style scene-graph scorer (eval/spice.py) — the speaker's second
quality metric beside BLEU (reference interface: reverie/spice_scorer.py).
"""
import numpy as np

from vln_goat_tpu.eval.spice import (SpiceScorer, scene_graph, spice_from_ids,
                                     spice_score)


def test_scene_graph_objects_attributes_relations():
    g = scene_graph("walk past the red couch in the large living room")
    assert ("couch",) in g
    assert ("couch", "red") in g
    assert ("room",) in g
    assert ("room", "living") in g or ("room", "large") in g
    # relation linking couch -> room through 'in'
    assert ("couch", "in", "room") in g


def test_synonyms_and_plurals_normalize():
    a = scene_graph("climb the stairs")
    b = scene_graph("climb the staircase")
    assert ("stairs",) in a and ("stairs",) in b


def test_identical_sentences_score_one():
    s = "turn left at the wooden table near the window"
    assert spice_score(s, [s])["spice"] == 1.0


def test_disjoint_sentences_score_zero():
    r = spice_score("walk to the kitchen sink",
                    ["climb the blue stairs outside"])
    assert r["spice"] == 0.0


def test_reference_union_semantics():
    # tuples split across two references still count as matched
    r = spice_score("the red chair near the door",
                    ["a red chair", "a chair near the door"])
    assert r["recall"] == 1.0 or r["spice"] > 0.8


def test_scorer_interface_matches_reference():
    data = [
        {"path_id": 0,
         "Inference": ["walk into the bedroom and stop by the bed"],
         "Ground Truth": ["enter the bedroom and wait near the bed"]},
        {"path_id": 1,
         "Inference": ["turn right"],
         "Ground Truth": ["turn right at the hall"]},
    ]
    corpus, scores = SpiceScorer().compute_scores(data)
    assert len(scores) == 2
    assert 0.0 <= corpus <= 1.0
    assert corpus == np.mean(scores)
    assert scores[0] > 0.0   # bedroom/bed overlap


def test_id_fallback_unigram_f1():
    assert spice_from_ids([1, 2, 3], [[1, 2, 3]]) == 1.0
    assert spice_from_ids([1, 2], [[3, 4]]) == 0.0
    mid = spice_from_ids([1, 2], [[2, 3]])
    assert 0.0 < mid < 1.0
