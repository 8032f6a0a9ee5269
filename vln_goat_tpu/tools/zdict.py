"""BACL back-door dictionaries: loading, and the online instruction z-dict
update (capability #5).

Reference:
- LoadZdict (map_nav_src/r2r/data_utils.py:44-122): base64 TSVs —
  image dict ['roomtype','feature','pz'], instruction dict
  ['token_type','token','feature','pz'];
- PickSpecificWords (utils/data.py:200-288): spaCy NOUN lemmas mapped
  through category_mapping.tsv -> landmark keys; a 35-word direction list;
- agent.update_z_dict (r2r/agent.py:713-848): run the language tower over
  the train instructions, harvest subword-aligned token embeddings per
  landmark/direction key, mean-pool + empirical p(z), refresh the dict.

spaCy is unavailable in this environment; WordPicker falls back to a
POS-free heuristic (direction list + a landmark vocabulary, either from
category_mapping.tsv or a built-in common-noun list).  The alignment logic
is tokenizer-pluggable: pass `convert_ids_to_tokens` and the continuation
prefix ('##' for BERT, 'Ġ'-absence for RoBERTa).
"""
from __future__ import annotations

import base64
import csv
import re
import sys
from collections import defaultdict
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# the reference's direction/action word list (utils/data.py:204-210)
DIRECTION_WORDS = [
    "right", "left", "down", "up", "forward", "around", "straight",
    "into", "front", "behind", "exit", "enter", "besides", "through",
    "stop", "out", "wait", "passed", "climb", "leave", "past", "before",
    "after", "between", "in", "along", "cross", "end", "head", "inside",
    "outside", "across", "towards", "face", "ahead", "toward",
]

# fallback landmark nouns when category_mapping.tsv / spaCy are unavailable
FALLBACK_LANDMARKS = [
    "door", "stairs", "stair", "room", "table", "chair", "kitchen",
    "bathroom", "bedroom", "hallway", "hall", "window", "couch", "sofa",
    "bed", "desk", "counter", "sink", "mirror", "lamp", "rug", "plant",
    "picture", "painting", "shelf", "cabinet", "closet", "fireplace",
    "television", "tv", "toilet", "shower", "bathtub", "refrigerator",
    "oven", "stove", "wall", "floor", "ceiling", "railing", "balcony",
    "garage", "office", "living", "dining", "entrance", "doorway",
]


def _lemma(word: str) -> str:
    """WordNet-free noun lemmatization (the reference uses
    nltk WordNetLemmatizer, utils/data.py:214 — unavailable offline):
    standard English plural stripping, which is all the lemmatizer does
    for the Matterport category nouns."""
    if len(word) > 3 and word.endswith("ies"):
        return word[:-3] + "y"
    if len(word) > 3 and word.endswith(("ches", "shes", "sses", "xes",
                                        "zes")):
        return word[:-2]
    if len(word) > 2 and word.endswith("s") and not word.endswith("ss"):
        return word[:-1]
    return word


def word_tokenize(instr: str) -> List[str]:
    """spaCy-like word tokenization (words and punctuation as separate
    tokens) — the index space of PickSpecificWords (utils/data.py:263-288
    iterates spaCy doc tokens).  Divergence from spaCy: no exceptions
    table (e.g. "don't" splits as don/'/t, spaCy gives do/n't)."""
    return re.findall(r"\w+|[^\w\s]", instr)


class WordPicker:
    """pick_action_object_words_with_index equivalent
    (utils/data.py:263-288): returns [(token index, key), ...] where
    landmark keys are CATEGORY names (source noun mapped through
    category_mapping.tsv) and direction keys are the matched word; indices
    are over word_tokenize(instr).

    spaCy is unavailable in this image, so the reference's NOUN-POS filter
    is replaced by a gazetteer: any token whose lemma appears in the
    category mapping counts as a landmark.  Divergence: verb/noun homonyms
    that happen to be category sources are picked regardless of usage."""

    def __init__(self, cat_file: Optional[str] = None):
        self.landmark_map: Dict[str, str] = {}
        if cat_file:
            with open(cat_file, encoding="utf-8") as f:
                next(f)
                for line in f:
                    parts = line.strip("\n").split("\t")
                    self.landmark_map[parts[1]] = parts[-1]
        else:
            for w in FALLBACK_LANDMARKS:
                self.landmark_map[w] = w
        self.direction_set = set(DIRECTION_WORDS)

    def pick(self, instr: str) -> Tuple[List[Tuple[int, str]],
                                        List[Tuple[int, str]]]:
        landmarks, directions = [], []
        for i, raw in enumerate(word_tokenize(instr)):
            low = raw.lower()
            # landmark normalization chain (utils/data.py:211-215):
            # strip punctuation, lemmatize, drop digits
            name = re.sub(r"[^\w\s]", " ", low).strip()
            name = _lemma(name)
            name = "".join(c for c in name if not c.isdigit())
            if name in self.landmark_map:
                cat = self.landmark_map[name]
                landmarks.append((i, cat))
            # direction match is on the raw lowered token (:256)
            if low in self.direction_set:
                directions.append((i, low))
        return landmarks, directions


def subword_tokens_of(enc: Sequence[int], id_to_token: Dict[int, str],
                      special_ids: Sequence[int] = (0, 1, 2)) -> List[str]:
    """convert_ids_to_tokens(enc, skip_special_tokens=True) from a plain
    id->token vocab (agent.py:781): the walk space of the reference's
    embedding harvest.  Position j in the returned list corresponds to
    row j+1 of the language-tower output (one leading special token)."""
    sp = set(special_ids)
    return [id_to_token[int(t)] for t in enc if int(t) not in sp]


def align_word_embeddings(
    tokens: List[str], embeds: np.ndarray,
    picks: List[Tuple[int, str]], is_continuation: Callable[[str], bool],
    cls_offset: int = 1,
) -> List[Tuple[str, np.ndarray]]:
    """Map whitespace-word picks to first-subword embeddings
    (agent.py:778-799: '#'-continuations skipped, +1 for [CLS])."""
    out = []
    word_idx = -1
    pick_map = defaultdict(list)
    for i, key in picks:
        pick_map[i].append(key)
    for j, tok in enumerate(tokens):
        if is_continuation(tok):
            continue
        word_idx += 1
        for key in pick_map.get(word_idx, []):
            if j + cls_offset < len(embeds):
                out.append((key, embeds[j + cls_offset]))
    return out


def update_instr_zdict(
    model, params, instr_data: Sequence[dict], word_picker: WordPicker,
    tokens_of: Callable[[dict], List[str]],
    is_continuation: Callable[[str], bool],
    z_dict: Optional[dict] = None, batch_size: int = 64,
    max_len: int = 200,
) -> Tuple[dict, dict, dict, dict, dict]:
    """agent.update_z_dict equivalent.  `model` is a GoatModel;
    instruction embeddings come from the plain language tower."""
    from ..models.goat import GoatModel

    fn = jax.jit(lambda p, ids, mask: model.apply(
        p, ids, mask, method=GoatModel.forward_text))

    landmark_dict = defaultdict(list)
    direction_dict = defaultdict(list)
    for i in range(0, len(instr_data), batch_size):
        chunk = list(instr_data[i:i + batch_size])
        # fixed padding width: per-chunk max lengths would retrigger XLA
        # compilation of the jitted language tower for every new length
        L = max_len
        ids = np.zeros((len(chunk), L), np.int32)
        mask = np.zeros((len(chunk), L), bool)
        for b, d in enumerate(chunk):
            enc = list(d["instr_encoding"])[:L]
            ids[b, :len(enc)] = enc
            mask[b, :len(enc)] = True
        out = np.asarray(fn(params, jnp.asarray(ids), jnp.asarray(mask)))
        for b, d in enumerate(chunk):
            landmarks, directions = word_picker.pick(d["instruction"])
            toks = tokens_of(d)
            for key, emb in align_word_embeddings(
                    toks, out[b], landmarks, is_continuation):
                landmark_dict[key].append(emb)
            for key, emb in align_word_embeddings(
                    toks, out[b], directions, is_continuation):
                direction_dict[key].append(emb)

    def summarize(d):
        total = sum(len(v) for v in d.values()) or 1
        feats, pzs = {}, {}
        for k, v in d.items():
            feats[k] = np.mean(np.stack(v, 0), 0)
            pzs[k] = len(v) / total
        return feats, pzs

    lm_feats, lm_pz = summarize(landmark_dict)
    dr_feats, dr_pz = summarize(direction_dict)

    new = {
        "instr_direction_features": np.stack(list(dr_feats.values()), 0)
        if dr_feats else np.zeros((0, 768), np.float32),
        "instr_direction_pzs": np.asarray(list(dr_pz.values()), np.float32),
        "instr_landmark_features": np.stack(list(lm_feats.values()), 0)
        if lm_feats else np.zeros((0, 768), np.float32),
        "instr_landmark_pzs": np.asarray(list(lm_pz.values()), np.float32),
    }
    if z_dict is None:
        z_dict = {}
    z_dict["instr_zdict"] = new
    return z_dict, lm_feats, dr_feats, lm_pz, dr_pz


# ----------------------------------------------------------------------
IMG_TSV_FIELDS = ["roomtype", "feature", "pz"]
TXT_TSV_FIELDS = ["token_type", "token", "feature", "pz"]


def save_instr_zdict_tsv(path: str, landmark_feats: Dict[str, np.ndarray],
                         direction_feats: Dict[str, np.ndarray],
                         landmark_pz: Dict[str, float],
                         direction_pz: Dict[str, float]):
    """save_backdoor_z_dict (agent.py:850-871)."""
    with open(path, "wt") as f:
        w = csv.DictWriter(f, delimiter="\t", fieldnames=TXT_TSV_FIELDS)
        for key, val in landmark_feats.items():
            w.writerow({"token_type": "landmark", "token": key,
                        "feature": base64.b64encode(
                            val.astype(np.float32)).decode(),
                        "pz": landmark_pz[key]})
        for key, val in direction_feats.items():
            w.writerow({"token_type": "direction", "token": key,
                        "feature": base64.b64encode(
                            val.astype(np.float32)).decode(),
                        "pz": direction_pz[key]})


def load_instr_zdict_tsv(path: str) -> Dict[str, np.ndarray]:
    """LoadZdict.load_instr_tensor (data_utils.py:90-122)."""
    csv.field_size_limit(sys.maxsize)
    dr_f, dr_p, lm_f, lm_p = [], [], [], []
    with open(path) as f:
        for it in csv.DictReader(f, delimiter="\t", fieldnames=TXT_TSV_FIELDS):
            feat = np.frombuffer(base64.b64decode(it["feature"]), np.float32)
            if it["token_type"] == "direction":
                dr_f.append(feat)
                dr_p.append(float(it["pz"]))
            elif it["token_type"] == "landmark":
                lm_f.append(feat)
                lm_p.append(float(it["pz"]))
    out = {"instr_landmark_features": np.stack(lm_f, 0),
           "instr_landmark_pzs": np.asarray(lm_p, np.float32)}
    if dr_f:
        out["instr_direction_features"] = np.stack(dr_f, 0)
        out["instr_direction_pzs"] = np.asarray(dr_p, np.float32)
    return out


def save_img_zdict_tsv(path: str, feats: Dict[str, np.ndarray],
                       pzs: Dict[str, float]):
    with open(path, "wt") as f:
        w = csv.DictWriter(f, delimiter="\t", fieldnames=IMG_TSV_FIELDS)
        for key, val in feats.items():
            w.writerow({"roomtype": key,
                        "feature": base64.b64encode(
                            val.astype(np.float32)).decode(),
                        "pz": pzs[key]})


def load_img_zdict_tsv(path: str) -> Dict[str, np.ndarray]:
    """LoadZdict.load_img_tensor (data_utils.py:75-88)."""
    csv.field_size_limit(sys.maxsize)
    feats, pzs = [], []
    with open(path) as f:
        for it in csv.DictReader(f, delimiter="\t", fieldnames=IMG_TSV_FIELDS):
            feats.append(np.frombuffer(base64.b64decode(it["feature"]),
                                       np.float32))
            pzs.append(float(it["pz"]))
    return {"img_features": np.stack(feats, 0),
            "img_pzs": np.asarray(pzs, np.float32)}


def broadcast_zdict(zd: Dict[str, np.ndarray], batch_size: int,
                    dim: int = 768) -> Dict[str, jnp.ndarray]:
    """Tile dict banks over the batch (agent.py:53-56)."""
    out = {}
    for k, v in zd.items():
        v = jnp.asarray(v)
        if v.ndim == 1:
            v = v[:, None]
        out[k] = jnp.broadcast_to(v[None], (batch_size,) + v.shape)
    return out
