"""Checkpoint interop: reference torch `.pt` <-> flax params, plus Orbax
save/load for native checkpoints.

The reference's checkpoint surface (SURVEY.md section 5 checkpoint/resume):
- fine-tune saves {'vln_bert': {'epoch': N, 'state_dict': {...}}} where keys
  look like `vln_bert.embeddings.word_embeddings.weight`, optionally behind
  a `module.` DDP prefix (agent_base.py:205-253);
- pretrain saves a flat state dict (utils/save.py:23-71);
- init-time key surgery maps pretrain keys `vln_bert.*` -> `bert.*`, strips
  `module.`, and re-homes head keys (vlnbert_init.py:52-69).

Mapping rules torch -> flax (names were chosen in models/ to make this
mechanical):
- numeric segments merge into their parent: `layer.0.x` -> `layer_0.x`
  (covers ModuleLists, nn.Sequential like ClsPrediction's net.0/net.2/net.3
  and vp_pos_embeddings.0/1);
- Linear: weight -> kernel (transposed), bias -> bias;
- LayerNorm (1-D weight) -> scale/bias;
- Embedding tables (known names) -> embedding (no transpose);
- torch nn.MultiheadAttention in the DETR pano encoder: in_proj_weight/bias
  split into thirds -> q_proj/k_proj/v_proj, out_proj -> out_proj.
"""
from __future__ import annotations

import re
from typing import Any, Dict, Optional

import jax.numpy as jnp
import numpy as np

EMBEDDING_TABLES = {
    "word_embeddings", "position_embeddings", "token_type_embeddings",
    "gmap_step_embeddings", "nav_type_embedding", "obj_name_linear",
}

# raw nn.Parameter leaves (not Linear/LN): keep as-is
RAW_PARAMS = {"tim_global_attn", "tim_local_attn", "tim_txt_attn"}


def strip_prefixes(key: str) -> Optional[str]:
    """Normalize reference key prefixes (agent_base.py:232-246,
    vlnbert_init.py:56-69). Returns None for keys we drop (buffers)."""
    if key.startswith("module."):
        key = key[len("module."):]
    if key.startswith("vln_bert.bert."):
        key = key[len("vln_bert.bert."):]
    elif key.startswith("vln_bert."):
        key = key[len("vln_bert."):]
    elif key.startswith("bert."):
        key = key[len("bert."):]
    if key in ("embeddings.position_ids", "embeddings.token_type_ids"):
        return None  # registered buffers, not params
    if key.startswith("drop_env"):
        return None
    return key


def _merge_numeric(parts):
    out = []
    for p in parts:
        if re.fullmatch(r"\d+", p) and out:
            out[-1] = f"{out[-1]}_{p}"
        else:
            out.append(p)
    return out


def _set(tree: Dict, path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def torch_to_flax(state_dict: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Reference state dict (numpy-valued) -> flax {'params': ...} tree."""
    params: Dict[str, Any] = {}
    pending_inproj: Dict[tuple, Dict[str, np.ndarray]] = {}

    for key, val in state_dict.items():
        key = strip_prefixes(key)
        if key is None:
            continue
        val = np.asarray(val)
        parts = _merge_numeric(key.split("."))

        leaf = parts[-1]
        mod = parts[-2] if len(parts) >= 2 else ""

        if leaf in RAW_PARAMS or (len(parts) == 1):
            _set(params, parts, jnp.asarray(val))
            continue

        if leaf in ("in_proj_weight", "in_proj_bias"):
            # torch MultiheadAttention packed qkv
            base = tuple(parts[:-1])
            pending_inproj.setdefault(base, {})[leaf] = val
            continue

        if leaf == "weight":
            if mod in EMBEDDING_TABLES:
                _set(params, parts[:-1] + ["embedding"], jnp.asarray(val))
            elif val.ndim == 1:  # LayerNorm
                _set(params, parts[:-1] + ["scale"], jnp.asarray(val))
            else:               # Linear
                _set(params, parts[:-1] + ["kernel"], jnp.asarray(val.T))
        elif leaf == "bias":
            _set(params, parts[:-1] + ["bias"], jnp.asarray(val))
        else:
            _set(params, parts, jnp.asarray(val))

    for base, d in pending_inproj.items():
        w, b = d.get("in_proj_weight"), d.get("in_proj_bias")
        D = w.shape[0] // 3
        for i, name in enumerate(("q_proj", "k_proj", "v_proj")):
            _set(params, list(base) + [name, "kernel"],
                 jnp.asarray(w[i * D:(i + 1) * D].T))
            if b is not None:
                _set(params, list(base) + [name, "bias"],
                     jnp.asarray(b[i * D:(i + 1) * D]))
    return {"params": params}


def _walk(tree, prefix=()):
    for k, v in tree.items():
        if isinstance(v, dict):
            yield from _walk(v, prefix + (k,))
        else:
            yield prefix + (k,), v


def flax_to_torch(variables: Dict[str, Any], add_prefix: str = "vln_bert."
                  ) -> Dict[str, np.ndarray]:
    """flax {'params': ...} -> reference-style torch state dict (numpy)."""
    out: Dict[str, np.ndarray] = {}
    qkv: Dict[str, Dict[str, np.ndarray]] = {}
    for path, val in _walk(variables["params"]):
        val = np.asarray(val)
        parts = [re.sub(r"_(\d+)$", r".\1", p) for p in path]
        leaf = parts[-1]
        mod = parts[-2] if len(parts) >= 2 else ""
        mod_base = mod.split(".")[-1] if "." in mod else mod

        if leaf in ("q_proj", "k_proj", "v_proj"):
            pass  # handled below via full leaf path
        if leaf == "kernel":
            if mod_base in ("q_proj", "k_proj", "v_proj"):
                base = ".".join(parts[:-2])
                qkv.setdefault(base, {})[mod_base + ".weight"] = val.T
                continue
            out[".".join(parts[:-1]) + ".weight"] = val.T
        elif leaf == "scale":
            out[".".join(parts[:-1]) + ".weight"] = val
        elif leaf == "embedding":
            out[".".join(parts[:-1]) + ".weight"] = val
        elif leaf == "bias":
            if mod_base in ("q_proj", "k_proj", "v_proj"):
                base = ".".join(parts[:-2])
                qkv.setdefault(base, {})[mod_base + ".bias"] = val
                continue
            out[".".join(parts[:-1]) + ".bias"] = val
        else:
            out[".".join(parts)] = val

    for base, d in qkv.items():
        if all(f"{n}.weight" in d for n in ("q_proj", "k_proj", "v_proj")):
            out[base + ".in_proj_weight"] = np.concatenate(
                [d["q_proj.weight"], d["k_proj.weight"], d["v_proj.weight"]], 0)
        if all(f"{n}.bias" in d for n in ("q_proj", "k_proj", "v_proj")):
            out[base + ".in_proj_bias"] = np.concatenate(
                [d["q_proj.bias"], d["k_proj.bias"], d["v_proj.bias"]], 0)
    return {add_prefix + k: v for k, v in out.items()}


def load_reference_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a reference .pt (fine-tune wrapper dict or flat pretrain dict)
    into a numpy state dict."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "vln_bert" in ckpt and \
            isinstance(ckpt["vln_bert"], dict) and "state_dict" in ckpt["vln_bert"]:
        sd = ckpt["vln_bert"]["state_dict"]
    elif isinstance(ckpt, dict) and "state_dict" in ckpt:
        sd = ckpt["state_dict"]
    else:
        sd = ckpt
    return {k: v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
            for k, v in sd.items()}


def merge_loaded(init_params: Dict[str, Any], loaded: Dict[str, Any],
                 strict: bool = False):
    """Overlay loaded params onto an init tree (the reference tolerates
    missing/extra keys at load, agent_base.py:238-253)."""
    missing, extra = [], []

    def rec(dst, src, prefix=""):
        for k, v in src.items():
            if k not in dst:
                extra.append(prefix + k)
                continue
            if isinstance(v, dict):
                rec(dst[k], v, prefix + k + "/")
            else:
                if dst[k].shape != v.shape:
                    extra.append(f"{prefix}{k} (shape {v.shape} != {dst[k].shape})")
                else:
                    dst[k] = v

    import copy
    out = copy.deepcopy(init_params)
    rec(out["params"], loaded["params"])

    def find_missing(dst, src, prefix=""):
        for k, v in dst.items():
            if k not in src:
                missing.append(prefix + k)
            elif isinstance(v, dict):
                find_missing(v, src.get(k, {}), prefix + k + "/")

    find_missing(out["params"], loaded["params"])
    if strict and (missing or extra):
        raise ValueError(f"missing={missing}, extra={extra}")
    return out, missing, extra


# encoder modules that live under the `bert.` prefix in a reference
# PRETRAIN state dict (GlocalTextPathCMTPreTraining: self.bert holds the
# encoder, heads sit on the wrapper — pretrain_goat.py:40-89)
_PRETRAIN_BERT_MODULES = {
    "embeddings", "lang_encoder", "img_embeddings", "local_encoder",
    "global_encoder",
}


def flax_to_torch_pretrain(variables: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """flax pretrain params -> reference pretrain-format flat state dict:
    encoder keys under `bert.`, task heads at top level (the layout
    ModelSaver writes, utils/save.py:23-71)."""
    flat = flax_to_torch(variables, add_prefix="")
    out = {}
    for k, v in flat.items():
        top = k.split(".", 1)[0]
        out[("bert." + k) if top in _PRETRAIN_BERT_MODULES else k] = v
    return out


# ----------------------------------------------------------------------
# Pretrain-entry init surgery (train_r2r_goat.py:113-172): map third-party
# checkpoint key spaces (METER / LXMERT / HF bert) into the reference's
# `bert.*` pretrain namespace, which torch_to_flax then converts.
def surgery_init_keys(state_dict: Dict[str, np.ndarray],
                      fmt: str) -> Dict[str, np.ndarray]:
    """fmt: 'goat' (reference .pt, no rename) | 'meter' | 'lxmert' |
    'bert' (plain HF AutoModel dump).

    meter (train_r2r_goat.py:154-172): text_transformer.embeddings ->
    bert.embeddings, text_transformer.encoder -> bert.lang_encoder,
    cross_modal_image_layers -> BOTH bert.{local,global}_encoder.encoder
    .crossattention.
    lxmert (:127-151): bert.encoder.layer -> bert.lang_encoder.layer,
    bert.encoder.x_layers -> both cross encoders, cls.predictions ->
    mlm_head.predictions.
    bert (:116-125): keys kept as-is — under HF from_pretrained the
    encoder.layer.* keys find no module and only the embeddings load
    (faithful to the reference's effective behavior)."""
    if fmt == "goat":
        return state_dict
    out: Dict[str, np.ndarray] = {}
    for key, val in state_dict.items():
        key = key.replace("module.", "")
        if fmt == "meter":
            if "text_transformer.embeddings" in key:
                out[key.replace("text_transformer.", "bert.")] = val
            elif "text_transformer.encoder" in key:
                out[key.replace("text_transformer.encoder",
                                "bert.lang_encoder")] = val
            elif "cross_modal_image_layers" in key:
                out[key.replace(
                    "cross_modal_image_layers",
                    "bert.local_encoder.encoder.crossattention")] = val
                out[key.replace(
                    "cross_modal_image_layers",
                    "bert.global_encoder.encoder.crossattention")] = val
            else:
                out[key] = val
        elif fmt == "lxmert":
            if "bert.encoder.layer" in key:
                out[key.replace("bert.encoder.layer",
                                "bert.lang_encoder.layer")] = val
            elif "bert.encoder.x_layers" in key:
                out[key.replace(
                    "bert.encoder.x_layers",
                    "bert.local_encoder.encoder.x_layers")] = val
                out[key.replace(
                    "bert.encoder.x_layers",
                    "bert.global_encoder.encoder.x_layers")] = val
            elif "cls.predictions" in key:
                out[key.replace("cls.predictions",
                                "mlm_head.predictions")] = val
            else:
                out[key] = val
        elif fmt == "bert":
            out[key] = val
        else:
            raise ValueError(f"unknown init format {fmt!r}")
    return out


def init_pretrain_from(path: str, fmt: str, init_params: Dict[str, Any]):
    """Load a torch checkpoint with pretrain-entry key surgery and overlay
    it on freshly initialized pretrain params.  Returns
    (params, missing, extra) like merge_loaded."""
    sd = load_reference_checkpoint(path)
    sd = surgery_init_keys(sd, fmt)
    loaded = torch_to_flax(sd)
    return merge_loaded(init_params, loaded)


# ----------------------------------------------------------------------
# Orbax native checkpoints
def save_orbax(path: str, state: Any):
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()


def load_orbax(path: str, like: Any) -> Any:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, like)


# ----------------------------------------------------------------------
# Full training-state checkpoints (params + optimizer state + step counter):
# the reference's --save_optimizer / --resume_file continuation semantics
# (agent_base.py:205-253 saves {'epoch', 'state_dict', 'optimizer'} and
# load() restores the iteration count).  A marker file distinguishes these
# from params-only checkpoints so build_runtime can route restores.
_TRAIN_STATE_MARKER = "GOAT_TRAIN_STATE"


def save_train_state(path: str, state: Any):
    """state: TrainState-like with .params/.opt_state/.step."""
    import os

    save_orbax(path, {"params": state.params, "opt_state": state.opt_state,
                      "step": state.step})
    with open(os.path.join(path, _TRAIN_STATE_MARKER), "w") as f:
        f.write("1\n")


def is_train_state_dir(path: str) -> bool:
    import os

    return os.path.isdir(path) and \
        os.path.exists(os.path.join(path, _TRAIN_STATE_MARKER))


def load_train_state(path: str, like_state: Any):
    """-> (state, start_step). The optimizer (and thus opt_state structure)
    must be built with the same flags as the saved run."""
    restored = load_orbax(path, {"params": like_state.params,
                                 "opt_state": like_state.opt_state,
                                 "step": like_state.step})
    state = type(like_state)(restored["params"], restored["opt_state"],
                             restored["step"])
    return state, int(np.asarray(restored["step"]))


def load_train_state_params(path: str) -> Any:
    """Restore only the params subtree from a full train-state checkpoint
    (no optimizer reconstruction needed — shapes come from the checkpoint
    metadata).  Used by valid/extract modes given a --resume_file that
    points at a train_state_latest dir."""
    import jax
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    tree = ckptr.metadata(path).item_metadata.tree
    like = jax.tree.map(lambda m: jax.ShapeDtypeStruct(m.shape, m.dtype),
                        tree)
    return ckptr.restore(path, like)["params"]


# ----------------------------------------------------------------------
# Transpeaker checkpoints.  Reference save format (r2r/transpeaker.py:
# 329-344): {'transpeaker': {'epoch': N, 'state_dict': {...}, 'optimizer':
# ...}}; its load deletes any 'progress' keys and restores strict
# (transpeaker.py:345-363).
_SPK_ATTN = ("W_Q", "W_K", "W_V", "fc")


def speaker_torch_to_flax(state_dict: Dict[str, np.ndarray]):
    """Map a reference Transpeaker state_dict to our TranspeakerModel
    param tree (speaker/model.py).  Name map (models/transpeaker_model.py
    :157-256 -> ours):

      encoder.down_size                         -> encoder_down_size
      encoder.image_self_attn.{W_Q,W_K,W_V,fc}  -> encoder_image_self_attn.*
      encoder.layers.I.enc_self_attn.*          -> enc_I_self_attn.*
      encoder.layers.I.pos_ffn.fc.{0,3}         -> enc_I_ffn.fc_{0,3}
      decoder.embedding                         -> embedding (no transpose)
      decoder.layers.I.dec_self_attn.*          -> dec_I_self_attn.*
      decoder.layers.I.dec_enc_attn.*           -> dec_I_enc_attn.*
      decoder.layers.I.pos_ffn.fc.{0,3}         -> dec_I_ffn.fc_{0,3}
      projection                                -> projection (bias-free)

    The {encoder,decoder}.pos_emb.pe sinusoid buffers have no parameter
    counterpart (we compute sinusoid_table inline) and are skipped, like
    the reference's own 'progress' deletion.  Returns (tree, skipped)."""
    tree: Dict[str, Any] = {}
    skipped = []
    for key, val in state_dict.items():
        if key.startswith("module."):
            key = key[len("module."):]
        if key.endswith("pos_emb.pe") or "progress" in key:
            skipped.append(key)
            continue
        parts = key.split(".")
        arr = np.asarray(val)
        m = re.match(
            r"(encoder|decoder)\.layers\.(\d+)\.(enc_self_attn|"
            r"dec_self_attn|dec_enc_attn|pos_ffn)\.(.*)", key)
        if m:
            side, i, mod, rest = m.groups()
            pre = "enc" if side == "encoder" else "dec"
            if mod == "pos_ffn":
                fcix = rest.split(".")[1]          # fc.{0,3}.weight
                path = (f"{pre}_{i}_ffn", f"fc_{fcix}")
            else:
                name = {"enc_self_attn": "self_attn",
                        "dec_self_attn": "self_attn",
                        "dec_enc_attn": "enc_attn"}[mod]
                path = (f"{pre}_{i}_{name}", rest.split(".")[0])
        elif key.startswith("encoder.down_size."):
            path = ("encoder_down_size",)
        elif key.startswith("encoder.image_self_attn."):
            path = ("encoder_image_self_attn", parts[2])
        elif key == "decoder.embedding.weight":
            _set(tree, ("embedding", "embedding"), jnp.asarray(arr))
            continue
        elif key.startswith("projection."):
            path = ("projection",)
        else:
            skipped.append(key)
            continue
        leaf = parts[-1]
        if leaf == "weight":
            _set(tree, path + ("kernel",), jnp.asarray(arr.T))
        elif leaf == "bias":
            _set(tree, path + ("bias",), jnp.asarray(arr))
        else:
            skipped.append(key)
    return tree, skipped


def load_reference_speaker(path: str) -> Dict[str, np.ndarray]:
    """Load the reference Transpeaker .pt wrapper -> flat numpy state
    dict (transpeaker.py:329-344 format; tolerates a bare state_dict)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "transpeaker" in obj:
        obj = obj["transpeaker"]["state_dict"]
    return {k: v.detach().cpu().numpy() if hasattr(v, "detach") else
            np.asarray(v) for k, v in obj.items()}
