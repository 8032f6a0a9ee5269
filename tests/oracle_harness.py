"""Drive the REAL reference fine-tune stack (/root/reference/map_nav_src:
R2RNavBatch + GMapNavAgent + GlocalTextPathNavCMT) on synthetic data, by
providing a fake MatterSim module backed by our ScanGraph tables.

This is the strongest parity evidence obtainable without Matterport data
(VERDICT round-1, item 5): the reference's whole host-side step loop —
candidate sweep (r2r/env.py:249-334), GraphMap bookkeeping, gmap/vp
variable builders (r2r/agent.py:151-304), fused-logit action selection and
stop backtrack (r2r/agent.py:588-681) — runs unmodified against the same
synthetic world and model weights as our scan-compiled rollout, and the
two must pick identical paths.

It doubles as the reference-throughput measurement rig (VERDICT item 3):
`time_reference_iteration` times Seq2SeqAgent.train DAgger iterations with
the real model on this host's CPU, separating host-loop time from model
compute so BASELINE.md can quote a grounded anchor instead of a guess.

The fake MatterSim reproduces the discretized-view state machine the
reference relies on (30-degree steps, viewIndex = row*12+col, navigable
locations with camera-relative headings).  Note: r2r/agent.py:371,380
treats `EnvBatch.sims` as a *batched* simulator while r2r/env.py:47 builds
a list — the fake returns a hybrid list object supporting both, which is
what the reference code requires to run at all.
"""
from __future__ import annotations

import json
import math
import os
import sys
import types
from typing import Dict, List

import numpy as np

REF = "/root/reference/map_nav_src"

_TWO_PI = 2.0 * math.pi


def _wrap_pi(x: float) -> float:
    return (x + math.pi) % _TWO_PI - math.pi


class _Loc:
    __slots__ = ("viewpointId", "x", "y", "z", "rel_heading",
                 "rel_elevation", "rel_distance")

    def __init__(self, vp_id, pos, rel_heading, rel_elevation, rel_distance):
        self.viewpointId = vp_id
        self.x, self.y, self.z = (float(pos[0]), float(pos[1]), float(pos[2]))
        self.rel_heading = rel_heading
        self.rel_elevation = rel_elevation
        self.rel_distance = rel_distance


class _State:
    __slots__ = ("scanId", "viewIndex", "heading", "elevation", "location",
                 "navigableLocations", "step")


class _FakeSimulator:
    """Single-episode discretized graph simulator (MatterSim.Simulator
    stand-in).  Graph data comes from the registry installed by
    install_fake_mattersim; unknown scans get an isolated dummy node (the
    reference builds one sim on a hardcoded scan purely for angle tables,
    utils/data.py:103-150)."""

    _GRAPHS: Dict[str, "object"] = {}

    def __init__(self):
        self.scan = None
        self.vp = 0
        self.col = 0
        self.row = 1

    # config no-ops (r2r/env.py:48-58)
    def setDatasetPath(self, *a):
        pass

    def setNavGraphPath(self, *a):
        pass

    def setRenderingEnabled(self, *a):
        pass

    def setDiscretizedViewingAngles(self, *a):
        pass

    def setCameraResolution(self, *a):
        pass

    def setCameraVFOV(self, *a):
        pass

    def setBatchSize(self, *a):
        pass

    def initialize(self):
        pass

    # ------------------------------------------------------------------
    @property
    def _view_index(self):
        return self.row * 12 + self.col

    @property
    def _heading(self):
        return (self.col % 12) * math.radians(30)

    @property
    def _elevation(self):
        return (self.row - 1) * math.radians(30)

    def newEpisode(self, scans, vps, headings, elevations):
        scan, vp, heading, elevation = scans[0], vps[0], headings[0], \
            elevations[0]
        self.scan = scan
        g = self._GRAPHS.get(scan)
        self.vp = g.index[vp] if g is not None else 0
        # discretized angles snap to the nearest 30-degree step
        self.col = int(round(heading / math.radians(30))) % 12
        self.row = min(max(int(round(elevation / math.radians(30))) + 1, 0), 2)

    def makeAction(self, index, heading, elevation):
        ix = index[0]
        if ix != 0:
            g = self._GRAPHS[self.scan]
            nbrs = [int(w) for w in g.cand_local[self.vp] if w >= 0]
            self.vp = nbrs[ix - 1]
        self.col = (self.col + int(round(heading[0]))) % 12
        self.row = min(max(self.row + int(round(elevation[0])), 0), 2)

    # set to (hfov, vfov) radians to emulate the real MatterSim view
    # frustum: navigableLocations then only lists neighbors inside the
    # current view's frustum (populateNavigable semantics the reference
    # sweep relies on, r2r/env.py:249-314).  None = every neighbor visible
    # from every view (the graph-adjacency approximation).
    VISIBILITY_FOV = None

    def getState(self):
        st = _State()
        st.scanId = self.scan
        st.viewIndex = self._view_index
        st.heading = self._heading
        st.elevation = self._elevation
        st.step = 0
        g = self._GRAPHS.get(self.scan)
        if g is None:
            st.location = _Loc("dummy", (0.0, 0.0, 0.0), 0.0, 0.0, 0.0)
            st.navigableLocations = [st.location]
            return [st]
        pos = g.pos[self.vp]
        st.location = _Loc(g.vp_ids[self.vp], pos, 0.0, 0.0, 0.0)
        locs = [st.location]
        # every neighbor is listed with camera-relative angles; the
        # reference's 36-view sweep keeps, per neighbor, the view
        # minimizing sqrt(rel_h^2+rel_e^2) (r2r/env.py:249-314), which is
        # exactly ScanGraph.cand_ptid (= nearest_view_index_np)
        for k in range(g.cand_local.shape[1]):
            w = int(g.cand_local[self.vp, k])
            if w < 0:
                continue
            rel_h = _wrap_pi(float(g.cand_heading[self.vp, k]) - st.heading)
            rel_e = float(g.cand_elev[self.vp, k]) - st.elevation
            if self.VISIBILITY_FOV is not None:
                hfov, vfov = self.VISIBILITY_FOV
                if abs(rel_h) > hfov / 2.0 or abs(rel_e) > vfov / 2.0:
                    continue
            locs.append(_Loc(
                g.vp_ids[w], g.pos[w], rel_h, rel_e,
                float(g.cand_dist[self.vp, k])))
        st.navigableLocations = locs
        return [st]


class _SimList(list):
    """EnvBatch.sims: a list of per-episode sims that also answers the
    batched calls r2r/agent.py:371,380 makes on it."""

    def append(self, sim):
        list.append(self, sim)

    def getState(self):
        return [s.getState()[0] for s in self]

    def newEpisode(self, scans, vps, headings, elevations):
        for i, s in enumerate(self):
            s.newEpisode([scans[i]], [vps[i]], [headings[i]],
                         [elevations[i]])


def install_fake_mattersim(graphs: Dict[str, "object"]):
    """Install sys.modules stubs so /root/reference/map_nav_src imports on
    this image: MatterSim (fake, backed by `graphs`: scan_id -> ScanGraph)
    plus inert line_profiler / spacy / jsonlines / sklearnex."""
    import importlib.machinery

    def _stub(name):
        m = types.ModuleType(name)
        # a real __spec__ so importlib.util.find_spec (used by
        # transformers' feature probing) accepts the stub
        m.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
        return m

    _FakeSimulator._GRAPHS = dict(graphs)
    ms = _stub("MatterSim")
    ms.Simulator = _FakeSimulator
    sys.modules["MatterSim"] = ms

    for name in ("line_profiler",):
        if name not in sys.modules:
            sys.modules[name] = _stub(name)

    if "spacy" not in sys.modules:
        sp = _stub("spacy")

        def _no_spacy(*a, **k):
            raise RuntimeError("spacy stubbed out in oracle harness")

        sp.load = _no_spacy
        sys.modules["spacy"] = sp

    if "jsonlines" not in sys.modules:
        jl = _stub("jsonlines")

        class _JL:
            def __init__(self, f):
                self._f = open(f)

            def __iter__(self):
                for line in self._f:
                    if line.strip():
                        yield json.loads(line)

            def __enter__(self):
                return self

            def __exit__(self, *a):
                self._f.close()

        jl.open = _JL
        sys.modules["jsonlines"] = jl

    if "sklearnex" not in sys.modules:
        se = _stub("sklearnex")
        se.patch_sklearn = lambda *a, **k: None
        sys.modules["sklearnex"] = se

    # reference code calls .cuda() everywhere; keep tensors on CPU
    import torch

    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self

    if REF not in sys.path:
        sys.path.insert(0, REF)
    # the reference targets an older transformers; shim moved helper
    import transformers.modeling_utils as mu

    if not hasattr(mu, "apply_chunking_to_forward"):
        from transformers.pytorch_utils import apply_chunking_to_forward

        mu.apply_chunking_to_forward = apply_chunking_to_forward


def write_connectivity(graphs: Dict[str, "object"], out_dir: str):
    """ScanGraph -> Matterport connectivity JSONs (the exact schema
    utils/data.py:76-101 and sim/graph_sim.load_connectivity parse)."""
    os.makedirs(out_dir, exist_ok=True)
    for scan, g in graphs.items():
        V = g.num_vps
        adj = np.zeros((V, V), bool)
        for v in range(V):
            for w in g.cand_local[v]:
                if w >= 0:
                    adj[v, int(w)] = adj[int(w), v] = True
        items = []
        for v in range(V):
            pose = [0.0] * 16
            pose[0] = pose[5] = pose[10] = pose[15] = 1.0
            pose[3], pose[7], pose[11] = (float(g.pos[v, 0]),
                                          float(g.pos[v, 1]),
                                          float(g.pos[v, 2]))
            items.append(dict(image_id=g.vp_ids[v], pose=pose,
                              included=True,
                              unobstructed=[bool(x) for x in adj[v]],
                              height=1.5))
        with open(os.path.join(out_dir, f"{scan}_connectivity.json"),
                  "w") as f:
            json.dump(items, f)


class StubFeatDB:
    """ImageFeaturesDB stand-in: same [Vtot, 36, Df] feature array the
    NavWorld is built from, keyed by (scan, vp_id)."""

    def __init__(self, graphs: Dict[str, "object"], scan_order: List[str],
                 features: np.ndarray):
        self.features = features
        self.offsets = {}
        off = 0
        for s in scan_order:
            self.offsets[s] = off
            off += graphs[s].num_vps
        self.graphs = graphs

    def get_image_feature(self, scan, vp_id, img_type=None):
        g = self.graphs[scan]
        return self.features[self.offsets[scan] + g.index[vp_id]]


def make_ref_args(tmp: str, feat_dim: int = 768, **overrides):
    """Parse the reference's own parser with harness-appropriate flags,
    run postprocess_args (path derivation only), then apply overrides."""
    argv = ["prog", "--mode", "train", "--root_dir", tmp, "--output_dir",
            os.path.join(tmp, "out"), "--tokenizer", "roberta",
            "--dropout", "0", "--feat_dropout", "0", "--seed", "0"]
    old_argv = sys.argv
    try:
        sys.argv = argv
        from r2r.parser import parse_args, postprocess_args

        args = postprocess_args(parse_args())
    finally:
        sys.argv = old_argv
    args.feature_size = args.image_feat_size = feat_dim
    for k, v in overrides.items():
        setattr(args, k, v)
    return args


_ROBERTA_CONFIG = dict(
    model_type="roberta", vocab_size=50265, hidden_size=768,
    num_hidden_layers=12, num_attention_heads=12, intermediate_size=3072,
    hidden_act="gelu", hidden_dropout_prob=0.1,
    attention_probs_dropout_prob=0.1, max_position_embeddings=514,
    type_vocab_size=1, initializer_range=0.02, layer_norm_eps=1e-5,
    pad_token_id=1, bos_token_id=0, eos_token_id=2,
    attn_implementation="eager",
)


def write_roberta_config(tmp: str):
    """get_vlnbert_models reads PretrainedConfig from the local path
    'datasets/pretrained/roberta' (vlnbert_init.py:74-83); materialize it
    under `tmp` and chdir there before building the agent."""
    d = os.path.join(tmp, "datasets", "pretrained", "roberta")
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(_ROBERTA_CONFIG, f)


def _reinit_model(bert):
    """Deterministically re-initialize the oracle model.  transformers
    >=4.5x fast-init leaves params its _init_weights doesn't cover as
    torch.empty garbage when from_pretrained gets an empty state_dict —
    notably nn.MultiheadAttention inside the DETR pano encoder
    (models/transformer.py) whose in_proj_bias came back non-finite.  The
    authors' older transformers ran full module init first; reproduce
    that: the repo's init_weights (Bert_backbone.py:911-919) for standard
    modules + MultiheadAttention's own reset."""
    import torch

    from models.Bert_backbone import init_weights as ref_init_weights

    torch.manual_seed(0)
    bert.apply(ref_init_weights)
    for m in bert.modules():
        if isinstance(m, torch.nn.MultiheadAttention):
            m._reset_parameters()
    bad = [n for n, p in bert.named_parameters()
           if not torch.isfinite(p).all()]
    assert not bad, f"non-finite params after reinit: {bad}"


def goat_config_from_ref_args(args):
    """GoatConfig mirroring exactly what get_vlnbert_models builds from
    these args (vlnbert_init.py:89-155 + the local roberta config)."""
    from vln_goat_tpu.config import GoatConfig

    return GoatConfig(
        dataset=args.dataset, name="R2R", mode="train",
        vocab_size=50265, hidden_size=768, num_attention_heads=12,
        intermediate_size=3072, max_position_embeddings=514,
        type_vocab_size=1, pad_token_id=1,
        layer_norm_eps=_ROBERTA_CONFIG["layer_norm_eps"],
        hidden_act="gelu",
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        num_l_layers=args.num_l_layers, num_pano_layers=args.num_pano_layers,
        num_x_layers=args.num_x_layers,
        image_feat_size=args.image_feat_size,
        angle_feat_size=args.angle_feat_size, obj_feat_size=0,
        max_action_steps=100, max_action_len=args.max_action_len,
        max_instr_len=args.max_instr_len, fusion=args.fusion,
        glocal_fuse=(args.fusion == "dynamic"),
        graph_sprels=args.graph_sprels,
        adaptive_pano_fusion=args.adaptive_pano_fusion,
        do_back_img=args.do_back_img, do_back_txt=args.do_back_txt,
        do_front_img=args.do_front_img, do_front_his=args.do_front_his,
        do_front_txt=args.do_front_txt,
        do_back_txt_type=args.do_back_txt_type,
        do_back_img_type=args.do_back_img_type,
        do_add_method=args.do_add_method,
        cfp_temperature=args.cfp_temperature, feat_dropout=0.0,
    )


class NavRecorder:
    """Wraps the reference VLNBert to record per-step navigation inputs and
    fused logits during a rollout (for logit-level parity)."""

    def __init__(self, inner):
        self.inner = inner
        self.records = []

    def __call__(self, mode, batch):
        out = self.inner(mode, batch)
        if mode == "navigation":
            self.records.append(dict(
                gmap_vpids=[list(v) for v in batch["gmap_vpids"]],
                logits=out["fused_logits"].detach().cpu().numpy().copy(),
                visited=batch["gmap_visited_masks"].cpu().numpy().copy(),
                masks=batch["gmap_masks"].cpu().numpy().copy(),
            ))
        return out

    # the agent touches these on self.vln_bert
    def eval(self):
        self.inner.eval()
        return self

    def train(self, mode=True):
        self.inner.train(mode)
        return self

    def parameters(self):
        return self.inner.parameters()

    @property
    def drop_env(self):
        return self.inner.drop_env

    @property
    def vln_bert(self):
        return self.inner.vln_bert


def flatten_ref_traj(traj: dict) -> List[str]:
    """Reference traj['path'] is a list of path segments (the first is
    [[start]]); flatten to one viewpoint-id sequence."""
    return sum(traj["path"], [])


class StubObjDB:
    """reverie.data_utils.ObjectFeatureDB stand-in: deterministic synthetic
    objects per viewpoint (feature rows, absolute directions, bbox sizes,
    object ids, category numbers) — same call surface as the reference
    (reverie/data_utils.py:80-104)."""

    def __init__(self, graphs, scan_order: List[str], obj_feat_size=768,
                 n_objs: int = 8, seed: int = 7):
        self.store = {}
        rng = np.random.default_rng(seed)
        for s in scan_order:
            g = graphs[s]
            for v in range(g.num_vps):
                n = int(rng.integers(1, n_objs + 1))
                fts = rng.standard_normal((n, obj_feat_size)).astype(
                    np.float32)
                dirs = np.stack([rng.uniform(-np.pi, np.pi, n),
                                 rng.uniform(-0.6, 0.6, n)], 1)
                sizes = rng.integers(20, 300, (n, 2))
                ids = [f"{v}_{k}" for k in range(n)]
                names = rng.integers(0, 45, n).tolist()
                self.store[(s, g.vp_ids[v])] = (fts, dirs, sizes, ids, names)

    def get_object_feature(self, scan, viewpoint, base_heading,
                           base_elevation, angle_feat_size,
                           max_objects=None):
        from utils.data import angle_feature

        fts, dirs, sizes, ids, names = self.store[(scan, viewpoint)]
        if max_objects is not None:
            fts, dirs, sizes = fts[:max_objects], dirs[:max_objects], \
                sizes[:max_objects]
            ids, names = ids[:max_objects], names[:max_objects]
        ang = np.zeros((len(fts), angle_feat_size), np.float32)
        box = np.zeros((len(fts), 3), np.float32)
        for k in range(len(fts)):
            ang[k] = angle_feature(dirs[k, 0] - base_heading,
                                   dirs[k, 1] - base_elevation,
                                   angle_feat_size)
            w, h = sizes[k]
            box[k, :2] = [h / 480, w / 640]
            box[k, 2] = box[k, 0] * box[k, 1]
        return fts, ang, box, list(ids), list(names)


def make_reverie_ref_args(tmp: str, feat_dim: int = 768, **overrides):
    """reverie/parser.py twin of make_ref_args."""
    argv = ["prog", "--mode", "train", "--root_dir", tmp, "--output_dir",
            os.path.join(tmp, "out"), "--tokenizer", "roberta",
            "--dropout", "0", "--feat_dropout", "0", "--seed", "0",
            # the reverie parser resolves feature paths through hardcoded
            # maps (reverie/parser.py:180-196); pick keys that exist
            "--features", "clip768", "--obj_features", "vitbase"]
    old_argv = sys.argv
    try:
        sys.argv = argv
        from reverie.parser import parse_args

        args = parse_args()  # runs postprocess_args internally (:171)
    finally:
        sys.argv = old_argv
    args.feature_size = args.image_feat_size = feat_dim
    for k, v in overrides.items():
        setattr(args, k, v)
    return args


def build_ref_reverie_stack(graphs, features: np.ndarray,
                            instr_data: List[dict], tmp: str,
                            batch_size: int = 12, feat_dim: int = 768,
                            obj_feat_size: int = 768, max_objects: int = 20,
                            **arg_overrides):
    """Reference REVERIE stack (ReverieObjectNavBatch +
    GMapObjectNavAgent, reverie/main_nav_obj.py:191-260) on synthetic
    data.  instr_data items must carry 'objId'; obj2vps maps each to its
    goal viewpoint.  Returns (agent, env, args, obj_db)."""
    install_fake_mattersim(graphs)
    write_roberta_config(tmp)
    conn_dir = os.path.join(tmp, "connectivity")
    write_connectivity(graphs, conn_dir)

    args = make_reverie_ref_args(
        tmp, feat_dim=feat_dim, obj_feat_size=obj_feat_size,
        max_objects=max_objects, **arg_overrides)
    scan_order = sorted(graphs)
    feat_db = StubFeatDB(graphs, scan_order, features)
    obj_db = StubObjDB(graphs, scan_order, obj_feat_size=obj_feat_size)
    obj2vps = {}
    for it in instr_data:
        if "objId" in it:
            obj2vps.setdefault(f"{it['scan']}_{it['objId']}", []).append(
                it["path"][-1])

    cwd = os.getcwd()
    os.chdir(tmp)
    try:
        from reverie.env import ReverieObjectNavBatch
        from reverie.agent_obj_goat import GMapObjectNavAgent

        env = ReverieObjectNavBatch(
            feat_db, obj_db, instr_data, conn_dir, obj2vps,
            batch_size=batch_size, angle_feat_size=args.angle_feat_size,
            max_objects=max_objects, seed=0, name="oracle", args=args)
        env.env.sims = _SimList(env.env.sims)
        agent = GMapObjectNavAgent(args, env, rank=0)
        _reinit_model(agent.vln_bert.vln_bert)
    finally:
        os.chdir(cwd)
    return agent, env, args, obj_db


def build_ref_stack(graphs, features: np.ndarray, instr_data: List[dict],
                    tmp: str, batch_size: int = 8, feat_dim: int = 768,
                    **arg_overrides):
    """Construct the reference R2RNavBatch + GMapNavAgent on synthetic
    data.  Returns (agent, env, args)."""
    install_fake_mattersim(graphs)
    write_roberta_config(tmp)
    conn_dir = os.path.join(tmp, "connectivity")
    write_connectivity(graphs, conn_dir)

    args = make_ref_args(tmp, feat_dim=feat_dim, **arg_overrides)
    scan_order = sorted(graphs)
    feat_db = StubFeatDB(graphs, scan_order, features)

    cwd = os.getcwd()
    os.chdir(tmp)  # so 'datasets/pretrained/roberta' resolves
    try:
        from r2r.env import R2RNavBatch
        from r2r.agent import GMapNavAgent

        env = R2RNavBatch(feat_db, instr_data, conn_dir,
                          batch_size=batch_size,
                          angle_feat_size=args.angle_feat_size, seed=0,
                          name="oracle", args=args)
        # r2r/agent.py:371,380 calls batched methods on EnvBatch.sims (a
        # plain list as built, r2r/env.py:47) — wrap so those calls work
        env.env.sims = _SimList(env.env.sims)
        agent = GMapNavAgent(args, env, rank=0)
        _reinit_model(agent.vln_bert.vln_bert)
    finally:
        os.chdir(cwd)
    return agent, env, args
