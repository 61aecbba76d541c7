"""Load the ACTUAL reference model sources as a parity oracle.

Round 3's verdict (weak #8): the in-repo torch oracle
(tests/torch_reference.py) re-declares the reference compute graph, so a
misreading of the reference replicated in both the oracle and the JAX
model passes parity silently. This module imports
/root/reference/lib/models/{PMCE,PoseEstimation,CoevoDecoder}.py — the real
files, unmodified — with the minimal import environment they need:

- ``timm.models.layers`` / ``timm.models.vision_transformer`` shims
  (timm is not installed; ~60 LoC of public timm semantics),
- a ``core.config.cfg`` stub (the real one has import-time side effects:
  /root/reference/lib/core/config.py:25-38 creates experiment dirs),
- a ``funcs_utils.load_checkpoint`` stub (never called: pretrained=False),
- the REAL reference ``graph_utils`` and ``models.backbones.{mesh,
  graph_layers}`` (pure numpy/scipy/torch — they run as-is on CPU),
- synthetic artifacts written to disk in the exact on-disk formats the
  reference loads (mesh_downsampling.npz with scipy-sparse A/U/D object
  arrays, smpl_mean_vertices.npy, J_regressor_h36m_correct.npy),
- ``torch.Tensor.cuda`` patched to a no-op for the CPU-only run
  (CoevoDecoder.py:199,206 call .cuda() unconditionally).

Everything is torn back out of sys.modules/sys.path after loading so the
rest of the test session is unaffected.
"""

from __future__ import annotations

import os
import sys
import types
from contextlib import contextmanager

import numpy as np
import torch
import torch.nn as nn

REF_LIB = "/root/reference/lib"


# ---------------------------------------------------------------------------
# timm shims — public timm semantics as used by the reference
# (PoseEstimation.py:9-10, CoevoDecoder.py:6-7). Written against timm's
# published vision_transformer.py, independently of tests/torch_reference.
# ---------------------------------------------------------------------------

def _build_timm():
    timm = types.ModuleType("timm")
    timm_models = types.ModuleType("timm.models")
    layers = types.ModuleType("timm.models.layers")
    vit = types.ModuleType("timm.models.vision_transformer")

    class DropPath(nn.Module):
        def __init__(self, drop_prob=0.0):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            if self.drop_prob == 0.0 or not self.training:
                return x
            keep = 1.0 - self.drop_prob
            shape = (x.shape[0],) + (1,) * (x.ndim - 1)
            mask = torch.bernoulli(torch.full(shape, keep, device=x.device))
            return x / keep * mask

    def to_2tuple(v):
        return v if isinstance(v, tuple) else (v, v)

    class Mlp(nn.Module):
        def __init__(self, in_features, hidden_features=None,
                     out_features=None, act_layer=nn.GELU, drop=0.0):
            super().__init__()
            out_features = out_features or in_features
            hidden_features = hidden_features or in_features
            self.fc1 = nn.Linear(in_features, hidden_features)
            self.act = act_layer()
            self.fc2 = nn.Linear(hidden_features, out_features)
            self.drop = nn.Dropout(drop)

        def forward(self, x):
            return self.drop(self.fc2(self.drop(self.act(self.fc1(x)))))

    class Attention(nn.Module):
        def __init__(self, dim, num_heads=8, qkv_bias=False, attn_drop=0.0,
                     proj_drop=0.0):
            super().__init__()
            self.num_heads = num_heads
            self.scale = (dim // num_heads) ** -0.5
            self.qkv = nn.Linear(dim, dim * 3, bias=qkv_bias)
            self.attn_drop = nn.Dropout(attn_drop)
            self.proj = nn.Linear(dim, dim)
            self.proj_drop = nn.Dropout(proj_drop)

        def forward(self, x):
            B, N, C = x.shape
            qkv = self.qkv(x).reshape(
                B, N, 3, self.num_heads, C // self.num_heads
            ).permute(2, 0, 3, 1, 4)
            q, k, v = qkv.unbind(0)
            attn = (q @ k.transpose(-2, -1)) * self.scale
            attn = self.attn_drop(attn.softmax(dim=-1))
            x = (attn @ v).transpose(1, 2).reshape(B, N, C)
            return self.proj_drop(self.proj(x))

    def _cfg(url="", **kwargs):
        return {"url": url, **kwargs}

    layers.DropPath = DropPath
    layers.to_2tuple = to_2tuple
    layers.trunc_normal_ = nn.init.trunc_normal_
    vit.Mlp = Mlp
    vit.Attention = Attention
    vit._cfg = _cfg
    timm.models = timm_models
    timm_models.layers = layers
    timm_models.vision_transformer = vit
    return {"timm": timm, "timm.models": timm_models,
            "timm.models.layers": layers,
            "timm.models.vision_transformer": vit}


def _build_cfg_stub(base_data_dir, joint_dim, vertx_dim, seqlen):
    class _NS(types.SimpleNamespace):
        pass

    cfg = _NS()
    cfg.MODEL = _NS(posenet_pretrained=False, joint_dim=joint_dim,
                    vertx_dim=vertx_dim, posenet_path="")
    cfg.DATASET = _NS(BASE_DATA_DIR=base_data_dir, seqlen=seqlen)
    core = types.ModuleType("core")
    core_config = types.ModuleType("core.config")
    core_config.cfg = cfg
    core.config = core_config
    funcs_utils = types.ModuleType("funcs_utils")

    def load_checkpoint(*a, **k):  # pragma: no cover - pretrained=False
        raise AssertionError("reference tried to load a real checkpoint")

    funcs_utils.load_checkpoint = load_checkpoint
    return {"core": core, "core.config": core_config,
            "funcs_utils": funcs_utils}


def _write_artifacts(tmpdir, mean_verts, J_regressor, D1, D2):
    """Write synthetic artifacts in the reference's exact on-disk formats."""
    import scipy.sparse as sp

    os.makedirs(os.path.join(tmpdir, "data", "base_data"), exist_ok=True)
    os.makedirs(os.path.join(tmpdir, "data", "Human36M"), exist_ok=True)
    np.save(os.path.join(tmpdir, "data", "base_data",
                         "smpl_mean_vertices.npy"), mean_verts)
    np.save(os.path.join(tmpdir, "data", "Human36M",
                         "J_regressor_h36m_correct.npy"), J_regressor)
    # mesh_downsampling.npz: object arrays of scipy sparse matrices
    # (models/backbones/mesh.py:50-56 — np.load(allow_pickle) + A/U/D keys).
    sizes = (D1.shape[1], D1.shape[0], D2.shape[0])
    A = np.empty(3, dtype=object)
    for i, n in enumerate(sizes):
        A[i] = sp.identity(n, format="csr")
    D = np.empty(2, dtype=object)
    D[0], D[1] = sp.csr_matrix(D1), sp.csr_matrix(D2)
    U = np.empty(2, dtype=object)
    U[0], U[1] = sp.csr_matrix(D1.T), sp.csr_matrix(D2.T)
    np.savez(os.path.join(tmpdir, "data", "base_data",
                          "mesh_downsampling.npz"), A=A, U=U, D=D)


@contextmanager
def _no_cuda():
    orig = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    try:
        yield
    finally:
        torch.Tensor.cuda = orig


# ---------------------------------------------------------------------------
# Eval-protocol oracle: import the REAL reference evaluation code
# (lib/coord_utils.py rigid_align, lib/eval_utils.py compute_error_accel,
# and the dataset evaluate() methods of data/PW3D/dataset.py and
# data/Human36M/dataset.py) and run them on synthetic predictions. The
# dataset __init__s load gigabytes of annotations, so evaluate() is called
# UNBOUND on a stub `self` carrying exactly the attributes the method
# reads — the protocol arithmetic that executes is the reference's own.
# ---------------------------------------------------------------------------


def _eval_stub_modules():
    """sys.modules stubs for the imports the dataset modules pull in that
    are either unavailable here (pycocotools, transforms3d, skimage) or
    carry import-time side effects (core.config). Only module-IMPORT needs
    these; evaluate() itself touches none of them except cfg.TEST.vis."""
    stubs = {}

    def mod(name, **attrs):
        m = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        stubs[name] = m
        return m

    class _NS(types.SimpleNamespace):
        pass

    cfg = _NS()
    cfg.TEST = _NS(vis=False)
    cfg.DATASET = _NS(seqlen=16)
    cfg.data_dir = "/nonexistent"
    cfg.vis_dir = "/nonexistent"
    mod("core", config=None)
    stubs["core"].config = mod("core.config", cfg=cfg)

    mod("funcs_utils",
        save_obj=lambda *a, **k: (_ for _ in ()).throw(
            AssertionError("evaluate() tried to save an obj")),
        stop=lambda *a, **k: None)

    class _SMPLStub:  # never constructed: evaluate() uses the stub self
        def __init__(self, *a, **k):
            raise AssertionError("reference tried to build a real SMPL")

    mod("smpl", SMPL=_SMPLStub)

    class _COCOStub:
        def __init__(self, *a, **k):
            raise AssertionError("reference tried to load a real COCO json")

    pycoco = mod("pycocotools")
    pycoco.coco = mod("pycocotools.coco", COCO=_COCOStub)
    mod("transforms3d")
    mod("noise_utils", synthesize_pose=None)
    mod("aug_utils", affine_transform=None, j3d_processing=None,
        flip_2d_joint=None, transform_joint_to_other_db=None)
    mod("_img_utils", split_into_chunks_pose=None,
        split_into_chunks_mesh=None)
    return stubs


@contextmanager
def load_reference_eval():
    """Yield (pw3d_module, h36m_module, coord_utils, eval_utils) — the
    REAL reference sources, with only unavailable third-party imports
    stubbed. coord_utils (rigid_align: lib/coord_utils.py:151-173) and
    eval_utils (compute_error_accel) are imported from /root/reference/lib
    UNMODIFIED and are exactly what the dataset evaluate() methods call."""
    import importlib.util

    stubs = _eval_stub_modules()
    saved = {}
    added = []
    lib_real = ["coord_utils", "eval_utils"]
    for name in list(stubs) + lib_real:
        if name in sys.modules:
            saved[name] = sys.modules.pop(name)
    sys.path.insert(0, REF_LIB)
    try:
        sys.modules.update(stubs)
        added.extend(stubs)
        import coord_utils
        import eval_utils
        added.extend(lib_real)

        def load_ds(tag, path):
            spec = importlib.util.spec_from_file_location(tag, path)
            m = importlib.util.module_from_spec(spec)
            sys.modules[tag] = m
            added.append(tag)
            spec.loader.exec_module(m)
            return m

        pw3d = load_ds("_ref_pw3d_dataset",
                       "/root/reference/data/PW3D/dataset.py")
        h36m = load_ds("_ref_h36m_dataset",
                       "/root/reference/data/Human36M/dataset.py")
        yield pw3d, h36m, coord_utils, eval_utils
    finally:
        sys.path.remove(REF_LIB)
        for name in set(added):
            sys.modules.pop(name, None)
        sys.modules.update(saved)


@contextmanager
def load_reference_models(tmpdir, mean_verts, J_regressor, D1, D2,
                          joint_dim=64, vertx_dim=64, seqlen=16):
    """Yield the reference's (PMCE, PoseEstimation, CoevoDecoder) modules.

    ``mean_verts`` [V,3], ``J_regressor`` [J,V], ``D1`` [V1,V], ``D2``
    [V2,V1] parameterize the on-disk artifacts the reference loads at
    model construction (CoevoDecoder.py:193-209).
    """
    _write_artifacts(str(tmpdir), mean_verts, J_regressor, D1, D2)
    stubs = {}
    stubs.update(_build_timm())
    stubs.update(_build_cfg_stub(
        os.path.join(str(tmpdir), "data", "base_data"),
        joint_dim, vertx_dim, seqlen))

    saved_modules = {}
    added = []
    names = ["models", "models.backbones", "models.backbones.mesh",
             "models.backbones.graph_layers", "models.PMCE",
             "models.PoseEstimation", "models.CoevoDecoder",
             "graph_utils"] + list(stubs)
    for name in names:
        if name in sys.modules:
            saved_modules[name] = sys.modules.pop(name)
    sys.path.insert(0, REF_LIB)
    old_cwd = os.getcwd()
    try:
        sys.modules.update(stubs)
        added.extend(stubs)
        # The reference hard-codes a CWD-relative J_regressor path
        # (CoevoDecoder.py:206: np.load('data/Human36M/...')).
        os.chdir(str(tmpdir))
        with _no_cuda():
            import models.backbones.mesh as ref_mesh
            import models.CoevoDecoder as CoevoDecoder
            import models.PMCE as PMCE
            import models.PoseEstimation as PoseEstimation

            # Pose2Mesh instantiates Mesh() with its cuda default device
            # and default filename; point it at the synthetic artifacts
            # on CPU. The REAL Mesh/get_graph_params/spmm still run.
            real_mesh_cls = ref_mesh.Mesh
            CoevoDecoder.Mesh = lambda: real_mesh_cls(
                filename=os.path.join(str(tmpdir), "data", "base_data",
                                      "mesh_downsampling.npz"),
                device=torch.device("cpu"))
            for name in ("models", "models.backbones",
                         "models.backbones.mesh",
                         "models.backbones.graph_layers", "models.PMCE",
                         "models.PoseEstimation", "models.CoevoDecoder",
                         "graph_utils"):
                if name in sys.modules:
                    added.append(name)
            yield PMCE, PoseEstimation, CoevoDecoder
    finally:
        os.chdir(old_cwd)
        sys.path.remove(REF_LIB)
        for name in set(added):
            sys.modules.pop(name, None)
        sys.modules.update(saved_modules)
