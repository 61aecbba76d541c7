"""Regression tests for the offline artifact converters.

The chumpy-pkl unpickler (tools/convert_smpl_pkl.py) is the single most
fragile link to real-data parity: it replays the on-disk format of the MPI
``basicModel_*.pkl`` files (reference loader: /root/reference/smplpytorch/
smplpytorch/native/webuser/serialization.py:1-39) without importing chumpy.
These tests construct genuine chumpy-format pickles in-process — stub
classes registered under the ``chumpy``/``chumpy.ch``/``chumpy.ch_ops``
module names are pickled, producing the exact class-path references a real
MPI pickle contains — and drive the converter end to end.

convert_mesh_downsampling.py is exercised on a scipy-sparse fixture shaped
like the COMA ``mesh_downsampling.npz`` (reference consumer:
/root/reference/lib/models/backbones/mesh.py:49-57).
"""

from __future__ import annotations

import pickle
import sys
import types
from pathlib import Path

import numpy as np
import pytest
import scipy.sparse as sp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

import convert_smpl_pkl  # noqa: E402
import convert_mesh_downsampling  # noqa: E402

from pmce_tpu.smpl.artifacts import SMPLArtifacts  # noqa: E402
from pmce_tpu.smpl.mesh import MeshCoarsening  # noqa: E402


# --------------------------------------------------------------------------
# Fake chumpy classes. Instances pickle with class paths ``chumpy.ch.Ch``
# and ``chumpy.ch_ops.add`` — byte-compatible with what a real MPI pickle
# references — and carry the same state layout chumpy serializes (plain
# ``__dict__`` with the payload under ``x`` / operands under ``a``,``b``).
# --------------------------------------------------------------------------

def _register_fake_chumpy():
    created = []
    root = types.ModuleType("chumpy")
    ch = types.ModuleType("chumpy.ch")
    ch_ops = types.ModuleType("chumpy.ch_ops")
    reordering = types.ModuleType("chumpy.reordering")

    class Ch:  # noqa: D401 - mimic chumpy.ch.Ch pickle layout
        def __init__(self, x):
            self.x = np.asarray(x)

    class add:  # noqa: N801 - chumpy's class really is lowercase
        def __init__(self, a, b):
            self.a = a
            self.b = b

    class transpose:  # noqa: N801
        def __init__(self, x):
            self.x = np.asarray(x)

    Ch.__module__, Ch.__qualname__ = "chumpy.ch", "Ch"
    add.__module__, add.__qualname__ = "chumpy.ch_ops", "add"
    transpose.__module__ = "chumpy.reordering"
    transpose.__qualname__ = "transpose"
    ch.Ch, ch_ops.add, reordering.transpose = Ch, add, transpose
    root.ch, root.ch_ops, root.reordering = ch, ch_ops, reordering

    for name, mod in (("chumpy", root), ("chumpy.ch", ch),
                      ("chumpy.ch_ops", ch_ops),
                      ("chumpy.reordering", reordering)):
        assert name not in sys.modules, f"real {name} present?"
        sys.modules[name] = mod
        created.append(name)
    return Ch, add, transpose, created


@pytest.fixture()
def fake_chumpy():
    Ch, add, transpose, created = _register_fake_chumpy()
    try:
        yield Ch, add, transpose
    finally:
        for name in created:
            sys.modules.pop(name, None)


def _mini_model(Ch, add, transpose, *, regressor_format="csc", seed=0):
    """A structurally-faithful miniature SMPL pickle payload.

    V=48, J=24 so SMPLArtifacts.validate's shape relations (posedirs basis
    = 9*(J-1)=207, weights rows sum to 1) hold at test size.
    """
    rng = np.random.default_rng(seed)
    V, J = 48, 24
    v_template = rng.normal(size=(V, 3))
    shapedirs = rng.normal(size=(V, 3, 10))
    posedirs = rng.normal(size=(V, 3, 207))
    weights = rng.random((V, J))
    weights /= weights.sum(axis=1, keepdims=True)
    jr = np.zeros((J, V))
    jr[np.arange(J), np.arange(J) * 2] = 1.0
    kintree = np.zeros((2, J), dtype=np.uint32)
    kintree[0] = np.maximum(np.arange(J) - 1, 0)
    kintree[0, 0] = np.uint32(2**32 - 1)  # root parent as MPI stores it
    kintree[1] = np.arange(J)
    faces = rng.integers(0, V, size=(64, 3)).astype(np.uint32)

    make_sparse = sp.csr_matrix if regressor_format == "csr" else sp.csc_matrix
    payload = {
        # v_template in real pkls is an add node (template + offsets).
        "v_template": add(Ch(v_template * 0.5), v_template * 0.5),
        "shapedirs": transpose(shapedirs),
        "posedirs": Ch(posedirs),
        "J_regressor": make_sparse(jr),
        "weights": Ch(weights),
        "kintree_table": kintree,
        "f": faces,
        "bs_type": "lrotmin",
        "bs_style": "lbs",
    }
    expected = {
        "v_template": v_template, "shapedirs": shapedirs,
        "posedirs": posedirs, "J_regressor": jr, "weights": weights,
        "faces": faces.astype(np.int32),
        "parents": np.concatenate([[0], kintree[0, 1:]]).astype(np.int32),
    }
    return payload, expected


@pytest.mark.parametrize("fmt", ["csc", "csr"])
def test_convert_smpl_pkl_roundtrip(fake_chumpy, tmp_path, fmt):
    Ch, add, transpose = fake_chumpy
    payload, expected = _mini_model(Ch, add, transpose, regressor_format=fmt)
    pkl = tmp_path / f"basicModel_{fmt}.pkl"
    pkl.write_bytes(pickle.dumps(payload, protocol=2))

    # The converter must not need chumpy importable at all: drop the fake
    # modules before converting so any stray ``import chumpy`` fails loudly.
    saved = {n: sys.modules.pop(n) for n in list(sys.modules)
             if n.startswith("chumpy")}
    try:
        out = tmp_path / f"smpl_{fmt}.npz"
        convert_smpl_pkl.convert(str(pkl), str(out))
        art = SMPLArtifacts.load(str(out))
    finally:
        sys.modules.update(saved)

    np.testing.assert_allclose(art.v_template, expected["v_template"],
                               atol=1e-6)
    np.testing.assert_allclose(art.shapedirs, expected["shapedirs"],
                               atol=1e-6)
    np.testing.assert_allclose(
        art.posedirs, expected["posedirs"].reshape(48, 3, 207), atol=1e-6)
    np.testing.assert_allclose(art.J_regressor, expected["J_regressor"],
                               atol=1e-6)
    np.testing.assert_allclose(art.lbs_weights, expected["weights"],
                               atol=1e-6)
    np.testing.assert_array_equal(art.kintree_parents, expected["parents"])
    np.testing.assert_array_equal(art.faces, expected["faces"])


def test_sparse_stub_against_scipy_oracle():
    """The hand-rolled CSR/CSC densification must match scipy exactly,
    including a non-square matrix (where a transposed walk would throw or
    silently scramble)."""
    rng = np.random.default_rng(7)
    dense = rng.random((5, 9)) * (rng.random((5, 9)) > 0.6)
    for mat, stub_cls in ((sp.csc_matrix(dense), convert_smpl_pkl._SparseStub),
                          (sp.csr_matrix(dense), convert_smpl_pkl._CsrStub)):
        stub = stub_cls.__new__(stub_cls)
        stub.__setstate__(mat.__reduce__()[2])
        np.testing.assert_allclose(stub.toarray(), dense, atol=0)


def test_chumpy_add_node_sums_both_operands(fake_chumpy, tmp_path):
    """Regression for the round-2 review fix: an ``add`` node must sum a+b
    (returning only ``a`` silently dropped v_template offsets)."""
    Ch, add, transpose = fake_chumpy
    a = np.full((4, 3), 1.0)
    b = np.full((4, 3), 0.25)
    blob = pickle.dumps(add(Ch(a), b), protocol=2)
    node = convert_smpl_pkl._Unpickler(
        __import__("io").BytesIO(blob), encoding="latin1").load()
    np.testing.assert_allclose(node.r, a + b)


def test_convert_mesh_downsampling_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    sizes = (20, 10, 5)
    D, U = [], []
    for lvl in range(2):
        nf, nc = sizes[lvl], sizes[lvl + 1]
        d = rng.random((nc, nf)) * (rng.random((nc, nf)) > 0.5)
        u = rng.random((nf, nc)) * (rng.random((nf, nc)) > 0.5)
        D.append(sp.csc_matrix(d))
        U.append(sp.csr_matrix(u))
    # The COMA file stores object arrays of scipy sparse matrices plus an
    # adjacency list A the converter ignores (mesh.py:49-57).
    src = tmp_path / "mesh_downsampling.npz"
    np.savez(src,
             A=np.array([sp.eye(s) for s in sizes], dtype=object),
             D=np.array(D, dtype=object),
             U=np.array(U, dtype=object))

    out = tmp_path / "mesh_coarsening.npz"
    convert_mesh_downsampling.convert(str(src), str(out))
    mesh = MeshCoarsening.load(str(out))
    assert mesh.sizes == sizes
    for lvl in range(2):
        np.testing.assert_allclose(mesh.D[lvl], D[lvl].toarray(), atol=1e-6)
        np.testing.assert_allclose(mesh.U[lvl], U[lvl].toarray(), atol=1e-6)
