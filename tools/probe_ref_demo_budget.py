"""Measure the reference demo's per-window camera-fit floor from its OWN code.

The reference demo fits a 3-parameter weak-perspective camera with a
300-iteration Adam loop PER sliding window — at test stride 1 that is one
fit per output frame (/root/reference/main/run_demo.py:134-173, window loop
:337-351). The loop's cost is dominated by Python + framework dispatch on
tiny tensors (17 joints, 3 parameters), not by FLOPs, so a CPU-eager
measurement of the reference's own module is a defensible FLOOR for what
the loop costs on the reference's RTX 3090 (where every one of the ~10
ops per iteration additionally pays a CUDA launch).

This probe imports the REAL ``lib/models/project_net.py`` (the only stub
is ``core.config``, whose import has side effects) and replays the fit
loop verbatim: L1 loss on the projected 17 mid-frame joints, Adam lr 0.1
with drops to 0.05 at iter 100 and 0.001 at iter 200
(run_demo.py:141,152-165). The result is recorded in PERF.json under
``ref_demo_budget``; the README's demo-verdict row is rendered from it
(pmce_tpu/utils/perf.py).

Usage: python tools/probe_ref_demo_budget.py [--windows 8]
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))

import argparse
import time
import types

REF_LIB = "/root/reference/lib"


def load_reference_project_net():
    """Import the reference's project_net with a core.config stub.

    The real lib/core/config.py creates/deletes experiment directories at
    import time (config.py:25-38); project_net only does ``from
    core.config import cfg`` and never reads it at fit time.
    """
    import sys

    stub_core = types.ModuleType("core")
    stub_cfg = types.ModuleType("core.config")
    stub_cfg.cfg = types.SimpleNamespace()
    stub_core.config = stub_cfg
    saved = {n: sys.modules.pop(n) for n in ("core", "core.config")
             if n in sys.modules}
    sys.modules["core"] = stub_core
    sys.modules["core.config"] = stub_cfg
    sys.path.insert(0, REF_LIB)
    try:
        import importlib.util
        spec = importlib.util.spec_from_file_location(
            "_ref_project_net", _os.path.join(REF_LIB, "models",
                                              "project_net.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod
    finally:
        sys.path.remove(REF_LIB)
        for n in ("core", "core.config"):
            sys.modules.pop(n, None)
        sys.modules.update(saved)


def fit_window(project_net_mod, torch, pred_3d_joint, target_joint,
               crop_size=500):
    """One window's camera fit, verbatim loop semantics from
    /root/reference/main/run_demo.py:141,152-165."""
    import torch.nn as nn
    import torch.optim as optim

    project_net = project_net_mod.get_model(crop_size=crop_size)
    criterion = nn.L1Loss()
    optimizer = optim.Adam(project_net.parameters(), lr=0.1)
    project_net.train()
    for j in range(0, 300):
        pred_2d_joint = project_net(pred_3d_joint.detach())
        loss = criterion(pred_2d_joint, target_joint[:, :17, :])
        optimizer.zero_grad()
        loss.backward()
        optimizer.step()
        if j == 100:
            for g in optimizer.param_groups:
                g["lr"] = 0.05
        if j == 200:
            for g in optimizer.param_groups:
                g["lr"] = 0.001
    return float(loss.detach())


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--windows", type=int, default=8)
    args = ap.parse_args()

    import numpy as np
    import torch

    torch.manual_seed(0)
    mod = load_reference_project_net()

    rng = np.random.default_rng(0)
    pred_3d = torch.tensor(rng.normal(scale=0.3, size=(1, 17, 3)),
                           dtype=torch.float32)
    target = torch.tensor(rng.uniform(100, 400, size=(1, 19, 2)),
                          dtype=torch.float32)

    fit_window(mod, torch, pred_3d, target)          # warmup
    t0 = time.perf_counter()
    for _ in range(args.windows):
        fit_window(mod, torch, pred_3d, target)
    dt = time.perf_counter() - t0
    ms_per_window = dt / args.windows * 1e3
    ms_per_step = ms_per_window / 300.0
    ceiling_fps = 1e3 / ms_per_window

    print(f"reference camera fit (300-iter Adam, reference "
          f"lib/models/project_net.py, CPU eager): "
          f"{ms_per_window:.1f} ms/window ({ms_per_step:.3f} ms/step) "
          f"over {args.windows} windows")
    print(f"-> reference demo ceiling from this stage ALONE "
          f"(stride-1 windows = one fit per frame): {ceiling_fps:.2f} fps")

    from pmce_tpu.utils import perf

    perf.record("ref_demo_budget", {
        "cam_fit_ms_per_window": round(ms_per_window, 1),
        "cam_fit_ms_per_step": round(ms_per_step, 3),
        "cam_fit_only_ceiling_fps": round(ceiling_fps, 2),
        "basis": ("reference lib/models/project_net.py + verbatim "
                  "run_demo.py:141-165 loop, CPU eager floor; excludes "
                  "the reference's per-frame ViTPose-huge mmpose call, "
                  "YOLOv3 detection, HMR features, PMCE forward and "
                  "pyrender — all additional serial per-frame cost"),
        "source": "tools/probe_ref_demo_budget.py",
    })


if __name__ == "__main__":
    main()
