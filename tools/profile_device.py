"""Device-accurate timing via the jax profiler trace.

The axon tunnel adds ~2 ms of dispatch latency per executed program, which
swamps wall-clock micro-benchmarks (a 32 MB copy "measures" 1.9 ms). This
harness instead captures a profiler trace of N forwards and aggregates the
TPU "XLA Ops" lane — actual device-side op durations, immune to tunnel
latency.

Usage:
  python tools/profile_device.py [--whole-block] [--batch 256] [--top 25]
  python tools/profile_device.py --stage lifter   # profile one stage only
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))

import argparse
import collections
import glob
import gzip
import json
import os
import tempfile


def aggregate(trace_dir: str, iters: int, top: int):
    path = sorted(glob.glob(
        os.path.join(trace_dir, "plugins/profile/*/*.trace.json.gz")))[-1]
    with gzip.open(path) as f:
        data = json.load(f)
    ev = data["traceEvents"]
    pids, tids = {}, {}
    for e in ev:
        if e.get("ph") == "M":
            if e.get("name") == "process_name":
                pids[e["pid"]] = e["args"].get("name", "")
            if e.get("name") == "thread_name":
                tids[(e["pid"], e.get("tid"))] = e["args"].get("name", "")
    agg = collections.defaultdict(float)
    cnt = collections.defaultdict(int)
    tot = 0.0
    for e in ev:
        if (e.get("ph") == "X"
                and pids.get(e["pid"], "").startswith("/device:TPU")
                and tids.get((e["pid"], e.get("tid"))) == "XLA Ops"):
            agg[e["name"]] += e.get("dur", 0)
            cnt[e["name"]] += 1
            tot += e.get("dur", 0)
    print(f"device total: {tot / 1000:.2f} ms / {iters} iters "
          f"= {tot / iters / 1000:.3f} ms/iter")
    for n, v in sorted(agg.items(), key=lambda x: -x[1])[:top]:
        print(f"{v / iters / 1000:8.3f} ms/iter  x{cnt[n] // iters:4d}  "
              f"{n[:90]}")
    return tot / iters / 1000


def profile_train(args) -> None:
    """Per-op device attribution of the bf16+fused train step."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from pmce_tpu.utils import compile_cache

    compile_cache.enable()
    from pmce_tpu.core.trainer import TrainState, make_pmce_train_step
    from pmce_tpu.models.pmce import create_pmce
    from pmce_tpu.smpl.artifacts import ensure_cached_artifacts
    from pmce_tpu.smpl.mesh import ensure_cached_coarsening

    art = ensure_cached_artifacts()
    coarse = ensure_cached_coarsening()
    rng = np.random.default_rng(0)
    jr = rng.random((17, art.num_verts)).astype(np.float32)
    jr /= jr.sum(1, keepdims=True)
    model, _ = create_pmce(num_joint=17, art=art, coarsening=coarse,
                           joint_regressor_h36m=jr,
                           dtype=jnp.bfloat16, fused_attn=True)
    tx = optax.adam(1e-4)
    B, T, J, V = args.batch, 16, 17, art.num_verts
    batch = {
        "pose2d": jnp.asarray(rng.normal(size=(B, T, J, 2)), jnp.float32),
        "img_feature": jnp.asarray(rng.normal(size=(B, T, 2048)),
                                   jnp.float32),
        "mesh": jnp.asarray(rng.normal(size=(B, V, 3)), jnp.float32),
        "lift_pose3d": jnp.asarray(rng.normal(size=(B, J, 3)), jnp.float32),
        "reg_pose3d": jnp.asarray(rng.normal(size=(B, J, 3)), jnp.float32),
        "mesh_valid": jnp.ones((B, V, 1), jnp.float32),
        "lift_pose3d_valid": jnp.ones((B, J, 1), jnp.float32),
        "reg_pose3d_valid": jnp.ones((B, J, 1), jnp.float32),
    }
    params = jax.jit(model.init)(jax.random.PRNGKey(0), batch["pose2d"],
                                 batch["img_feature"])["params"]
    state = TrainState(params=params, opt_state=jax.jit(tx.init)(params),
                       step=jnp.zeros((), jnp.int32))
    step = make_pmce_train_step(model, tx, jnp.asarray(art.faces),
                                jnp.asarray(jr), 0.1, 20.0, 1e-3)
    key = jax.random.PRNGKey(0)
    lw = jnp.asarray(0.0)
    state, loss, _ = step(state, batch, key, lw)
    _ = float(loss)

    with tempfile.TemporaryDirectory() as td:
        with jax.profiler.trace(td):
            for _ in range(args.iters):
                state, loss, _ = step(state, batch, key, lw)
            _ = float(loss)
        aggregate(td, args.iters, args.top)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--whole-block", action="store_true")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--stage", choices=["pmce", "lifter", "decoder"],
                    default="pmce")
    ap.add_argument("--train", action="store_true",
                    help="profile the bf16+fused TRAIN step instead of the "
                         "serving forward (per-op device attribution of the "
                         "forward+backward+Adam graph)")
    args = ap.parse_args()

    if args.train:
        return profile_train(args)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from pmce_tpu.utils import compile_cache

    compile_cache.enable()
    from pmce_tpu.models.pmce import create_pmce
    from pmce_tpu.smpl.artifacts import ensure_cached_artifacts
    from pmce_tpu.smpl.mesh import ensure_cached_coarsening

    art = ensure_cached_artifacts()
    coarse = ensure_cached_coarsening()
    kwargs = {}
    if args.whole_block:
        kwargs["whole_block_kernel"] = True
    model, _ = create_pmce(num_joint=19, art=art, coarsening=coarse,
                           dtype=jnp.bfloat16, fused_attn=True, **kwargs)

    rng = np.random.default_rng(0)
    B, T, J = args.batch, 16, 19
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, T, J, 2)),
        jnp.zeros((1, T, 2048)))

    if args.stage == "pmce":
        def fwd(params, pose2d, img_feat):
            mesh, evo, pose3d = model.apply(params, pose2d, img_feat)
            return (jnp.sum(mesh.astype(jnp.float32))
                    + jnp.sum(evo.astype(jnp.float32))
                    + jnp.sum(pose3d.astype(jnp.float32)))
    elif args.stage == "lifter":
        def fwd(params, pose2d, img_feat):
            out = model.apply(params, pose2d, img_feat,
                              method=lambda m, p, f: m.pose_lifter(p, f))
            return jnp.sum(out.astype(jnp.float32))
    else:
        def fwd(params, pose2d, img_feat):
            pose = jnp.zeros((pose2d.shape[0], J, 3), jnp.float32)
            out = model.apply(
                params, pose, img_feat,
                method=lambda m, p, f: m.pose_mesh_coevo(p, f))
            return sum(jnp.sum(o.astype(jnp.float32))
                       for o in jax.tree.leaves(out))

    jf = jax.jit(fwd)
    p2 = jnp.asarray(rng.normal(size=(B, T, J, 2)), jnp.float32)
    imf = jnp.asarray(rng.normal(size=(B, T, 2048)), jnp.float32)
    _ = float(jf(params, p2, imf))

    with tempfile.TemporaryDirectory() as td:
        with jax.profiler.trace(td):
            acc = jf(params, p2, imf) * 0.0
            for _ in range(args.iters):
                acc = acc + jf(params, p2, imf)
            _ = float(acc)
        # iters + 1: the acc-zeroing call executes on device too.
        aggregate(td, args.iters + 1, args.top)


if __name__ == "__main__":
    main()
