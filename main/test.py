#!/usr/bin/env python
"""Evaluation CLI.

API parity target: /root/reference/main/test.py —
``python main/test.py --cfg configs/test_mesh_3dpw.yml`` loads a
checkpoint and runs the test dataset's full protocol evaluation
(MPJPE / PA-MPJPE / MPVPE / ACCEL, per-action where applicable).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    p = argparse.ArgumentParser(description="Evaluate pmce-tpu models")
    p.add_argument("--cfg", type=str, required=True)
    p.add_argument("--weights", type=str, default="",
                   help="checkpoint path (overrides TEST.weight_path)")
    p.add_argument("--platform", type=str, default="")
    p.add_argument("--vis", type=str, default="",
                   help="dump every 500th predicted mesh as OBJ here")
    args = p.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import jax
    import jax.numpy as jnp

    from pmce_tpu.utils import compile_cache

    compile_cache.enable()

    from pmce_tpu.core import checkpoint as ckpt_lib
    from pmce_tpu.core.config import load_config
    from pmce_tpu.core.trainer import H36M_EVAL_JOINTS, Trainer, TrainState
    from pmce_tpu.data.clip_dataset import MultiDataset
    from pmce_tpu.data.factory import (
        build_test_dataset,
        target_joint_regressor,
    )
    from pmce_tpu.models.pmce import create_pmce, resolve_compute_dtype
    from pmce_tpu.models.pose_lifter import PoseLifter
    from pmce_tpu.smpl.artifacts import ensure_cached_artifacts
    from pmce_tpu.smpl.mesh import ensure_cached_coarsening

    cfg = load_config(args.cfg)
    art = ensure_cached_artifacts()
    coarse = ensure_cached_coarsening()

    test_ds = build_test_dataset(cfg, art)
    j_reg_target = target_joint_regressor(cfg, test_ds)

    dtype = resolve_compute_dtype(cfg.MODEL.compute_dtype)
    if cfg.MODEL.name == "PMCE":
        model, _ = create_pmce(
            num_joint=test_ds.num_joints, art=art, coarsening=coarse,
            joint_regressor_h36m=test_ds.joint_regressor_h36m,
            embed_dim=cfg.MODEL.hpe_dim, depth=cfg.MODEL.hpe_dep,
            seqlen=cfg.DATASET.seqlen, dtype=dtype,
            fused_attn=cfg.MODEL.fused_attn)
    elif cfg.MODEL.name == "PoseEst":
        model = PoseLifter(num_joints=test_ds.num_joints,
                           num_frames=cfg.DATASET.seqlen,
                           embed_dim=cfg.MODEL.hpe_dim,
                           depth=cfg.MODEL.hpe_dep, dtype=dtype,
                           fused_attn=cfg.MODEL.fused_attn)
    else:
        # Strict like train.py: a typo'd name would otherwise evaluate a
        # random Stage-1 model against a PMCE checkpoint.
        raise ValueError(f"unknown MODEL.name {cfg.MODEL.name!r}")

    eval_root = getattr(test_ds, "eval_root_idx", 0)
    eval_joints = (None if (cfg.MODEL.name == "PoseEst" and eval_root != 0)
                   else H36M_EVAL_JOINTS)
    trainer = Trainer(cfg=cfg, model=model,
                      train_data=MultiDataset([test_ds], seed=0),
                      test_data=test_ds, faces=art.faces,
                      J_reg_target=j_reg_target,
                      eval_root_idx=eval_root, eval_joints=eval_joints)

    weight_path = args.weights or cfg.TEST.weight_path
    sample = test_ds.get_batch([0])
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.asarray(sample["pose2d"]),
        jnp.asarray(sample["img_feature"]))["params"]
    if weight_path:
        loaded = ckpt_lib.load_checkpoint(
            weight_path, params_template=jax.device_get(params))
        params = loaded["params"]
        print(f"loaded weights from {weight_path} "
              f"(epoch {loaded.get('epoch')})")
    else:
        print("WARNING: no weights given — evaluating a random init")

    state = TrainState(params=params, opt_state=None,
                       step=jnp.zeros((), jnp.int32))
    trainer.full_evaluate(state, vis_dir=args.vis)


if __name__ == "__main__":
    main()
