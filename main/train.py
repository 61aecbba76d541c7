#!/usr/bin/env python
"""Training CLI.

API parity target: /root/reference/main/train.py —
``python main/train.py --cfg configs/train_mesh_h36m.yml`` trains either
the composed PMCE mesh model or the Stage-1 pose lifter (``MODEL.name``),
evaluating and checkpointing every epoch with best/final selection.

Additions: ``--smoke`` (tiny run for CI), ``--platform cpu`` (force the
host backend), and explicit seeding of every RNG (the reference seeds
torch/np/random globals; here one seed feeds jax PRNG keys and numpy
Generators).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    p = argparse.ArgumentParser(description="Train pmce-tpu models")
    p.add_argument("--cfg", type=str, required=True)
    p.add_argument("--seed", type=int, default=123)
    p.add_argument("--resume", type=str, default="",
                   help="checkpoint dir/file to resume from")
    p.add_argument("--smoke", action="store_true",
                   help="2 epochs x 4 steps for a quick end-to-end check")
    p.add_argument("--platform", type=str, default="",
                   help="override jax platform (e.g. cpu)")
    p.add_argument("--tag", type=str, default="run")
    args = p.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import jax

    from pmce_tpu.utils import compile_cache

    compile_cache.enable()

    # Multi-host bootstrap (no-op on a single host); then shard data-
    # parallel over however many devices the process set exposes.
    from pmce_tpu.parallel import distributed as dist

    dist.initialize()

    from pmce_tpu.core import checkpoint as ckpt_lib
    from pmce_tpu.core.config import ensure_output_dirs, load_config
    from pmce_tpu.core.trainer import Trainer
    from pmce_tpu.data.clip_dataset import MultiDataset
    from pmce_tpu.data.factory import (
        build_test_dataset,
        build_train_datasets,
        target_joint_regressor,
    )
    from pmce_tpu.models.pmce import create_pmce, resolve_compute_dtype
    from pmce_tpu.models.pose_lifter import PoseLifter
    from pmce_tpu.smpl.artifacts import ensure_cached_artifacts
    from pmce_tpu.smpl.mesh import ensure_cached_coarsening

    cfg = load_config(args.cfg)
    cfg.TRAIN.seed = args.seed
    if args.smoke:
        cfg.TRAIN.end_epoch = min(cfg.TRAIN.end_epoch, 2)
        cfg.TRAIN.steps_per_epoch = 4
        cfg.TRAIN.batch_size = min(cfg.TRAIN.batch_size, 8)
        cfg.TEST.batch_size = min(cfg.TEST.batch_size, 8)
        cfg.DATASET.synthetic_samples = 64

    dirs = ensure_output_dirs(cfg, tag=args.tag)
    print(f"[pmce-tpu] backend={jax.default_backend()} "
          f"devices={len(jax.devices())} out={dirs['output']}")

    art = ensure_cached_artifacts()
    coarse = ensure_cached_coarsening()

    train_list = build_train_datasets(cfg, art)
    test_ds = build_test_dataset(cfg, art)
    main_ds = train_list[0]
    j_reg_target = target_joint_regressor(cfg, main_ds)

    dtype = resolve_compute_dtype(cfg.MODEL.compute_dtype)
    if cfg.MODEL.name == "PMCE":
        model, _assets = create_pmce(
            num_joint=main_ds.num_joints, art=art, coarsening=coarse,
            joint_regressor_h36m=main_ds.joint_regressor_h36m,
            embed_dim=cfg.MODEL.hpe_dim, depth=cfg.MODEL.hpe_dep,
            seqlen=cfg.DATASET.seqlen, dtype=dtype,
            fused_attn=cfg.MODEL.fused_attn)
    elif cfg.MODEL.name == "PoseEst":
        model = PoseLifter(num_joints=main_ds.num_joints,
                           num_frames=cfg.DATASET.seqlen,
                           embed_dim=cfg.MODEL.hpe_dim,
                           depth=cfg.MODEL.hpe_dep, dtype=dtype,
                           fused_attn=cfg.MODEL.fused_attn)
    else:
        raise ValueError(f"unknown MODEL.name {cfg.MODEL.name!r}")

    from pmce_tpu.core.trainer import H36M_EVAL_JOINTS

    eval_root = getattr(test_ds, "eval_root_idx", 0)
    # PW3D's Stage-1 protocol evaluates ALL coco joints about the pelvis;
    # every other path uses the 14 H36M eval joints about joint 0.
    eval_joints = (None if (cfg.MODEL.name == "PoseEst" and eval_root != 0)
                   else H36M_EVAL_JOINTS)
    from pmce_tpu.utils.logging import MetricLogger

    logger = MetricLogger(out_dir=dirs["output"],
                          use_wandb=cfg.TRAIN.wandb,
                          run_name=args.tag)
    dev_mesh = None
    if len(jax.devices()) > 1:
        dev_mesh = dist.global_mesh()
        if cfg.TRAIN.batch_size % dev_mesh.devices.shape[0]:
            raise ValueError(
                f"TRAIN.batch_size {cfg.TRAIN.batch_size} must divide by "
                f"the data-mesh size {dev_mesh.devices.shape[0]}")
        print(f"[pmce-tpu] data-parallel over {dev_mesh.devices.shape[0]} "
              f"devices ({jax.process_count()} host(s))"
              + (", FSDP param/opt sharding" if cfg.TRAIN.fsdp else ""))

    trainer = Trainer(
        cfg=cfg, model=model,
        train_data=MultiDataset(train_list, seed=args.seed),
        test_data=test_ds,
        faces=art.faces, J_reg_target=j_reg_target,
        ckpt_dir=dirs["checkpoint"],
        mesh=dev_mesh,
        eval_root_idx=eval_root,
        eval_joints=eval_joints,
        metric_logger=logger,
    )

    state = None
    if args.resume:
        state, last_epoch = trainer.restore(args.resume)
        print(f"resumed from epoch {last_epoch}")
        cfg.TRAIN.begin_epoch = last_epoch + 1

    # Stage-2 warm start from Stage-1 weights (reference
    # PoseEstimation.py:68-74, cfg.MODEL.posenet_pretrained/posenet_path).
    if (cfg.MODEL.name == "PMCE" and cfg.MODEL.posenet_pretrained
            and cfg.MODEL.posenet_path and state is None):
        state = trainer.init_state(
            trainer.train_data.sample_batch(cfg.TRAIN.batch_size))
        lifter = ckpt_lib.load_checkpoint(
            cfg.MODEL.posenet_path,
            params_template=jax.device_get(
                state.params["pose_lifter"]))["params"]
        params = dict(state.params)
        params["pose_lifter"] = lifter
        state = state.replace(params=params)
        if dev_mesh is not None:
            # The warm-started subtree is host numpy: re-apply the mesh
            # placement so the FSDP (or replicated) invariant holds.
            from pmce_tpu.parallel import mesh as mesh_lib

            state = (mesh_lib.shard_fsdp(dev_mesh, state)
                     if cfg.TRAIN.fsdp
                     else mesh_lib.replicate(dev_mesh, state))
        print(f"loaded Stage-1 weights from {cfg.MODEL.posenet_path}")

    state = trainer.fit(state)
    print("Final protocol evaluation:")
    trainer.full_evaluate(state)
    print(f"Training finished; checkpoints in {dirs['checkpoint']}")


if __name__ == "__main__":
    main()
