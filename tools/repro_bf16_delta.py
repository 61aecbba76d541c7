"""Standalone repro of tests/test_trainer.py::test_bf16_fused_serving_policy_
metric_delta — trains the 2-epoch smoke model ONCE, caches params to disk,
then reports the f32 vs bf16+fused eval MPJPE/MPVPE deltas. Lets kernel
numeric changes iterate without re-training (the training is ~minutes on CPU).

Usage: JAX_PLATFORMS=cpu python tools/repro_bf16_delta.py
"""

import os
import pickle
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

# The env var alone is NOT honored on this image (the axon TPU plugin
# overrides it); the config update is what actually pins the backend.
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from pmce_tpu.utils.compile_cache import machine_tag  # noqa: E402

_cache = os.path.join(os.path.dirname(__file__), "..", "tests", ".jax_cache",
                      machine_tag())
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from pmce_tpu.core.config import Config  # noqa: E402
from pmce_tpu.core.trainer import Trainer  # noqa: E402
from pmce_tpu.data.clip_dataset import ClipDataset, MultiDataset  # noqa: E402
from pmce_tpu.data.synthetic import generate_sequences  # noqa: E402
from pmce_tpu.models.pmce import create_pmce  # noqa: E402
from pmce_tpu.smpl.artifacts import synthetic_artifacts  # noqa: E402
from pmce_tpu.smpl.mesh import synthetic_coarsening  # noqa: E402

STATE_PATH = "/tmp/bf16_repro_state.pkl"


def _cfg():
    cfg = Config()
    cfg.TRAIN.batch_size = 8
    cfg.TRAIN.end_epoch = 2
    cfg.TRAIN.steps_per_epoch = 6
    cfg.TRAIN.lr = 1e-3
    cfg.TEST.batch_size = 8
    return cfg


def main():
    art = synthetic_artifacts(seed=0, num_verts=600, num_faces=1200)
    coarse = synthetic_coarsening(sizes=(600, 150, 40))
    rng = np.random.default_rng(0)
    jr = rng.random((17, 600)).astype(np.float32)
    jr /= jr.sum(1, keepdims=True)
    train_ds = ClipDataset(
        generate_sequences(art, jr, num_videos=2, frames_per_video=40,
                           seed=0), seqlen=16, stride=1)
    test_ds = ClipDataset(
        generate_sequences(art, jr, num_videos=1, frames_per_video=40,
                           seed=1), seqlen=16, stride=1)

    model, _ = create_pmce(num_joint=17, art=art, coarsening=coarse,
                           joint_regressor_h36m=jr, embed_dim=32, depth=1)
    trainer = Trainer(cfg=_cfg(), model=model,
                      train_data=MultiDataset([train_ds], seed=0),
                      test_data=test_ds, faces=art.faces,
                      J_reg_target=jr, log_fn=lambda *_: None)

    if os.path.exists(STATE_PATH):
        with open(STATE_PATH, "rb") as f:
            params = pickle.load(f)
        print("loaded cached trained params")
        sample = trainer.train_data.sample_batch(8)
        state = trainer.init_state(sample)
        state = state.replace(params=jax.device_put(params))
    else:
        state = trainer.fit()
        with open(STATE_PATH, "wb") as f:
            pickle.dump(jax.device_get(state.params), f)
        print("trained + cached params")

    je_f32, se_f32, _ = trainer.evaluate(state)

    model_bf16, _ = create_pmce(num_joint=17, art=art, coarsening=coarse,
                                joint_regressor_h36m=jr, embed_dim=32,
                                depth=1, dtype=jnp.bfloat16, fused_attn=True)
    serving = Trainer(cfg=_cfg(), model=model_bf16,
                      train_data=trainer.train_data, test_data=test_ds,
                      faces=art.faces, J_reg_target=jr,
                      log_fn=lambda *_: None)
    je_bf16, se_bf16, _ = serving.evaluate(state)
    dj = abs(je_bf16 - je_f32)
    ds = abs(se_bf16 - se_f32) / se_f32
    print(f"MPJPE f32={je_f32:.4f} bf16={je_bf16:.4f} |delta|={dj:.4f} mm "
          f"(tol 0.1) {'PASS' if dj <= 0.1 else 'FAIL'}")
    print(f"MPVPE f32={se_f32:.4f} bf16={se_bf16:.4f} rel={ds:.6f} "
          f"(tol 1e-3) {'PASS' if ds <= 1e-3 else 'FAIL'}")


if __name__ == "__main__":
    main()
