"""End-to-end training-runtime tests on synthetic data (small model).

Compile time dominates on CPU, so tests share one module-scoped trained
PMCE trainer; only the lift model and the sharded path compile separately.
"""

import os

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from pmce_tpu.core.config import Config, load_config
from pmce_tpu.core.trainer import Trainer
from pmce_tpu.data.clip_dataset import ClipDataset, MultiDataset
from pmce_tpu.data.synthetic import generate_sequences
from pmce_tpu.models.pmce import create_pmce
from pmce_tpu.models.pose_lifter import PoseLifter
from pmce_tpu.smpl.artifacts import synthetic_artifacts
from pmce_tpu.smpl.mesh import synthetic_coarsening


@pytest.fixture(scope="module")
def setup():
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
    return art, coarse, jr, train_ds, test_ds


def _cfg(**kw):
    cfg = Config()
    cfg.TRAIN.batch_size = 8
    cfg.TRAIN.end_epoch = 2
    cfg.TRAIN.steps_per_epoch = 6
    cfg.TRAIN.lr = 1e-3
    cfg.TEST.batch_size = 8
    for k, v in kw.items():
        setattr(cfg.TRAIN, k, v)
    return cfg


@pytest.fixture(scope="module")
def trained(setup, tmp_path_factory):
    """One full PMCE fit (2 epochs, checkpointing, eval) shared by tests."""
    art, coarse, jr, train_ds, test_ds = setup
    ckpt_dir = str(tmp_path_factory.mktemp("ckpt"))
    model, assets = create_pmce(num_joint=17, art=art, coarsening=coarse,
                                joint_regressor_h36m=jr,
                                embed_dim=32, depth=1)
    trainer = Trainer(cfg=_cfg(), model=model,
                      train_data=MultiDataset([train_ds], seed=0),
                      test_data=test_ds, faces=art.faces,
                      J_reg_target=jr, ckpt_dir=ckpt_dir,
                      log_fn=lambda *_: None)
    state = trainer.fit()
    return trainer, state, ckpt_dir


def test_pmce_training_loss_decreases(trained):
    trainer, state, ckpt_dir = trained
    assert len(trainer.loss_history) == 2
    assert trainer.loss_history[-1] < trainer.loss_history[0]
    assert len(trainer.error_history["joint"]) == 2
    assert np.isfinite(trainer.error_history["joint"][-1])


def test_checkpoint_files_and_roundtrip(trained):
    from pmce_tpu.core import checkpoint as ckpt

    trainer, state, ckpt_dir = trained
    assert os.path.isfile(os.path.join(ckpt_dir, "final.ckpt"))
    assert os.path.isfile(os.path.join(ckpt_dir, "best.ckpt"))
    loaded = ckpt.load_checkpoint(
        ckpt_dir, params_template=jax.device_get(state.params))
    flat_a = jax.tree_util.tree_leaves(jax.device_get(state.params))
    flat_b = jax.tree_util.tree_leaves(loaded["params"])
    # "best" may differ from final state; check structure + finiteness,
    # then check the FINAL checkpoint matches the final state exactly.
    assert len(flat_a) == len(flat_b)
    final = ckpt.load_checkpoint(
        os.path.join(ckpt_dir, "final.ckpt"),
        params_template=jax.device_get(state.params))
    for a, b in zip(flat_a, jax.tree_util.tree_leaves(final["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert final["epoch"] == 2
    assert len(final["train_log"]) == 2


def test_resume_restores_full_state(trained, setup):
    """Trainer.restore must bring back params AND optimizer state plus the
    loss/error history — round 1's CLI resume only bumped the epoch and
    silently retrained from random init."""
    trainer, state, ckpt_dir = trained
    art, coarse, jr, train_ds, test_ds = setup
    model, _ = create_pmce(num_joint=17, art=art, coarsening=coarse,
                           joint_regressor_h36m=jr, embed_dim=32, depth=1)
    fresh = Trainer(cfg=_cfg(), model=model,
                    train_data=MultiDataset([train_ds], seed=0),
                    test_data=test_ds, faces=art.faces, J_reg_target=jr,
                    log_fn=lambda *_: None)
    restored, last_epoch = fresh.restore(
        os.path.join(ckpt_dir, "final.ckpt"))
    assert last_epoch == 2
    assert fresh.loss_history == trainer.loss_history
    for a, b in zip(jax.tree_util.tree_leaves(restored.params),
                    jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # Optimizer state (Adam moments) restored, not re-initialized.
    for a, b in zip(jax.tree_util.tree_leaves(restored.opt_state),
                    jax.tree_util.tree_leaves(state.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_lift_training(setup):
    art, coarse, jr, train_ds, test_ds = setup
    cfg = _cfg()
    cfg.MODEL.name = "PoseEst"
    model = PoseLifter(num_joints=17, embed_dim=32, depth=1)
    trainer = Trainer(cfg=cfg, model=model,
                      train_data=MultiDataset([train_ds], seed=0),
                      test_data=test_ds, faces=art.faces, J_reg_target=jr,
                      log_fn=lambda *_: None)
    trainer.fit()
    assert trainer.loss_history[-1] < trainer.loss_history[0]
    assert np.isfinite(trainer.error_history["joint"][-1])


def test_data_parallel_training_on_mesh(setup):
    """Sharded training step over the 8-virtual-device mesh runs and is
    numerically equivalent to single-device (same math, psum'd grads)."""
    from pmce_tpu.parallel import mesh as mesh_lib

    art, coarse, jr, train_ds, _ = setup
    assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"
    dev_mesh = mesh_lib.create_mesh()
    cfg = _cfg(steps_per_epoch=2, end_epoch=1)
    cfg.TRAIN.batch_size = 16  # divisible by 8
    model, _ = create_pmce(num_joint=17, art=art, coarsening=coarse,
                           joint_regressor_h36m=jr, embed_dim=32, depth=1)
    losses = {}
    evals = {}
    for tag, m in (("mesh", dev_mesh), ("single", None)):
        trainer = Trainer(cfg=cfg, model=model,
                          train_data=MultiDataset([train_ds], seed=0),
                          test_data=train_ds, faces=art.faces,
                          J_reg_target=jr, mesh=m, log_fn=lambda *_: None)
        state = trainer.fit()
        losses[tag] = trainer.loss_history
        evals[tag] = trainer.error_history["joint"][-1]
    np.testing.assert_allclose(losses["mesh"], losses["single"], rtol=2e-4)
    # Sharded evaluation matches single-device evaluation.
    np.testing.assert_allclose(evals["mesh"], evals["single"], rtol=2e-4)


def test_fsdp_training_equivalence(setup):
    """TRAIN.fsdp=True shards params + opt state leaf-wise over the data
    axis (ZeRO). Same math as replicated DP: loss histories must match,
    and the post-step state must STAY sharded (GSPMD propagates the input
    shardings through the donated jit step)."""
    from pmce_tpu.parallel import mesh as mesh_lib

    art, coarse, jr, train_ds, _ = setup
    dev_mesh = mesh_lib.create_mesh()
    cfg = _cfg(steps_per_epoch=2, end_epoch=1)
    cfg.TRAIN.batch_size = 16
    model, _ = create_pmce(num_joint=17, art=art, coarsening=coarse,
                           joint_regressor_h36m=jr, embed_dim=32, depth=1)
    losses = {}
    states = {}
    for tag, m, fsdp in (("fsdp", dev_mesh, True), ("single", None, False)):
        cfg.TRAIN.fsdp = fsdp
        trainer = Trainer(cfg=cfg, model=model,
                          train_data=MultiDataset([train_ds], seed=0),
                          test_data=train_ds, faces=art.faces,
                          J_reg_target=jr, mesh=m, log_fn=lambda *_: None)
        states[tag] = trainer.fit()
        losses[tag] = trainer.loss_history
    np.testing.assert_allclose(losses["fsdp"], losses["single"], rtol=2e-4)
    # The big kernels must still be sharded over data after the steps.
    sharded = 0
    for leaf in jax.tree_util.tree_leaves(states["fsdp"].params):
        if not leaf.sharding.is_fully_replicated:
            sharded += 1
            assert leaf.sharding.is_fully_addressable
    assert sharded > 0, "no parameter leaf remained FSDP-sharded"
    # And the final params agree with the single-device run. Tolerance is
    # in units of one Adam step (lr=1e-3): reduce-scatter vs all-reduce
    # reduction order perturbs tiny gradients, and Adam's g/√v̂ amplifies
    # those into O(lr)-scale differences on near-zero leaves.
    lr = cfg.TRAIN.lr
    for a, b in zip(jax.tree_util.tree_leaves(states["fsdp"].params),
                    jax.tree_util.tree_leaves(states["single"].params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-2, atol=0.5 * lr)


def test_eval_metrics_invariant_to_batch_size(trained):
    """Streamed eval must equal the exact dataset-level metric for ANY
    batch size: the ragged final batch is wrap-padded for static shapes
    but pad samples carry zero weight (round 1 counted them, biasing the
    running mean; and it synced per batch — now one sync per epoch)."""
    trainer, state, _ = trained
    n = len(trainer.test_data)
    results = {}
    for bs in (n, 8, 7):         # exact-multiple and two ragged sizes
        trainer.cfg.TEST.batch_size = bs
        je, se, _ = trainer.evaluate(state)
        results[bs] = (je, se)
    trainer.cfg.TEST.batch_size = 8
    for bs in (8, 7):
        np.testing.assert_allclose(results[bs], results[n], rtol=1e-5)


def test_bf16_fused_serving_policy_metric_delta(trained, setup):
    """The serving configuration (bf16 compute + fused Pallas attention)
    must reproduce the f32 model's eval metric on the SAME trained params:
    documented tolerance one bf16 ulp (2e-3 relative) MPJPE delta on the
    synthetic eval — see the error model below and README's serving-policy
    numeric contract."""
    import jax.numpy as jnp

    trainer, state, _ = trained
    art, coarse, jr, _, test_ds = setup
    model_bf16, _ = create_pmce(num_joint=17, art=art, coarsening=coarse,
                                joint_regressor_h36m=jr,
                                embed_dim=32, depth=1,
                                dtype=jnp.bfloat16, fused_attn=True)
    serving = Trainer(cfg=_cfg(), model=model_bf16,
                      train_data=trainer.train_data, test_data=test_ds,
                      faces=art.faces, J_reg_target=jr,
                      log_fn=lambda *_: None)
    je_f32, se_f32, _ = trainer.evaluate(state)
    je_bf16, se_bf16, _ = serving.evaluate(state)
    # Documented tolerance — RELATIVE on both metrics, because bf16
    # rounding error is proportional to activation/coordinate magnitude
    # (each bf16 value carries ~2⁻⁹ relative noise, so metric deltas scale
    # with the metric's own magnitude). The bound is ONE bf16 ulp relative
    # (2⁻⁹ ≈ 2e-3): a computation whose output error is dominated by bf16
    # rounding cannot be gated tighter than its own quantization step.
    # Measured realizations sit below but NEAR that line, and they vary by
    # HOST, not just by kernel variant: the same commit measured 0.094 mm
    # (1.3e-3) on one machine and 0.117 mm (1.6e-3) on another — XLA:CPU
    # emits different fused-rounding sequences per microarchitecture, so
    # any bound inside the realization spread is a coin flip across
    # machines (round 3 asserted 0.1 mm absolute on the ~73 mm smoke
    # metric and failed exactly that way). At the converged ~53.5 mm
    # protocol (BASELINE.md) the measured 1.3–1.6e-3 scales to
    # 0.069–0.086 mm — inside the 0.1 mm north star; 2e-3 (0.107 mm) is
    # the hard quantization ceiling. Per-kernel drift is guarded much
    # tighter by tests/test_bf16_canary.py (the actual regression
    # detector); this test is the end-to-end sanity gate.
    assert abs(je_bf16 - je_f32) <= 2e-3 * je_f32, (je_f32, je_bf16)
    assert abs(se_bf16 - se_f32) <= 1e-3 * se_f32, (se_f32, se_bf16)


def test_bf16_mixed_precision_training(trained, setup):
    """MODEL.compute_dtype='bfloat16' TRAINS end to end: master params stay
    f32 (Adam state and updates in f32), matmuls/activations run bf16,
    attention goes through the fused Pallas kernels' custom VJP. The loss
    must decrease and the final eval must land near the f32 run's."""
    import jax.numpy as jnp

    from pmce_tpu.models.pmce import resolve_compute_dtype

    assert resolve_compute_dtype("float32") is None
    assert resolve_compute_dtype("bfloat16") is jnp.bfloat16
    with pytest.raises(ValueError, match="compute_dtype"):
        resolve_compute_dtype("float16")

    trainer_f32, _, _ = trained
    art, coarse, jr, train_ds, test_ds = setup
    model, _ = create_pmce(num_joint=17, art=art, coarsening=coarse,
                           joint_regressor_h36m=jr, embed_dim=32, depth=1,
                           dtype=jnp.bfloat16, fused_attn=True)
    trainer = Trainer(cfg=_cfg(), model=model,
                      train_data=MultiDataset([train_ds], seed=0),
                      test_data=test_ds, faces=art.faces, J_reg_target=jr,
                      log_fn=lambda *_: None)
    state = trainer.fit()
    assert trainer.loss_history[-1] < trainer.loss_history[0]
    # Master weights stayed f32 under the bf16 compute policy.
    for leaf in jax.tree_util.tree_leaves(state.params):
        assert leaf.dtype == np.float32, leaf.dtype
    # Same data, seed, and step count as the f32 run: trajectories round
    # differently but must converge to the same neighborhood.
    je_bf16 = trainer.error_history["joint"][-1]
    je_f32 = trainer_f32.error_history["joint"][-1]
    assert np.isfinite(je_bf16)
    assert abs(je_bf16 - je_f32) <= 0.15 * je_f32, (je_f32, je_bf16)


def test_config_strict_overlay(tmp_path):
    p = tmp_path / "c.yml"
    p.write_text("TRAIN:\n  lr: 0.01\n  batch_size: 4\n")
    cfg = load_config(str(p))
    assert cfg.TRAIN.lr == 0.01 and cfg.TRAIN.batch_size == 4

    bad = tmp_path / "bad.yml"
    bad.write_text("TRAIN:\n  learning_rate: 0.01\n")
    with pytest.raises(ValueError, match="learning_rate"):
        load_config(str(bad))

    bad2 = tmp_path / "bad2.yml"
    bad2.write_text("TRAINING:\n  lr: 0.01\n")
    with pytest.raises(ValueError, match="TRAINING"):
        load_config(str(bad2))
