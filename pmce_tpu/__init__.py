"""pmce-tpu: a TPU-native framework for video-based 3D human pose & mesh recovery.

A ground-up JAX / XLA / Pallas / pjit re-design with the capabilities of the
PMCE reference (ICCV 2023, "Co-Evolution of Pose and Mesh for 3D Human Body
Estimation from Video"): a Stage-1 spatio-temporal 2D→3D pose lifter, a
Stage-2 pose↔mesh co-evolution decoder, the SMPL body model, five dataset
pipelines with their evaluation protocols, a training/eval runtime, and an
end-to-end video demo pipeline.

Sub-packages
------------
- ``pmce_tpu.smpl``      SMPL body model (artifacts, batched LBS forward,
                         Pallas fused skinning kernel, mesh coarsening).
- ``pmce_tpu.ops``       geometry / camera / Procrustes / metric kernels.
- ``pmce_tpu.models``    flax model zoo (pose lifter, co-evolution decoder,
                         composed PMCE, ResNet-50 feature extractor, ViTPose).
- ``pmce_tpu.data``      dataset pipelines, clip chunking, 2D noise synthesis,
                         keypoint-vocabulary conversion, host-side loaders.
- ``pmce_tpu.core``      losses, optimizers, trainers, checkpointing, config.
- ``pmce_tpu.parallel``  device-mesh / sharding utilities (DP over ICI).
- ``pmce_tpu.demo``      in-the-wild video pipeline (decode, track, 2D pose,
                         features, mesh recovery, camera fit, render).
"""

__version__ = "0.1.0"
