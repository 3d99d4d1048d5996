"""nerfsafetyvalidation_tpu — TPU-native NeRF safety-validation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
sisl/NeRFSafetyValidation (an Instant-NGP NeRF stack wrapped by a drone
safety-validation pipeline). The compute path is pure JAX (jit/vmap/pjit,
Pallas kernels for the hot ops); the reference's CUDA extensions
(gridencoder, shencoder, freqencoder, raymarching, ffmlp) are replaced by
TPU-idiomatic dense fixed-shape kernels.

Layer map (mirrors SURVEY.md §1):
  ops/        encoder + ray-march + composite kernels   (replaces reference L0/L1)
  models/     NeRF networks + volume renderer            (reference L2, nerf/)
  data/       dataset provider + ray generation          (reference L3, nerf/provider.py)
  train/      trainer, metrics, checkpointing            (reference L3, nerf/utils.py)
  parallel/   mesh + sharding utilities                  (replaces DDP/NCCL)
  nav/        planner / agent / estimator stack          (reference L4, nav/)
  uq/         uncertainty quantification                 (reference L5, uncertainty/)
  validation/ simulators + stress tests + replay         (reference L6, validation/)
"""

__version__ = "0.1.0"
