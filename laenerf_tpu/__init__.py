"""laenerf_tpu — a TPU-native (JAX / XLA / Pallas / pjit) framework with the
capabilities of r4dl/LAENeRF (CVPR 2024).

Layers (mirrors SURVEY.md's layer map of the reference):
  ops/       — L0 kernel equivalents (hash grid, SH, freq, ray march, composite)
  models/    — L1-L2 NeRF network + volume renderer + occupancy grid state
  data/      — L3 datasets / ray sampling
  train/     — L3 trainer, metrics, checkpoints
  parallel/  — data-parallel mesh + sharded train step (NCCL-DDP equivalent)
  editing/   — L4 edit grid, LAENeRF palette model, style losses, distillation
  pipeline/  — L5 headless recolor/style pipeline drivers + CLI
"""

__version__ = "0.1.0"
