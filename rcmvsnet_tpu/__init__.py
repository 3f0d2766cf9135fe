"""rcmvsnet_tpu — a TPU-native JAX/XLA/Pallas framework for unsupervised
multi-view stereo with rendering consistency (the capability set of
Boese0601/RC-MVSNet, re-designed TPU-first).

Layers (mirrors SURVEY.md §1 of the reference analysis):
  core/      — pure-numpy I/O (PFM, cam files, pair lists, PLY) and geometry
  ops/       — JAX sampling/warping primitives (grid-sample parity, fused
               plane-sweep warp + variance, SSIM, smoothness)
  nn/        — Flax building blocks (conv+BN, FPN feature net, 3D U-Net
               cost regularizer, NeRF MLP, neural volume encoder)
  models/    — CascadeMVSNet backbone + rendering-consistency network
  losses/    — unsupervised photometric / augmentation / ray losses
  render/    — Gaussian-Uniform ray sampling + volumetric rendering
  parallel/  — jax.sharding Mesh runtime (data-parallel training, SyncBN)
  data/      — DTU / Tanks&Temples datasets + host-side pipelines
  train/     — fused train step, optax schedule, orbax checkpoints
  fusion/    — depth-map filtering/fusion to point clouds + DTU benchmark
  cli/       — train / eval-dtu / eval-tanks entry points
"""

__version__ = "0.1.0"
