"""cmda_tpu — a TPU-native (JAX/XLA/Pallas) framework for cross-modality
domain-adaptive semantic segmentation, with the capabilities of XiaRho/CMDA
(ICCV 2023, arXiv:2307.15942).

Built from scratch for TPU: NHWC layouts, one fused jitted UDA train step
(single grad, EMA update and ClassMix on-device), GSPMD data parallelism via
``jax.sharding``, and Pallas kernels for the event hot path.

Layer map (mirrors SURVEY.md §1, redesigned):
  ops/       pure array numerics: ISR, voxel grid, losses, metrics, augments
  models/    flax.linen modules: MiT encoder, DAFormer heads, fusion, CycleGAN
  uda/       the DACS self-training step (EMA teacher, pseudo-labels, ClassMix)
  data/      host-side datasets (DSEC / CityscapesIC / DarkZurich / UDA pairing)
  parallel/  mesh + sharding helpers
  train/     optimizer, schedules, loop, checkpointing, evaluation
"""

__version__ = "0.1.0"
