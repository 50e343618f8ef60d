"""spnerf_tpu — a TPU-native (JAX/XLA/Pallas) SuperPoint + NeRF framework.

A from-scratch rebuild of the capabilities of
AliYoussef97/SuperPoint-NeRF-Pytorch, redesigned TPU-first:

- NHWC tensor layouts, static shapes, padded+masked keypoint sets.
- Homographic augmentation, valid masks, keypoint maps and losses run
  on-device inside the jitted train step (reference ran them per-sample
  on CPU in ``Dataset.__getitem__``).
- Homographic adaptation is a single vmapped batched program instead of
  a 100-iteration Python loop (reference: export.py:103-104).
- Data parallelism via ``jax.sharding.Mesh`` + jit shardings; the
  reference is single-GPU only.
- In-framework NeRF renderer (the reference delegated to NerfStudio).
"""

__version__ = "0.1.0"
