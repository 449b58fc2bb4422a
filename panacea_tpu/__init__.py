"""panacea-tpu: a TPU-native JAX framework for BEV-conditioned multi-view video diffusion.

Built from scratch with the capabilities of the reference implementation
(wenyuqing/panacea, a CUDA/torch codebase): a two-stage, BEV-layout-conditioned,
panoramic 6-camera video diffusion generator for autonomous driving, evaluated
through a StreamPETR 3D-detection harness.

Design stance (TPU-first, see SURVEY.md section 7):
  * pure-functional flax models, channels-last layouts, bf16 compute / fp32 params
  * one flash-attention kernel family (Pallas on TPU, XLA einsum elsewhere) with
    intra-view / cross-view / temporal / text specializations
  * full sampler loop as ``lax.scan`` inside a single ``jit``; CFG batched on-device
  * ``jax.sharding.Mesh`` + NamedSharding / shard_map in place of DDP+NCCL
"""

__version__ = "0.1.0"

from panacea_tpu.registry import instantiate_from_config, register, resolve_target  # noqa: F401
