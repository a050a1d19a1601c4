"""visionllm_tpu: a TPU-native (JAX/XLA/Pallas) multimodal generalist framework.

A ground-up rebuild of the capabilities of VisionLLMv2 (reference:
/root/reference/VisionLLMv2) designed for TPU hardware: SPMD over
`jax.sharding.Mesh`, static shapes everywhere, Pallas kernels for the hot
gather ops, and functional (flax.linen) model components.

Subpackages:
  ops       — compute kernels (ms_deform_attn, attention, box ops)
  models    — vision encoders, LLMs, atom-tool decoders, composite model
  parallel  — mesh construction + sharding rules
  data      — prompting, tokenization, image preprocessing, collation
  train     — losses, optimizer, train step
  eval      — benchmark harnesses (COCO det / pose / VQA)
  utils     — checkpointing, torch->jax weight conversion
"""

__version__ = "0.1.0"
