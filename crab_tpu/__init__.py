"""crab_tpu — a TPU-native audio-visual scene-understanding framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of GeWu-Lab/Crab
("Crab: A Unified Audio-Visual Scene Understanding Model with Explicit
Cooperation", CVPR 2025): frozen CLIP-ViT + BEATs perception, Q-Former
projectors, a LLaMA-2 decoder with MoE-routed LoRA, a SAM-style multi-scale
segmentation head, and the nine AV-UIE tasks (AVQA, AVE, AVVP, ARIG, AVCap,
MS3, S4, AVSS, Ref-AVS).

Layering (bottom -> top):
  core/      mesh + precision + config + param-tree utilities
  media/     device data plane: fbank kernel, image preprocessing, chunkers
  encoders/  CLIP ViT-L, BEATs, Q-Former projectors (pure functions)
  lm/        LLaMA decoder with MoE-LoRA + KV-cache generation
  fusion/    multimodal token splicing (static layouts)
  seg/       SAM-style multi-scale mask decoder + losses
  tasks/     task registry: prompts, media recipes, parsers, metrics
  runtime/   batched inference engine (data/model sharded)
  train/     optax train state, sharded optimizer, checkpoints
"""

__version__ = "0.1.0"
