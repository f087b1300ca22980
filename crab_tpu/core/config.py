"""Typed configuration tree for crab_tpu.

Replaces the reference's dataclass-flag soup (GeWu-Lab/Crab
``configs/unified_config.py:6-125`` plus per-script ``.sh`` files) with one
coherent, validated config tree. All real hyperparameters live here; nothing
is hidden in shell scripts or hardcoded cluster paths.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Optional, Sequence


@dataclass(frozen=True)
class VisionEncoderConfig:
    """CLIP ViT-L/14-224 vision tower (frozen perception encoder).

    Mirrors the behavior of the reference's ``VisualEncoder``
    (``models/multimodal_encoder.py:33-84``): multi-layer hidden-state taps
    (``select_layers``), CLS token dropped ("patch" mode).
    ``select_layers`` are indices into [embeddings, layer1..layerN] hidden
    states, i.e. HF ``output_hidden_states`` indexing.
    """

    image_size: int = 224
    patch_size: int = 14
    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_layers: int = 24
    num_heads: int = 16
    # Hidden-state taps, HF indexing (0 = embeddings). The reference uses
    # [14, 22, 23] (configs/unified_config.py:14); taps feed the seg neck
    # (first image_scale_nums of them) and the VL projector (last one).
    select_layers: Sequence[int] = (14, 22, 23)
    layer_norm_eps: float = 1e-5
    # CLIP preprocessing constants (CLIPImageProcessor defaults).
    image_mean: Sequence[float] = (0.48145466, 0.4578275, 0.40821073)
    image_std: Sequence[float] = (0.26862954, 0.26130258, 0.27577711)

    @property
    def tokens_per_image(self) -> int:
        return (self.image_size // self.patch_size) ** 2  # 256


@dataclass(frozen=True)
class AudioEncoderConfig:
    """BEATs iter3+ AS2M audio encoder (frozen).

    Mirrors ``models/beats/BEATs.py:26-103`` + ``models/beats/backbone.py``:
    16x16 conv patchify of a 128-mel fbank, 12-layer post-norm transformer
    with shared gated relative-position bias and a grouped conv positional
    embedding.
    """

    input_patch_size: int = 16
    embed_dim: int = 512
    encoder_layers: int = 12
    encoder_embed_dim: int = 768
    encoder_ffn_embed_dim: int = 3072
    encoder_attention_heads: int = 12
    conv_bias: bool = False
    conv_pos: int = 128
    conv_pos_groups: int = 16
    layer_norm_first: bool = False
    deep_norm: bool = True
    relative_position_embedding: bool = True
    num_buckets: int = 320
    max_distance: int = 800
    gru_rel_pos: bool = True
    num_mel_bins: int = 128


@dataclass(frozen=True)
class ProjectorConfig:
    """BLIP-2-style Q-Former projector (visual or audio -> LLM tokens).

    Mirrors ``VLProjector``/``ALProjector``
    (``models/multimodal_encoder.py:87-262``): input LayerNorm, a 2-layer
    BERT with 32 learned queries and cross-attention in every layer, then a
    2-layer MLP to the decoder width.
    """

    encoder_width: int = 1024  # 1024 visual / 768 audio
    hidden_size: int = 768  # bert-base
    num_hidden_layers: int = 2
    num_heads: int = 12
    intermediate_size: int = 3072
    num_query_tokens: int = 32
    mlp_depth: int = 2
    layer_norm_eps: float = 1e-12


@dataclass(frozen=True)
class MoELoRAConfig:
    """Interaction-aware MoE-LoRA (the paper's "explicit cooperation").

    Mirrors ``peft_hyper/tuners/lora.py:260-369``: one shared down-proj A,
    ``num_experts`` up-projs B_i and a token-wise softmax router; applied to
    every q/k/v/o/gate/up/down projection of the decoder.
    """

    rank: int = 8
    alpha: int = 16
    num_experts: int = 3  # 1 joint finetune / 3 joint inference / 5 AVS
    dropout: float = 0.05
    # fp32 router softmax for parity with the reference (lora.py:347).
    router_dtype: str = "float32"

    @property
    def scaling(self) -> float:
        return self.alpha / self.rank


@dataclass(frozen=True)
class DecoderConfig:
    """LLaMA-2-style decoder (primary) — also covers Qwen2 dims.

    vocab_size is the *extended* vocabulary: base vocab + 17 multimodal
    special tokens (``models/unified_arch.py:409-459``).
    """

    vocab_size: int = 32017  # 32000 + 17 multimodal tokens
    hidden_size: int = 4096
    intermediate_size: int = 11008
    num_layers: int = 32
    num_heads: int = 32
    num_kv_heads: int = 32
    head_dim: int = 128
    rope_theta: float = 10000.0
    rms_norm_eps: float = 1e-5
    max_position_embeddings: int = 4096
    attention_bias: bool = False  # True for Qwen2 q/k/v
    tie_word_embeddings: bool = False
    # int8 KV cache: halves decode-step HBM traffic
    # (ops/decode_attention.py)
    kv_quant: bool = False
    # int8-KV decode attention implementation: 'xla' factors the per-row
    # scales out of both contractions and lets the compiler stream the
    # int8 cache into mixed bf16xs8 dots (measured fastest at serving
    # shapes, tools/micro_kv8.py: 12.5 ms/step-equiv vs 15.6 bf16 /
    # 18.4 pallas at S=832); 'pallas' keeps the VMEM-dequant kernel
    # (VMEM-bound above S~1k at batch 8).
    kv_kernel: str = "xla"
    # W8A8 prefill: with int8 weights, also quantize activations
    # per-token (symmetric) at T>1 so projections run s8xs8 on the MXU
    # at 2x the bf16 rate (v5e: 394 vs 197 TOPS). Decode (T==1) stays
    # W8A16 — it is bandwidth-bound. Opt-in: per-token activation
    # quantization is near-lossless on most inputs but is NOT bit-parity
    # (LLM.int8-style outlier channels can degrade 7B quality).
    int8_activations: bool = False
    # Prefill (T>1) attention implementation. 'xla' materializes the
    # (B, H, T, S) fp32 score tensor per layer (1.2 GB at the serving
    # shape B=16/T=768 — written and re-read around the softmax);
    # 'flash' runs the bundled Pallas TPU flash-attention kernel
    # (jax.experimental.pallas.ops.tpu.flash_attention) with online
    # softmax — scores never leave VMEM. Numerics: same math, different
    # reduction order (not bit-parity with 'xla'). Decode (T==1) is
    # unaffected (ops/decode_attention.py owns that path).
    prefill_attn: str = "xla"
    # flash block sizes (q, k). This environment pays ~5.6 us of fixed
    # cost per Pallas grid step (tools/README.md), so serving shapes
    # want the largest blocks that fit VMEM; 768 = whole-row blocks at
    # the bench prefill width. Measured before changing: tools/
    # micro_prefill_attn.py.
    flash_block_q: int = 256
    flash_block_k: int = 256
    # layer-scan unroll factor. At full unroll (= num_layers) the layer
    # index becomes a compile-time constant, so per-layer KV cache reads
    # are static slices instead of dynamic gathers (which XLA may
    # materialize as copies inside the decode step). Costs compile time;
    # measured on-chip before changing the default (tools/README.md).
    scan_unroll: int = 1
    lora: Optional[MoELoRAConfig] = field(default_factory=MoELoRAConfig)


@dataclass(frozen=True)
class SegConfig:
    """SAM-style multi-scale mask decoder ("SegModule").

    Mirrors ``models/multimodal_encoder.py:268-353`` + the multi-scale
    decoder at ``:891-1444``.
    """

    prompt_embed_dim: int = 256
    image_scale_nums: int = 2
    token_nums_per_scale: int = 3
    transformer_depth: int = 2
    transformer_mlp_dim: int = 2048
    num_heads: int = 8
    attention_downsample_rate: int = 2
    avs_query_num: int = 300
    query_generator_num_layers: int = 2
    query_generator_hidden_dim: int = 2048
    vit_embedding_dim: int = 1024
    image_embedding_size: int = 16  # 224 / 14
    low_res_mask_size: int = 112
    output_mask_size: int = 224
    avss_num_classes: int = 71
    dice_loss_weight: float = 0.5
    bce_loss_weight: float = 1.0

    @property
    def num_mask_tokens(self) -> int:
        # <mask_0..5>: image_scale_nums * token_nums_per_scale
        return self.image_scale_nums * self.token_nums_per_scale


@dataclass(frozen=True)
class CrabConfig:
    """Top-level model config."""

    name: str = "crab-7b"
    vision: VisionEncoderConfig = field(default_factory=VisionEncoderConfig)
    audio: AudioEncoderConfig = field(default_factory=AudioEncoderConfig)
    vl_projector: ProjectorConfig = field(
        default_factory=lambda: ProjectorConfig(encoder_width=1024)
    )
    al_projector: ProjectorConfig = field(
        default_factory=lambda: ProjectorConfig(encoder_width=768)
    )
    decoder: DecoderConfig = field(default_factory=DecoderConfig)
    seg: SegConfig = field(default_factory=SegConfig)
    # Computation dtype for the big matmuls ("bfloat16" or "float32");
    # norms, router softmax and logits always accumulate in fp32.
    compute_dtype: str = "bfloat16"
    param_dtype: str = "bfloat16"

    def replace(self, **kwargs: Any) -> "CrabConfig":
        return dataclasses.replace(self, **kwargs)


def crab_7b() -> CrabConfig:
    """LLaMA-2-7B-Chat flagship (reference primary model)."""
    return CrabConfig(name="crab-7b")


def crab_qwen_7b() -> CrabConfig:
    """Qwen2-7B variant (reference secondary; d_model 3584, GQA, qkv bias)."""
    return CrabConfig(
        name="crab-qwen-7b",
        decoder=DecoderConfig(
            vocab_size=151663,  # 151646 + 17
            hidden_size=3584,
            intermediate_size=18944,
            num_layers=28,
            num_heads=28,
            num_kv_heads=4,
            head_dim=128,
            rope_theta=1000000.0,
            rms_norm_eps=1e-6,
            max_position_embeddings=32768,
            attention_bias=True,
        ),
        vl_projector=ProjectorConfig(encoder_width=1024),
        al_projector=ProjectorConfig(encoder_width=768),
    )


def crab_tiny(vocab_size: int = 512) -> CrabConfig:
    """Tiny end-to-end config for tests and compile checks.

    Same architecture as crab-7b in every structural respect (layer kinds,
    taps, query counts, MoE-LoRA, seg head), just narrow and shallow.
    """
    return CrabConfig(
        name="crab-tiny",
        vision=VisionEncoderConfig(
            image_size=56,
            patch_size=14,
            hidden_size=64,
            intermediate_size=128,
            num_layers=4,
            num_heads=4,
            select_layers=(2, 3, 4),
        ),
        audio=AudioEncoderConfig(
            embed_dim=32,
            encoder_layers=2,
            encoder_embed_dim=64,
            encoder_ffn_embed_dim=128,
            encoder_attention_heads=4,
            conv_pos=16,
            conv_pos_groups=4,
            num_buckets=32,
            max_distance=64,
        ),
        vl_projector=ProjectorConfig(
            encoder_width=64,
            hidden_size=64,
            num_heads=4,
            intermediate_size=128,
            num_query_tokens=8,
        ),
        al_projector=ProjectorConfig(
            encoder_width=64,
            hidden_size=64,
            num_heads=4,
            intermediate_size=128,
            num_query_tokens=8,
        ),
        decoder=DecoderConfig(
            vocab_size=vocab_size,
            hidden_size=64,
            intermediate_size=128,
            num_layers=2,
            num_heads=4,
            num_kv_heads=4,
            head_dim=16,
            max_position_embeddings=2048,
            lora=MoELoRAConfig(rank=4, alpha=8, num_experts=3, dropout=0.0),
        ),
        seg=SegConfig(
            prompt_embed_dim=32,
            transformer_mlp_dim=64,
            num_heads=4,
            avs_query_num=16,
            query_generator_hidden_dim=64,
            vit_embedding_dim=64,
            image_embedding_size=4,
            low_res_mask_size=16,
            output_mask_size=32,
        ),
        compute_dtype="float32",
        param_dtype="float32",
    )


def crab_qwen_tiny(vocab_size: int = 512) -> CrabConfig:
    """Tiny config with the Qwen2 decoder shape (GQA, qkv bias, 1e6
    rope, 1e-6 eps) so the qwen family is exercised end to end — engine,
    packed layout (per-member B0/B1/B2), CLIs — without 7B weights."""
    import dataclasses

    base = crab_tiny(vocab_size)
    return base.replace(
        name="crab-qwen-tiny",
        decoder=dataclasses.replace(
            base.decoder,
            num_kv_heads=2,
            attention_bias=True,
            rope_theta=1000000.0,
            rms_norm_eps=1e-6,
        ),
    )


PRESETS = {
    "crab-7b": crab_7b,
    "crab-qwen-7b": crab_qwen_7b,
    "crab-tiny": crab_tiny,
    "crab-qwen-tiny": crab_qwen_tiny,
}


# 7B backbone name -> (config factory, tokenizer base vocab, eos id).
# The single source of truth for the checkpoint-format constants shared
# by the bench scripts and the CLIs (cli/quick_start.select_model):
# LLaMA-2 ends on </s>=2 over a 32000 base vocab; Qwen2 ends on
# <|im_end|>=151645 over 151646 (the 17 Crab special tokens sit above
# either base — fusion/tokens.py).
BACKBONES = {
    "llama": (crab_7b, 32000, 2),
    "qwen": (crab_qwen_7b, 151646, 151645),
}


def backbone_preset(llm: str):
    """(config_factory, base_vocab, eos_id) for a 7B backbone name.

    Raises on unknown names so a typo'd CRAB_*_LLM env var fails loudly
    instead of silently measuring the wrong backbone."""
    try:
        return BACKBONES[llm]
    except KeyError:
        raise ValueError(
            f"unknown backbone {llm!r}: expected one of {sorted(BACKBONES)}"
        ) from None
