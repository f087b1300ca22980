"""HF LLaMA/Qwen2 checkpoints (+ peft_hyper MoE-LoRA deltas) -> stacked
crab_tpu decoder params.

Handles:
  - plain HF ``LlamaForCausalLM`` / ``Qwen2ForCausalLM`` state dicts;
  - the reference's delta files (``finetune_weights.bin``), whose keys are
    peft-prefixed (``base_model.model.model.layers...``) and carry
    ``lora_route``/``lora_A``/``lora_B{i}`` children
    (``peft_hyper/tuners/lora.py:287-290``);
  - extended embeddings (base vocab + 17 multimodal tokens).
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

from crab_tpu.core.config import DecoderConfig


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        return t.detach().cpu().float().numpy()
    return np.asarray(t, np.float32)


def strip_peft_prefix(sd: Dict) -> Dict:
    """base_model.model.X -> X (peft_hyper wrapping)."""
    out = {}
    for k, v in sd.items():
        if k.startswith("base_model.model."):
            k = k[len("base_model.model."):]
        out[k] = v
    return out


_PROJ = {
    "q": "self_attn.q_proj",
    "k": "self_attn.k_proj",
    "v": "self_attn.v_proj",
    "o": "self_attn.o_proj",
    "gate": "mlp.gate_proj",
    "up": "mlp.up_proj",
    "down": "mlp.down_proj",
}


def convert_llama(
    sd: Dict,
    cfg: DecoderConfig,
    prefix: str = "model.",
    load_lora: bool = False,
) -> Dict:
    """HF state dict -> stacked decoder param tree."""
    L = cfg.num_layers

    def stack_lin(names):
        return jnp.asarray(np.stack([_np(sd[n]).T for n in names]))

    params = {
        "embed": jnp.asarray(_np(sd[f"{prefix}embed_tokens.weight"])),
        "final_norm": {"scale": jnp.asarray(_np(sd[f"{prefix}norm.weight"]))},
        "layers": {
            "attn_norm": {
                "scale": jnp.asarray(
                    np.stack(
                        [
                            _np(sd[f"{prefix}layers.{i}.input_layernorm.weight"])
                            for i in range(L)
                        ]
                    )
                )
            },
            "mlp_norm": {
                "scale": jnp.asarray(
                    np.stack(
                        [
                            _np(
                                sd[
                                    f"{prefix}layers.{i}.post_attention_layernorm.weight"
                                ]
                            )
                            for i in range(L)
                        ]
                    )
                )
            },
        },
    }
    if "lm_head.weight" in sd:
        params["lm_head"] = jnp.asarray(_np(sd["lm_head.weight"]).T)
    else:  # tied embeddings
        params["lm_head"] = params["embed"].T

    for short, hf in _PROJ.items():
        names = [f"{prefix}layers.{i}.{hf}.weight" for i in range(L)]
        p = {"w": stack_lin(names)}
        bias_name = f"{prefix}layers.0.{hf}.bias"
        if bias_name in sd:
            p["b"] = jnp.asarray(
                np.stack([_np(sd[f"{prefix}layers.{i}.{hf}.bias"]) for i in range(L)])
            )
        if load_lora and cfg.lora is not None:
            E = cfg.lora.num_experts
            route, A, B = [], [], []
            for i in range(L):
                base = f"{prefix}layers.{i}.{hf}"
                route.append(_np(sd[f"{base}.lora_route.weight"]).T)
                A.append(_np(sd[f"{base}.lora_A.weight"]).T)
                B.append(
                    np.stack([_np(sd[f"{base}.lora_B{e}.weight"]).T for e in range(E)])
                )
            p["lora"] = {
                "route": jnp.asarray(np.stack(route)),
                "A": jnp.asarray(np.stack(A)),
                "B": jnp.asarray(np.stack(B)),
            }
        params["layers"][short] = p
    return params


def extend_embeddings(params: Dict, new_vocab: int, seed: int = 0) -> Dict:
    """Grow embed/lm_head to the multimodal vocabulary.

    New rows init ~ N(0, 0.02) (HF resize default is mean-init; the
    reference immediately overwrites them from finetuned deltas, so the
    init only matters before stage-2 loading).
    """
    rng = np.random.default_rng(seed)
    embed = np.asarray(params["embed"])
    V, D = embed.shape
    if new_vocab <= V:
        return params
    extra = rng.normal(0.0, 0.02, (new_vocab - V, D)).astype(embed.dtype)
    params = dict(params)
    params["embed"] = jnp.asarray(np.concatenate([embed, extra], axis=0))
    head = np.asarray(params["lm_head"])
    extra_h = rng.normal(0.0, 0.02, (D, new_vocab - V)).astype(head.dtype)
    params["lm_head"] = jnp.asarray(np.concatenate([head, extra_h], axis=1))
    return params
