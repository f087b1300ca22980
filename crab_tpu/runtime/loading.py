"""Checkpoint loading: build a full Crab param tree from real artifacts.

Mirrors the reference's load chain (``scripts/quick_start.py:453-554``):
base LLaMA/Qwen HF checkpoint + CLIP ViT + BEATs .pt + the staged delta
files (``finetune_weights.bin`` etc.), but with explicit manifests instead
of ``strict=False``.

All torch.load calls are CPU + weights_only where possible.
"""

from __future__ import annotations

import glob
import os
from typing import Dict

import numpy as np

from crab_tpu.core.config import CrabConfig
from crab_tpu.encoders.convert import convert_beats, convert_clip_vit, convert_projector
from crab_tpu.lm.convert import convert_llama, extend_embeddings, strip_peft_prefix
from crab_tpu.seg.convert import convert_seg


def _load_torch(path: str) -> Dict:
    import torch

    return torch.load(path, map_location="cpu", weights_only=False)


def _load_hf_state_dict(model_dir: str) -> Dict:
    """Load an HF model dir (safetensors preferred, else .bin shards)."""
    st_files = sorted(glob.glob(os.path.join(model_dir, "*.safetensors")))
    if st_files:
        from safetensors import safe_open

        sd = {}
        for f in st_files:
            with safe_open(f, framework="np") as fp:
                for k in fp.keys():
                    sd[k] = fp.get_tensor(k)
        return sd
    bins = sorted(glob.glob(os.path.join(model_dir, "pytorch_model*.bin")))
    sd = {}
    for b in bins:
        sd.update(_load_torch(b))
    if not sd:
        raise FileNotFoundError(f"no weights found in {model_dir}")
    return sd


def load_decoder(model_dir: str, cfg: CrabConfig, load_lora: bool = False) -> Dict:
    sd = _load_hf_state_dict(model_dir)
    params = convert_llama(sd, cfg.decoder, prefix="model.", load_lora=load_lora)
    return extend_embeddings(params, cfg.decoder.vocab_size)


def load_clip(model_dir: str, cfg: CrabConfig) -> Dict:
    sd = _load_hf_state_dict(model_dir)
    return convert_clip_vit(sd, cfg.vision)


def load_beats(ckpt_path: str, cfg: CrabConfig) -> Dict:
    ckpt = _load_torch(ckpt_path)
    sd = ckpt.get("model", ckpt)
    return convert_beats(sd, cfg.audio)


def apply_reference_delta(params: Dict, delta_path: str, cfg: CrabConfig) -> Dict:
    """Overlay a reference-format delta (``finetune_weights.bin``):
    projector weights, MoE-LoRA, seg module, embeddings — whatever the
    file carries."""
    sd = strip_peft_prefix(_load_torch(delta_path))
    out = dict(params)
    keys = set(sd.keys())

    def has(prefix):
        return any(k.startswith(prefix) for k in keys)

    if has("model.vl_projector.") or has("vl_projector."):
        pfx = "model.vl_projector." if has("model.vl_projector.") else "vl_projector."
        sub = {k[len(pfx):]: v for k, v in sd.items() if k.startswith(pfx)}
        out["vl_projector"] = convert_projector(sub, cfg.vl_projector, "visual")
    if has("model.al_projector.") or has("al_projector."):
        pfx = "model.al_projector." if has("model.al_projector.") else "al_projector."
        sub = {k[len(pfx):]: v for k, v in sd.items() if k.startswith(pfx)}
        out["al_projector"] = convert_projector(sub, cfg.al_projector, "audio")
    if has("model.seg_module.") or has("seg_module."):
        pfx = "model.seg_module." if has("model.seg_module.") else "seg_module."
        sub = {k[len(pfx):]: v for k, v in sd.items() if k.startswith(pfx)}
        out["seg"] = convert_seg(sub, cfg.seg)
    if any(".lora_A." in k for k in keys):
        dec = convert_llama(
            {**_decoder_base_sd(out["decoder"], cfg), **sd},
            cfg.decoder,
            prefix="model.",
            load_lora=True,
        )
        out["decoder"] = dec
    for name, key in (
        ("model.embed_tokens.weight", "embed"),
        ("lm_head.weight", "lm_head"),
    ):
        if name in sd:
            import jax.numpy as jnp

            t = sd[name]
            arr = np.asarray(t.detach().cpu().float().numpy() if hasattr(t, "detach") else t)
            out["decoder"] = dict(out["decoder"])
            out["decoder"][key] = jnp.asarray(arr.T if key == "lm_head" else arr)
    return out


def _decoder_base_sd(decoder_params: Dict, cfg: CrabConfig) -> Dict:
    """Re-express current decoder params as an HF-style state dict so that
    convert_llama can merge base weights with delta LoRA keys."""
    sd = {}
    L = cfg.decoder.num_layers
    layers = decoder_params["layers"]
    sd["model.embed_tokens.weight"] = np.asarray(decoder_params["embed"])
    sd["model.norm.weight"] = np.asarray(decoder_params["final_norm"]["scale"])
    if "lm_head" in decoder_params:
        sd["lm_head.weight"] = np.asarray(decoder_params["lm_head"]).T
    else:  # int8 head (quantize_decoder_host lm_head=True): dequantize
        sd["lm_head.weight"] = (
            np.asarray(decoder_params["lm_head_q"], np.float32)
            * np.asarray(decoder_params["lm_head_s"])
        ).T
    name_map = {
        "q": "self_attn.q_proj",
        "k": "self_attn.k_proj",
        "v": "self_attn.v_proj",
        "o": "self_attn.o_proj",
        "gate": "mlp.gate_proj",
        "up": "mlp.up_proj",
        "down": "mlp.down_proj",
    }
    for i in range(L):
        sd[f"model.layers.{i}.input_layernorm.weight"] = np.asarray(
            layers["attn_norm"]["scale"][i]
        )
        sd[f"model.layers.{i}.post_attention_layernorm.weight"] = np.asarray(
            layers["mlp_norm"]["scale"][i]
        )
        for short, hf in name_map.items():
            sd[f"model.layers.{i}.{hf}.weight"] = np.asarray(layers[short]["w"][i]).T
            if "b" in layers[short]:
                sd[f"model.layers.{i}.{hf}.bias"] = np.asarray(layers[short]["b"][i])
    return sd
