"""Weight-only int8 quantization for the decoder.

Serving a 7B decoder on a single 16 GB v5e chip doesn't fit in bf16
(13.5 GB weights + KV cache + encoders > ~15 GiB usable). Per-output-
channel symmetric int8 halves the weight footprint (6.7 GB) and doubles
decode arithmetic intensity — the standard single-chip serving recipe.

Quantized projections store ``w_q`` (int8, same layout as ``w``) and
``w_s`` (fp32 per-out-channel scale); ``llama._proj`` computes
``(x @ w_q) * w_s`` so the scale fuses into the matmul epilogue and no
dequantized copy is materialized in HBM.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

QUANT_KEYS = ("q", "k", "v", "o", "gate", "up", "down")


def quantize_weight(w: jnp.ndarray):
    """(..., in, out) -> int8 weights + (..., 1, out) fp32 scales."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return q, scale


def init_llama_int8(key, cfg, dtype=jnp.bfloat16) -> Dict:
    """Random-init a decoder directly in int8 weights.

    Quantizing a fully materialized bf16 7B on-device needs ~2x transient
    HBM and OOMs a 16 GB chip; benchmarks and smoke tests that don't load
    real checkpoints should start int8 from the outset. Real checkpoints
    quantize on host (numpy) layer by layer instead.
    """
    from crab_tpu.core.layers import normal_init, rms_norm_init
    from crab_tpu.lm.lora import init_moe_lora

    D = cfg.hidden_size
    qd = cfg.num_heads * cfg.head_dim
    kvd = cfg.num_kv_heads * cfg.head_dim
    L = cfg.num_layers
    dims = {
        "q": (D, qd), "k": (D, kvd), "v": (D, kvd), "o": (qd, D),
        "gate": (D, cfg.intermediate_size), "up": (D, cfg.intermediate_size),
        "down": (cfg.intermediate_size, D),
    }
    ks = jax.random.split(key, 12)
    layers: Dict = {
        "attn_norm": {"scale": jnp.ones((L, D), dtype)},
        "mlp_norm": {"scale": jnp.ones((L, D), dtype)},
    }
    for i, (name, (din, dout)) in enumerate(dims.items()):
        kk = jax.random.fold_in(key, 1000 + i)
        p = {
            "w_q": jax.random.randint(kk, (L, din, dout), -127, 128, dtype=jnp.int8),
            "w_s": jnp.full((L, 1, dout), 0.02 / 127.0, jnp.float32),
        }
        if cfg.attention_bias and name in ("q", "k", "v"):
            p["b"] = jnp.zeros((L, dout), dtype)
        if cfg.lora is not None:
            loras = [
                init_moe_lora(jax.random.fold_in(kk, 7 + l), din, dout, cfg.lora, dtype)
                for l in range(L)
            ]
            p["lora"] = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *loras)
        layers[name] = p
    return {
        "embed": normal_init(ks[0], (cfg.vocab_size, D), 0.02, dtype),
        "layers": layers,
        "final_norm": rms_norm_init(D, dtype),
        "lm_head": normal_init(ks[8], (D, cfg.vocab_size), 0.02, dtype),
    }


def quantize_decoder_host(decoder_params: Dict, keys=QUANT_KEYS) -> Dict:
    """Host (numpy) per-projection quantization for real checkpoints.

    Runs one stacked weight at a time on the CPU, so the device never
    holds the bf16 and int8 copies simultaneously (quantizing a fully
    materialized 7B on-device needs ~2x transient HBM).
    """
    import numpy as np

    out = dict(decoder_params)
    layers = dict(out["layers"])
    for k in keys:
        p = dict(layers[k])
        w = np.asarray(jax.device_get(p.pop("w")), np.float32)
        amax = np.abs(w).max(axis=-2, keepdims=True)
        scale = np.where(amax > 0, amax / 127.0, 1.0).astype(np.float32)
        q = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
        p["w_q"] = jnp.asarray(q)
        p["w_s"] = jnp.asarray(scale)
        layers[k] = p
    out["layers"] = layers
    return out


def quantize_decoder(decoder_params: Dict, keys=QUANT_KEYS) -> Dict:
    """Replace 'w' with ('w_q', 'w_s') for the chosen projections.

    Embeddings, lm_head, norms and LoRA stay in their original dtype
    (LoRA deltas are tiny and precision-critical).
    """
    out = dict(decoder_params)
    layers = dict(out["layers"])
    for k in keys:
        p = dict(layers[k])
        q, s = jax.jit(quantize_weight)(p.pop("w"))
        p["w_q"], p["w_s"] = q, s
        layers[k] = p
    out["layers"] = layers
    return out
