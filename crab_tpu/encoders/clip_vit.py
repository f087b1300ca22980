"""CLIP ViT-L/14 vision tower as a pure JAX function with multi-layer taps.

Re-designs the reference's frozen HF ``CLIPVisionModel`` usage
(``models/multimodal_encoder.py:33-84``): per-frame forward with
``output_hidden_states=True`` and taps at ``select_layers`` (HF indexing:
0 = post-pre-layernorm embeddings, i = output of encoder layer i), CLS
dropped ("patch" mode).

TPU-first details:
  - patch embedding = one (P*P*3 x D) matmul instead of a conv;
  - computation stops at max(select_layers) — with taps [14,22,23] the
    24th layer and the final post-layernorm are never computed;
  - QuickGELU (x * sigmoid(1.702x)) exactly as CLIP.
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp

from crab_tpu.core.config import VisionEncoderConfig
from crab_tpu.core.layers import (
    layer_norm,
    layer_norm_init,
    linear,
    linear_init,
    normal_init,
)


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def init_clip_vit(key, cfg: VisionEncoderConfig, dtype=jnp.float32):
    n_pos = cfg.tokens_per_image + 1
    ks = jax.random.split(key, 3 + cfg.num_layers)
    params = {
        "class_embedding": normal_init(ks[0], (cfg.hidden_size,), 0.02, dtype),
        # conv kernel flattened to (P*P*3, D); no bias in CLIP patch conv
        "patch_embedding": normal_init(
            ks[1], (cfg.patch_size * cfg.patch_size * 3, cfg.hidden_size), 0.02, dtype
        ),
        "position_embedding": normal_init(
            ks[2], (n_pos, cfg.hidden_size), 0.02, dtype
        ),
        "pre_ln": layer_norm_init(cfg.hidden_size, dtype),
        "layers": [],
    }
    for i in range(cfg.num_layers):
        lk = jax.random.split(ks[3 + i], 6)
        params["layers"].append(
            {
                "ln1": layer_norm_init(cfg.hidden_size, dtype),
                # q/k/v packed into one (H, 3H) matmul: one MXU dispatch
                # instead of three per layer (HF stores them split; the
                # converter packs — numerics identical)
                "attn": {
                    "qkv": _pack_qkv(
                        linear_init(lk[0], cfg.hidden_size, cfg.hidden_size, dtype=dtype),
                        linear_init(lk[1], cfg.hidden_size, cfg.hidden_size, dtype=dtype),
                        linear_init(lk[2], cfg.hidden_size, cfg.hidden_size, dtype=dtype),
                    ),
                    "o": linear_init(lk[3], cfg.hidden_size, cfg.hidden_size, dtype=dtype),
                },
                "ln2": layer_norm_init(cfg.hidden_size, dtype),
                "mlp": {
                    "fc1": linear_init(
                        lk[4], cfg.hidden_size, cfg.intermediate_size, dtype=dtype
                    ),
                    "fc2": linear_init(
                        lk[5], cfg.intermediate_size, cfg.hidden_size, dtype=dtype
                    ),
                },
            }
        )
    return params


def _pack_qkv(q, k, v):
    """Three (H, H) linears -> one packed (H, 3H) linear."""
    return {
        "w": jnp.concatenate([q["w"], k["w"], v["w"]], axis=1),
        "b": jnp.concatenate([q["b"], k["b"], v["b"]]),
    }


def _attn(p, x, num_heads):
    B, L, H = x.shape
    hd = H // num_heads
    if "qkv" in p:
        qkv = linear(p["qkv"], x).reshape(B, L, 3, num_heads, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    else:  # legacy split layout (older checkpoints/param trees)
        q = linear(p["q"], x).reshape(B, L, num_heads, hd)
        k = linear(p["k"], x).reshape(B, L, num_heads, hd)
        v = linear(p["v"], x).reshape(B, L, num_heads, hd)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(hd).astype(x.dtype)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)
    ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, L, H)
    return linear(p["o"], ctx)


def _embed(params, pixels, cfg: VisionEncoderConfig):
    """pixels (B, 3, H, W) normalized -> (B, 1+N, D) token embeddings."""
    B = pixels.shape[0]
    P = cfg.patch_size
    g = cfg.image_size // P
    # (B, 3, gP, gP) -> (B, g, g, 3*P*P) patches, channel-major per patch
    # to match torch conv weight layout (D, 3, P, P).
    x = pixels.reshape(B, 3, g, P, g, P)
    x = x.transpose(0, 2, 4, 1, 3, 5).reshape(B, g * g, 3 * P * P)
    patch = x @ params["patch_embedding"]
    cls = jnp.broadcast_to(
        params["class_embedding"][None, None], (B, 1, cfg.hidden_size)
    ).astype(patch.dtype)
    tokens = jnp.concatenate([cls, patch], axis=1)
    return tokens + params["position_embedding"][None].astype(patch.dtype)


def clip_vit_apply(
    params,
    pixels: jnp.ndarray,
    cfg: VisionEncoderConfig,
    select_layers: Sequence[int] | None = None,
) -> List[jnp.ndarray]:
    """Forward with hidden-state taps.

    Args:
      pixels: (B, 3, H, W), already CLIP-normalized.
      select_layers: HF-indexed taps; defaults to cfg.select_layers.
    Returns:
      list of (B, N, D) patch features (CLS dropped), one per tap, in tap
      order — mirroring ``VisualEncoder.feature_select``
      (``multimodal_encoder.py:52-63``).
    """
    if select_layers is None:
        select_layers = cfg.select_layers
    max_layer = max(select_layers)
    x = _embed(params, pixels, cfg)
    x = layer_norm(params["pre_ln"], x, eps=cfg.layer_norm_eps)
    hidden = {0: x}
    for i in range(max_layer):
        p = params["layers"][i]
        x = x + _attn(p["attn"], layer_norm(p["ln1"], x, eps=cfg.layer_norm_eps), cfg.num_heads)
        h = layer_norm(p["ln2"], x, eps=cfg.layer_norm_eps)
        x = x + linear(p["mlp"]["fc2"], quick_gelu(linear(p["mlp"]["fc1"], h)))
        hidden[i + 1] = x
    return [hidden[i][:, 1:] for i in select_layers]
