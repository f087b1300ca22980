"""BEATs audio encoder (iter3+ AS2M class) as a pure JAX function.

Re-designs ``models/beats/BEATs.py`` + ``models/beats/backbone.py``:
  - 16x16 conv patchify of the 128-mel fbank -> one (256 x 512) matmul;
  - grouped conv positional embedding (weight-norm folded at conversion);
  - 12 post-norm transformer layers with DeepNorm residual scaling and a
    *shared* relative-position bias table, gated per layer (gru_rel_pos,
    ``backbone.py:650-662``);
  - the reference's numerically-stabilized attention: q pre-scaled by
    head_dim**-0.5 / 32, logits re-scaled by 32 after row-max subtraction
    (``backbone.py:513-515,623-624``).

The encoder is frozen in Crab; dropout paths are omitted.
"""

from __future__ import annotations

import functools
import math
import jax
import jax.numpy as jnp
import numpy as np

from crab_tpu.core.config import AudioEncoderConfig
from crab_tpu.core.layers import (
    gelu,
    layer_norm,
    layer_norm_init,
    linear,
    linear_init,
    normal_init,
)

_ALPHA = 32.0  # fairseq/BEATs attention rescale constant


@functools.lru_cache(maxsize=32)
def _relative_bucket_table(
    length: int, num_buckets: int, max_distance: int
) -> np.ndarray:
    """(L, L) int32 bucket ids, bidirectional T5-style bucketing
    (``backbone.py:392-430``)."""
    context = np.arange(length)[:, None]
    memory = np.arange(length)[None, :]
    rel = memory - context
    half = num_buckets // 2
    buckets = (rel > 0).astype(np.int64) * half
    rel = np.abs(rel)
    max_exact = half // 2
    is_small = rel < max_exact
    large = max_exact + (
        np.log(np.maximum(rel, 1) / max_exact)
        / math.log(max_distance / max_exact)
        * (half - max_exact)
    ).astype(np.int64)
    large = np.minimum(large, half - 1)
    buckets += np.where(is_small, rel, large)
    return buckets.astype(np.int32)


def init_beats(key, cfg: AudioEncoderConfig, dtype=jnp.float32):
    ks = jax.random.split(key, 6 + cfg.encoder_layers)
    D, E = cfg.encoder_embed_dim, cfg.embed_dim
    p = {
        "patch_embedding": {
            "w": normal_init(
                ks[0], (cfg.input_patch_size * cfg.input_patch_size, E), 0.02, dtype
            )
        },
        "ln_patch": layer_norm_init(E, dtype),
        "pos_conv": {
            "w": normal_init(
                ks[2],
                (cfg.conv_pos, D // cfg.conv_pos_groups, D),
                math.sqrt(4.0 / (cfg.conv_pos * D)),
                dtype,
            ),
            "b": jnp.zeros((D,), dtype),
        },
        "ln_pre": layer_norm_init(D, dtype),
        "rel_bias": normal_init(
            ks[3], (cfg.num_buckets, cfg.encoder_attention_heads), 0.02, dtype
        )
        if cfg.relative_position_embedding
        else None,
        "layers": [],
    }
    if cfg.conv_bias:
        p["patch_embedding"]["b"] = jnp.zeros((E,), dtype)
    if E != D:
        p["post_extract_proj"] = linear_init(ks[1], E, D, dtype=dtype)
    hd = D // cfg.encoder_attention_heads
    for i in range(cfg.encoder_layers):
        lk = jax.random.split(ks[6 + i], 8)
        layer = {
            "attn": {
                "q": linear_init(lk[0], D, D, dtype=dtype),
                "k": linear_init(lk[1], D, D, dtype=dtype),
                "v": linear_init(lk[2], D, D, dtype=dtype),
                "o": linear_init(lk[3], D, D, dtype=dtype),
            },
            "ln1": layer_norm_init(D, dtype),
            "fc1": linear_init(lk[4], D, cfg.encoder_ffn_embed_dim, dtype=dtype),
            "fc2": linear_init(lk[5], cfg.encoder_ffn_embed_dim, D, dtype=dtype),
            "ln2": layer_norm_init(D, dtype),
        }
        if cfg.gru_rel_pos:
            layer["grep_linear"] = linear_init(lk[6], hd, 8, dtype=dtype)
            layer["grep_a"] = jnp.ones((1, cfg.encoder_attention_heads, 1, 1), dtype)
        p["layers"].append(layer)
    return p


def _pos_conv(p, x, cfg: AudioEncoderConfig):
    """Grouped conv positional embedding + SamePad trim + GELU
    (``backbone.py:33-46``)."""
    B, T, D = x.shape
    y = jax.lax.conv_general_dilated(
        x,
        p["w"].astype(x.dtype),
        window_strides=(1,),
        padding=[(cfg.conv_pos // 2, cfg.conv_pos // 2)],
        dimension_numbers=("NTC", "TIO", "NTC"),
        feature_group_count=cfg.conv_pos_groups,
    )
    y = y + p["b"].astype(y.dtype)
    if cfg.conv_pos % 2 == 0:  # SamePad removes the trailing element
        y = y[:, :T, :]
    return gelu(y)


def _attention(layer, x, pos_bias, cfg: AudioEncoderConfig):
    B, L, D = x.shape
    H = cfg.encoder_attention_heads
    hd = D // H
    scaling = hd**-0.5
    q_raw = linear(layer["attn"]["q"], x).reshape(B, L, H, hd)
    k = linear(layer["attn"]["k"], x).reshape(B, L, H, hd)
    v = linear(layer["attn"]["v"], x).reshape(B, L, H, hd)

    q = q_raw * (scaling / _ALPHA)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k)
    logits = (logits - jnp.max(logits, axis=-1, keepdims=True)) * _ALPHA

    if pos_bias is not None:
        bias = pos_bias[None]  # (1, H, L, L)
        if cfg.gru_rel_pos:
            # gate from the *unscaled* q (backbone.py:653-658)
            g = linear(layer["grep_linear"], q_raw)  # (B, L, H, 8)
            g = g.transpose(0, 2, 1, 3).reshape(B, H, L, 2, 4).sum(-1)
            g = jax.nn.sigmoid(g)
            gate_a, gate_b = g[..., 0], g[..., 1]
            gate = gate_a * (gate_b * layer["grep_a"].reshape(1, H, 1) - 1.0) + 2.0
            bias = gate[..., None] * bias  # (B, H, L, 1) * (1, H, L, L)
        logits = logits + bias
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)
    ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, L, D)
    return linear(layer["attn"]["o"], ctx)


def beats_apply(params, fbank: jnp.ndarray, cfg: AudioEncoderConfig) -> jnp.ndarray:
    """Normalized fbank (B, F, M) -> token features (B, N, D).

    N = (F // patch) * (M // patch); e.g. a 1-second clip (98 frames) gives
    6*8 = 48 tokens at 768-d.
    """
    B, F, M = fbank.shape
    ps = cfg.input_patch_size
    tF, tM = F // ps, M // ps
    x = fbank[:, : tF * ps, : tM * ps]
    # patchify: (B, tF, ps, tM, ps) -> (B, tF*tM, ps*ps) row-major like the
    # torch conv weight (E, 1, kh, kw)
    x = x.reshape(B, tF, ps, tM, ps).transpose(0, 1, 3, 2, 4).reshape(
        B, tF * tM, ps * ps
    )
    feats = linear(params["patch_embedding"], x)
    feats = layer_norm(params["ln_patch"], feats)
    if "post_extract_proj" in params:
        feats = linear(params["post_extract_proj"], feats)

    x = feats + _pos_conv(params["pos_conv"], feats, cfg)
    if not cfg.layer_norm_first:
        x = layer_norm(params["ln_pre"], x)

    L = x.shape[1]
    pos_bias = None
    if cfg.relative_position_embedding:
        table = jnp.asarray(
            _relative_bucket_table(L, cfg.num_buckets, cfg.max_distance)
        )
        pos_bias = jnp.take(params["rel_bias"], table, axis=0)  # (L, L, H)
        pos_bias = pos_bias.transpose(2, 0, 1).astype(x.dtype)  # (H, L, L)

    alpha = (2.0 * cfg.encoder_layers) ** 0.25 if cfg.deep_norm else 1.0
    for layer in params["layers"]:
        attn_out = _attention(layer, x, pos_bias, cfg)
        x = layer_norm(layer["ln1"], x * alpha + attn_out)
        ffn = linear(layer["fc2"], gelu(linear(layer["fc1"], x)))
        x = layer_norm(layer["ln2"], x * alpha + ffn)
    return x
