"""BLIP-2-style Q-Former: a small BERT whose learned queries cross-attend
to frozen encoder features.

Re-designs the reference's vendored ``models/Qformer.py`` (BertModel with
``query_embeds`` + cross-attention every layer, ``num_hidden_layers=2``,
queries-only input) as a pure function. Because Crab never feeds text into
the Q-Former, only the query path exists here: self-attention over the 32
queries, cross-attention to the media tokens, and the query FFN
(``feed_forward_chunk_query`` — ``models/Qformer.py:483-486``).

Shapes: queries (B, Q, H); media features (B, N, W) with W = encoder width.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from crab_tpu.core.config import ProjectorConfig
from crab_tpu.core.layers import (
    gelu,
    layer_norm,
    layer_norm_init,
    linear,
    linear_init,
    normal_init,
)


def _attention_init(key, q_dim, kv_dim, out_dim, dtype):
    ks = jax.random.split(key, 4)
    return {
        "q": linear_init(ks[0], q_dim, out_dim, dtype=dtype),
        "k": linear_init(ks[1], kv_dim, out_dim, dtype=dtype),
        "v": linear_init(ks[2], kv_dim, out_dim, dtype=dtype),
        "o": linear_init(ks[3], out_dim, out_dim, dtype=dtype),
        "ln": layer_norm_init(out_dim, dtype),
    }


def _mha(p, x_q, x_kv, num_heads):
    """Post-norm BERT attention block: attn -> proj -> LN(residual + out)."""
    B, Lq, _ = x_q.shape
    Lk = x_kv.shape[1]
    H = p["q"]["w"].shape[1]
    hd = H // num_heads
    q = linear(p["q"], x_q).reshape(B, Lq, num_heads, hd)
    k = linear(p["k"], x_kv).reshape(B, Lk, num_heads, hd)
    v = linear(p["v"], x_kv).reshape(B, Lk, num_heads, hd)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(hd).astype(q.dtype)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, Lq, H)
    out = linear(p["o"], ctx)
    return layer_norm(p["ln"], out + x_q, eps=1e-12)


def _ffn(p, x):
    h = gelu(linear(p["fc1"], x))
    h = linear(p["fc2"], h)
    return layer_norm(p["ln"], h + x, eps=1e-12)


def init_qformer(key, cfg: ProjectorConfig, dtype=jnp.float32):
    ks = jax.random.split(key, 2 + cfg.num_hidden_layers)
    layers = []
    for i in range(cfg.num_hidden_layers):
        lk = jax.random.split(ks[2 + i], 3)
        layers.append(
            {
                "self_attn": _attention_init(
                    lk[0], cfg.hidden_size, cfg.hidden_size, cfg.hidden_size, dtype
                ),
                "cross_attn": _attention_init(
                    lk[1], cfg.hidden_size, cfg.encoder_width, cfg.hidden_size, dtype
                ),
                "ffn": {
                    "fc1": linear_init(
                        jax.random.fold_in(lk[2], 0),
                        cfg.hidden_size,
                        cfg.intermediate_size,
                        dtype=dtype,
                    ),
                    "fc2": linear_init(
                        jax.random.fold_in(lk[2], 1),
                        cfg.intermediate_size,
                        cfg.hidden_size,
                        dtype=dtype,
                    ),
                    "ln": layer_norm_init(cfg.hidden_size, dtype),
                },
            }
        )
    return {
        # 32 learned queries, init normal(0, 0.02) like the reference
        # (multimodal_encoder.py:113-114)
        "query_tokens": normal_init(
            ks[0], (cfg.num_query_tokens, cfg.hidden_size), 0.02, dtype
        ),
        # BertEmbeddings.LayerNorm applied to the raw queries
        "emb_ln": layer_norm_init(cfg.hidden_size, dtype),
        "layers": layers,
    }


def qformer_apply(params, media_feats, cfg: ProjectorConfig) -> jnp.ndarray:
    """(B, N, W) media features -> (B, Q, H) query outputs."""
    B = media_feats.shape[0]
    x = jnp.broadcast_to(
        params["query_tokens"][None],
        (B, cfg.num_query_tokens, cfg.hidden_size),
    ).astype(media_feats.dtype)
    x = layer_norm(params["emb_ln"], x, eps=1e-12)
    for layer in params["layers"]:
        x = _mha(layer["self_attn"], x, x, cfg.num_heads)
        x = _mha(layer["cross_attn"], x, media_feats, cfg.num_heads)
        x = _ffn(layer["ffn"], x)
    return x
