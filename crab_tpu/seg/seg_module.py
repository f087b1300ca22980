"""SAM-style multi-scale segmentation head ("SegModule") in pure JAX.

Re-designs ``models/multimodal_encoder.py:268-1444``:
  - text FC projects the six ``<mask_i>`` decoder hiddens to prompt space;
    three tokens per scale are fused with learned scalars;
  - a conv neck maps two CLIP hidden-state taps (16x16 x 1024) to 256-d;
  - per scale, a SAM TwoWayTransformer (depth 2) mixes 300 learned AVS
    queries (pre-fused with the prompt by a QueryGenerator) with the image
    grid; scale 1 upsamples 2x and gates by the sigmoid of scale-0 masks;
  - per-task heads: 1-channel (s4/ms3/ref-avs) or 71-class (avss) conv.

Differences from the reference, on purpose:
  - batched over samples; the task selects the head *statically* (the
    reference branches per sample on a task string at runtime —
    ``multimodal_encoder.py:419``);
  - the coarse-to-fine gate broadcasts over channels instead of hardcoding
    256 (``:1114``), so narrow test configs work;
  - bilinear resizes use jax.image (align_corners=False semantics).
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from crab_tpu.core.config import SegConfig
from crab_tpu.core.layers import (
    gelu,
    layer_norm_init,
    linear,
    linear_init,
    normal_init,
    xavier_uniform,
)


# ---------------------------------------------------------------------------
# small building blocks
# ---------------------------------------------------------------------------


def _ln2d_init(dim, dtype=jnp.float32):
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def layer_norm_2d(p, x, eps: float = 1e-6):
    """SAM LayerNorm2d: normalize over the channel dim of (B, C, H, W)."""
    xf = x.astype(jnp.float32)
    u = xf.mean(axis=1, keepdims=True)
    s = jnp.square(xf - u).mean(axis=1, keepdims=True)
    y = (xf - u) * jax.lax.rsqrt(s + eps)
    y = y * p["scale"][None, :, None, None] + p["bias"][None, :, None, None]
    return y.astype(x.dtype)


def _conv_init(key, out_c, in_c, kh, kw, use_bias=True, dtype=jnp.float32):
    # torch conv default init: kaiming_uniform(a=sqrt(5)) on (O, I, kh, kw)
    fan_in = in_c * kh * kw
    gain = math.sqrt(2.0 / (1.0 + 5.0))
    bound = gain * math.sqrt(3.0 / fan_in)
    p = {
        "w": jax.random.uniform(
            key, (out_c, in_c, kh, kw), dtype, minval=-bound, maxval=bound
        )
    }
    if use_bias:
        b_bound = 1.0 / math.sqrt(fan_in)
        p["b"] = jax.random.uniform(
            jax.random.fold_in(key, 1), (out_c,), dtype, minval=-b_bound, maxval=b_bound
        )
    return p


def _conv2d(p, x, padding=0):
    # lax.conv requires matching dtypes (jnp matmuls auto-promote); the seg
    # head runs in the activation dtype regardless of storage dtype
    y = jax.lax.conv_general_dilated(
        x,
        p["w"].astype(x.dtype),
        window_strides=(1, 1),
        padding=[(padding, padding)] * 2,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    if "b" in p:
        y = y + p["b"][None, :, None, None]
    return y


def _deconv2x_init(key, in_c, out_c, dtype=jnp.float32):
    # torch ConvTranspose2d(in, out, k=2, s=2): weight (in, out, 2, 2)
    fan_in = in_c * 4  # torch computes fan_in from (in, out*k*k) transposed...
    gain = math.sqrt(2.0 / 6.0)
    bound = gain * math.sqrt(3.0 / (out_c * 4))
    p = {
        "w": jax.random.uniform(
            key, (in_c, out_c, 2, 2), dtype, minval=-bound, maxval=bound
        ),
        "b": jnp.zeros((out_c,), dtype),
    }
    return p


def _deconv2x(p, x):
    """ConvTranspose2d k=2 s=2 as an einsum + pixel shuffle."""
    B, C, H, W = x.shape
    y = jnp.einsum("bchw,coij->bohiwj", x, p["w"].astype(x.dtype))
    out_c = p["w"].shape[1]
    y = y.reshape(B, out_c, 2 * H, 2 * W)
    return y + p["b"].astype(y.dtype)[None, :, None, None]


def _bilinear(x, size: Tuple[int, int]):
    """(B, C, H, W) bilinear resize, align_corners=False (torch default)."""
    B, C, H, W = x.shape
    return jax.image.resize(x, (B, C, size[0], size[1]), method="bilinear")


def _mha_init(key, dim, internal, dtype=jnp.float32):
    ks = jax.random.split(key, 4)
    return {
        "q": linear_init(ks[0], dim, internal, dtype=dtype),
        "k": linear_init(ks[1], dim, internal, dtype=dtype),
        "v": linear_init(ks[2], dim, internal, dtype=dtype),
        "o": linear_init(ks[3], internal, dim, dtype=dtype),
    }


def _mha(p, q, k, v, num_heads):
    B, Lq, _ = q.shape
    Lk = k.shape[1]
    I = p["q"]["w"].shape[1]
    hd = I // num_heads
    qh = linear(p["q"], q).reshape(B, Lq, num_heads, hd)
    kh = linear(p["k"], k).reshape(B, Lk, num_heads, hd)
    vh = linear(p["v"], v).reshape(B, Lk, num_heads, hd)
    logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) / jnp.sqrt(hd).astype(q.dtype)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, vh).reshape(B, Lq, I)
    return linear(p["o"], ctx)


def _ln(p, x, eps=1e-5):
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = jnp.square(xf - mean).mean(-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * p["scale"] + p["bias"]).astype(x.dtype)


def _position_embedding_random(gaussian: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """SAM PositionEmbeddingRandom -> (h*w, 2*num_feats)
    (``multimodal_encoder.py:795-835``)."""
    ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
    xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
    grid_y = jnp.broadcast_to(ys[:, None], (h, w))
    grid_x = jnp.broadcast_to(xs[None, :], (h, w))
    coords = jnp.stack([grid_x, grid_y], axis=-1)  # (h, w, 2)
    coords = (2.0 * coords - 1.0) @ gaussian.astype(jnp.float32)
    coords = 2.0 * jnp.pi * coords
    pe = jnp.concatenate([jnp.sin(coords), jnp.cos(coords)], axis=-1)
    return pe.reshape(h * w, -1)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def _two_way_block_init(key, cfg: SegConfig, dtype):
    d = cfg.prompt_embed_dim
    internal = d // cfg.attention_downsample_rate
    ks = jax.random.split(key, 8)
    return {
        "self_attn": _mha_init(ks[0], d, d, dtype),
        "norm1": layer_norm_init(d, dtype),
        "cross_t2i": _mha_init(ks[1], d, internal, dtype),
        "norm2": layer_norm_init(d, dtype),
        "mlp": {
            "fc1": linear_init(ks[2], d, cfg.transformer_mlp_dim, dtype=dtype),
            "fc2": linear_init(ks[3], cfg.transformer_mlp_dim, d, dtype=dtype),
        },
        "norm3": layer_norm_init(d, dtype),
        "norm4": layer_norm_init(d, dtype),
        "cross_i2t": _mha_init(ks[4], d, internal, dtype),
    }


def _two_way_transformer_init(key, cfg: SegConfig, dtype):
    ks = jax.random.split(key, cfg.transformer_depth + 1)
    d = cfg.prompt_embed_dim
    return {
        "blocks": [
            _two_way_block_init(ks[i], cfg, dtype) for i in range(cfg.transformer_depth)
        ],
        "final_t2i": _mha_init(
            ks[-1], d, d // cfg.attention_downsample_rate, dtype
        ),
        "final_norm": layer_norm_init(d, dtype),
    }


def _query_generator_init(key, cfg: SegConfig, dtype):
    d = cfg.prompt_embed_dim
    layers = []
    for i in range(cfg.query_generator_num_layers):
        ks = jax.random.split(jax.random.fold_in(key, i), 4)
        layers.append(
            {
                # torch nn.MultiheadAttention; xavier_uniform re-init
                # (multimodal_encoder.py:1436-1439)
                "self_attn": _mha_init(ks[0], d, d, dtype),
                "cross_attn": _mha_init(ks[1], d, d, dtype),
                "ffn": {
                    "fc1": linear_init(
                        ks[2], d, cfg.query_generator_hidden_dim, dtype=dtype
                    ),
                    "fc2": linear_init(
                        ks[3], cfg.query_generator_hidden_dim, d, dtype=dtype
                    ),
                },
                "norm1": layer_norm_init(d, dtype),
                "norm2": layer_norm_init(d, dtype),
                "norm3": layer_norm_init(d, dtype),
            }
        )
    return {"layers": layers}


def init_seg(key, cfg: SegConfig, d_model: int, dtype=jnp.float32):
    d = cfg.prompt_embed_dim
    ks = jax.random.split(key, 20)
    return {
        "text_fc": {
            "fc1": linear_init(ks[0], d_model, d_model, dtype=dtype),
            "fc2": linear_init(ks[1], d_model, d, dtype=dtype),
        },
        "multiseg_scalar": jnp.full(
            (cfg.token_nums_per_scale,), 1.0 / cfg.token_nums_per_scale, dtype
        ),
        "multiscale_scalar": jnp.full(
            (cfg.image_scale_nums,), 1.0 / cfg.image_scale_nums, dtype
        ),
        "no_mask_embed": normal_init(ks[2], (d,), 1.0, dtype),
        "neck": {
            "conv1": _conv_init(ks[3], d, cfg.vit_embedding_dim, 1, 1, False, dtype),
            "ln1": _ln2d_init(d, dtype),
            "conv2": _conv_init(ks[4], d, d, 3, 3, False, dtype),
            "ln2": _ln2d_init(d, dtype),
        },
        "pe_gaussian": normal_init(ks[5], (2, d // 2), 1.0, dtype),
        "decoder": {
            "avs_query": normal_init(ks[6], (cfg.avs_query_num, d), 1.0, dtype),
            "query_generator": _query_generator_init(ks[7], cfg, dtype),
            "transformers": [
                _two_way_transformer_init(jax.random.fold_in(ks[8], i), cfg, dtype)
                for i in range(cfg.image_scale_nums)
            ],
            "level_embed": normal_init(ks[9], (cfg.image_scale_nums, d), 1.0, dtype),
            "hyper_mlp": {
                "fc1": linear_init(ks[10], d, d, dtype=dtype),
                "fc2": linear_init(ks[11], d, d, dtype=dtype),
                "fc3": linear_init(ks[12], d, d // 8, dtype=dtype),
            },
            "hyper_mlp_out": {
                "conv1": _conv_init(ks[13], d, cfg.avs_query_num, 1, 1, True, dtype),
                "conv2": _conv_init(ks[14], d, d, 1, 1, True, dtype),
                "conv3": _conv_init(ks[15], d // 8, d, 1, 1, True, dtype),
            },
            "output_upscaling": {
                "deconv": _deconv2x_init(ks[16], d, d // 8, dtype),
                "ln": _ln2d_init(d // 8, dtype),
            },
            "upsample_2x": {
                "deconv": _deconv2x_init(ks[17], d, d, dtype),
                "ln": _ln2d_init(d, dtype),
            },
            "pe1_gaussian": normal_init(ks[18], (2, d // 2), 1.0, dtype),
            "ms3_s4_classifier": _conv_init(ks[19], 1, d // 8, 1, 1, False, dtype),
            "avss_classifier": _conv_init(
                jax.random.fold_in(ks[19], 1), cfg.avss_num_classes, d // 8, 1, 1, False, dtype
            ),
        },
    }


# ---------------------------------------------------------------------------
# apply
# ---------------------------------------------------------------------------


def _query_generator(p, queries, sparse):
    """(B, Q, d), (B, N, d) -> (B, Q, d). NB: mirrors the reference's loop,
    which feeds the ORIGINAL avs_query into every layer
    (``multimodal_encoder.py:1441-1444`` — `query` is not threaded)."""
    out = queries
    for layer in p["layers"]:
        q = queries
        q = _ln(layer["norm1"], q + _mha(layer["self_attn"], q, q, q, 8))
        q = _ln(layer["norm2"], q + _mha(layer["cross_attn"], q, sparse, sparse, 8))
        q = _ln(layer["norm3"], q + linear(layer["ffn"]["fc2"], gelu(linear(layer["ffn"]["fc1"], q))))
        out = q
    return out


def _two_way(p, queries, keys, query_pe, key_pe, num_heads):
    for i, blk in enumerate(p["blocks"]):
        if i == 0:
            q = _mha(blk["self_attn"], queries, queries, queries, num_heads)
            queries = _ln(blk["norm1"], q)
        else:
            q = queries + query_pe
            queries = _ln(
                blk["norm1"], queries + _mha(blk["self_attn"], q, q, queries, num_heads)
            )
        q = queries + query_pe
        k = keys + key_pe
        queries = _ln(
            blk["norm2"], queries + _mha(blk["cross_t2i"], q, k, keys, num_heads)
        )
        mlp = linear(blk["mlp"]["fc2"], jax.nn.relu(linear(blk["mlp"]["fc1"], queries)))
        queries = _ln(blk["norm3"], queries + mlp)
        q = queries + query_pe
        k = keys + key_pe
        keys = _ln(blk["norm4"], keys + _mha(blk["cross_i2t"], k, q, queries, num_heads))
    q = queries + query_pe
    k = keys + key_pe
    queries = queries + _mha(p["final_t2i"], q, k, keys, num_heads)
    queries = _ln(p["final_norm"], queries)
    return queries, keys


def _mlp3(p, x):
    x = jax.nn.relu(linear(p["fc1"], x))
    x = jax.nn.relu(linear(p["fc2"], x))
    return linear(p["fc3"], x)


def _conv_mlp3(p, x):
    x = jax.nn.relu(_conv2d(p["conv1"], x))
    x = jax.nn.relu(_conv2d(p["conv2"], x))
    return _conv2d(p["conv3"], x)


def _decode_level(dec, cfg: SegConfig, img_emb, sparse, dense, level: int, prev, task: str):
    """One scale of MaskDecoderMultiScale.predict_masks
    (``multimodal_encoder.py:1083-1143``)."""
    B = img_emb.shape[0]
    d = cfg.prompt_embed_dim
    queries = jnp.broadcast_to(
        dec["avs_query"][None], (B, cfg.avs_query_num, d)
    ).astype(img_emb.dtype)
    tokens = _query_generator(dec["query_generator"], queries, sparse)
    tokens = tokens + dec["level_embed"][level][None, None]

    src = img_emb  # (B, d, h, w)
    if level > 0:
        src = _deconv2x(dec["upsample_2x"]["deconv"], src)
        src = gelu(layer_norm_2d(dec["upsample_2x"]["ln"], src))
        prev_mean = jnp.mean(prev, axis=1, keepdims=True)  # (B, 1, h, w)
        src = (jax.nn.sigmoid(prev_mean) + 1.0) * src
        h, w = src.shape[2], src.shape[3]
        pe = _position_embedding_random(dec["pe1_gaussian"], h, w)
        dense = _bilinear(dense, (h, w))
    else:
        h, w = src.shape[2], src.shape[3]
        pe = _position_embedding_random(dec["_pe_gaussian_l0"], h, w)

    src = src + dense
    keys = src.reshape(B, d, h * w).transpose(0, 2, 1)  # (B, hw, d)
    key_pe = jnp.broadcast_to(pe[None], (B, h * w, d)).astype(keys.dtype)

    hs, keys = _two_way(
        dec["transformers"][level], tokens, keys, tokens, key_pe, cfg.num_heads
    )
    q_out = _mlp3(dec["hyper_mlp"], hs[:, : cfg.avs_query_num])  # (B, Q, d/8)
    src = keys.transpose(0, 2, 1).reshape(B, d, h, w)
    up = _deconv2x(dec["output_upscaling"]["deconv"], src)
    up = gelu(layer_norm_2d(dec["output_upscaling"]["ln"], up))  # (B, d/8, 2h, 2w)
    c = up.shape[1]
    masks = jnp.einsum("bqc,bchw->bqhw", q_out, up)  # (B, Q, 2h, 2w)
    masks = _conv_mlp3(dec["hyper_mlp_out"], masks)  # (B, d/8, 2h, 2w)
    head = "avss_classifier" if task == "avss" else "ms3_s4_classifier"
    return _conv2d(dec[head], masks)  # (B, ncls, 2h, 2w)


def seg_apply(
    params,
    pred_embeddings: jnp.ndarray,  # (B, K=scales*tokens_per_scale, d_model)
    multi_scale_feats: Sequence[jnp.ndarray],  # scales x (B, 256, 1024)
    cfg: SegConfig,
    task: str = "binary",  # 'binary' (s4/ms3/ref-avs) or 'avss'
) -> jnp.ndarray:
    """-> (B, num_classes, out, out) mask logits at cfg.output_mask_size."""
    B = pred_embeddings.shape[0]
    d = cfg.prompt_embed_dim
    g = cfg.image_embedding_size

    x = jax.nn.relu(linear(params["text_fc"]["fc1"], pred_embeddings))
    x = linear(params["text_fc"]["fc2"], x)  # (B, K, d)
    x = x.reshape(B, cfg.image_scale_nums, cfg.token_nums_per_scale, d)
    fused = jnp.einsum("bstd,t->bsd", x, params["multiseg_scalar"])  # (B, S, d)

    dense = jnp.broadcast_to(
        params["no_mask_embed"][None, :, None, None], (B, d, g, g)
    ).astype(x.dtype)

    dec = dict(params["decoder"])
    dec["_pe_gaussian_l0"] = params["pe_gaussian"]

    num_classes = cfg.avss_num_classes if task == "avss" else 1
    out_size = cfg.low_res_mask_size
    low_res = jnp.zeros((B, num_classes, out_size, out_size), x.dtype)
    prev = None
    for level in range(cfg.image_scale_nums):
        feats = multi_scale_feats[level]  # (B, g*g, vit_dim)
        img = feats.reshape(B, g, g, -1).transpose(0, 3, 1, 2)  # (B, vit, g, g)
        img = _conv2d(params["neck"]["conv1"], img)
        img = layer_norm_2d(params["neck"]["ln1"], img)
        img = _conv2d(params["neck"]["conv2"], img, padding=1)
        img = layer_norm_2d(params["neck"]["ln2"], img)
        sparse = fused[:, level][:, None]  # (B, 1, d)
        masks_l = _decode_level(dec, cfg, img, sparse, dense, level, prev, task)
        prev = masks_l
        low_res = low_res + params["multiscale_scalar"][level] * _bilinear(
            masks_l, (out_size, out_size)
        )
    return _bilinear(low_res, (cfg.output_mask_size, cfg.output_mask_size))
