"""LLaMA-2-class decoder as a pure JAX function with MoE-LoRA projections.

Re-designs the reference's HF ``LlamaForCausalLM`` + peft_hyper wrapping
(``models/unified_llama.py``, ``peft_hyper/tuners/lora.py``) TPU-first:

  - layers stored *stacked* (leading axis = layer) and executed with
    ``lax.scan`` — one compiled layer body, fast compiles at 7B scale;
  - GQA-ready attention (covers Qwen2 dims too), RoPE in fp32;
  - MoE-LoRA deltas fused into each projection;
  - explicit KV cache pytree for autoregressive decode;
  - fp32 logits and norms, bf16 matmuls under the dtype Policy.

Sharding intent (applied by runtime/sharding.py): attention/MLP weights
split on the head/ffn axis over the 'model' mesh axis; activations
replicated per 'data' shard.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from crab_tpu.core.config import DecoderConfig, MoELoRAConfig
from crab_tpu.core.layers import kaiming_uniform, normal_init, rms_norm, rms_norm_init
from crab_tpu.lm.lora import init_moe_lora, moe_lora_delta

NEG_INF = -1e9  # mask value, matches HF's min-dtype semantics closely enough


class KVCache(NamedTuple):
    k: jnp.ndarray  # (L, B, S_max, n_kv, hd)
    v: jnp.ndarray  # (L, B, S_max, n_kv, hd)
    length: jnp.ndarray  # () int32 — filled positions

    @classmethod
    def zeros(cls, cfg: DecoderConfig, batch: int, max_len: int, dtype):
        shape = (cfg.num_layers, batch, max_len, cfg.num_kv_heads, cfg.head_dim)
        return cls(
            jnp.zeros(shape, dtype), jnp.zeros(shape, dtype), jnp.zeros((), jnp.int32)
        )


class KVCacheQ(NamedTuple):
    """int8 KV cache (decode attention runs in a Pallas kernel that
    dequantizes in VMEM — see ops/decode_attention.py). Layout is
    (L, B, Hkv, S, d) so per-(batch, head) blocks are clean (S, d) tiles.

    CONSTRAINT: prefill (T > 1) must happen exactly once, at offset 0 —
    the T>1 branch attends over the *local* bf16 k/v (``mask[..., :T]``)
    rather than the quantized cache, which is only read by the T==1
    decode kernel. Chunked/continued prefill would silently drop earlier
    chunks; use the bf16 KVCache if that's ever needed. lm/generate.py's
    prefill-once-then-decode loop satisfies this by construction."""

    k_q: jnp.ndarray  # (L, B, n_kv, S_max, hd) int8
    k_s: jnp.ndarray  # (L, B, n_kv, S_max) f32
    v_q: jnp.ndarray
    v_s: jnp.ndarray
    length: jnp.ndarray  # () int32

    @classmethod
    def zeros(cls, cfg: DecoderConfig, batch: int, max_len: int, dtype=None):
        vshape = (cfg.num_layers, batch, cfg.num_kv_heads, max_len, cfg.head_dim)
        sshape = (cfg.num_layers, batch, cfg.num_kv_heads, max_len)
        return cls(
            jnp.zeros(vshape, jnp.int8),
            jnp.zeros(sshape, jnp.float32),
            jnp.zeros(vshape, jnp.int8),
            jnp.zeros(sshape, jnp.float32),
            jnp.zeros((), jnp.int32),
        )


def _proj_init(key, in_dim, out_dim, lora: Optional[MoELoRAConfig], dtype, num_layers):
    ks = jax.random.split(key, num_layers)
    p = {
        "w": jnp.stack(
            [kaiming_uniform(k, (in_dim, out_dim), dtype) for k in ks]
        )
    }
    if lora is not None:
        lks = jax.random.split(jax.random.fold_in(key, 1), num_layers)
        loras = [init_moe_lora(k, in_dim, out_dim, lora, dtype) for k in lks]
        p["lora"] = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *loras)
    return p


def init_llama(key, cfg: DecoderConfig, dtype=jnp.float32) -> Dict[str, Any]:
    D = cfg.hidden_size
    qd = cfg.num_heads * cfg.head_dim
    kvd = cfg.num_kv_heads * cfg.head_dim
    L = cfg.num_layers
    ks = jax.random.split(key, 12)
    params = {
        "embed": normal_init(ks[0], (cfg.vocab_size, D), 0.02, dtype),
        "layers": {
            "attn_norm": {"scale": jnp.ones((L, D), dtype)},
            "q": _proj_init(ks[1], D, qd, cfg.lora, dtype, L),
            "k": _proj_init(ks[2], D, kvd, cfg.lora, dtype, L),
            "v": _proj_init(ks[3], D, kvd, cfg.lora, dtype, L),
            "o": _proj_init(ks[4], qd, D, cfg.lora, dtype, L),
            "mlp_norm": {"scale": jnp.ones((L, D), dtype)},
            "gate": _proj_init(ks[5], D, cfg.intermediate_size, cfg.lora, dtype, L),
            "up": _proj_init(ks[6], D, cfg.intermediate_size, cfg.lora, dtype, L),
            "down": _proj_init(ks[7], cfg.intermediate_size, D, cfg.lora, dtype, L),
        },
        "final_norm": rms_norm_init(D, dtype),
        "lm_head": normal_init(ks[8], (D, cfg.vocab_size), 0.02, dtype),
    }
    if cfg.attention_bias:
        for name, od in (("q", qd), ("k", kvd), ("v", kvd)):
            params["layers"][name]["b"] = jnp.zeros((L, od), dtype)
    return params


def _quantize_act(x):
    """Per-token symmetric int8 activation quantization (W8A8 prefill)."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    s = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8)
    return q, s


def _base_proj(p, x, a8: bool = False):
    """Base matmul across the storage formats: bf16 'w', int8 'w_q'+'w_s',
    or group-int4 'w_p'+'w_g' (Pallas kernel on decode-sized row counts,
    in-graph dequant for prefill — ops/w4a16_matmul.py).

    ``a8``: with int8 weights, quantize activations per token and run the
    dot s8xs8->s32 on the MXU (2x the bf16 rate); scales fold into the
    fp32 epilogue (cfg.int8_activations, prefill only)."""
    if "w_p" in p:
        from crab_tpu.ops.w4a16_matmul import (
            dequant_w4_xla,
            w4a16_matmul,
        )

        lead = x.shape[:-1]
        D = x.shape[-1]
        R = 1
        for s in lead:
            R *= s
        group = D // p["w_g"].shape[0]
        if R <= 256:
            y = w4a16_matmul(
                x.reshape(R, D),
                p["w_p"],
                p["w_g"],
                interpret=jax.default_backend() == "cpu",
                group=group,
            )
            return y.reshape(*lead, -1).astype(x.dtype)
        return x @ dequant_w4_xla(p["w_p"], p["w_g"], x.dtype)
    if "w_q" in p:  # weight-only int8 (lm/quant.py): scale in the epilogue
        if a8 and p["w_q"].dtype == jnp.int8:
            xq, xs = _quantize_act(x)
            # NOTE the s32 conv output (1.98 GB at gu/B=16/T=768) round-
            # trips HBM before the scale epilogue — XLA does not form a
            # kOutput fusion here (it does for the weight-only path's
            # single multiply). Measured: requesting an f32-typed dot to
            # skip the convert is a wash (1046 vs 1045 ms prefill), so
            # exact integer accumulation stays.
            y = jax.lax.dot_general(
                xq,
                p["w_q"],
                (((x.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            return (
                y.astype(jnp.float32) * xs * p["w_s"].astype(jnp.float32)[0]
            ).astype(x.dtype)
        return jnp.dot(x, p["w_q"].astype(x.dtype)) * p["w_s"].astype(x.dtype)[0]
    return x @ p["w"]


def _proj(p, x, lora_cfg, dropout_rng=None, route_out=False, a8=False):
    y = _base_proj(p, x, a8)
    if "b" in p:
        y = y + p["b"]
    route = None
    if lora_cfg is not None and "lora" in p:
        if route_out:
            delta, route = moe_lora_delta(
                p["lora"], x, lora_cfg, return_route=True, dropout_rng=dropout_rng
            )
        else:
            delta = moe_lora_delta(p["lora"], x, lora_cfg, dropout_rng=dropout_rng)
        y = y + delta
    if route_out:
        return y, route
    return y


def decode_qkv_proj(layer_params, h, cfg):
    """q/k/v for the slot decode loops (cb_decode_chunk / spec verify) —
    packed or canonical layout, flat (N, T, qd|kvd) outputs. Inference
    only: no dropout keys, no route telemetry, no a8 (the decode loops
    are bandwidth-bound; W8A8 pays only at prefill widths). The training/
    prefill path in ``llama_apply`` keeps its own richer variant."""
    qd = cfg.num_heads * cfg.head_dim
    kvd = cfg.num_kv_heads * cfg.head_dim
    if "qkv" in layer_params:
        from crab_tpu.lm.pack import packed_proj

        qkv, _ = packed_proj(layer_params["qkv"], h, cfg.lora, 3)
        return qkv[..., :qd], qkv[..., qd: qd + kvd], qkv[..., qd + kvd:]
    return (
        _proj(layer_params["q"], h, cfg.lora),
        _proj(layer_params["k"], h, cfg.lora),
        _proj(layer_params["v"], h, cfg.lora),
    )


def decode_mlp_block(layer_params, x, cfg):
    """Post-attention residual MLP for the slot decode loops:
    x + down(silu(gate) * up), packed or canonical. Same inference-only
    scope as ``decode_qkv_proj``."""
    h = rms_norm(layer_params["mlp_norm"], x, cfg.rms_norm_eps)
    if "gu" in layer_params:
        from crab_tpu.lm.pack import packed_proj

        gu, _ = packed_proj(layer_params["gu"], h, cfg.lora, 2)
        I = cfg.intermediate_size
        gate, up = gu[..., :I], gu[..., I:]
    else:
        gate = _proj(layer_params["gate"], h, cfg.lora)
        up = _proj(layer_params["up"], h, cfg.lora)
    return x + _proj(layer_params["down"], jax.nn.silu(gate) * up, cfg.lora)


def _rope(pos_ids, head_dim, theta, dtype):
    """cos/sin tables for the given positions, fp32. pos_ids (B, T)."""
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )
    angles = pos_ids[..., None].astype(jnp.float32) * inv_freq  # (B, T, hd/2)
    emb = jnp.concatenate([angles, angles], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def _rotate_half(x):
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def _apply_rope(q, k, cos, sin):
    # q (B, T, H, hd); cos/sin (B, T, hd)
    cos = cos[:, :, None, :]
    sin = sin[:, :, None, :]
    qf, kf = q.astype(jnp.float32), k.astype(jnp.float32)
    q2 = qf * cos + _rotate_half(qf) * sin
    k2 = kf * cos + _rotate_half(kf) * sin
    return q2.astype(q.dtype), k2.astype(k.dtype)


def _attention(q, k, v, mask, num_heads, num_kv_heads):
    """q (B,T,H,hd); k/v (B,S,Hkv,hd); mask (B,1,T,S) additive."""
    B, T, H, hd = q.shape
    if num_kv_heads != H:
        rep = H // num_kv_heads
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(hd).astype(q.dtype)
    logits = logits.astype(jnp.float32) + mask
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, T, H * hd)


def _pick_block(n: int, want: int) -> int:
    """Largest multiple of 128 that divides n and is <= want (flash
    kernel blocks must be 128-multiples dividing the sequence)."""
    b = min(want, n)
    b -= b % 128
    while b > 128 and n % b:
        b -= 128
    return max(b, 128)


def _attention_flash(q, k, v, pad_mask, num_heads, num_kv_heads,
                     block_q, block_k):
    """Online-softmax prefill attention (Pallas flash kernel from
    jax.experimental.pallas.ops.tpu) — the XLA path above materializes
    the (B, H, T, T) fp32 score tensor around the softmax (1.2 GB/layer
    written + re-read at B=16/T=768; measured 253 ms of the 1047 ms
    serving prefill — tools/micro_prefill2.py). Scores here never leave
    VMEM. Offset-0 full-causal prefill only; pad_mask (B, T) 1=keep
    carries left-padding via segment ids (pads land in segment 0, real
    tokens in 1 — cross-segment attention is masked, matching the
    additive mask the XLA path builds)."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        SegmentIds,
        flash_attention,
    )

    B, T, H, hd = q.shape
    if num_kv_heads != H:
        rep = H // num_kv_heads
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
    qt = q.transpose(0, 2, 1, 3)  # (B, H, T, hd)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    seg = pad_mask.astype(jnp.int32)
    # the kernel needs 128-aligned T; serving buckets are 64-aligned
    # (engine seq_bucket), so pad the tail. Tail queries land in segment
    # 0 with the left-pads (they attend only garbage, sliced off below);
    # real queries never see them. Attention FLOPs grow ≤(T+127)²/T²,
    # but the matmuls around it stay at T — cheaper than widening the
    # whole prefill bucket to 128.
    T_pad = -(-T // 128) * 128
    if T_pad != T:
        pad = ((0, 0), (0, 0), (0, T_pad - T), (0, 0))
        qt = jnp.pad(qt, pad)
        kt = jnp.pad(kt, pad)
        vt = jnp.pad(vt, pad)
        seg = jnp.pad(seg, ((0, 0), (0, T_pad - T)))
    bq = _pick_block(T_pad, block_q)
    bk = _pick_block(T_pad, block_k)
    # block_b > 1 cuts grid steps (5.6 us fixed each here) but the fp32
    # score block (block_b*bq*bk*4) must stay well inside 16 MB VMEM
    bb = 1
    while (
        bb * 2 <= B
        and B % (bb * 2) == 0
        and (bb * 2) * bq * bk * 4 <= 6 * 1024 * 1024
    ):
        bb *= 2
    blocks = BlockSizes(
        block_q=bq, block_k_major=bk, block_k=bk, block_b=bb,
        block_q_major_dkv=bq, block_k_major_dkv=bk, block_k_dkv=bk,
        block_q_dkv=bq, block_k_major_dq=bk, block_k_dq=bk, block_q_dq=bq,
    )
    out = flash_attention(
        qt, kt, vt,
        segment_ids=SegmentIds(q=seg, kv=seg),
        causal=True,
        sm_scale=float(1.0 / np.sqrt(hd)),
        block_sizes=blocks,
    )
    return out[:, :, :T].transpose(0, 2, 1, 3).reshape(B, T, H * hd)


def lm_head_logits(params, head_in):
    """fp32 logits across the head storage formats: bf16 'lm_head' or
    per-vocab-channel int8 'lm_head_q'+'lm_head_s' (saves a 262 MB bf16
    read per decode step and 131 MB of HBM at 7B)."""
    if "lm_head_q" in params:
        y = head_in @ params["lm_head_q"].astype(head_in.dtype)
        return y.astype(jnp.float32) * params["lm_head_s"]
    return (head_in @ params["lm_head"]).astype(jnp.float32)


def llama_apply(
    params,
    cfg: DecoderConfig,
    inputs_embeds: jnp.ndarray,  # (B, T, D)
    attention_mask: Optional[jnp.ndarray] = None,  # (B, T_total) 1=keep
    position_ids: Optional[jnp.ndarray] = None,  # (B, T)
    cache: Optional[KVCache] = None,
    collect_routes: bool = False,
    remat: bool = False,
    dropout_rng: Optional[jnp.ndarray] = None,
    last_logit_only: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, Optional[KVCache], Optional[dict]]:
    """Returns (logits fp32, last_hidden, new_cache, route_telemetry).

    ``last_logit_only``: compute lm_head on the final position only —
    generate's prefill needs just that token, and the full (B, T, V)
    fp32 logits tensor at 7B/T=704 is ~720 MB of pure HBM traffic.

    Without a cache: full causal self-attention over T (prefill/training);
    attention_mask is (B, T) padding mask. With a cache: T new tokens are
    appended at cache.length; attention_mask must cover the cache max_len.

    ``collect_routes``: telemetry dict with per-token router weights for
    every attention projection — ``{'q'|'k'|'v'|'o': (L, B, T, E)}`` plus
    ``q_route_mean`` (L, E) — the reference needed a forked
    modeling_llama.py for this (``models/modeling_llama.py:1140-1252``,
    dumped by ``inference_hyper_lora.py:164-205``).

    ``dropout_rng``: enables train-mode LoRA dropout (rate cfg.lora.dropout)
    on every adapted projection; omit for eval/inference determinism.
    """
    B, T, D = inputs_embeds.shape
    x = inputs_embeds

    quant_cache = isinstance(cache, KVCacheQ)
    if cache is None:
        S = T
        offset = jnp.zeros((), jnp.int32)
    elif quant_cache:
        S = cache.k_q.shape[3]
        offset = cache.length
    else:
        S = cache.k.shape[2]
        offset = cache.length

    if quant_cache and T > 1:
        # Chunked/continued prefill into the int8 cache silently drops the
        # earlier chunks (the T>1 branch attends over the LOCAL k/v only —
        # see KVCacheQ docstring). Fail loudly instead of decoding garbage.
        if isinstance(cache.length, jax.core.Tracer):
            # in-graph: poison activations so any offset!=0 prefill yields
            # NaN logits at fetch time rather than plausible wrong tokens
            x = jnp.where(offset == 0, x, jnp.asarray(jnp.nan, x.dtype))
        elif int(cache.length) != 0:
            raise ValueError(
                "KVCacheQ supports a single prefill at offset 0; chunked "
                f"prefill (offset={int(cache.length)}, T={T}) would drop "
                "earlier chunks. Use the bf16 KVCache for chunked prefill."
            )

    if position_ids is None:
        position_ids = offset[None, None] + jnp.arange(T)[None, :]
        position_ids = jnp.broadcast_to(position_ids, (B, T))
    if attention_mask is None:
        attention_mask = jnp.ones((B, S), jnp.int32)

    # additive mask (B, 1, T, S): padding + causality
    kv_pos = jnp.arange(S)[None, None, None, :]
    q_pos = (offset + jnp.arange(T))[None, None, :, None]
    causal = kv_pos <= q_pos
    keep = causal & (attention_mask[:, None, None, :] > 0)
    mask = jnp.where(keep, 0.0, NEG_INF).astype(jnp.float32)

    cos, sin = _rope(position_ids, cfg.head_dim, cfg.rope_theta, x.dtype)

    lora_cfg = cfg.lora

    # Offset-0 full-causal prefill attention: flash kernel when enabled
    # and the shape qualifies (TPU backend, 128-multiple head_dim — the
    # Pallas kernel's lane constraint; unaligned T is tail-padded inside
    # _attention_flash); XLA score-materializing path otherwise. Both
    # prefill call sites below (no cache / int8 cache being written)
    # share this. T>=128: tiny prefills would pay more in pad than the
    # score tensor costs.
    use_flash = (
        cfg.prefill_attn == "flash"
        and T >= 128
        and cfg.head_dim % 128 == 0
        and jax.default_backend() == "tpu"
    )

    def prefill_attention(q, k, v):
        if use_flash:
            return _attention_flash(
                q, k, v, attention_mask[:, :T], cfg.num_heads,
                cfg.num_kv_heads, cfg.flash_block_q, cfg.flash_block_k,
            )
        return _attention(
            q, k, v, mask[..., :T], cfg.num_heads, cfg.num_kv_heads
        )

    def layer_fn(carry, inputs):
        # The KV cache rides the scan *carry* and is updated in place per
        # layer. Putting it in the ys (stacked outputs) instead would copy
        # the whole (L, B, S, ...) cache to fresh buffers every decode
        # step — measured ~2x decode-step cost at 7B.
        x, *cache_bufs = carry
        layer_params, layer_idx = inputs
        packed = "qkv" in layer_params
        h = rms_norm(layer_params["attn_norm"], x, cfg.rms_norm_eps)
        out = {}
        attn_p = layer_params["qkv" if packed else "q"]
        has_lora = lora_cfg is not None and "lora" in attn_p
        collect = collect_routes and has_lora
        dkeys = {}
        if dropout_rng is not None and has_lora and lora_cfg.dropout > 0.0:
            if packed:
                raise ValueError(
                    "packed decoder layout is inference-only; train on the "
                    "canonical layout (lm/pack.py)"
                )
            names = ("q", "k", "v", "o", "gate", "up", "down")
            dkeys = dict(
                zip(names, jax.random.split(jax.random.fold_in(dropout_rng, layer_idx), 7))
            )
        qd = cfg.num_heads * cfg.head_dim
        kvd = cfg.num_kv_heads * cfg.head_dim
        a8 = cfg.int8_activations and T > 1
        if packed:
            from crab_tpu.lm.pack import packed_proj

            qkv, routes3 = packed_proj(layer_params["qkv"], h, lora_cfg, 3, a8=a8)
            q = qkv[..., :qd]
            k = qkv[..., qd : qd + kvd]
            v = qkv[..., qd + kvd :]
            if collect and routes3 is not None:
                out["q"] = routes3[..., 0, :].astype(jnp.float32)
                out["k"] = routes3[..., 1, :].astype(jnp.float32)
                out["v"] = routes3[..., 2, :].astype(jnp.float32)
        else:
            q, q_route = _proj(
                layer_params["q"], h, lora_cfg, dkeys.get("q"), route_out=True,
                a8=a8,
            )
            k, k_route = _proj(
                layer_params["k"], h, lora_cfg, dkeys.get("k"), route_out=True,
                a8=a8,
            )
            v, v_route = _proj(
                layer_params["v"], h, lora_cfg, dkeys.get("v"), route_out=True,
                a8=a8,
            )
            if collect:
                out["q"] = q_route.astype(jnp.float32)
                out["k"] = k_route.astype(jnp.float32)
                out["v"] = v_route.astype(jnp.float32)
        q = q.reshape(B, T, cfg.num_heads, cfg.head_dim)
        k = k.reshape(B, T, cfg.num_kv_heads, cfg.head_dim)
        v = v.reshape(B, T, cfg.num_kv_heads, cfg.head_dim)
        q, k = _apply_rope(q, k, cos, sin)

        if quant_cache:
            from crab_tpu.ops.decode_attention import (
                decode_attention_int8,
                quantize_kv,
            )

            k_qc, k_sc, v_qc, v_sc = cache_bufs
            # (B, T, Hkv, d) -> cache layout (B, Hkv, T, d)
            kq_new, ks_new = quantize_kv(k.transpose(0, 2, 1, 3))
            vq_new, vs_new = quantize_kv(v.transpose(0, 2, 1, 3))
            k_qc = jax.lax.dynamic_update_slice(
                k_qc, kq_new[None], (layer_idx, 0, 0, offset, 0)
            )
            k_sc = jax.lax.dynamic_update_slice(
                k_sc, ks_new[None], (layer_idx, 0, 0, offset)
            )
            v_qc = jax.lax.dynamic_update_slice(
                v_qc, vq_new[None], (layer_idx, 0, 0, offset, 0)
            )
            v_sc = jax.lax.dynamic_update_slice(
                v_sc, vs_new[None], (layer_idx, 0, 0, offset)
            )
            cache_bufs = [k_qc, k_sc, v_qc, v_sc]
            if T == 1:
                # int8 decode attention; bias carries both the
                # left-padding and not-yet-written masking. Default is
                # the XLA mixed bf16xs8 formulation (scales factored out
                # of the dots) — fastest measured and no VMEM ceiling;
                # 'pallas' keeps the VMEM-dequant kernel.
                from crab_tpu.ops.decode_attention import (
                    decode_attention_int8_xla,
                )

                bias = mask[:, 0, 0, :]  # (B, S)
                args = (
                    q[:, 0],  # (B, H, d)
                    jax.lax.dynamic_index_in_dim(k_qc, layer_idx, 0, False),
                    jax.lax.dynamic_index_in_dim(k_sc, layer_idx, 0, False),
                    jax.lax.dynamic_index_in_dim(v_qc, layer_idx, 0, False),
                    jax.lax.dynamic_index_in_dim(v_sc, layer_idx, 0, False),
                )
                if cfg.kv_kernel == "pallas":
                    attn = decode_attention_int8(
                        *args, bias=bias,
                        interpret=jax.default_backend() == "cpu",
                    )
                else:
                    attn = decode_attention_int8_xla(*args, bias=bias)
                attn = attn[:, None, :, :].reshape(
                    B, 1, cfg.num_heads * cfg.head_dim
                )
            else:
                # prefill at offset 0: attend over the local (bf16) k/v —
                # the quantized cache is written for subsequent decode
                attn = prefill_attention(q, k, v)
        elif cache is not None:
            k_cache, v_cache = cache_bufs
            k_cache = jax.lax.dynamic_update_slice(
                k_cache, k[None], (layer_idx, 0, offset, 0, 0)
            )
            v_cache = jax.lax.dynamic_update_slice(
                v_cache, v[None], (layer_idx, 0, offset, 0, 0)
            )
            cache_bufs = [k_cache, v_cache]
            k_full = jax.lax.dynamic_index_in_dim(k_cache, layer_idx, 0, False)
            v_full = jax.lax.dynamic_index_in_dim(v_cache, layer_idx, 0, False)
            attn = _attention(q, k_full, v_full, mask, cfg.num_heads, cfg.num_kv_heads)
        else:
            # no cache: S == T, full causal prefill/training
            attn = prefill_attention(q, k, v)

        o, o_route = _proj(
            layer_params["o"], attn, lora_cfg, dkeys.get("o"), route_out=True,
            a8=a8,
        )
        if collect:
            out["o"] = o_route.astype(jnp.float32)
        x = x + o

        h = rms_norm(layer_params["mlp_norm"], x, cfg.rms_norm_eps)
        if packed:
            gu, _ = packed_proj(layer_params["gu"], h, lora_cfg, 2, a8=a8)
            I = cfg.intermediate_size
            gate, up = gu[..., :I], gu[..., I:]
        else:
            gate = _proj(
                layer_params["gate"], h, lora_cfg, dkeys.get("gate"), a8=a8
            )
            up = _proj(layer_params["up"], h, lora_cfg, dkeys.get("up"), a8=a8)
        x = x + _proj(
            layer_params["down"], jax.nn.silu(gate) * up, lora_cfg,
            dkeys.get("down"), a8=a8,
        )

        return (x, *cache_bufs), out

    if quant_cache:
        init_bufs = [cache.k_q, cache.k_s, cache.v_q, cache.v_s]
    elif cache is not None:
        init_bufs = [cache.k, cache.v]
    else:
        init_bufs = []

    # rematerialization: recompute layer activations in the backward pass
    # instead of storing them — at 7B/seq 768 stored activations exceed the
    # chip's HBM; remat trades ~30% extra forward FLOPs for O(1) layers of
    # live activations (the reference leans on ZeRO CPU offload instead)
    body = jax.checkpoint(layer_fn) if remat else layer_fn
    (x, *cache_bufs), ys = jax.lax.scan(
        body,
        (x, *init_bufs),
        (params["layers"], jnp.arange(cfg.num_layers)),
        unroll=min(cfg.scan_unroll, cfg.num_layers),
    )

    x = rms_norm(params["final_norm"], x, cfg.rms_norm_eps)
    head_in = x[:, -1:] if last_logit_only else x
    logits = lm_head_logits(params, head_in)

    new_cache = None
    if quant_cache:
        new_cache = KVCacheQ(*cache_bufs, offset + T)
    elif cache is not None:
        new_cache = KVCache(*cache_bufs, offset + T)
    telemetry = None
    if collect_routes and isinstance(ys, dict) and "q" in ys:
        telemetry = dict(ys)  # q/k/v/o: (L, B, T, E)
        telemetry["q_route_mean"] = ys["q"].mean(axis=(1, 2))  # (L, E)
    return logits, x, new_cache, telemetry
