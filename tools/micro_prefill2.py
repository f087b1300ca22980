"""Prefill op-level ablation (round 4) — where do 1046 ms go?

micro_prefill.py measured the packed a8 prefill at 1046 ms resident
(B=16, T=768) = 164 TFLOP/s effective vs the 394 TOPS s8 roofline
(~440 ms floor). This grid isolates the non-matmul costs by
monkeypatching pieces out (results are WRONG numerically — this is a
cost probe, not a correctness path):

  full      the serving path (baseline)
  w8        weight-only int8, bf16 dots (a8 off) — what does s8xs8 buy?
  noattn    _attention returns q (skips QK/softmax/AV and the fp32
            (B,H,T,T) score materialization, ~1.2 GB/layer)
  sm-bf16   softmax scores kept in bf16 (halves score-tensor traffic)
  noquant   a8 matmuls fed a fixed pre-quantized x (skips the per-token
            abs-max quantize VPU pass, keeps the s8 dots)
  dot-bf16  s8xs8 dot typed bf16 (epilogue converts in registers; the
            s32 round trip — ~2 GB/layer written + re-read — becomes a
            1 GB bf16 write). NOT numerically exact: |acc| reaches
            127*127*K ~ 2^26 and bf16 keeps 8 mantissa bits (~0.2% rel),
            on top of a8's ~1% — candidate only if it measures well
  nolora    cfg.lora=None (bounds the MoE-LoRA delta's prefill cost)

Run: PF2_GRID=full,noattn,sm-bf16 python tools/micro_prefill2.py
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import dataclasses
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from crab_tpu.core.config import crab_7b
import crab_tpu.lm.llama as L
from crab_tpu.lm.pack import pack_decoder
from crab_tpu.lm.quant import init_llama_int8

B = int(_os.environ.get("PF2_B", "16"))
T = int(_os.environ.get("PF2_T", "768"))
GRID = _os.environ.get("PF2_GRID", "full,noattn,sm-bf16,w8,noquant").split(",")

_orig_attention = L._attention
_orig_quantize = L._quantize_act
_orig_base_proj = L._base_proj


def _base_proj_bf16(p, x, a8=False):
    if a8 and "w_q" in p and p["w_q"].dtype == jnp.int8:
        xq, xs = L._quantize_act(x)
        y = jax.lax.dot_general(
            xq, p["w_q"], (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.bfloat16,
        )
        return (
            y * (xs * p["w_s"].astype(jnp.float32)[0]).astype(jnp.bfloat16)
        ).astype(x.dtype)
    return _orig_base_proj(p, x, a8)


def _attn_skip(q, k, v, mask, num_heads, num_kv_heads):
    Bq, Tq, H, hd = q.shape
    return q.reshape(Bq, Tq, H * hd)


def _attn_bf16_scores(q, k, v, mask, num_heads, num_kv_heads):
    Bq, Tq, H, hd = q.shape
    if num_kv_heads != H:
        rep = H // num_kv_heads
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(hd).astype(q.dtype)
    logits = logits + mask.astype(q.dtype)  # scores stay bf16
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(Bq, Tq, H * hd)


def _quant_fixed(x):
    # skip the abs-max pass: pretend scale 1/127 everywhere
    q = jnp.clip(x.astype(jnp.float32) * 127.0, -127, 127).astype(jnp.int8)
    return q, jnp.full(x.shape[:-1] + (1,), 1.0 / 127.0, jnp.float32)


def measure(variant: str):
    a8 = variant != "w8"
    cfg = dataclasses.replace(
        crab_7b().decoder, kv_quant=True, int8_activations=a8,
        lora=None if variant == "nolora" else crab_7b().decoder.lora,
    )
    params = jax.jit(lambda k: init_llama_int8(k, cfg))(jax.random.PRNGKey(0))
    params = pack_decoder(params, cfg, donate=True)
    emb = jax.jit(
        lambda k: jax.random.normal(k, (B, T, cfg.hidden_size), jnp.bfloat16)
        * 0.02
    )(jax.random.PRNGKey(1))
    mask = jnp.ones((B, T), jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(T)[None], (B, T))

    L._attention = {
        "noattn": _attn_skip, "sm-bf16": _attn_bf16_scores,
    }.get(variant, _orig_attention)
    L._quantize_act = _quant_fixed if variant == "noquant" else _orig_quantize
    L._base_proj = _base_proj_bf16 if variant == "dot-bf16" else _orig_base_proj
    # packed_proj may close over the module-level quantize; patch there too
    import crab_tpu.lm.pack as P
    if hasattr(P, "_quantize_act"):
        P._quantize_act = L._quantize_act

    def chain(n):
        def fn(p, e):
            def body(i, acc):
                cache = L.KVCacheQ.zeros(cfg, B, T, e.dtype)
                logits, _, _, _ = L.llama_apply(
                    p, cfg, e + (acc * 0).astype(e.dtype),
                    attention_mask=mask, position_ids=pos, cache=cache,
                    last_logit_only=True,
                )
                return acc + logits[0, -1, 0].astype(jnp.float32)
            return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))

        f = jax.jit(fn)
        float(f(params, emb))
        best = 1e9
        for _ in range(2):
            t0 = time.time()
            float(f(params, emb))
            best = min(best, time.time() - t0)
        return best

    t2, t6 = chain(2), chain(6)
    ms = (t6 - t2) / 4.0 * 1000
    print(f"{variant}: prefill {ms:.0f} ms resident (B={B}, T={T})")
    L._attention = _orig_attention
    L._quantize_act = _orig_quantize
    L._base_proj = _orig_base_proj
    del params
    return ms


res = {}
for g in GRID:
    res[g] = measure(g)
print(json.dumps({k: round(v, 1) for k, v in res.items()}))
