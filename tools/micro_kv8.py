"""Does XLA stream int8 KV into the decode-attention dots?

The Pallas int8-KV kernel loses at S~=832 (grid overhead). But the scales
factor OUT of both attention contractions — per-row k scale multiplies the
logit, per-row v scale folds into the probabilities — so both dots can run
as mixed bf16 x s8, the same convert-into-dot pattern XLA already fuses
for int8 weights (verified via micro_hlo: no materialized dequant).

This micro times one layer's decode attention, chained in a fori_loop so
the measured region is one program: bf16 cache vs int8-XLA vs int8-Pallas
at the serving shapes (B=8, H=32, d=128, S in {832, 1216}).
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from crab_tpu.ops.decode_attention import decode_attention_int8

B, H, D = 8, 32, 128
N = 100  # chained calls per timed program


def xla_int8_attn(q, kq, ks, vq, vs, bias):
    Hkv, S = kq.shape[1], kq.shape[2]
    G = q.shape[1] // Hkv
    qg = q.reshape(B, Hkv, G, D)
    logits = jnp.einsum(
        "bhgd,bhsd->bhgs", qg, kq.astype(qg.dtype)
    ).astype(jnp.float32)
    logits = logits * (D ** -0.5) * ks[:, :, None, :] + bias[:, None, None, :]
    p = jax.nn.softmax(logits, axis=-1)
    p = (p * vs[:, :, None, :]).astype(qg.dtype)
    out = jnp.einsum("bhgs,bhsd->bhgd", p, vq.astype(qg.dtype))
    return out.reshape(B, H, D)


def bf16_attn(q, k, v, bias):
    logits = jnp.einsum("bhd,bhsd->bhs", q, k).astype(jnp.float32)
    logits = logits * (D ** -0.5) + bias[:, None, :]
    p = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhs,bhsd->bhd", p, v)


def timed(name, fn, q0, reps=3):
    f = jax.jit(
        lambda q: lax.fori_loop(
            0, N, lambda i, q: (fn(q) * 1e-3 + 0.01).astype(q.dtype), q
        )
    )
    t0 = time.time()
    float(jnp.sum(f(q0)))
    print(f"  {name}: compile+first {time.time()-t0:.1f}s", flush=True)
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        float(jnp.sum(f(q0)))
        best = min(best, time.time() - t0)
    per_call = best / N * 1000
    print(f"  {name}: {per_call:.3f} ms/call  (x32 layers = "
          f"{per_call*32:.2f} ms/step)", flush=True)
    return per_call


for S in (832, 1216):
    print(f"S={S}:", flush=True)
    key = jax.random.PRNGKey(0)
    ks_ = jax.random.split(key, 6)
    q0 = jax.random.normal(ks_[0], (B, H, D), jnp.bfloat16)
    k = jax.random.normal(ks_[1], (B, H, S, D), jnp.bfloat16)
    v = jax.random.normal(ks_[2], (B, H, S, D), jnp.bfloat16)
    kq = jax.random.randint(ks_[3], (B, H, S, D), -127, 128, jnp.int8)
    vq = jax.random.randint(ks_[4], (B, H, S, D), -127, 128, jnp.int8)
    kscale = jnp.full((B, H, S), 0.01, jnp.float32)
    vscale = jnp.full((B, H, S), 0.01, jnp.float32)
    bias = jnp.zeros((B, S), jnp.float32)

    timed("bf16       ", lambda q: bf16_attn(q, k, v, bias), q0)
    timed("int8-xla   ", lambda q: xla_int8_attn(q, kq, kscale, vq, vscale, bias), q0)
    timed("int8-pallas", lambda q: decode_attention_int8(
        q, kq, kscale, vq, vscale, bias=bias), q0)
