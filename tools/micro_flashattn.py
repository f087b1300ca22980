"""Prefill attention: materialized XLA einsum vs Pallas flash kernel.

micro_prefill.py put the 7B B=16/T=768 prefill at 138 TFLOP/s effective
(a8) — far off the s8 MXU rate. Prime suspect: the einsum attention
materializes (B, H, T, S) fp32 logits+probs (16x32x768x768x4 = 1.2 GB
per layer) through HBM, while a flash kernel keeps the running softmax
in VMEM. This times both formulations at the exact prefill shape, with
the left-pad + causal mask expressed as segment_ids for flash.

Run: python tools/micro_flashattn.py
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from jax.experimental.pallas.ops.tpu.flash_attention import (
    BlockSizes,
    flash_attention,
)

from crab_tpu.lm.llama import NEG_INF, _attention

B = int(_os.environ.get("FA_B", "16"))
T = int(_os.environ.get("FA_T", "768"))
H = 32
D = 128
PAD = 64  # left-pad rows per sequence

key = jax.random.PRNGKey(0)
q = jax.random.normal(key, (B, T, H, D), jnp.bfloat16) * 0.05
k = jax.random.normal(jax.random.fold_in(key, 1), (B, T, H, D), jnp.bfloat16) * 0.05
v = jax.random.normal(jax.random.fold_in(key, 2), (B, T, H, D), jnp.bfloat16) * 0.05

amask = jnp.zeros((B, T), jnp.int32).at[:, PAD:].set(1)
causal = jnp.tril(jnp.ones((T, T), bool))
full = (causal[None] & (amask[:, None, :] > 0))[:, None]  # (B,1,T,S)
bias = jnp.where(full, 0.0, NEG_INF).astype(jnp.float32)


def timed(f, *args, reps=3):
    out = f(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0][0, 0])
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        out = f(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0][0, 0])
        best = min(best, time.time() - t0)
    return best


def chain(fn, n):
    """Chain n attention calls through a data dependency (relay rules)."""
    def g(q, k, v):
        def body(i, acc):
            out = fn(q + (acc * 0).astype(q.dtype), k, v)
            return acc + out.reshape(-1)[0].astype(jnp.float32)
        return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))
    f = jax.jit(g)
    float(f(q, k, v))
    best = 1e9
    for _ in range(2):
        t0 = time.time()
        float(f(q, k, v))
        best = min(best, time.time() - t0)
    return best


def xla_attn(q, k, v):
    return _attention(q, k, v, bias, H, H)


segs = amask  # pads segment 0, real tokens segment 1


def flash_attn(q, k, v):
    from jax.experimental.pallas.ops.tpu.flash_attention import SegmentIds

    out = flash_attention(
        q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
        v.transpose(0, 2, 1, 3),
        segment_ids=SegmentIds(segs, segs),
        causal=True, sm_scale=D ** -0.5,
    )
    return out.transpose(0, 2, 1, 3).reshape(B, T, H * D)


x2, x6 = chain(xla_attn, 2), chain(xla_attn, 6)
xla_ms = (x6 - x2) / 4 * 1000
print(f"xla einsum attention: {xla_ms:.2f} ms/call (B={B} H={H} T={T})")

f2, f6 = chain(flash_attn, 2), chain(flash_attn, 6)
fl_ms = (f6 - f2) / 4 * 1000
print(f"pallas flash attention: {fl_ms:.2f} ms/call -> {xla_ms/fl_ms:.2f}x")

# numerics: compare against the masked einsum in fp32
ref = _attention(
    q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32),
    bias, H, H,
)
got = flash_attn(q, k, v).astype(jnp.float32)
# pad rows attend only pads (garbage but unused downstream); compare real
diff = jnp.abs(ref - got)[:, PAD:].max()
print(f"max |diff| on real rows: {float(diff):.3e}")
