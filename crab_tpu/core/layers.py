"""Minimal functional NN layer kit: explicit param pytrees, pure applies.

crab_tpu modules are (init -> params dict, apply(params, x) -> y) pairs.
Explicit pytrees keep three things trivial that framework magic obscures:
torch-checkpoint conversion, per-leaf sharding rules, and parity testing.

Conventions:
  - linear weights are stored (in, out) — i.e. transposed from torch —
    so applies are plain ``x @ w`` feeding the MXU directly.
  - all math runs in the caller's chosen dtype; layer norms always
    compute their statistics in fp32.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def uniform_init(key, shape, bound, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def kaiming_uniform(key, shape, dtype=jnp.float32, a: float = math.sqrt(5)):
    """torch nn.Linear default init (kaiming_uniform with a=sqrt(5))."""
    fan_in = shape[0]
    gain = math.sqrt(2.0 / (1.0 + a * a))
    bound = gain * math.sqrt(3.0 / fan_in)
    return uniform_init(key, shape, bound, dtype)


def normal_init(key, shape, std, dtype=jnp.float32):
    return std * jax.random.normal(key, shape, dtype)


def xavier_uniform(key, shape, gain: float = 1.0, dtype=jnp.float32):
    fan_in, fan_out = shape[0], shape[-1]
    bound = gain * math.sqrt(6.0 / (fan_in + fan_out))
    return uniform_init(key, shape, bound, dtype)


def linear_init(key, in_dim, out_dim, use_bias=True, dtype=jnp.float32):
    kw, kb = jax.random.split(key)
    p = {"w": kaiming_uniform(kw, (in_dim, out_dim), dtype)}
    if use_bias:
        bound = 1.0 / math.sqrt(in_dim)
        p["b"] = uniform_init(kb, (out_dim,), bound, dtype)
    return p


def quantize_act_int8(x):
    """Per-token symmetric int8 activation quantization (shared with the
    decoder's W8A8 prefill path, lm/llama._quantize_act semantics)."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    s = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8)
    return q, s


def linear(p, x):
    if "w_q" in p:
        # W8A8: s8 x s8 -> s32 on the MXU (2x the bf16 rate, measured
        # 1.6-1.8x sustained — tools/micro_mxu8.py), scales in the fp32
        # epilogue. Encoder params opt in via encoders/quantize.py;
        # bf16/fp32 trees never carry 'w_q' so parity paths are
        # untouched.
        xq, xs = quantize_act_int8(x)
        y = jax.lax.dot_general(
            xq,
            p["w_q"],
            (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        y = (
            y.astype(jnp.float32) * xs * p["w_s"].astype(jnp.float32)[0]
        ).astype(x.dtype)
    else:
        y = x @ p["w"]
    if "b" in p:
        y = y + p["b"]
    return y


def layer_norm_init(dim, dtype=jnp.float32):
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def layer_norm(p, x, eps: float = 1e-5):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def rms_norm_init(dim, dtype=jnp.float32):
    return {"scale": jnp.ones((dim,), dtype)}


def rms_norm(p, x, eps: float = 1e-5):
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    y = xf * jax.lax.rsqrt(var + eps)
    return (y * p["scale"].astype(jnp.float32)).astype(x.dtype)


def embedding_init(key, num, dim, std=0.02, dtype=jnp.float32):
    return {"embedding": normal_init(key, (num, dim), std, dtype)}


def embedding(p, ids):
    return jnp.take(p["embedding"], ids, axis=0)


def gelu(x):
    # torch nn.GELU default = exact erf formulation.
    return jax.nn.gelu(x, approximate=False)


def count_params(tree) -> int:
    return sum(int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(tree))


def cast_tree(tree, dtype):
    return jax.tree_util.tree_map(lambda l: l.astype(dtype), tree)


# ---------------------------------------------------------------------------
# torch -> jax conversion helpers (used by encoders/*/convert and lm/convert)
# ---------------------------------------------------------------------------


def t2j(t) -> jnp.ndarray:
    """torch tensor -> jnp array (host roundtrip, fp32-safe)."""
    return jnp.asarray(np.asarray(t.detach().cpu().float().numpy()))


def t_linear(module) -> dict:
    """torch nn.Linear -> {'w': (in,out)[, 'b']} (weight transposed)."""
    p = {"w": t2j(module.weight).T}
    if getattr(module, "bias", None) is not None:
        p["b"] = t2j(module.bias)
    return p


def t_layer_norm(module) -> dict:
    return {"scale": t2j(module.weight), "bias": t2j(module.bias)}
