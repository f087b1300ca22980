"""Pallas decode attention over an int8-quantized KV cache.

Motivation (measured on v5e, 7B, batch 4): decode steps are KV-bound —
the bf16 cache costs ~16 ms/step of HBM reads vs ~8 ms for int8 weights.
Quantizing K/V per (position, head) to int8 halves cache traffic, but in
plain XLA the dequantized bf16 tensors would round-trip HBM and erase the
win. This kernel DMAs int8 tiles into VMEM, dequantizes on the VPU, and
runs the two small matmuls on the MXU — cache bytes read = int8 bytes.

Layouts are chosen for TPU tiling: caches are (B, Hkv, S, d) so each
program's block is a clean (S, d) tile (d = 128 lanes); scales are
(B, Hkv, S). One program per (batch, kv-head); all query heads of the
group (GQA-ready) are processed together.

  q:      (B, H, d)       single decode step
  k_q/v_q:(B, Hkv, S, d)  int8
  k_s/v_s:(B, Hkv, S)     f32 per-position-per-head scales
  length: ()              int32 attendable prefix (cache fill level)
  -> out  (B, H, d)
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _kernel(q_ref, kq_ref, ks_ref, vq_ref, vs_ref, bias_ref, out_ref, *, G, Hkv):
    # one program per batch row; kv heads unrolled statically so every
    # slice index is compile-time constant (mosaic can't prove dynamic
    # sublane offsets are tile-aligned when G < 8).
    d = q_ref.shape[2]
    S = kq_ref.shape[2]
    bias = bias_ref[0]  # (1, S)
    for h in range(Hkv):
        q = q_ref[0, h * G:(h + 1) * G, :].astype(jnp.float32)  # (G, d)
        k = kq_ref[0, h].astype(jnp.float32) * ks_ref[0, h].reshape(S, 1)
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (G, S)
        logits = logits * (d**-0.5) + bias

        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)

        v = vq_ref[0, h].astype(jnp.float32) * vs_ref[0, h].reshape(S, 1)
        out = jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # (G, d)
        out_ref[0, h * G:(h + 1) * G, :] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def decode_attention_int8(
    q: jnp.ndarray,  # (B, H, d)
    k_q: jnp.ndarray,  # (B, Hkv, S, d) int8
    k_s: jnp.ndarray,  # (B, Hkv, S) f32
    v_q: jnp.ndarray,
    v_s: jnp.ndarray,
    length: Optional[jnp.ndarray] = None,  # () int32 — simple prefix mask
    bias: Optional[jnp.ndarray] = None,  # (B, S) additive f32 (0 / -1e9)
    interpret: bool = False,
) -> jnp.ndarray:
    B, H, d = q.shape
    Hkv, S = k_q.shape[1], k_q.shape[2]
    G = H // Hkv  # query heads per kv head (HF GQA ordering: h -> h // G)

    if bias is None:
        if length is None:
            raise ValueError("pass either length or bias")
        bias = jnp.where(jnp.arange(S)[None] < length, 0.0, -1e9)
        bias = jnp.broadcast_to(bias, (B, S))
    bias = bias.astype(jnp.float32).reshape(B, 1, S)

    out = pl.pallas_call(
        functools.partial(_kernel, G=G, Hkv=Hkv),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, d), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, Hkv, S, d), lambda b: (b, 0, 0, 0)),
            pl.BlockSpec((1, Hkv, S), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, Hkv, S, d), lambda b: (b, 0, 0, 0)),
            pl.BlockSpec((1, Hkv, S), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, 1, S), lambda b: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, H, d), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, d), q.dtype),
        interpret=interpret,
    )(q, k_q, k_s, v_q, v_s, bias)
    return out


def decode_attention_int8_xla(
    q: jnp.ndarray,  # (B, H, d)
    k_q: jnp.ndarray,  # (B, Hkv, S, d) int8
    k_s: jnp.ndarray,  # (B, Hkv, S) f32
    v_q: jnp.ndarray,
    v_s: jnp.ndarray,
    length: Optional[jnp.ndarray] = None,
    bias: Optional[jnp.ndarray] = None,  # (B, S) additive f32
) -> jnp.ndarray:
    """Plain-XLA int8-KV decode attention — no kernel, no dequant copy.

    The per-row scales factor OUT of both contractions: k's scale
    multiplies the logit after the dot, v's scale folds into the
    probabilities before the dot. Both dots are then mixed bf16 x s8 and
    XLA streams the int8 operand straight into the MXU convolution (the
    same convert-into-dot fusion verified for int8 weights via
    tools/micro_hlo.py), so cache bytes read stay 8-bit. Measured faster
    than both the bf16 path and the Pallas kernel at serving shapes
    (tools/micro_kv8.py), and it has no VMEM ceiling at long S.
    """
    B, H, d = q.shape
    Hkv, S = k_q.shape[1], k_q.shape[2]
    G = H // Hkv
    if bias is None:
        if length is None:
            raise ValueError("pass either length or bias")
        bias = jnp.where(jnp.arange(S)[None] < length, 0.0, -1e9)
        bias = jnp.broadcast_to(bias, (B, S))
    qg = q.reshape(B, Hkv, G, d)
    logits = jnp.einsum(
        "bhgd,bhsd->bhgs", qg, k_q.astype(qg.dtype),
        preferred_element_type=jnp.float32,
    )
    logits = (
        logits * (d ** -0.5) * k_s[:, :, None, :]
        + bias.astype(jnp.float32)[:, None, None, :]
    )
    p = jax.nn.softmax(logits, axis=-1)
    p = (p * v_s[:, :, None, :]).astype(qg.dtype)
    out = jnp.einsum(
        "bhgs,bhsd->bhgd", p, v_q.astype(qg.dtype),
        preferred_element_type=jnp.float32,
    )
    return out.reshape(B, H, d).astype(q.dtype)


def window_attention_int8_xla(
    q: jnp.ndarray,  # (B, T, H, d) — T-token verify window
    k_q: jnp.ndarray,  # (B, Hkv, S, d) int8
    k_s: jnp.ndarray,  # (B, Hkv, S) f32
    v_q: jnp.ndarray,
    v_s: jnp.ndarray,
    bias: jnp.ndarray,  # (B, T, S) additive f32
) -> jnp.ndarray:
    """Multi-query generalization of ``decode_attention_int8_xla`` for the
    speculative verify window: T queries per sequence attend the whole
    int8 cache (the window's own rows included — the caller scatters them
    first and masks causality through ``bias``). Same factored-scale
    formulation as the T == 1 path; tilings differ across shapes, so
    bf16 parity is up to rounding (lm/spec.py module docstring).
    Returns (B, T, H*d) in q.dtype.
    """
    B, T, H, d = q.shape
    Hkv = k_q.shape[1]
    G = H // Hkv
    qg = q.reshape(B, T, Hkv, G, d)
    logits = jnp.einsum(
        "bthgd,bhsd->bhtgs", qg, k_q.astype(qg.dtype),
        preferred_element_type=jnp.float32,
    )
    logits = (
        logits * (d ** -0.5) * k_s[:, :, None, None, :]
        + bias.astype(jnp.float32)[:, None, :, None, :]
    )
    p = jax.nn.softmax(logits, axis=-1)
    p = (p * v_s[:, :, None, None, :]).astype(qg.dtype)
    out = jnp.einsum(
        "bhtgs,bhsd->bthgd", p, v_q.astype(qg.dtype),
        preferred_element_type=jnp.float32,
    )
    return out.reshape(B, T, H * d).astype(q.dtype)


def quantize_kv(x: jnp.ndarray):
    """(..., d) -> int8 values + (...) f32 scales (per trailing vector)."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(xf / scale[..., None]), -127, 127).astype(jnp.int8)
    return q, scale


def reference_attention(q, k, v, length):
    """fp reference for tests: q (B,H,d), k/v (B,Hkv,S,d)."""
    B, H, d = q.shape
    Hkv, S = k.shape[1], k.shape[2]
    rep = H // Hkv
    k = jnp.repeat(k, rep, axis=1)
    v = jnp.repeat(v, rep, axis=1)
    logits = jnp.einsum("bhd,bhsd->bhs", q.astype(jnp.float32), k.astype(jnp.float32))
    logits = logits * (d**-0.5)
    mask = jnp.arange(S)[None, None, :] < length
    logits = jnp.where(mask, logits, -1e9)
    p = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhs,bhsd->bhd", p, v.astype(jnp.float32)).astype(q.dtype)
