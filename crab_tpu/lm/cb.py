"""Continuous-batching decode core: per-slot KV lengths, chunked steps.

The batch engine (runtime/engine.py) decodes whole same-shape batches in
lock-step — the reference's model too (batch 8, one generate call:
``inference_hyper_lora.py:1477``). Production serving mixes requests of
different lengths arriving at different times; idling a whole batch on
its longest member wastes chip time. This module gives the decoder a
slot abstraction:

  - one persistent (L, N, S_max, ...) KV cache holds N independent
    sequences, each with its own write index / position / activity bit;
  - ``cb_prefill`` runs a normal left-padded prefill for ONE request and
    returns the (L, 1, T_pad, ...) cache slice to deposit into a slot;
  - ``cb_decode_chunk`` advances ALL active slots K tokens in one
    compiled program (K amortizes host round trips; slots that hit EOS
    mid-chunk stop writing and emit pads).

Greedy decoding is token-identical to lm/generate.py for each request
(tests/test_continuous.py) — continuous batching changes scheduling,
never results. ``capture_hidden`` returns each step's final-norm hidden
state so the AVS seg head (mask-token hidden capture) works here too.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from crab_tpu.core.config import DecoderConfig
from crab_tpu.core.layers import rms_norm
from crab_tpu.lm.generate import sample_logits
from crab_tpu.lm.llama import (
    KVCache,
    NEG_INF,
    _apply_rope,
    _attention,
    _proj,
    _rope,
    decode_mlp_block,
    decode_qkv_proj,
    llama_apply,
    lm_head_logits,
)


class SlotState(NamedTuple):
    """Device-side per-slot decode state (host keeps the request map)."""

    k: jnp.ndarray  # (L, N, S_max, Hkv, hd)
    v: jnp.ndarray  # (L, N, S_max, Hkv, hd)
    bitmap: jnp.ndarray  # (N, S_max) int32 — attendable cache rows
    widx: jnp.ndarray  # (N,) int32 — next cache row to write
    pos: jnp.ndarray  # (N,) int32 — rope position of the next token
    tok: jnp.ndarray  # (N,) int32 — last emitted token (next input)
    active: jnp.ndarray  # (N,) bool
    hist: jnp.ndarray  # (N, S_max) int32 — token id at each cache row
    #   (-1 at feature-splice/pad rows); prompt ids come from deposit,
    #   decode steps append their input token. Feeds the n-gram draft
    #   lookup in lm/spec.py — text history IS the draft model.

    @classmethod
    def zeros(cls, cfg: DecoderConfig, slots: int, max_len: int, dtype):
        shape = (cfg.num_layers, slots, max_len, cfg.num_kv_heads, cfg.head_dim)
        return cls(
            jnp.zeros(shape, dtype),
            jnp.zeros(shape, dtype),
            jnp.zeros((slots, max_len), jnp.int32),
            jnp.zeros((slots,), jnp.int32),
            jnp.zeros((slots,), jnp.int32),
            jnp.zeros((slots,), jnp.int32),
            jnp.zeros((slots,), bool),
            jnp.full((slots, max_len), -1, jnp.int32),
        )


class SlotStateQ(NamedTuple):
    """int8-KV slot state — the KVCacheQ of the slot world.

    Same host semantics as SlotState; the K/V rows are stored int8 with
    per-row fp32 scales in the (L, N, Hkv, S, d) layout that
    ``ops.decode_attention`` reads (scales factor out of both attention
    contractions, so decode stays mixed bf16 x s8 with no dequant copy).
    Halves slot-cache HBM — double the slots/max_len per chip — and makes
    the continuous engine's memory story match the batch engine's
    ``kv_quant`` mode, with which it is token-identical (same per-row
    quantizer, same XLA attention formulation; tests/test_continuous.py).
    """

    k_q: jnp.ndarray  # (L, N, Hkv, S_max, hd) int8
    k_s: jnp.ndarray  # (L, N, Hkv, S_max) f32
    v_q: jnp.ndarray
    v_s: jnp.ndarray
    bitmap: jnp.ndarray  # (N, S_max) int32
    widx: jnp.ndarray  # (N,) int32
    pos: jnp.ndarray  # (N,) int32
    tok: jnp.ndarray  # (N,) int32
    active: jnp.ndarray  # (N,) bool
    hist: jnp.ndarray  # (N, S_max) int32

    @classmethod
    def zeros(cls, cfg: DecoderConfig, slots: int, max_len: int, dtype=None):
        vshape = (cfg.num_layers, slots, cfg.num_kv_heads, max_len, cfg.head_dim)
        sshape = (cfg.num_layers, slots, cfg.num_kv_heads, max_len)
        return cls(
            jnp.zeros(vshape, jnp.int8),
            jnp.zeros(sshape, jnp.float32),
            jnp.zeros(vshape, jnp.int8),
            jnp.zeros(sshape, jnp.float32),
            jnp.zeros((slots, max_len), jnp.int32),
            jnp.zeros((slots,), jnp.int32),
            jnp.zeros((slots,), jnp.int32),
            jnp.zeros((slots,), jnp.int32),
            jnp.zeros((slots,), bool),
            jnp.full((slots, max_len), -1, jnp.int32),
        )


def cb_prefill(
    params,
    cfg: DecoderConfig,
    inputs_embeds: jnp.ndarray,  # (1, T_pad, D) left-padded prompt
    attention_mask: jnp.ndarray,  # (1, T_pad)
    position_ids: jnp.ndarray,  # (1, T_pad)
    temperature: float = 0.0,
    top_k: int = 0,
    top_p: float = 1.0,
    rng: jnp.ndarray | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One request's prefill -> (k (L,1,T,Hkv,hd), v, first_tok (1,), next_pos (1,)).

    Reuses the standard prefill path with a T_pad-long cache; the caller
    deposits the slices into slot rows [0, T_pad) and the bitmap gets the
    attention mask (left pads stay masked forever — bucketing waste, not
    correctness)."""
    B, T = inputs_embeds.shape[:2]
    cache = KVCache.zeros(cfg, B, T, inputs_embeds.dtype)
    logits, _, cache, _ = llama_apply(
        params,
        cfg,
        inputs_embeds,
        attention_mask=attention_mask,
        position_ids=position_ids,
        cache=cache,
        last_logit_only=True,
    )
    if rng is None:
        rng = jax.random.PRNGKey(0)
    first = sample_logits(logits[:, -1], rng, temperature, top_k, top_p)  # (1,)
    next_pos = position_ids[:, -1] + 1
    return cache.k, cache.v, first, next_pos


def deposit(
    state: SlotState, slot: int, k, v, mask_row, first_tok, next_pos,
    hist_row=None,
):
    """Write a prefilled request into slot `slot` (host-driven, jittable).

    ``k``/``v`` are the bf16 (L, 1, T, Hkv, hd) prefill cache slices from
    ``cb_prefill`` for either state flavor; a SlotStateQ target quantizes
    them per row on the way in (identical quantizer to the batch engine's
    KVCacheQ prefill, so tokens stay bit-comparable across engines).

    ``hist_row`` (1, T) int32: prompt token ids with -1 at feature-splice
    and pad rows (None -> all -1: the slot still decodes correctly, the
    spec-decode draft lookup just can't match into the prompt)."""
    T = k.shape[2]
    if hist_row is None:
        hist_row = jnp.full((1, T), -1, jnp.int32)
    if isinstance(state, SlotStateQ):
        from crab_tpu.ops.decode_attention import quantize_kv

        kq, ks = quantize_kv(k.transpose(0, 1, 3, 2, 4))  # (L,1,Hkv,T,hd)
        vq, vs = quantize_kv(v.transpose(0, 1, 3, 2, 4))
        kv_fields = dict(
            k_q=jax.lax.dynamic_update_slice(
                state.k_q, kq, (0, slot, 0, 0, 0)
            ),
            k_s=jax.lax.dynamic_update_slice(state.k_s, ks, (0, slot, 0, 0)),
            v_q=jax.lax.dynamic_update_slice(
                state.v_q, vq, (0, slot, 0, 0, 0)
            ),
            v_s=jax.lax.dynamic_update_slice(state.v_s, vs, (0, slot, 0, 0)),
        )
    else:
        kv_fields = dict(
            k=jax.lax.dynamic_update_slice(state.k, k, (0, slot, 0, 0, 0)),
            v=jax.lax.dynamic_update_slice(state.v, v, (0, slot, 0, 0, 0)),
        )
    return state._replace(
        **kv_fields,
        bitmap=jax.lax.dynamic_update_slice(
            state.bitmap,
            jnp.pad(
                mask_row.astype(jnp.int32),
                ((0, 0), (0, state.bitmap.shape[1] - T)),
            ),
            (slot, 0),
        ),
        widx=state.widx.at[slot].set(T),
        pos=state.pos.at[slot].set(next_pos[0]),
        tok=state.tok.at[slot].set(first_tok[0]),
        active=state.active.at[slot].set(True),
        hist=jax.lax.dynamic_update_slice(
            state.hist,
            jnp.pad(
                hist_row.astype(jnp.int32),
                ((0, 0), (0, state.hist.shape[1] - T)),
                constant_values=-1,
            ),
            (slot, 0),
        ),
    )


def retire(state: SlotState, slot: int) -> SlotState:
    """Free a slot: clear its bitmap/activity (cache rows are dead data)."""
    return state._replace(
        bitmap=state.bitmap.at[slot].set(0),
        widx=state.widx.at[slot].set(0),
        active=state.active.at[slot].set(False),
        hist=state.hist.at[slot].set(-1),
    )


def cb_decode_chunk(
    params, cfg: DecoderConfig, state: SlotState, chunk: int, eos_id: int,
    pad_id: int = 0, capture_hidden: bool = False,
    temperature: float = 0.0, top_k: int = 0, top_p: float = 1.0,
    rng: jnp.ndarray | None = None,
):
    """Advance every active slot up to `chunk` tokens in one program.

    Returns (new_state, tokens (N, chunk), emitted (N,)[, hidden]) —
    ``emitted`` is the count of valid tokens per slot this chunk (a real
    token may equal pad_id, so the host must use the count, not sentinel
    values). The first emitted token is the NEXT token after state.tok
    (state.tok itself was emitted by prefill or the previous chunk).

    ``capture_hidden``: also return the final-norm hidden state of each
    step, (N, chunk, D) — hidden[:, i] is the forward that PROCESSED the
    token emitted at chunk index i-1 (or state.tok for i=0) and produced
    the token at index i, i.e. the same alignment as
    lm/generate.GenerateResult.hidden; the AVS seg head consumes it via
    capture_mask_hidden."""
    N, S = state.bitmap.shape
    quant = isinstance(state, SlotStateQ)
    dtype = params["embed"].dtype if quant else state.k.dtype

    def step(carry):
        st, out, hid_buf, emitted, i, key = carry
        key, sub = jax.random.split(key)
        # the incoming token occupies cache row widx for active slots
        at_widx = st.active[:, None] & (
            jnp.arange(S)[None, :] == st.widx[:, None]
        )
        bitmap = jnp.where(at_widx, 1, st.bitmap)
        hist = jnp.where(at_widx, st.tok[:, None], st.hist)
        emb = jnp.take(params["embed"], st.tok, axis=0)[:, None, :].astype(dtype)
        cos, sin = _rope(st.pos[:, None], cfg.head_dim, cfg.rope_theta, dtype)
        mask = jnp.where(bitmap[:, None, None, :] > 0, 0.0, NEG_INF).astype(
            jnp.float32
        )
        bias = mask[:, 0, 0, :]  # (N, S) for the int8 decode attention

        def layer_fn(carry_l, inputs):
            x, *kv_bufs = carry_l
            layer_params, layer_idx = inputs
            h = rms_norm(layer_params["attn_norm"], x, cfg.rms_norm_eps)
            q, k, v = decode_qkv_proj(layer_params, h, cfg)
            q = q.reshape(N, 1, cfg.num_heads, cfg.head_dim)
            k = k.reshape(N, 1, cfg.num_kv_heads, cfg.head_dim)
            v = v.reshape(N, 1, cfg.num_kv_heads, cfg.head_dim)
            q, k = _apply_rope(q, k, cos, sin)
            # per-slot scatter at row widx (frozen for finished slots by
            # writing into row widx anyway — masked out via bitmap)
            rows = jnp.arange(N)
            if quant:
                from crab_tpu.ops.decode_attention import (
                    decode_attention_int8_xla,
                    quantize_kv,
                )

                kqc, ksc, vqc, vsc = kv_bufs
                kq_new, ks_new = quantize_kv(k[:, 0])  # (N, Hkv, d), (N, Hkv)
                vq_new, vs_new = quantize_kv(v[:, 0])
                kqc = kqc.at[layer_idx, rows, :, st.widx].set(kq_new)
                ksc = ksc.at[layer_idx, rows, :, st.widx].set(ks_new)
                vqc = vqc.at[layer_idx, rows, :, st.widx].set(vq_new)
                vsc = vsc.at[layer_idx, rows, :, st.widx].set(vs_new)
                attn = decode_attention_int8_xla(
                    q[:, 0],
                    jax.lax.dynamic_index_in_dim(kqc, layer_idx, 0, False),
                    jax.lax.dynamic_index_in_dim(ksc, layer_idx, 0, False),
                    jax.lax.dynamic_index_in_dim(vqc, layer_idx, 0, False),
                    jax.lax.dynamic_index_in_dim(vsc, layer_idx, 0, False),
                    bias=bias,
                )
                attn = attn.reshape(N, 1, cfg.num_heads * cfg.head_dim)
                kv_bufs = [kqc, ksc, vqc, vsc]
            else:
                kc, vc = kv_bufs
                kc = kc.at[layer_idx, rows, st.widx].set(k[:, 0].astype(dtype))
                vc = vc.at[layer_idx, rows, st.widx].set(v[:, 0].astype(dtype))
                k_full = jax.lax.dynamic_index_in_dim(kc, layer_idx, 0, False)
                v_full = jax.lax.dynamic_index_in_dim(vc, layer_idx, 0, False)
                attn = _attention(
                    q, k_full, v_full, mask, cfg.num_heads, cfg.num_kv_heads
                )
                kv_bufs = [kc, vc]
            x = x + _proj(layer_params["o"], attn, cfg.lora)
            x = decode_mlp_block(layer_params, x, cfg)
            return (x, *kv_bufs), None

        init_bufs = (
            (st.k_q, st.k_s, st.v_q, st.v_s) if quant else (st.k, st.v)
        )
        (x, *kv_bufs), _ = jax.lax.scan(
            layer_fn,
            (emb, *init_bufs),
            (params["layers"], jnp.arange(cfg.num_layers)),
        )
        x = rms_norm(params["final_norm"], x, cfg.rms_norm_eps)
        if capture_hidden:
            hid_buf = jax.lax.dynamic_update_slice(
                hid_buf, x[:, -1][:, None, :], (0, i, 0)
            )
        logits = lm_head_logits(params, x[:, -1])
        # slots share the step key; categorical over the (N, V) batch still
        # draws independently per row
        nxt = sample_logits(logits, sub, temperature, top_k, top_p)
        emit = jnp.where(st.active, nxt, pad_id)
        out = jax.lax.dynamic_update_slice(out, emit[:, None], (0, i))
        emitted = emitted + st.active.astype(jnp.int32)
        new_active = st.active & (nxt != eos_id)
        kv_fields = (
            dict(zip(("k_q", "k_s", "v_q", "v_s"), kv_bufs))
            if quant
            else dict(zip(("k", "v"), kv_bufs))
        )
        st = st._replace(
            **kv_fields,
            bitmap=bitmap,
            widx=jnp.where(st.active, st.widx + 1, st.widx),
            pos=jnp.where(st.active, st.pos + 1, st.pos),
            tok=jnp.where(st.active, nxt, st.tok),
            active=new_active,
            hist=hist,
        )
        return st, out, hid_buf, emitted, i + 1, key

    if rng is None:
        rng = jax.random.PRNGKey(0)
    D = params["embed"].shape[1]
    out0 = jnp.full((N, chunk), pad_id, jnp.int32)
    hid0 = jnp.zeros((N, chunk, D) if capture_hidden else (N, 0, 0), dtype)
    st, out, hid, emitted, _, _ = jax.lax.while_loop(
        lambda c: (c[4] < chunk) & jnp.any(c[0].active),
        step,
        (
            state,
            out0,
            hid0,
            jnp.zeros((N,), jnp.int32),
            jnp.zeros((), jnp.int32),
            rng,
        ),
    )
    if capture_hidden:
        return st, out, emitted, hid
    return st, out, emitted
