"""Self-speculative (prompt-lookup) decoding over the slot abstraction.

The decoder at serving batch sizes is weight-bound: one decode step reads
~6.7 GB of int8 weights to produce ONE token per sequence (tools/README.md).
A forward over T=k+1 tokens reads the same weights, so if k drafted tokens
can be verified in that one forward, accepted tokens are nearly free MXU
work. This module drafts WITHOUT an auxiliary model: the draft source is
the sequence's own token history (prompt + generated so far) — "prompt
lookup" / n-gram speculation, the assisted-generation mode HF and vLLM
ship for exactly this weight-bound regime. Templated Crab answers
("<answer>...</answer>", repeated event labels, AVS mask-token runs) are
rich in repeated n-grams, which is where this pays.

Greedy-only and LOSSLESS: every emitted token is an argmax of the real
model's logits given the true prefix — acceptance only decides how many
of them one program produces. The (N, k+1) verify forward's
reductions round differently from the single-token forward's, so a
numerically TIED argmax can resolve either way — the same
nondeterminism class as changing the batch size. Short streams are
pinned bit-identical by tests/test_spec.py; on degenerate random-weight
cyclic outputs a tie-flip was measured at token ~16 in fp32 (top-1/2
logit gap 8e-4, where the teacher-forced full forward agreed with the
SPEC token) and ~70-100 in bf16 on chip. Trained-model gaps at real
answer tokens are orders of magnitude wider.

Algorithm per loop step, all slots at once, static shapes throughout:
  1. draft: find the most recent earlier occurrence of the bigram
     (hist[widx-1], tok) in the slot's history; take the k tokens that
     followed it (unknown/absent -> -1, which can never match an argmax).
  2. verify: ONE forward over the (N, k+1) window [tok, draft...] with
     rope positions pos..pos+k, attending to the cache plus the causal
     in-window rows; KV rows are scattered per slot at widx+i.
  3. accept: m = leading draft/argmax matches; emit m+1 tokens, truncated
     at EOS and at the chunk budget; unmask/record exactly the accepted
     rows (rejected rows stay masked and are overwritten next step).

No reference counterpart (the reference decodes strictly one token per
forward via HF generate, ``inference_hyper_lora.py:1477``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from crab_tpu.core.config import DecoderConfig
from crab_tpu.core.layers import rms_norm
from crab_tpu.lm.cb import SlotState
from crab_tpu.lm.llama import (
    NEG_INF,
    KVCache,
    _apply_rope,
    _attention,
    _proj,
    _rope,
    decode_mlp_block,
    decode_qkv_proj,
    llama_apply,
    lm_head_logits,
)


def draft_lookup(hist: jnp.ndarray, widx: jnp.ndarray, tok: jnp.ndarray,
                 k: int) -> jnp.ndarray:
    """N-gram draft: (N, k) continuation tokens after the most recent
    earlier occurrence of the current suffix — longest-suffix-first
    ladder: the 4-gram (hist[widx-3..widx-1], tok) when it matches
    somewhere, else the trigram (hist[widx-2], hist[widx-1], tok), else
    the bigram (hist[widx-1], tok); -1 where no match. Longer-context
    matches draft better continuations on templated text (the standard
    prompt-lookup refinement), and every candidate is still verified, so
    the choice only moves acceptance, never correctness."""
    N, S = hist.shape
    ar = jnp.arange(S)[None, :]
    prev = jnp.take_along_axis(
        hist, jnp.maximum(widx - 1, 0)[:, None], axis=1
    )[:, 0]
    prev2 = jnp.take_along_axis(
        hist, jnp.maximum(widx - 2, 0)[:, None], axis=1
    )[:, 0]
    prev2 = jnp.where(widx >= 2, prev2, -1)
    prev3 = jnp.take_along_axis(
        hist, jnp.maximum(widx - 3, 0)[:, None], axis=1
    )[:, 0]
    prev3 = jnp.where(widx >= 3, prev3, -1)
    h_next = jnp.concatenate(
        [hist[:, 1:], jnp.full((N, 1), -1, jnp.int32)], axis=1
    )
    h_prev = jnp.concatenate(
        [jnp.full((N, 1), -1, jnp.int32), hist[:, :-1]], axis=1
    )
    h_prev2 = jnp.concatenate(
        [jnp.full((N, 2), -1, jnp.int32), hist[:, :-2]], axis=1
    )
    hit = (
        (hist == prev[:, None])
        & (h_next == tok[:, None])
        & (prev[:, None] >= 0)
        & (tok[:, None] >= 0)
        # at least one known continuation row: hist[j+2] written means
        # j+2 <= widx-1 (row widx-1 is the last token recorded so far)
        & (ar + 2 <= widx[:, None] - 1)
    )
    hit3 = hit & (h_prev == prev2[:, None]) & (prev2[:, None] >= 0)
    hit4 = hit3 & (h_prev2 == prev3[:, None]) & (prev3[:, None] >= 0)
    # most recent match: hit positions hold their own index, so the max
    # value IS the chosen j; longer-suffix matches win over shorter ones
    jstar4 = jnp.max(jnp.where(hit4, ar, -1), axis=1)  # (N,), -1 if none
    jstar3 = jnp.max(jnp.where(hit3, ar, -1), axis=1)
    jstar2 = jnp.max(jnp.where(hit, ar, -1), axis=1)
    jstar = jnp.where(
        jstar4 >= 0, jstar4, jnp.where(jstar3 >= 0, jstar3, jstar2)
    )
    has = jstar >= 0
    gidx = jnp.minimum(jnp.maximum(jstar, 0)[:, None] + 2 + jnp.arange(k), S - 1)
    draft = jnp.take_along_axis(hist, gidx, axis=1)
    return jnp.where(has[:, None], draft, -1)


def spec_decode_chunk(
    params, cfg: DecoderConfig, state: SlotState, chunk: int, eos_id: int,
    pad_id: int = 0, spec_k: int = 4, capture_hidden: bool = False,
):
    """Advance every active slot up to `chunk` tokens, k+1 positions per
    forward. Greedy only (speculation over sampled distributions needs
    rejection sampling; the engine enforces temperature == 0).

    Returns (state, tokens (N, chunk), emitted (N,), accepted (N,)
    [, hidden (N, chunk, D)]): same contract as ``cb_decode_chunk`` plus
    `accepted` = drafted tokens accepted this chunk (telemetry — emitted
    already counts them). Slots need spec_k rows of cache slack: the last
    verify window may scatter K/V up to row widx+spec_k (the admission
    check in runtime/continuous.py accounts for it).

    Works over both slot flavors: bf16 ``SlotState`` and int8
    ``SlotStateQ`` (rejected rows' quantized K/V are overwritten on the
    next verify, exactly like the bf16 rows)."""
    from crab_tpu.lm.cb import SlotStateQ

    N, S = state.bitmap.shape
    quant = isinstance(state, SlotStateQ)
    dtype = params["embed"].dtype if quant else state.k.dtype
    T = spec_k + 1
    ar_t = jnp.arange(T)
    rows = jnp.arange(N)

    def step(carry):
        st, out, hid_buf, emitted, accepted = carry
        draft = draft_lookup(st.hist, st.widx, st.tok, spec_k)  # (N, k)
        toks_in = jnp.concatenate([st.tok[:, None], draft], axis=1)  # (N, T)
        pos = st.pos[:, None] + ar_t[None, :]
        cos, sin = _rope(pos, cfg.head_dim, cfg.rope_theta, dtype)
        ar_s = jnp.arange(S)
        # query j attends the established cache plus in-window rows
        # widx..widx+j (causal inside the verify window); left-pad rows
        # stay masked via the bitmap
        win = (ar_s[None, None, :] >= st.widx[:, None, None]) & (
            ar_s[None, None, :] <= st.widx[:, None, None] + ar_t[None, :, None]
        )
        attend = (st.bitmap[:, None, :] > 0) | win  # (N, T, S)
        win_bias = jnp.where(attend, 0.0, NEG_INF).astype(jnp.float32)
        mask = win_bias[:, None]  # (N, 1, T, S) for the bf16 attention
        emb = jnp.take(
            params["embed"], jnp.maximum(toks_in, 0), axis=0
        ).astype(dtype)
        scat = st.widx[:, None] + ar_t[None, :]  # (N, T) KV scatter rows
        scat = jnp.minimum(scat, S - 1)  # full slots are inactive; clamp

        def layer_fn(carry_l, inputs):
            x, *kv_bufs = carry_l
            layer_params, layer_idx = inputs
            h = rms_norm(layer_params["attn_norm"], x, cfg.rms_norm_eps)
            q, k, v = decode_qkv_proj(layer_params, h, cfg)
            q = q.reshape(N, T, cfg.num_heads, cfg.head_dim)
            k = k.reshape(N, T, cfg.num_kv_heads, cfg.head_dim)
            v = v.reshape(N, T, cfg.num_kv_heads, cfg.head_dim)
            q, k = _apply_rope(q, k, cos, sin)
            if quant:
                from crab_tpu.ops.decode_attention import (
                    quantize_kv,
                    window_attention_int8_xla,
                )

                kqc, ksc, vqc, vsc = kv_bufs
                kq_new, ks_new = quantize_kv(k)  # (N,T,Hkv,d), (N,T,Hkv)
                vq_new, vs_new = quantize_kv(v)
                kqc = kqc.at[layer_idx, rows[:, None], :, scat].set(kq_new)
                ksc = ksc.at[layer_idx, rows[:, None], :, scat].set(ks_new)
                vqc = vqc.at[layer_idx, rows[:, None], :, scat].set(vq_new)
                vsc = vsc.at[layer_idx, rows[:, None], :, scat].set(vs_new)
                attn = window_attention_int8_xla(
                    q,
                    jax.lax.dynamic_index_in_dim(kqc, layer_idx, 0, False),
                    jax.lax.dynamic_index_in_dim(ksc, layer_idx, 0, False),
                    jax.lax.dynamic_index_in_dim(vqc, layer_idx, 0, False),
                    jax.lax.dynamic_index_in_dim(vsc, layer_idx, 0, False),
                    bias=win_bias,
                )
                kv_bufs = [kqc, ksc, vqc, vsc]
            else:
                kc, vc = kv_bufs
                kc = kc.at[layer_idx, rows[:, None], scat].set(k.astype(dtype))
                vc = vc.at[layer_idx, rows[:, None], scat].set(v.astype(dtype))
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
        x = rms_norm(params["final_norm"], x, cfg.rms_norm_eps)  # (N, T, D)
        logits = lm_head_logits(params, x)  # (N, T, V) fp32
        outt = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # (N, T)

        # acceptance: leading positions where the draft equals the argmax
        match = (outt[:, :-1] == draft) & (draft >= 0)  # (N, k)
        m = jnp.sum(jnp.cumprod(match.astype(jnp.int32), axis=1), axis=1)
        c = m + 1
        # EOS inside the accepted prefix ends the emission there
        in_c = ar_t[None, :] < c[:, None]
        is_eos = (outt == eos_id) & in_c
        first_eos = jnp.argmax(is_eos, axis=1)
        c = jnp.where(jnp.any(is_eos, axis=1), first_eos + 1, c)
        # chunk budget and inactivity
        c = jnp.minimum(c, chunk - emitted)
        c = jnp.where(st.active, c, 0)
        valid = ar_t[None, :] < c[:, None]  # (N, T)
        ended = jnp.any((outt == eos_id) & valid, axis=1)

        tgt = jnp.where(valid, emitted[:, None] + ar_t[None, :], chunk)
        out = out.at[rows[:, None], tgt].set(outt, mode="drop")
        if capture_hidden:
            hid_buf = hid_buf.at[rows[:, None], tgt].set(x, mode="drop")

        new_bitmap = st.bitmap | (
            (ar_s[None, :] >= st.widx[:, None])
            & (ar_s[None, :] < (st.widx + c)[:, None])
        ).astype(jnp.int32)
        hist_tgt = jnp.where(valid, scat, S)
        new_hist = st.hist.at[rows[:, None], hist_tgt].set(
            toks_in, mode="drop"
        )
        last = jnp.take_along_axis(
            outt, jnp.maximum(c - 1, 0)[:, None], axis=1
        )[:, 0]
        kv_fields = (
            dict(zip(("k_q", "k_s", "v_q", "v_s"), kv_bufs))
            if quant
            else dict(zip(("k", "v"), kv_bufs))
        )
        st = st._replace(
            **kv_fields,
            bitmap=new_bitmap,
            widx=st.widx + c,
            pos=st.pos + c,
            tok=jnp.where(c > 0, last, st.tok),
            active=st.active & ~ended,
            hist=new_hist,
        )
        return (
            st,
            out,
            hid_buf,
            emitted + c,
            accepted + jnp.maximum(c - 1, 0),
        )

    D = params["embed"].shape[1]
    out0 = jnp.full((N, chunk), pad_id, jnp.int32)
    hid0 = jnp.zeros((N, chunk, D) if capture_hidden else (N, 0, 0), dtype)
    st, out, hid, emitted, accepted = jax.lax.while_loop(
        lambda c: jnp.any(c[0].active & (c[3] < chunk)),
        step,
        (state, out0, hid0, jnp.zeros((N,), jnp.int32),
         jnp.zeros((N,), jnp.int32)),
    )
    if capture_hidden:
        return st, out, emitted, accepted, hid
    return st, out, emitted, accepted


def spec_generate(
    params,
    cfg: DecoderConfig,
    inputs_embeds: jnp.ndarray,  # (B, T, D) left-padded prompt embeddings
    attention_mask: jnp.ndarray,  # (B, T) 1 = real token
    position_ids: jnp.ndarray,  # (B, T)
    max_new_tokens: int,
    eos_id: int,
    pad_id: int = 0,
    spec_k: int = 4,
    prompt_hist: jnp.ndarray | None = None,  # (B, T) ids, -1 at splice/pad
):
    """Whole-batch speculative decoding with the lm/generate.py contract.

    Same inputs as ``generate`` (greedy only) and the same
    ``GenerateResult`` contract (bit-identical in fp32; see the module
    docstring for the bf16 tied-argmax caveat) — the batch engine swaps
    this in when speculation is enabled, so the evaluate CLI and bench
    get the multi-token-per-weight-read win without the slot scheduler. Internally: one standard
    prefill into a (T + max_new + spec_k)-row cache, then the slot-chunk
    verify loop with every batch row as a slot (all rows share widx = T;
    acceptance still advances per row).

    ``prompt_hist`` feeds the n-gram draft lookup with the prompt's text
    tokens (-1 at feature-splice and pad rows). None means drafts can
    only match the sequence's own generated tokens.

    ``cfg.kv_quant`` runs the whole thing over the int8 slot cache
    (``SlotStateQ`` + the windowed int8 attention): half the cache HBM,
    same tokens as the batch engine's kv_quant decode. With bf16 KV the
    tokens are bit-identical to ``generate``.
    """
    from crab_tpu.lm.cb import SlotStateQ
    from crab_tpu.lm.generate import GenerateResult
    from crab_tpu.lm.llama import KVCacheQ

    B, T, D = inputs_embeds.shape
    S = T + max_new_tokens + spec_k
    dtype = inputs_embeds.dtype

    cache_cls = KVCacheQ if cfg.kv_quant else KVCache
    cache = cache_cls.zeros(cfg, B, S, dtype)
    full_mask = jnp.zeros((B, S), jnp.int32).at[:, :T].set(attention_mask)
    logits, _, cache, _ = llama_apply(
        params,
        cfg,
        inputs_embeds,
        attention_mask=full_mask,
        position_ids=position_ids,
        cache=cache,
        last_logit_only=True,
    )
    last_logits = logits[:, -1]  # (B, V)
    tok0 = jnp.argmax(last_logits, axis=-1).astype(jnp.int32)

    hist = jnp.full((B, S), -1, jnp.int32)
    if prompt_hist is not None:
        hist = hist.at[:, :T].set(prompt_hist.astype(jnp.int32))
    common = dict(
        bitmap=full_mask,
        widx=jnp.full((B,), T, jnp.int32),
        pos=position_ids[:, -1] + 1,
        tok=tok0,
        active=tok0 != eos_id,
        hist=hist,
    )
    if cfg.kv_quant:
        # KVCacheQ's prefill already wrote quantized rows in the slot
        # layout (L, B, Hkv, S, d) — adopt its buffers directly
        state = SlotStateQ(
            k_q=cache.k_q, k_s=cache.k_s, v_q=cache.v_q, v_s=cache.v_s,
            **common,
        )
    else:
        state = SlotState(k=cache.k, v=cache.v, **common)

    chunk = max_new_tokens - 1
    if chunk > 0:
        _, out, emitted, _, hid = spec_decode_chunk(
            params, cfg, state, chunk, eos_id, pad_id,
            spec_k=spec_k, capture_hidden=True,
        )
    else:
        out = jnp.zeros((B, 0), jnp.int32)
        emitted = jnp.zeros((B,), jnp.int32)
        hid = jnp.zeros((B, 0, D), dtype)

    # generate()'s layout: tokens[0] = tok0; hidden[j] (j >= 1) is the
    # forward that processed token j-1 (hidden[0] is never written there
    # and stays zero). Chunk index i maps to final index i + 1, and
    # chunk hid[i] is the forward that processed final token i — the same
    # alignment, shifted by the prepended first token.
    tokens = jnp.concatenate([tok0[:, None], out], axis=1)
    hidden = jnp.concatenate([jnp.zeros((B, 1, D), dtype), hid], axis=1)
    num = jnp.sum(tokens != pad_id, axis=-1).astype(jnp.int32)
    return GenerateResult(tokens, hidden, num, last_logits)
