"""Autoregressive decoding: jitted prefill + lax.while_loop decode.

Replaces the reference's HF ``GenerationMixin.generate`` calls
(``models/unified_llama.py:244-361``). Greedy decoding (the reference's
default), static shapes, early exit when every sequence hit EOS.

The AVS path needs per-step last-layer hidden states so ``<mask_i>`` token
embeddings can feed the segmentation head (``unified_llama.py:333-353``).
Instead of HF's output_hidden_states plumbing, the decode loop writes each
forward's (B, D) last-layer hidden into a preallocated buffer: hidden[j]
is the hidden of the forward whose *input* was token j-1 and whose output
is token j. The hidden that *processed* mask token j (what SegModule
consumes at train time, ``unified_llama.py:106,231``) is therefore
hidden[j+1]; ``capture_mask_hidden`` applies that shift.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from crab_tpu.core.config import DecoderConfig
from crab_tpu.lm.llama import KVCache, KVCacheQ, llama_apply


class GenerateResult(NamedTuple):
    tokens: jnp.ndarray  # (B, max_new) int32, pad_id after EOS
    hidden: jnp.ndarray  # (B, max_new, D) last-layer hidden per step
    num_generated: jnp.ndarray  # (B,) int32 incl. the EOS token
    prefill_logits: jnp.ndarray  # (B, V) fp32 logits at the last prompt pos


class _State(NamedTuple):
    step: jnp.ndarray  # () int32 — index of the token produced last
    tok: jnp.ndarray  # (B,) last produced token (input of next forward)
    pos: jnp.ndarray  # (B,) its position id + 1
    mask: jnp.ndarray  # (B, S) attendable cache slots
    cache: KVCache
    tokens: jnp.ndarray  # (B, max_new)
    hidden: jnp.ndarray  # (B, max_new, D)
    finished: jnp.ndarray  # (B,) bool
    key: jnp.ndarray  # PRNG key (sampling)


def sample_logits(
    logits: jnp.ndarray,
    key: jnp.ndarray,
    temperature: float = 0.0,
    top_k: int = 0,
    top_p: float = 1.0,
) -> jnp.ndarray:
    """One sampling step over (..., V) logits.

    temperature <= 0 -> greedy (the reference's HF ``generate`` default,
    ``models/unified_llama.py:244-361``); otherwise temperature sampling,
    optionally truncated by top-k and/or nucleus top-p (the knobs HF users
    can flip on the reference's ``GenerationConfig``). All branches are
    trace-time constants — the compiled program has no dead paths.
    """
    if temperature <= 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    scaled = logits.astype(jnp.float32) / temperature
    if top_k > 0:
        kth = jax.lax.top_k(scaled, top_k)[0][..., -1:]
        scaled = jnp.where(scaled < kth, -1e9, scaled)
    if top_p < 1.0:
        srt = jnp.sort(scaled, axis=-1)[..., ::-1]  # descending
        probs = jax.nn.softmax(srt, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # keep tokens whose *exclusive* cumulative mass is < top_p, so the
        # token that crosses the boundary stays (HF semantics: smallest set
        # with mass >= top_p); the argmax token always survives — pinned
        # explicitly so top_p == 0.0 means "keep only the top token"
        # rather than masking everything and sampling uniformly.
        keep = (cum - probs) < top_p
        keep = keep.at[..., 0].set(True)
        thresh = jnp.min(jnp.where(keep, srt, jnp.inf), axis=-1, keepdims=True)
        scaled = jnp.where(scaled < thresh, -1e9, scaled)
    return jax.random.categorical(key, scaled, axis=-1).astype(jnp.int32)


def generate(
    params,
    cfg: DecoderConfig,
    inputs_embeds: jnp.ndarray,  # (B, T, D) left-padded prompt embeddings
    attention_mask: jnp.ndarray,  # (B, T) 1 = real token
    position_ids: jnp.ndarray,  # (B, T)
    max_new_tokens: int,
    eos_id: int,
    pad_id: int = 0,
    temperature: float = 0.0,
    top_k: int = 0,
    top_p: float = 1.0,
    rng: Optional[jnp.ndarray] = None,
) -> GenerateResult:
    """temperature <= 0 -> greedy (the reference's default); otherwise
    temperature sampling, optionally top-k / nucleus-top-p truncated."""
    B, T, D = inputs_embeds.shape
    if rng is None:
        rng = jax.random.PRNGKey(0)

    def select(logits, key):
        return sample_logits(logits, key, temperature, top_k, top_p)
    S = T + max_new_tokens
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
        last_logit_only=True,  # skip the (B, T, V) fp32 logits tensor
    )
    last_logits = logits[:, -1]  # (B, V)
    rng, k0 = jax.random.split(rng)
    tok0 = select(last_logits, k0)

    tokens0 = jnp.full((B, max_new_tokens), pad_id, jnp.int32).at[:, 0].set(tok0)
    hidden0 = jnp.zeros((B, max_new_tokens, D), dtype)

    def body(s: _State) -> _State:
        # the incoming token occupies cache slot cache.length — unmask it
        mask = jax.lax.dynamic_update_slice(
            s.mask, jnp.ones((B, 1), jnp.int32), (0, s.cache.length)
        )
        embeds = jnp.take(params["embed"], s.tok, axis=0)[:, None, :].astype(dtype)
        logits, hid, cache, _ = llama_apply(
            params,
            cfg,
            embeds,
            attention_mask=mask,
            position_ids=s.pos[:, None],
            cache=s.cache,
        )
        key, sub = jax.random.split(s.key)
        tok = select(logits[:, -1], sub)
        emit = jnp.where(s.finished, pad_id, tok)
        tokens = jax.lax.dynamic_update_slice(s.tokens, emit[:, None], (0, s.step + 1))
        # hid[:, -1] is the hidden that processed s.tok (= token s.step) and
        # produced token s.step + 1 -> store at s.step + 1.
        hidden = jax.lax.dynamic_update_slice(
            s.hidden, hid[:, -1][:, None, :], (0, s.step + 1, 0)
        )
        return _State(
            step=s.step + 1,
            tok=tok,
            pos=s.pos + 1,
            mask=mask,
            cache=cache,
            tokens=tokens,
            hidden=hidden,
            finished=s.finished | (tok == eos_id),
            key=key,
        )

    init = _State(
        step=jnp.zeros((), jnp.int32),
        tok=tok0,
        pos=position_ids[:, -1] + 1,
        mask=full_mask,
        cache=cache,
        tokens=tokens0,
        hidden=hidden0,
        finished=tok0 == eos_id,
        key=rng,
    )
    final = jax.lax.while_loop(
        lambda s: (s.step < max_new_tokens - 1) & ~jnp.all(s.finished), body, init
    )

    num = jnp.sum(final.tokens != pad_id, axis=-1).astype(jnp.int32)
    return GenerateResult(final.tokens, final.hidden, num, last_logits)


def capture_mask_hidden(
    result: GenerateResult, mask_token_ids: Sequence[int], num_mask_tokens: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Gather hidden states for the ``<mask_i>`` tokens.

    For a mask token generated at index j, takes hidden[j+1] — the hidden
    of the forward that processed it (training-consistent; see module
    docstring). Returns (pred_embeddings (B, K, D), found (B,) bool).
    """
    tokens = result.tokens  # (B, N)
    B, N = tokens.shape
    is_mask = jnp.zeros_like(tokens, dtype=bool)
    for mid in mask_token_ids:
        is_mask = is_mask | (tokens == mid)
    idx = jnp.argsort(~is_mask, axis=-1, stable=True)[:, :num_mask_tokens]  # (B, K)
    found = jnp.sum(is_mask, axis=-1) >= num_mask_tokens
    gather_idx = jnp.minimum(idx + 1, N - 1)
    pred = jnp.take_along_axis(result.hidden, gather_idx[..., None], axis=1)
    return pred, found
