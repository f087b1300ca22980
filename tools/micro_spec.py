"""Speculative-decode economics at 7B: verify-step cost vs plain step.

The weight-bound argument says a (B, k+1) verify forward should cost
barely more than a (B, 1) decode step, so speculation's speedup is
~(1 + accepted/steps). The bench's 500-token spec row gained only ~11%
(13.1 -> 11.8 s at B=16) — this tool separates the two possible causes:

  - low acceptance (drafts rarely match), or
  - an expensive verify step (window attention / scatter overheads
    eating the weight-read amortization).

Method: one manual prefill into the slot layout (same as spec_generate),
then time spec_decode_chunk at two chunk budgets and read back both
`emitted` and `accepted`; verify-step count = emitted - accepted (every
verify forward emits exactly one non-drafted token). Plain-step slope
from lm/generate at the same shapes for the denominator.

Run: KV8_B=16 python tools/micro_spec.py   (one TPU job at a time)
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import dataclasses
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from crab_tpu.core.config import crab_7b
from crab_tpu.lm.cb import SlotStateQ
from crab_tpu.lm.generate import generate
from crab_tpu.lm.llama import KVCacheQ, llama_apply
from crab_tpu.lm.pack import pack_decoder
from crab_tpu.lm.quant import init_llama_int8
from crab_tpu.lm.spec import spec_decode_chunk

B = int(_os.environ.get("KV8_B", "16"))
T = int(_os.environ.get("SPEC_T", "704"))
K = int(_os.environ.get("SPEC_K", "4"))
MAXLEN = int(_os.environ.get("SPEC_S", "896"))  # T + 80-budget + k slack

cfg = dataclasses.replace(crab_7b().decoder, kv_quant=True)
params = jax.jit(lambda k: init_llama_int8(k, cfg))(jax.random.PRNGKey(0))
params = pack_decoder(params, cfg, donate=True)

emb = jax.jit(
    lambda k: jax.random.normal(k, (B, T, cfg.hidden_size), jnp.bfloat16) * 0.02
)(jax.random.PRNGKey(1))
mask = jnp.ones((B, T), jnp.int32)
pos = jnp.broadcast_to(jnp.arange(T)[None], (B, T))


def plain_slope():
    def timed(max_new):
        f = jax.jit(
            lambda p, e: generate(
                p, cfg, e, mask, pos, max_new_tokens=max_new, eos_id=2, pad_id=0
            )
        )
        best = 1e9
        np.asarray(f(params, emb).tokens)
        for _ in range(2):
            t0 = time.time()
            np.asarray(f(params, emb).tokens)
            best = min(best, time.time() - t0)
        return best

    d16, d80 = timed(16), timed(80)
    return (d80 - d16) / 64.0 * 1000


@jax.jit
def make_state(p, e):
    """Prefill into the padded slot layout (spec_generate's recipe)."""
    cache = KVCacheQ.zeros(cfg, B, MAXLEN, e.dtype)
    full_mask = jnp.zeros((B, MAXLEN), jnp.int32).at[:, :T].set(mask)
    logits, _, cache, _ = llama_apply(
        p, cfg, e, attention_mask=full_mask, position_ids=pos,
        cache=cache, last_logit_only=True,
    )
    tok0 = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
    # history = synthetic ids so the draft lookup has material to match
    hist = jnp.full((B, MAXLEN), -1, jnp.int32).at[:, :T].set(
        jnp.broadcast_to(jnp.arange(T)[None] % 37 + 5, (B, T))
    )
    return SlotStateQ(
        k_q=cache.k_q, k_s=cache.k_s, v_q=cache.v_q, v_s=cache.v_s,
        bitmap=full_mask, widx=jnp.full((B,), T, jnp.int32),
        pos=pos[:, -1] + 1, tok=tok0,
        active=jnp.ones((B,), bool), hist=hist,
    )


def spec_run(chunk):
    # donate the slot state: without aliasing the program holds TWO
    # copies of the multi-GB int8 cache and OOMs next to the weights
    f = jax.jit(
        lambda st, p: spec_decode_chunk(
            p, cfg, st, chunk, eos_id=2, pad_id=0, spec_k=K
        ),
        donate_argnums=0,
    )
    st = make_state(params, emb)
    _, out, emitted, accepted = f(st, params)
    np.asarray(out)  # compile+first
    best, em, ac = 1e9, None, None
    for _ in range(2):
        st = make_state(params, emb)
        np.asarray(st.tok)  # prefill outside the timed region
        t0 = time.time()
        _, out, emitted, accepted = f(st, params)
        np.asarray(out)
        best = min(best, time.time() - t0)
        em, ac = np.asarray(emitted), np.asarray(accepted)
    return best, em, ac


ps = plain_slope()
print(f"plain decode slope: {ps:.2f} ms/step (B={B}, S~{T}+)")

t16, em16, ac16 = spec_run(16)
t80, em80, ac80 = spec_run(80)
# the while_loop runs until the SLOWEST row fills its budget: loop
# iterations = max over rows of per-row verify steps (emitted - accepted:
# every verify forward emits exactly one non-drafted token)
it16 = int((em16 - ac16).max())
it80 = int((em80 - ac80).max())
acc_pct = (ac80.sum() - ac16.sum()) / max(em80.sum() - em16.sum(), 1)
ms_per_verify = (t80 - t16) / max(it80 - it16, 1) * 1000
net_ms_per_tok = (t80 - t16) / (em80.mean() - em16.mean()) * 1000
print(
    f"acceptance {acc_pct:.1%}; loop iterations {it16} -> {it80} "
    f"for budgets 16 -> 80"
)
print(
    f"verify-forward cost: {ms_per_verify:.2f} ms/iter "
    f"({ms_per_verify / ps:.2f}x plain)"
)
print(f"net: spec {net_ms_per_tok:.2f} ms/token vs plain {ps:.2f}")
