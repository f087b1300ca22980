"""Decode-step ablations: slope at (lora on/off) x (kv_quant on/off) x batch."""
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
from crab_tpu.lm.generate import generate
from crab_tpu.lm.quant import init_llama_int8

T = 704


def slope(B, kvq, lora, reps=2):
    cfg = crab_7b().decoder
    cfg = dataclasses.replace(cfg, kv_quant=kvq, lora=cfg.lora if lora else None)
    params = jax.jit(lambda k: init_llama_int8(k, cfg))(jax.random.PRNGKey(0))
    emb = jax.jit(
        lambda k: jax.random.normal(k, (B, T, cfg.hidden_size), jnp.bfloat16) * 0.02
    )(jax.random.PRNGKey(1))
    mask = jnp.ones((B, T), jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(T)[None], (B, T))

    def timed(max_new):
        f = jax.jit(
            lambda p, e: generate(
                p, cfg, e, mask, pos, max_new_tokens=max_new, eos_id=2, pad_id=0
            )
        )
        t0 = time.time()
        np.asarray(f(params, emb).tokens)
        c = time.time() - t0
        best = 1e9
        for _ in range(reps):
            t0 = time.time()
            np.asarray(f(params, emb).tokens)
            best = min(best, time.time() - t0)
        return best * 1000, c

    d16, c1 = timed(16)
    d80, c2 = timed(80)
    s = (d80 - d16) / 64.0
    print(
        f"B={B} kvq={int(kvq)} lora={int(lora)}: decode {s:.2f} ms/step, "
        f"prefill+ovh {d16 - 16*s:.0f} ms (compiles {c1:.0f}/{c2:.0f}s)",
        flush=True,
    )
    del params, emb
    return s


slope(8, True, False)   # no LoRA
slope(8, False, True)   # bf16 KV, XLA attention
slope(16, True, True)   # batch 16
