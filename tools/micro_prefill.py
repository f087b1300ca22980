"""Prefill efficiency at serving shapes: measured vs roofline.

bench.py's fixed_overhead at B=16 is ~1.0 s, of which encode is ~0.3 s —
the rest is prefill + dispatch. Roofline: 2 * 7e9 * B*T FLOPs over the
s8xs8 MXU (~394 TOPS on v5e) -> ~440 ms at B=16/T=768; bf16 would be
~880 ms. This tool times the RESIDENT prefill program (chained
fori_loop, relay rules from tools/README.md) with and without W8A8 to
see how close the serving path gets and how much the a8 path buys.

Run: PF_B=16 PF_T=768 python tools/micro_prefill.py
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
from crab_tpu.lm.llama import KVCache, KVCacheQ, llama_apply
from crab_tpu.lm.pack import pack_decoder
from crab_tpu.lm.quant import init_llama_int8

B = int(_os.environ.get("PF_B", "16"))
T = int(_os.environ.get("PF_T", "768"))


def measure(a8: bool, lora: bool = True, kvq: bool = True):
    cfg = dataclasses.replace(
        crab_7b().decoder, kv_quant=kvq, int8_activations=a8
    )
    if not lora:
        cfg = dataclasses.replace(cfg, lora=None)
    params = jax.jit(lambda k: init_llama_int8(k, cfg))(jax.random.PRNGKey(0))
    params = pack_decoder(params, cfg, donate=True)
    emb = jax.jit(
        lambda k: jax.random.normal(k, (B, T, cfg.hidden_size), jnp.bfloat16)
        * 0.02
    )(jax.random.PRNGKey(1))
    mask = jnp.ones((B, T), jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(T)[None], (B, T))

    def chain(n):
        def fn(p, e):
            def body(i, acc):
                cache_cls = KVCacheQ if kvq else KVCache
                cache = cache_cls.zeros(cfg, B, T, e.dtype)
                logits, _, _, _ = llama_apply(
                    p, cfg, e + (acc * 0).astype(e.dtype),
                    attention_mask=mask, position_ids=pos, cache=cache,
                    last_logit_only=True,
                )
                return acc + logits[0, -1, 0].astype(jnp.float32)
            return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))

        f = jax.jit(fn)
        float(f(params, emb))  # compile+first
        best = 1e9
        for _ in range(2):
            t0 = time.time()
            float(f(params, emb))
            best = min(best, time.time() - t0)
        return best

    t2, t6 = chain(2), chain(6)
    ms = (t6 - t2) / 4.0 * 1000
    tflop = 2 * 7.0e9 * B * T / 1e12
    print(
        f"a8={a8} lora={lora} kvq={kvq}: prefill {ms:.0f} ms resident "
        f"(B={B}, T={T}) -> {tflop / (ms / 1000):.0f} TFLOP/s effective"
    )
    del params
    return ms


import json as _json
grid = _os.environ.get(
    "PF_GRID", "a8;bf16;a8-nolora;a8-bf16kv"
).split(";")
res = {}
for g in grid:
    if g == "a8":
        res[g] = measure(True)
    elif g == "bf16":
        res[g] = measure(False)
    elif g == "a8-nolora":
        res[g] = measure(True, lora=False)
    elif g == "a8-bf16kv":
        res[g] = measure(True, kvq=False)
print(_json.dumps({k: round(v, 1) for k, v in res.items()}))
