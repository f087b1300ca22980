"""Model-level decode slope with the XLA int8-KV path vs bf16 KV.

Full 7B generate (packed serving layout, int8 weights, MoE-LoRA) at two
decode lengths; slope = per-token device cost. Run at the bench prefill
(T=704) and near the 500-token budget's cache length (T=1100).
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
from crab_tpu.lm.generate import generate
from crab_tpu.lm.pack import pack_decoder
from crab_tpu.lm.quant import init_llama_int8

B = int(_os.environ.get("KV8_B", "8"))
base = crab_7b().decoder


def slope(T, kvq, kernel="xla", reps=2, unroll=1):
    cfg = dataclasses.replace(
        base, kv_quant=kvq, kv_kernel=kernel, scan_unroll=unroll
    )
    params = jax.jit(lambda k: init_llama_int8(k, cfg))(jax.random.PRNGKey(0))
    params = pack_decoder(params, cfg, donate=True)
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
        f"T={T} B={B} kvq={int(kvq)} kernel={kernel} unroll={unroll}: "
        f"decode {s:.2f} ms/step, "
        f"prefill+ovh {d16 - 16*s:.0f} ms (compiles {c1:.0f}/{c2:.0f}s)",
        flush=True,
    )
    for leaf in jax.tree_util.tree_leaves(params):
        try:
            leaf.delete()
        except Exception:
            pass
    return s


import sys

configs = sys.argv[1:] or ["704:1:xla", "704:0:xla", "1100:1:xla"]
for c in configs:
    parts = c.split(":")
    T, kvq, kernel = parts[0], parts[1], parts[2]
    unroll = int(parts[3]) if len(parts) > 3 else 1
    slope(int(T), kvq == "1", kernel, unroll=unroll)
