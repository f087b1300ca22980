"""Decode slope with the (tuned) W4A16 kernel at 7B — compare vs int8."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import dataclasses
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from crab_tpu.core.config import crab_7b
from crab_tpu.lm.generate import generate
from crab_tpu.lm.quant import init_llama_w4

B = int(_os.environ.get("W4_B", "8"))
T = int(_os.environ.get("W4_T", "704"))
cfg = dataclasses.replace(crab_7b().decoder, kv_quant=False)

params = jax.jit(lambda k: init_llama_w4(k, cfg))(jax.random.PRNGKey(0))
emb = jax.jit(
    lambda k: jax.random.normal(k, (B, T, cfg.hidden_size), jnp.bfloat16) * 0.02
)(jax.random.PRNGKey(1))
mask = jnp.ones((B, T), jnp.int32)
pos = jnp.broadcast_to(jnp.arange(T)[None], (B, T))


def timed(max_new, reps=2):
    f = jax.jit(
        lambda p, e: generate(
            p, cfg, e, mask, pos, max_new_tokens=max_new, eos_id=2, pad_id=0
        )
    )
    t0 = time.time()
    np.asarray(f(params, emb).tokens)
    print(f"  max_new={max_new}: compile+first {time.time()-t0:.1f}s", flush=True)
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        np.asarray(f(params, emb).tokens)
        best = min(best, time.time() - t0)
    print(f"  max_new={max_new}: {best*1000:.0f} ms", flush=True)
    return best * 1000


d16 = timed(16)
d80 = timed(80)
slope = (d80 - d16) / 64.0
print(f"W4A16 decode: {slope:.2f} ms/step (batch {B}); int8 reference: "
      f"15.06 ms/step packed")
