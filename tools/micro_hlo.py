"""Inspect the optimized HLO of one decode step: does XLA materialize a
bf16 copy of the int8 weights (convert outside the dot fusion)?"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import re
import sys

import jax
import jax.numpy as jnp

from crab_tpu.core.config import crab_7b
from crab_tpu.lm.llama import KVCacheQ, llama_apply
from crab_tpu.lm.quant import init_llama_int8
import dataclasses

cfg = dataclasses.replace(crab_7b().decoder, kv_quant=True, num_layers=2)
B, S = 8, 832

params = jax.eval_shape(lambda k: init_llama_int8(k, cfg), jax.random.PRNGKey(0))
cache = jax.eval_shape(lambda: KVCacheQ.zeros(cfg, B, S, jnp.bfloat16))
emb = jax.ShapeDtypeStruct((B, 1, cfg.hidden_size), jnp.bfloat16)
mask = jax.ShapeDtypeStruct((B, S), jnp.int32)
pos = jax.ShapeDtypeStruct((B, 1), jnp.int32)


def step(p, e, m, po, c):
    logits, _, c2, _ = llama_apply(
        p, cfg, e, attention_mask=m, position_ids=po, cache=c
    )
    return logits, c2


lowered = jax.jit(step).lower(params, emb, mask, pos, cache)
compiled = lowered.compile()
txt = compiled.as_text()
print(f"HLO length: {len(txt)} chars", file=sys.stderr)

# find convert ops s8 -> bf16/f32 and whether they live inside fusions
conv_lines = [
    ln.strip() for ln in txt.splitlines() if re.search(r"convert.*s8", ln)
]
print(f"s8 convert lines: {len(conv_lines)}")
for ln in conv_lines[:20]:
    print("  ", ln[:160])

# big buffers: allocation lines from memory analysis
ma = compiled.memory_analysis()
print("memory analysis:", ma)

# dots with s8 operand (fused) — look at fusion computations containing
# both a convert from s8 and a dot
fusions = re.findall(r"%fused_computation[^{]*\{[^}]*\}", txt, re.S)
n_fused_deq_dot = 0
for f in fusions:
    if re.search(r"convert.*s8", f) and "dot(" in f:
        n_fused_deq_dot += 1
print(f"fusions containing s8 convert + dot: {n_fused_deq_dot}")

with open("/tmp/decode_step.hlo", "w") as f:
    f.write(txt)
print("wrote /tmp/decode_step.hlo")
