"""Does XLA stream int4 weights into the matmul like it does int8?

Compiles (x bf16 @ w int4) * scale at decode shape and inspects the
optimized HLO: if the conv's weight operand is s4 (or the convert lives
inside the conv fusion with no big temp), int4 weight-only decode is
viable — half the int8 bytes again.
"""
import re

import jax
import jax.numpy as jnp

D, O = 4096, 11008


def f(x, wq, ws):
    return (
        jax.lax.dot_general(
            x, wq.astype(x.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        * ws
    )


x = jax.ShapeDtypeStruct((8, D), jnp.bfloat16)
wq = jax.ShapeDtypeStruct((D, O), jnp.int4)
ws = jax.ShapeDtypeStruct((1, O), jnp.float32)

compiled = jax.jit(f).lower(x, wq, ws).compile()
txt = compiled.as_text()
ma = compiled.memory_analysis()
print("temp bytes:", ma.temp_size_in_bytes)
print("arg bytes:", ma.argument_size_in_bytes)
for ln in txt.splitlines():
    if "convolution" in ln or ("convert" in ln and "s4" in ln):
        print(ln.strip()[:200])
