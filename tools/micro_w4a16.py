"""Time the Pallas W4A16 kernel at decode shape on the chip, vs int8-XLA."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from crab_tpu.ops.w4a16_matmul import quantize_w4, w4a16_matmul

R, D, O = 8, 4096, 11008
rng = np.random.default_rng(0)
w = rng.standard_normal((D, O)).astype(np.float32) * 0.02
wp_np, wg_np = quantize_w4(w)
wp, wg = jnp.asarray(wp_np), jnp.asarray(wg_np)
x = jnp.asarray(rng.standard_normal((R, D)).astype(np.float32) * 0.1, jnp.bfloat16)

# correctness on the chip
from crab_tpu.ops.w4a16_matmul import dequantize_w4
y = np.asarray(w4a16_matmul(x, wp, wg))
ref = np.asarray(x, np.float32) @ dequantize_w4(wp_np, wg_np)
print("chip rel err:", float(np.abs(y - ref).max() / np.abs(ref).max()))

N = 50

@jax.jit
def chain(x, wp, wg):
    def body(i, xx):
        y = w4a16_matmul(xx, wp, wg)
        return jnp.tanh(y[:, :D]).astype(jnp.bfloat16) * 0.01
    return jnp.sum(jax.lax.fori_loop(0, N, body, x).astype(jnp.float32))

float(np.asarray(chain(x, wp, wg)))
t0 = time.time()
float(np.asarray(chain(x, wp, wg)))
dt = (time.time() - t0) * 1000 / N
print(f"w4a16 kernel: {dt:.3f} ms/iter ({wp.size / (dt/1e3) / 1e9:.1f} GB/s packed)")

# int8 XLA comparison (same shape)
wq8 = jnp.asarray(
    np.clip(np.round(w / (np.abs(w).max(0, keepdims=True) / 127)), -127, 127),
    jnp.int8,
)
s8 = jnp.asarray(np.abs(w).max(0, keepdims=True) / 127, jnp.float32)

@jax.jit
def chain8(x, wq, ws):
    def body(i, xx):
        y = (
            jax.lax.dot_general(
                xx, wq.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            * ws
        )
        return jnp.tanh(y[:, :D]).astype(jnp.bfloat16) * 0.01
    return jnp.sum(jax.lax.fori_loop(0, N, body, x).astype(jnp.float32))

float(np.asarray(chain8(x, wq8, s8)))
t0 = time.time()
float(np.asarray(chain8(x, wq8, s8)))
dt8 = (time.time() - t0) * 1000 / N
print(f"int8 XLA:     {dt8:.3f} ms/iter ({wq8.size / (dt8/1e3) / 1e9:.1f} GB/s)")
