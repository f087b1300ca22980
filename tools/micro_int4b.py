"""int4 via nibble-packed uint8 args + in-program bitcast to s4.

jax's client crashes (RecursionError) when an s4 array is a jit argument,
so the 4-bit weights travel as uint8[..., O/2] and become s4[..., O] via
lax.bitcast_convert_type inside the program. This probe checks:
  1. numerical correctness of the nibble order vs a numpy oracle
  2. the optimized HLO still feeds the conv an s4 operand (no big temp)
  3. timing at decode shape
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

D, O = 4096, 11008
rng = np.random.default_rng(0)
w4 = rng.integers(-7, 8, (D, O)).astype(np.int8)  # int4 values in int8
# pack: byte = (hi << 4) | (lo & 0xF); try lo = even index first
lo = w4[:, 0::2]
hi = w4[:, 1::2]
packed = ((hi.astype(np.uint8) << 4) | (lo.astype(np.uint8) & 0xF)).astype(np.uint8)
ws = np.full((1, O), 0.01, np.float32)
x = rng.standard_normal((8, D)).astype(np.float32) * 0.1


def unpack(wp):
    s4 = jax.lax.bitcast_convert_type(wp, jnp.int4)  # (D, O/2, 2)
    return s4.reshape(wp.shape[0], -1)


@jax.jit
def f(x, wp, ws):
    w = unpack(wp)
    return (
        jax.lax.dot_general(
            x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        * ws
    )


y = np.asarray(f(x, packed, ws))
ref = (x.astype(np.float32) @ w4.astype(np.float32)) * ws
err = np.abs(y - ref).max() / np.abs(ref).max()
print("rel err vs numpy oracle:", float(err))

comp = jax.jit(f).lower(
    jax.ShapeDtypeStruct(x.shape, jnp.float32),
    jax.ShapeDtypeStruct(packed.shape, jnp.uint8),
    jax.ShapeDtypeStruct(ws.shape, jnp.float32),
).compile()
ma = comp.memory_analysis()
print("temp bytes:", ma.temp_size_in_bytes)

# timing: chained in one program, fetch scalar
N = 50

@jax.jit
def chain(x, wp, ws):
    def body(i, xx):
        y = (
            jax.lax.dot_general(
                xx, unpack(wp).astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            )
            * ws
        )
        return jnp.tanh(y[:, :D]).astype(jnp.bfloat16) * 0.01
    return jnp.sum(jax.lax.fori_loop(0, N, body, x.astype(jnp.bfloat16)).astype(jnp.float32))


float(np.asarray(chain(x, packed, ws)))
t0 = time.time()
out = float(np.asarray(chain(x, packed, ws)))
dt = (time.time() - t0) * 1000 / N
print(f"packed-int4 decode-shape matmul: {dt:.3f} ms/iter "
      f"({packed.size / (dt/1e3) / 1e9:.0f} GB/s of packed bytes)")
