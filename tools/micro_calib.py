"""Chip calibration through the (lazy) axon relay.

Every measurement is one jitted program containing a fori_loop of N
data-dependent iterations, forced by fetching a scalar — the only way to
time device work through the relay (block_until_ready is a no-op).
"""
import time
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)


def run(name, fn, *args, n=1, warm=True):
    if warm:
        float(np.asarray(fn(*args)))  # compile + one run
    t0 = time.time()
    out = float(np.asarray(fn(*args)))
    dt = (time.time() - t0) * 1000 / n
    print(f"{name}: {dt:.3f} ms/iter (out={out:.3g})", flush=True)
    return dt


N = 50

# 1. peak MXU: chained 4096^3 bf16 matmuls (137 GFLOP each)
A0 = jax.jit(lambda k: jax.random.normal(k, (4096, 4096), jnp.bfloat16) * 0.01)(
    jax.random.PRNGKey(1)
)

@jax.jit
def peak_mm(a):
    def body(i, x):
        return (x @ a) * 0.001
    return jnp.sum(jax.lax.fori_loop(0, N, body, a).astype(jnp.float32))

dt = run("matmul 4096^3 bf16", peak_mm, A0, n=N)
print(f"  -> {2 * 4096**3 / (dt / 1e3) / 1e12:.0f} TFLOP/s")

# 2. HBM bandwidth: chained full-array scale of 1 GiB (read+write 2 GiB)
B0 = jnp.ones((512, 1024, 1024), jnp.bfloat16)  # 1 GiB

@jax.jit
def bw(x):
    def body(i, y):
        return y * 1.0000001
    return jnp.sum(jax.lax.fori_loop(0, N, body, x)[0, 0, :8].astype(jnp.float32))

dt = run("scale 1GiB bf16", bw, B0, n=N)
print(f"  -> {2 * B0.size * 2 / (dt / 1e3) / 1e9:.0f} GB/s")
del B0

# 3. decode-shape matmul, int8 weights vs bf16 weights: (8,4096)@(4096,11008)
Bt, D, O = 8, 4096, 11008
x0 = jnp.ones((Bt, D), jnp.bfloat16) * 0.01
wq = jax.jit(
    lambda k: jax.random.randint(k, (D, O), -127, 128, dtype=jnp.int8)
)(jax.random.PRNGKey(0))
ws = jnp.full((1, O), 0.01, jnp.float32)
wb = jax.jit(lambda wq: wq.astype(jnp.bfloat16) * 0.01)(wq)

@jax.jit
def chain_int8(x, wq, ws):
    def body(i, xx):
        y = (
            jax.lax.dot_general(
                xx, wq, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            * ws
        )
        return jnp.tanh(y[:, :D]).astype(jnp.bfloat16) * 0.01
    return jnp.sum(jax.lax.fori_loop(0, N, body, x).astype(jnp.float32))

@jax.jit
def chain_bf16(x, wb):
    def body(i, xx):
        y = jax.lax.dot_general(xx, wb, (((1,), (0,)), ((), ())))
        return jnp.tanh(y[:, :D].astype(jnp.float32)).astype(jnp.bfloat16) * 0.01
    return jnp.sum(jax.lax.fori_loop(0, N, body, x).astype(jnp.float32))

dt = run("decode-shape int8 matmul", chain_int8, x0, wq, ws, n=N)
print(f"  -> reads {wq.size/1e6:.0f} MB -> {wq.size / (dt/1e3) / 1e9:.0f} GB/s")
dt = run("decode-shape bf16 matmul", chain_bf16, x0, wb, n=N)
print(f"  -> reads {2*wq.size/1e6:.0f} MB -> {2 * wq.size / (dt/1e3) / 1e9:.0f} GB/s")
