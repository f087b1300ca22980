"""Quantify the relay tunnel's H2D bandwidth and its overlap with
remote execution (2026-08-19, round 4).

micro_relay.py found 24 MB H2D + reduce + fetch = ~1.8 s best — ~14 MB/s
wire bandwidth. The bench headline batch ships ~34 MB (16 clips x
(10x224x224x3 RGB + 10x32000 PCM16)) and measures 2486 ms/batch: almost
exactly the wire time, i.e. the streamed headline row may be
TUNNEL-bandwidth-bound, not device-bound.

This tool answers:
  1. wire bandwidth precisely (slope between two payload sizes);
  2. whether an H2D initiated while the device is busy overlaps remote
     execution (pipelined stream) or serializes behind it.

Run: python tools/micro_wire.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    rng = np.random.default_rng(0)
    mb8 = rng.integers(0, 255, (8 << 20,), np.uint8)
    mb24 = rng.integers(0, 255, (24 << 20,), np.uint8)
    red = jax.jit(lambda a: jnp.sum(a, dtype=jnp.int32))

    def ship(arr, reps=3):
        int(red(jnp.asarray(arr)))  # warm the program
        best = 1e9
        for _ in range(reps):
            t0 = time.time()
            int(red(jnp.asarray(arr)))
            best = min(best, time.time() - t0)
        return best

    t8, t24 = ship(mb8), ship(mb24)
    bw = (24 - 8) / (t24 - t8)
    print(f"H2D+reduce+fetch: 8MB {t8*1000:.0f} ms, 24MB {t24*1000:.0f} ms")
    print(f"wire bandwidth (slope): {bw:.1f} MB/s; fixed {t8 - 8/bw:.3f} s")

    # ---- overlap: dispatch a ~1.5 s device-bound program, then
    # immediately upload 24 MB and run a second program on it. If H2D
    # overlaps execution, total ~= max(exec, wire); if it serializes,
    # total ~= exec + wire.
    x = jnp.asarray(rng.standard_normal((4096, 4096)).astype(np.float32))

    def heavy_fn(a):
        def body(i, acc):
            return acc @ a * 1e-3
        return jax.lax.fori_loop(0, 360, body, a)[0, 0]

    heavy = jax.jit(heavy_fn)
    float(heavy(x))  # warm
    t0 = time.time()
    float(heavy(x))
    exec_s = time.time() - t0
    print(f"heavy program alone: {exec_s*1000:.0f} ms")

    int(red(jnp.asarray(mb24)))  # warm reduce at this shape
    t0 = time.time()
    h = heavy(x)          # dispatch (lazy)
    d = red(jnp.asarray(mb24))  # upload while (maybe) busy
    float(h)
    int(d)
    both = time.time() - t0
    print(
        f"heavy + 24MB H2D interleaved: {both*1000:.0f} ms "
        f"(serial would be ~{(exec_s + t24)*1000:.0f}, "
        f"overlapped ~{max(exec_s, t24)*1000:.0f})"
    )

    # reversed completion order: fetch the upload-dependent result first
    t0 = time.time()
    h = heavy(x)
    d = red(jnp.asarray(mb24))
    int(d)
    float(h)
    both2 = time.time() - t0
    print(f"  (fetch upload-side first): {both2*1000:.0f} ms")


if __name__ == "__main__":
    main()
