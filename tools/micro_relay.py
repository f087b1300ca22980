"""Measure the axon relay's per-program round-trip and chaining behavior.

Questions this answers (2026-08-19, round 4):
  1. What does ONE trivial program dispatch+fetch cost (relay RTT floor)?
  2. Do two CHAINED programs (b = g(f(x)); fetch b) cost ~1 RTT or ~2?
     If ~1, splitting encode/generate into two programs is free and the
     938.6 ms bench fixed overhead is NOT program-launch overhead.
  3. What does an unfetched intermediate cost? (f's output stays remote)

Run: python tools/micro_relay.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np


def timed(label, fn, reps=5):
    fn()  # compile + warm
    best = 1e9
    vals = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        dt = time.time() - t0
        vals.append(dt * 1000)
        best = min(best, dt)
    print(f"{label}: best {best*1000:.1f} ms  all {[round(v,1) for v in vals]}")
    return best * 1000


def main():
    x = jnp.ones((256, 256), jnp.float32)

    f = jax.jit(lambda a: a * 1.000001 + 0.5)
    g = jax.jit(lambda a: a @ a * 0.001)
    h = jax.jit(lambda a: jnp.tanh(a) + 1.0)

    # 1. single program dispatch+fetch
    timed("1 program  (fetch scalar)", lambda: float(f(x)[0, 0]))

    # 2. two chained programs, fetch only the final
    timed("2 chained  (fetch scalar)", lambda: float(g(f(x))[0, 0]))

    # 3. three chained
    timed("3 chained  (fetch scalar)", lambda: float(h(g(f(x)))[0, 0]))

    # 4. two INDEPENDENT fetches back to back (2 full round trips)
    def two_fetches():
        float(f(x)[0, 0])
        float(g(x)[0, 0])
    timed("2 programs, 2 fetches", two_fetches)

    # 5. bigger fetch payload: full (256,256) f32 = 256 KB
    timed("1 program  (fetch 256KB)", lambda: np.asarray(f(x)).sum())

    # 6. H2D fresh input each call (upload on the critical path?)
    def fresh_input():
        xx = jnp.asarray(np.ones((256, 256), np.float32))
        return float(f(xx)[0, 0])
    timed("1 program, fresh H2D input", fresh_input)

    # 7. larger H2D: a bench-like media payload (16x10 frames uint8 ~24MB)
    big = np.random.default_rng(0).integers(0, 255, (16, 10, 224, 224, 3)).astype(np.uint8)
    s = jax.jit(lambda a: jnp.sum(a, dtype=jnp.int32))

    def big_h2d():
        return int(s(jnp.asarray(big)))
    timed("24MB H2D + reduce + fetch", big_h2d)


if __name__ == "__main__":
    main()
