"""Is the 2x int8 MXU rate reachable here at all? (round 4)

micro_prefill.py measured the packed W8A8 prefill at ~164 TFLOP/s
effective — barely above the v5e bf16 peak (197), nowhere near the
394 TOPS s8 rate. Before attacking the model code, measure the ceiling
on a PURE matmul at the prefill shape: s8xs8->s32 vs bf16 dots, chained
in one program (relay rules: tools/README.md).

Shapes: (M, K) x (K, N) with M = B*T = 12288, qkv/o K=N=4096 and the
gate-up fused N=22016 — the two conv shapes that carry the prefill.

Run: python tools/micro_mxu8.py
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

M = int(_os.environ.get("M8_M", str(16 * 768)))
SHAPES = [(4096, 4096), (4096, 22016)]


def bench(make_operands, dot, flops, n_hot=24):
    a, b = make_operands()

    def fn(a, b):
        def body(i, acc):
            # Two DCE traps, both hit by earlier versions of this probe
            # (they measured 1700+ "TFLOP/s", 9x the chip peak):
            # 1. an invariant dot gets hoisted out of the fori_loop —
            #    fold the data-dependent carry into the operand;
            # 2. consuming y[0,0] lets XLA strength-reduce the dot to
            #    ONE output element — consume ALL of y with a full
            #    reduce. The reduce re-reads y from HBM (~0.7 ms at the
            #    22016 shape), identical for every dtype row, so the
            #    bf16-vs-s8 ratio is clean even if the absolute TFLOP/s
            #    is slightly understated.
            aa = a.at[0, 0].set((i + acc * 0).astype(a.dtype)[()])
            y = dot(aa, b)
            return acc + jnp.sum(y, dtype=jnp.float32)

        return jax.lax.fori_loop(0, n_hot, body, jnp.zeros((), jnp.float32))

    f = jax.jit(fn)
    float(f(a, b))  # compile + warm
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        float(f(a, b))
        best = min(best, time.time() - t0)
    per = best / n_hot
    return per * 1e3, flops / per / 1e12


def main():
    res = {}
    for K, N in SHAPES:
        flops = 2.0 * M * K * N
        key = jax.random.PRNGKey(0)

        def mk_bf16():
            a = jax.random.normal(key, (M, K), jnp.bfloat16)
            b = jax.random.normal(key, (K, N), jnp.bfloat16)
            return a, b

        def mk_s8():
            a = jax.random.randint(key, (M, K), -127, 127, jnp.int8)
            b = jax.random.randint(key, (K, N), -127, 127, jnp.int8)
            return a, b

        ms, tf = bench(
            mk_bf16,
            lambda a, b: jax.lax.dot(a, b, precision=None),
            flops,
        )
        res[f"bf16_{K}x{N}"] = {"ms": round(ms, 2), "tflops": round(tf, 1)}
        print(f"bf16  {K}x{N}: {ms:.2f} ms  {tf:.0f} TFLOP/s")

        ms, tf = bench(
            mk_s8,
            lambda a, b: jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ),
            flops,
        )
        res[f"s8_{K}x{N}"] = {"ms": round(ms, 2), "tflops": round(tf, 1)}
        print(f"s8s32 {K}x{N}: {ms:.2f} ms  {tf:.0f} TOP/s")

        # s8 dot but bf16-typed output (epilogue convert in registers;
        # if the s32 HBM write is what caps the s8 rows, this shows it)
        ms, tf = bench(
            mk_s8,
            lambda a, b: jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.bfloat16,
            ),
            flops,
        )
        res[f"s8bf16_{K}x{N}"] = {"ms": round(ms, 2), "tflops": round(tf, 1)}
        print(f"s8bf16 {K}x{N}: {ms:.2f} ms  {tf:.0f} TOP/s")
    print(json.dumps(res))


if __name__ == "__main__":
    main()
