"""Serving soak: repeated waves through the continuous engine.

Production concerns the one-shot benches can't see: token drift across
engine reuse (slot-state leakage between waves), wall-time degradation
(HBM fragmentation — observed on this chip when failed allocations
poison the arena), and host-memory growth. This drives WAVES x N_REQ
requests through one ContinuousEngine(pf=0, spec_k=4) instance and
asserts:

  - every wave's texts are identical to wave 1 (determinism + clean
    slot retirement; greedy spec decoding is deterministic per config),
  - no wave is > 1.5x slower than the fastest (fragmentation guard;
    generous because the relay adds wall jitter),
  - device memory stats (when the backend exposes them) do not grow
    wave over wave.

Run: python tools/soak_serve.py       (one TPU job at a time; ~5 min
     after the serving-bench compile cache is warm)
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import numpy as np

WAVES = int(_os.environ.get("SOAK_WAVES", "5"))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    # reuse the serving bench's model, tokenizer, and trace construction
    # so the soak hits the exact compiled programs the bench already
    # cached
    import bench_serve as bs
    from crab_tpu.runtime.engine import InferenceEngine
    from crab_tpu.runtime.continuous import ContinuousEngine

    cfg, special, params, eos_id = bs.serving_model()
    engine = InferenceEngine(
        cfg, params, bs.BenchTokenizer(special), special, eos_id=eos_id,
        pad_id=0, pack_donate=True,
    )
    del params

    bs.register_bench_task()

    rng = np.random.default_rng(bs.SEED)
    trace = bs.build_trace(rng, bs.N_REQ)

    cb = ContinuousEngine(engine, slots=8, max_len=1024, chunk=16, spec_k=4)

    def mem_stats():
        try:
            s = jax.local_devices()[0].memory_stats()
            return s.get("bytes_in_use")
        except Exception:
            return None

    ref_texts = None
    walls = []
    mems = []
    for w in range(WAVES):
        t0 = time.time()
        texts = cb.run(trace)
        walls.append(time.time() - t0)
        mems.append(mem_stats())
        print(f"# wave {w}: {walls[-1]:.1f}s mem={mems[-1]}", file=_sys.stderr)
        if ref_texts is None:
            ref_texts = texts
        else:
            assert texts == ref_texts, f"wave {w} tokens drifted from wave 0"
    timed = walls[1:]  # wave 0 pays compiles
    assert max(timed) < 1.5 * min(timed), f"wall degradation: {timed}"
    if mems[-1] is not None and mems[1] is not None:
        assert mems[-1] <= mems[1] * 1.05, f"device memory growth: {mems}"
    print(
        f"SOAK OK: {WAVES} waves x {bs.N_REQ} requests, walls "
        f"{[round(x,1) for x in walls]}, mem {mems[-1]}"
    )


if __name__ == "__main__":
    main()
