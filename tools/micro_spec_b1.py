"""Batch-1 spec_k sweep for the interactive-latency row (round 4).

The 64-token batch-1 spec p50 is ~530 ms and decode-bound: each verify
forward at B=1 costs one ~7 GB weight read (~12-15 ms) regardless of k,
so UNLIKE the batch-16 case (k=4 sweet spot; tools/micro_spec500.py)
higher k may win at batch 1 — more drafts verified per weight read at
almost no extra cost. This sweeps k over the bench's batch-1 row.

Usage: [B1_KS=4,6,8,12] python tools/micro_spec_b1.py
"""
import dataclasses
import json
import os
import sys
import time
import zlib

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

KS = tuple(int(k) for k in os.environ.get("B1_KS", "4,8,12").split(","))
MAX_NEW = int(os.environ.get("B1_TOKENS", "64"))


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from bench_serve import BenchTokenizer, register_bench_task, serving_model
    from crab_tpu.runtime.engine import InferenceEngine
    from crab_tpu.tasks import registry

    cfg, special, params = serving_model()
    cfg = cfg.replace(
        decoder=dataclasses.replace(cfg.decoder, kv_quant=True)
    )
    base = InferenceEngine(
        cfg, params, BenchTokenizer(special), special, eos_id=2, pad_id=0,
        pack_donate=True,
    )
    del params
    register_bench_task()
    registry.TASKS["bench-avqa-64"] = dataclasses.replace(
        registry.TASKS["bench-avqa"], name="bench-avqa-64",
        max_new_tokens=MAX_NEW,
    )

    rng = np.random.default_rng(0)
    sample = {
        "question": "What is the left instrument of the first sounding instrument?",
        "media": {
            "video_yuv": rng.integers(0, 256, (10, 336, 224)).astype(np.uint8),
            "audio": (rng.standard_normal((10, 32000)) * 0.05).astype(np.float32),
        },
    }

    res = {}
    for k in KS:
        eng = InferenceEngine(
            cfg, base.params, BenchTokenizer(special), special,
            eos_id=2, pad_id=0, pack=False, spec_k=k,
        )
        t0 = time.time()
        eng.run("bench-avqa-64", [sample])
        print(f"# k={k} compile+first: {time.time()-t0:.1f}s", file=sys.stderr)
        lats = []
        for _ in range(7):
            t0 = time.time()
            eng.run("bench-avqa-64", [sample])
            lats.append((time.time() - t0) * 1000)
        p50 = float(np.percentile(lats, 50))
        res[k] = round(p50, 1)
        print(f"k={k}: p50 {p50:.0f} ms  all {[round(x) for x in lats]}")
    print(json.dumps(res))


if __name__ == "__main__":
    main()
