#!/usr/bin/env python
"""Sweep spec_k on the 500-token batch-16 row (median-of-3 per k).

The k sweep recorded in tools/README.md (k=4 -> 1.71, k=6 -> 1.35,
k=8 -> 1.16) predates the 4-gram draft ladder (lm/spec.draft_lookup);
longer-context matching changes the acceptance-vs-window-cost tradeoff,
so re-measure before keeping k=4 as the default.

Usage: [SPEC_KS=4,6,8] python tools/micro_spec500.py
"""

import dataclasses
import json
import os
import sys
import time
import zlib

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 16
KS = tuple(int(k) for k in os.environ.get("SPEC_KS", "4,6,8").split(","))


def main():
    import jax
    import jax.numpy as jnp

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from crab_tpu.core.config import crab_7b
    from crab_tpu.encoders.beats import init_beats
    from crab_tpu.encoders.clip_vit import init_clip_vit
    from crab_tpu.encoders.projectors import init_projector
    from crab_tpu.fusion.tokens import SpecialTokens
    from crab_tpu.lm.quant import init_llama_int8
    from crab_tpu.runtime.engine import InferenceEngine
    from crab_tpu.tasks import registry

    cfg = crab_7b().replace(compute_dtype="bfloat16", param_dtype="bfloat16")
    cfg = cfg.replace(
        decoder=dataclasses.replace(
            cfg.decoder, kv_quant=True, int8_activations=True
        )
    )
    special = SpecialTokens(base_vocab=32000)

    @jax.jit
    def init_all(key):
        ks = jax.random.split(key, 5)
        return {
            "vision": init_clip_vit(ks[0], cfg.vision, jnp.bfloat16),
            "audio": init_beats(ks[1], cfg.audio, jnp.bfloat16),
            "vl_projector": init_projector(
                ks[2], cfg.vl_projector, cfg.decoder.hidden_size, jnp.bfloat16
            ),
            "al_projector": init_projector(
                ks[3], cfg.al_projector, cfg.decoder.hidden_size, jnp.bfloat16
            ),
            "decoder": init_llama_int8(ks[4], cfg.decoder),
        }

    t0 = time.time()
    params = init_all(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    print(f"# init: {time.time()-t0:.1f}s", file=sys.stderr)

    class Tok:
        def encode(self, text):
            return [
                special.token_to_id.get(w, 7 + (zlib.crc32(w.encode()) % 20000))
                for w in text.replace(">", "> ").replace("<", " <").split()
            ]

        def decode(self, ids):
            return " ".join(str(i) for i in ids)

    t = registry.TaskSpec(
        "bench-avqa-500",
        lambda s: registry.prompts.avqa_instruction(s["question"]),
        lambda s: s["media"],
        dict(registry.TASKS["avqa"].feature_lens),
        max_new_tokens=500,
    )
    registry.TASKS["bench-avqa-500"] = t

    rng = np.random.default_rng(0)
    samples = [
        {
            "question": "What is the left instrument of the first sounding instrument?",
            "media": {
                "video": rng.integers(0, 255, (10, 224, 224, 3)).astype(np.uint8),
                "audio": (rng.standard_normal((10, 32000)) * 0.05).astype(np.float32),
            },
        }
        for _ in range(BATCH)
    ]

    engine = InferenceEngine(
        cfg, params, Tok(), special, eos_id=2, pad_id=0, pack_donate=True
    )
    del params

    results = {}
    for k in KS:
        spec = InferenceEngine(
            cfg, engine.params, Tok(), special, eos_id=2, pad_id=0,
            pack=False, spec_k=k,
        )
        t1 = time.time()
        spec.run("bench-avqa-500", samples)
        print(f"# k={k} compile+first: {time.time()-t1:.1f}s", file=sys.stderr)
        times = []
        for _ in range(3):
            t1 = time.time()
            spec.run("bench-avqa-500", samples)
            times.append(time.time() - t1)
        med = float(np.median(times))
        results[k] = {
            "median_s": round(med, 2),
            "runs": [round(x, 2) for x in times],
            "clips_per_s": round(BATCH / med, 4),
        }
        print(f"# k={k}: median {med:.1f}s {times} "
              f"({BATCH/med:.3f} clips/s)", file=sys.stderr)
        del spec
    print(json.dumps(results))


if __name__ == "__main__":
    main()
