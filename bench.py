#!/usr/bin/env python
"""crab_tpu benchmark — end-to-end AVQA-shape inference on one TPU chip.

Measures the BASELINE.md primary metric (AV-UIE clips/sec/chip) on the
flagship crab-7b configuration in bf16: CLIP over 10 frames + BEATs over
10x2s audio (fbank on device) + Q-Former projectors + multimodal splice +
LLaMA-2-7B prefill (~700 tokens) + 64 greedy decode steps.

Weights are random (no checkpoints ship with this environment); compute
cost is identical to trained weights. Decode length is fixed at 64 so the
number is stable run-to-run.

vs_baseline: the reference never measured throughput (SURVEY.md §6). The
denominator is an analytic A100 estimate for the reference stack (HF
eager + peft MoE-LoRA fp16, decode-bound: ~45 ms/step * 64 + prefill +
encoders + CPU media plane ≈ 4 s/clip ≈ 0.25 clips/s). Treat it as an
order-of-magnitude anchor, not a measurement.

Output: one JSON line {"metric", "value", "unit", "vs_baseline"}.
"""

import zlib
import json
import os
import sys
import time

import numpy as np

A100_BASELINE_CLIPS_PER_SEC = 0.25  # analytic estimate, see docstring
MAX_NEW_TOKENS = 64
DECODE_DTYPE = "bfloat16"
BATCH = int(os.environ.get("CRAB_BENCH_BATCH", "8"))  # reference NTP batch is 8
# weight bits: 8 = per-channel int8 (XLA mixed conv); 4 = group-int4
# via the Pallas W4A16 kernel (ops/w4a16_matmul.py)
WBITS = int(os.environ.get("CRAB_BENCH_WBITS", "8"))


def main():
    import jax
    import jax.numpy as jnp

    # persistent compilation cache: the 7B generate program takes ~10 min
    # to compile through this relay; cached runs start in seconds.
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    from crab_tpu.core.config import crab_7b
    from crab_tpu.fusion.tokens import SpecialTokens
    from crab_tpu.runtime.engine import InferenceEngine
    from crab_tpu.runtime.model import init_crab
    from crab_tpu.tasks import registry

    assert jax.default_backend() in ("tpu", "axon"), (
        f"bench expects a TPU backend, got {jax.default_backend()}"
    )

    import dataclasses

    cfg = crab_7b().replace(compute_dtype=DECODE_DTYPE, param_dtype=DECODE_DTYPE)
    # KV cache dtype: measured on-chip (tools/micro_ablate.py), bf16 KV +
    # XLA decode attention is 15.9 ms/step vs 22.2 with the int8-KV Pallas
    # kernel at S~=832/batch 8 — the kernel's grid is overhead-bound at
    # short S; it remains the right call for long-S memory headroom.
    # bf16 cache at batch 8, S<=1204 fits alongside int8 weights.
    kv_quant = os.environ.get("CRAB_BENCH_KVQ", "0") == "1"
    # W8A8 prefill (s8xs8 MXU at 2x the bf16 rate): the serving default
    # here, labeled in the unit string; CRAB_BENCH_A8=0 gives the
    # bit-conservative W8A16 prefill (DecoderConfig.int8_activations).
    a8 = os.environ.get("CRAB_BENCH_A8", "1") == "1"
    cfg = cfg.replace(
        decoder=dataclasses.replace(
            cfg.decoder, kv_quant=kv_quant, int8_activations=a8
        )
    )
    special = SpecialTokens(base_vocab=32000)

    t0 = time.time()
    # encoders in bf16, decoder directly in int8: bf16 7B weights + KV
    # cache + encoders exceed the ~15 GiB usable HBM of one v5e chip
    # (measured); int8 weight-only is the single-chip serving config.
    from crab_tpu.lm.quant import init_llama_int8, init_llama_w4
    from crab_tpu.encoders.beats import init_beats
    from crab_tpu.encoders.clip_vit import init_clip_vit
    from crab_tpu.encoders.projectors import init_projector

    # one jitted init program: ~1000 individual random-init dispatches
    # through the device relay cost 60-130 s; a single compiled (and
    # persistently cached) program takes seconds.
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
            # AVQA path doesn't touch the seg head. WBITS=4: packed
            # group-int4 layout driving the Pallas W4A16 decode kernel.
            "decoder": (
                init_llama_w4(ks[4], cfg.decoder)
                if WBITS == 4
                else init_llama_int8(ks[4], cfg.decoder)
            ),
        }

    params = init_all(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    print(f"# init: {time.time() - t0:.1f}s", file=sys.stderr)

    class BenchTokenizer:
        def encode(self, text):
            ids = []
            for w in text.replace(">", "> ").replace("<", " <").split():
                ids.append(special.token_to_id.get(w, 7 + (zlib.crc32(w.encode()) % 20000)))
            return ids

        def decode(self, ids):
            return " ".join(str(i) for i in ids)

    engine = InferenceEngine(
        cfg, params, BenchTokenizer(), special, eos_id=2, pad_id=0,
        pack_donate=True,  # single-copy HBM peak while packing the 7B
    )
    del params  # the donated tree is dead; drop the reference

    # AVQA-shape bench task: same media recipe shapes, fixed 64-step decode
    bench_task = registry.TaskSpec(
        "bench-avqa",
        lambda s: registry.prompts.avqa_instruction(s["question"]),
        lambda s: s["media"],
        dict(registry.TASKS["avqa"].feature_lens),
        max_new_tokens=MAX_NEW_TOKENS,
    )
    registry.TASKS["bench-avqa"] = bench_task

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

    t0 = time.time()
    out = engine.run("bench-avqa", samples)
    print(f"# compile+first run: {time.time() - t0:.1f}s", file=sys.stderr)
    assert out.tokens.shape == (BATCH, MAX_NEW_TOKENS)

    # streaming throughput: host prep + H2D of batch i+1 overlap with the
    # device executing batch i (run_stream) — the serving configuration
    iters = 6
    t0 = time.time()
    depth = int(os.environ.get("CRAB_BENCH_DEPTH", "2"))
    outs = engine.run_stream("bench-avqa", [samples] * iters, depth=depth)
    dt = (time.time() - t0) / iters
    assert len(outs) == iters
    clips_per_sec = BATCH / dt
    print(f"# steady-state: {dt*1000:.0f} ms/batch of {BATCH}", file=sys.stderr)

    # ---- stage breakdown (batch 8): encode vs prefill+decode ----------
    # re-run the already-compiled programs with explicit blocking between
    # stages; host/prep time is the remainder of the e2e batch time.
    from crab_tpu.fusion.splice import build_splice_batch

    task = registry.TASKS["bench-avqa"]
    specs, medias = [], []
    for s in samples:
        spec, media = engine.build_sample(task, s)
        specs.append(spec)
        medias.append(media)
    t_host0 = time.time()
    sb = build_splice_batch(
        specs, special, pad_to=engine._pad_len(specs, task), pad_id=engine.pad_id
    )
    media_batch = engine._media_batch(medias)
    encode_fn, gen_fn, _ = engine._program_for(
        tuple(sorted(media_batch)), False, "binary"
    )
    host_ms = (time.time() - t_host0) * 1000
    t1 = time.time()
    bank, _ = encode_fn(engine.params, media_batch)
    np.asarray(bank[0, 0])  # force through the lazy relay
    encode_ms = (time.time() - t1) * 1000
    t1 = time.time()
    res = gen_fn(
        engine.params["decoder"], bank, jnp.asarray(sb.text_ids),
        jnp.asarray(sb.feat_idx), jnp.asarray(sb.attention_mask),
        jnp.asarray(sb.position_ids), MAX_NEW_TOKENS,
    )
    np.asarray(res.tokens[0, -1])
    gen_ms = (time.time() - t1) * 1000
    breakdown = {
        "host_prep_ms": round(host_ms, 1),
        "encode_ms": round(encode_ms, 1),
        "prefill_decode_ms": round(gen_ms, 1),
        "decode_ms_per_token_est": round(gen_ms / (MAX_NEW_TOKENS + 12), 2),
    }
    print(f"# stage breakdown: {breakdown}", file=sys.stderr)

    # ---- p50/p99 single-query latency (BASELINE.json primary metric) ---
    lat_iters = int(os.environ.get("CRAB_BENCH_LAT_ITERS", "5"))
    lats = []
    for i in range(lat_iters + 1):
        t1 = time.time()
        engine.run("bench-avqa", samples[:1])
        lat = (time.time() - t1) * 1000
        if i > 0:  # first single-sample call compiles the batch-1 programs
            lats.append(lat)
        else:
            print(f"# batch-1 compile+first: {lat/1000:.1f}s", file=sys.stderr)
    p50 = float(np.percentile(lats, 50))
    p99 = float(np.percentile(lats, 99))
    print(f"# p50 {p50:.0f} ms  p99 {p99:.0f} ms (batch 1, "
          f"{MAX_NEW_TOKENS} tokens)", file=sys.stderr)

    # reference-comparable budget: the reference decodes NTP tasks with
    # max_new_tokens=500 (quick_start.py:39). Random weights never emit
    # EOS, so this is the worst-case full-budget latency.
    lat500 = None
    if os.environ.get("CRAB_BENCH_500", "1") == "1":
        t500 = registry.TaskSpec(
            "bench-avqa-500", task.instruction, task.media,
            dict(task.feature_lens), max_new_tokens=500,
        )
        registry.TASKS["bench-avqa-500"] = t500
        t1 = time.time()
        engine.run("bench-avqa-500", samples[:1])
        print(f"# 500-token compile+first: {time.time()-t1:.1f}s", file=sys.stderr)
        t1 = time.time()
        engine.run("bench-avqa-500", samples[:1])
        lat500 = (time.time() - t1) * 1000
        print(f"# 500-token budget latency: {lat500:.0f} ms", file=sys.stderr)

    record = {
        "metric": "avqa_e2e_clips_per_sec_per_chip",
        "value": round(clips_per_sec, 4),
        "unit": (
            f"clips/s (7B int{WBITS}-weight/"
            f"{'int8-act-prefill' if a8 else 'bf16-act'}, batch {BATCH}, "
            "10f video "
            f"+ 10x2s audio, {MAX_NEW_TOKENS} decode steps)"
        ),
        "vs_baseline": round(clips_per_sec / A100_BASELINE_CLIPS_PER_SEC, 3),
        "p50_latency_ms": round(p50, 1),
        "p99_latency_ms": round(p99, 1),
        "stage_breakdown": breakdown,
    }
    if lat500 is not None:
        record["latency_500tok_budget_ms"] = round(lat500, 1)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
