#!/usr/bin/env python
"""crab_tpu benchmark — end-to-end AVQA-shape inference on one TPU chip.

Measures the BASELINE.md primary metric (AV-UIE clips/sec/chip) on the
flagship configuration: CLIP over 10 frames + BEATs over 10x2s audio
(fbank on device) + Q-Former projectors + multimodal splice + 7B
decoder prefill (~700 tokens) + greedy decode. Weights are random (no
checkpoints ship with this environment); compute cost is identical to
trained weights.

Decoder backbone. The reference trains/serves BOTH LLaMA-2-7B and
Qwen2-7B (``scripts/finetune/finetune_hyperlora.py:44-45``). The
flagship default here is Qwen2-7B because its GQA (Hkv=4 vs LLaMA's
MHA Hkv=32) cuts the per-decode-step KV read 8x — and the round-5
component-floor analysis (tools/README.md "64-token headline") proved
MHA KV traffic is exactly what binds the 64-token row on one v5e core.
Measured at this flagship: decode slope 11.63 vs 17.5 ms/step, 64-token
row 8.58 vs 6.90 clips/s. ``CRAB_BENCH_LLM=llama`` reproduces the
LLaMA rows (the config all r01-r04 BENCH artifacts measure).

Decode budgets. The reference caps NTP decoding at max_new_tokens=500
(``scripts/quick_start.py:39``) but HF generate STOPS AT EOS — with
trained weights real Crab answers are short ("<answer>yes</answer>" ~10
tokens for AVQA; AVE/AVVP event lists ~20-60; ARIG coordinates ~35).
Random weights never emit EOS, so this bench reports BOTH framings:
  - the 64-token row (its decode length brackets the expected answer
    length of 6 of the 9 tasks, and it is stable run to run), and
  - the measured full-budget batch-8 500-token row (worst case: every
    sample exhausts the cap), plus a decode-length -> clips/s curve
    derived from the measured per-token slope.

vs_baseline. The reference never measured throughput (SURVEY.md §6).
The denominator is an analytic batch-8 A100 anchor with the assumptions
stated: HF eager fp16 7B + peft MoE-LoRA decodes at ~45 ms/step at batch
8, plus ~1.5 s/batch for prefill + encoders + the CPU media plane
(decord/librosa/fbank under a 4-worker DataLoader), i.e.
rate_A100(n) = 8 / (1.5 + 0.045 n) clips/s — 1.8 at n=64, 0.33 at
n=500. vs_baseline compares at the SAME decode length (apples to
apples). The BASELINE.md north star (">5x A100 end-to-end on v5e-8")
refers to the 8-chip pod: clips/s/chip x 8 (DP replication, no
cross-chip traffic at these batch sizes) vs one A100.

Output: one JSON line {"metric", "value", "unit", "vs_baseline", ...}.
"""

import dataclasses
import json
import os
import sys
import time
import zlib

import numpy as np

MAX_NEW_TOKENS = 64
# Serving batch. The reference serves batch 8 (inference_hyper_lora.py:1477);
# our batch is a free serving parameter, and with the int8 KV cache the
# chip takes 16 (measured: 17.57 ms/step at B=16 vs 14.81 at B=8 — 1.10
# vs 1.85 ms/step/clip; tools/README.md). The A100 anchor stays the
# reference's own batch-8 config; comparison is at equal decode LENGTH.
BATCH = int(os.environ.get("CRAB_BENCH_BATCH", "16"))
# weight bits: 8 = per-channel int8 (XLA mixed conv); 4 = group-int4
# via the Pallas W4A16 kernel (ops/w4a16_matmul.py)
WBITS = int(os.environ.get("CRAB_BENCH_WBITS", "8"))
# self-speculative decoding depth for the full-budget row (0 = off);
# greedy-lossless prompt-lookup drafting (lm/spec.py)
SPEC_K = int(os.environ.get("CRAB_BENCH_SPEC", "4"))
# decoder backbone: "qwen" (Qwen2-7B, flagship default — see module
# docstring) or "llama" (LLaMA-2-7B, the reference primary and the
# config the committed r01-r04 BENCH artifacts measure). The A100
# anchor is the same analytic model for both: they are ~7B decoders,
# and the anchor's 45 ms/step at batch 8 is overhead+weight-read bound
# (7B fp16 weights alone are ~7 ms at A100 HBM rate; the rest is HF
# eager per-step overhead), which GQA's smaller KV read barely moves —
# the anchor_sensitivity band in the JSON covers a +-25% error either
# way.
LLM = os.environ.get("CRAB_BENCH_LLM", "qwen")


def a100_anchor(n_tokens: int) -> float:
    """Analytic reference throughput at decode length n (see docstring)."""
    return 8.0 / (1.5 + 0.045 * n_tokens)


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

    from crab_tpu.core.config import backbone_preset
    from crab_tpu.fusion.tokens import SpecialTokens
    from crab_tpu.runtime.engine import InferenceEngine
    from crab_tpu.tasks import registry

    assert jax.default_backend() in ("tpu", "axon"), (
        f"bench expects a TPU backend, got {jax.default_backend()}"
    )

    base_cfg, base_vocab, eos_id = backbone_preset(LLM)
    cfg = base_cfg().replace(compute_dtype="bfloat16", param_dtype="bfloat16")
    # KV cache: int8 via the XLA mixed-dot decode attention — measured
    # on-chip vs bf16 KV at the packed 7B (tools/micro_kv8_model.py):
    # 14.81 vs 15.01 ms/step at S~750, and HALF the cache memory, which
    # is what lets batch 8 x 500-token decode fit next to int8 weights.
    kv_quant = os.environ.get("CRAB_BENCH_KVQ", "1") == "1"
    # W8A8 prefill (s8xs8 MXU at 2x the bf16 rate): serving default.
    a8 = os.environ.get("CRAB_BENCH_A8", "1") == "1"
    # Pallas flash prefill attention with whole-row blocks: measured
    # 1047 -> 976 ms at B=16/T=768 (tools/micro_prefill_attn.py); the
    # XLA path materializes the (B,H,T,T) fp32 score tensor per layer.
    pf_attn = os.environ.get("CRAB_BENCH_PF_ATTN", "flash")
    cfg = cfg.replace(
        decoder=dataclasses.replace(
            cfg.decoder, kv_quant=kv_quant, int8_activations=a8,
            prefill_attn=pf_attn, flash_block_q=768, flash_block_k=768,
        )
    )
    # 17 special tokens sit at the top of each base vocab (fusion/tokens)
    special = SpecialTokens(base_vocab=base_vocab)

    t0 = time.time()
    # encoders in bf16, decoder directly in int8: bf16 7B weights + KV
    # cache + encoders exceed the ~15 GiB usable HBM of one v5e chip.
    from crab_tpu.lm.quant import init_llama_int8, init_llama_w4
    from crab_tpu.encoders.beats import init_beats
    from crab_tpu.encoders.clip_vit import init_clip_vit
    from crab_tpu.encoders.projectors import init_projector

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
        cfg, params, BenchTokenizer(), special, eos_id=eos_id, pad_id=0,
        pack_donate=True,  # single-copy HBM peak while packing the 7B
    )
    del params  # the donated tree is dead; drop the reference

    def bench_task_named(name, max_new):
        t = registry.TaskSpec(
            name,
            lambda s: registry.prompts.avqa_instruction(s["question"]),
            lambda s: s["media"],
            dict(registry.TASKS["avqa"].feature_lens),
            max_new_tokens=max_new,
        )
        registry.TASKS[name] = t
        return t

    task = bench_task_named("bench-avqa", MAX_NEW_TOKENS)

    # Media arrives as codec-native I420 planes + PCM16 — the decoder's
    # raw output forms (video is stored as YUV 4:2:0; RGB is derived).
    # The engine converts to RGB on device (media/video.yuv420_to_rgb,
    # bit-identical to the host conversion — tests/test_engine.py). This
    # halves video wire bytes: this environment's host->device link runs
    # at ~13 MB/s (tools/micro_wire.py), so the RGB form's 34 MB/batch
    # made the streamed row LINK-bound at ~2.4 s/batch regardless of
    # device speed. YUV420: ~22 MB/batch. Set CRAB_BENCH_WIRE=rgb for
    # the old form.
    wire_yuv = os.environ.get("CRAB_BENCH_WIRE", "yuv420") == "yuv420"
    rng = np.random.default_rng(0)

    def make_sample():
        vid = {
            "video_yuv": rng.integers(0, 256, (10, 336, 224)).astype(np.uint8)
        } if wire_yuv else {
            "video": rng.integers(0, 255, (10, 224, 224, 3)).astype(np.uint8)
        }
        return {
            "question": "What is the left instrument of the first sounding instrument?",
            "media": {
                **vid,
                "audio": (rng.standard_normal((10, 32000)) * 0.05).astype(np.float32),
            },
        }

    samples_all = [
        make_sample()
        for _ in range(max(BATCH, 20))  # 20: the 500-token row's first attempt
    ]
    samples = samples_all[:BATCH]

    t0 = time.time()
    out = engine.run("bench-avqa", samples)
    print(f"# compile+first run: {time.time() - t0:.1f}s", file=sys.stderr)
    assert out.tokens.shape == (BATCH, MAX_NEW_TOKENS)

    # one speculative engine serves every spec row (params shared with
    # the packed main engine; pack=False — already packed)
    spec_engine = (
        InferenceEngine(
            cfg, engine.params, BenchTokenizer(), special,
            eos_id=eos_id, pad_id=0, pack=False, spec_k=SPEC_K,
        )
        if SPEC_K
        else None
    )

    # streaming throughput: host prep + H2D of batch i+1 overlap with the
    # device executing batch i (run_stream) — the serving configuration.
    # Best-of-2 six-batch runs: one relay straggler can inflate a single
    # run's average ~15% (same rationale as bench_serve.py).
    iters = 6
    depth = int(os.environ.get("CRAB_BENCH_DEPTH", "2"))
    dt = 1e9
    for _ in range(2):
        t0 = time.time()
        outs = engine.run_stream("bench-avqa", [samples] * iters, depth=depth)
        assert len(outs) == iters
        dt = min(dt, (time.time() - t0) / iters)
    clips_per_sec = BATCH / dt
    print(f"# steady-state: {dt*1000:.0f} ms/batch of {BATCH}", file=sys.stderr)

    # speculative streamed headline: same row, spec_k drafts verified in
    # one forward (lossless greedy; lm/spec.py). Whichever engine wins is
    # the serving default; both are reported.
    clips_spec = None
    if spec_engine is not None:
        try:
            t0 = time.time()
            spec_engine.run("bench-avqa", samples)
            print(f"# spec batch compile+first: {time.time()-t0:.1f}s",
                  file=sys.stderr)
            dts = 1e9
            for _ in range(2):
                t0 = time.time()
                spec_engine.run_stream("bench-avqa", [samples] * iters, depth=depth)
                dts = min(dts, (time.time() - t0) / iters)
            clips_spec = BATCH / dts
            print(f"# steady-state spec_k={SPEC_K}: {dts*1000:.0f} ms/batch "
                  f"({clips_spec:.2f} clips/s)", file=sys.stderr)
        except Exception as e:  # noqa: BLE001
            print(f"# spec headline row failed ({e!s:.120}); skipped",
                  file=sys.stderr)

    # ---- slope-based decode + resident encode (VERDICT r02: the old
    # fetch-forced stage breakdown was tunnel-polluted) ----------------
    from crab_tpu.fusion.splice import build_splice_batch

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
    host_ms = (time.time() - t_host0) * 1000

    # resident encode: media already on device; chain N encodes through a
    # data dependency (the lazy relay skips unfetched independent work).
    # EVERY modality must depend on the carry — a loop-invariant video
    # branch gets hoisted and drops CLIP out of the measurement.
    def encode_chain(n):
        def fn(params, media):
            def body(i, acc):
                m = {
                    k: v + (acc * 0).astype(v.dtype)
                    for k, v in media.items()
                }
                bank, _ = engine._encode_bank(params, m, False)
                return acc + bank[0, 0].astype(jnp.float32)
            return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))
        f = jax.jit(fn)
        float(f(engine.params, media_batch))  # compile+first
        best = 1e9
        for _ in range(2):
            t1 = time.time()
            float(f(engine.params, media_batch))
            best = min(best, time.time() - t1)
        return best

    e2, e8 = encode_chain(2), encode_chain(8)
    encode_ms_resident = max((e8 - e2) / 6.0, 0.0) * 1000

    # decode slope: dispatch the generate program directly on the
    # RESIDENT bank (no per-run media H2D — tunnel jitter between runs
    # would otherwise swamp the 64-step difference); prefill and relay
    # round trips cancel in the difference
    encode_fn, gen_fn, _ = engine._program_for(
        tuple(sorted(media_batch)), False, "binary"
    )
    bank, _ = encode_fn(engine.params, media_batch)
    gen_args = (
        jnp.asarray(sb.text_ids), jnp.asarray(sb.feat_idx),
        jnp.asarray(sb.attention_mask), jnp.asarray(sb.position_ids),
        engine._next_key(),
    )

    def gen_time(max_new, reps=3):
        r = gen_fn(engine.params["decoder"], bank, *gen_args, max_new)
        np.asarray(r.tokens[0, -1])  # compile+first
        best = 1e9
        for _ in range(reps):
            t1 = time.time()
            r = gen_fn(engine.params["decoder"], bank, *gen_args, max_new)
            np.asarray(r.tokens[0, -1])
            best = min(best, time.time() - t1)
        return best

    t16 = gen_time(16)
    t80 = gen_time(80)
    decode_ms_slope = (t80 - t16) / 64.0 * 1000
    fixed_s = t16 - 16 * decode_ms_slope / 1000  # encode+prefill+host+fetch
    breakdown = {
        "host_prep_ms": round(host_ms, 1),
        "encode_ms_resident": round(encode_ms_resident, 1),
        "decode_ms_slope": round(decode_ms_slope, 2),
        "fixed_overhead_ms": round(fixed_s * 1000, 1),
    }
    print(f"# stage breakdown: {breakdown}", file=sys.stderr)

    # decode-length -> clips/s curve: the measured STREAMED batch time
    # re-projected along the decode slope (dt is the serving-path batch
    # time at 64 tokens; fixed_s below is the resident device path)
    stream_fixed_s = dt - 64 * decode_ms_slope / 1000
    curve = {
        str(n): round(BATCH / (stream_fixed_s + n * decode_ms_slope / 1000), 2)
        for n in (16, 32, 64, 128, 500)
    }

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

    # speculative batch-1 latency: interactive serving's lever — each
    # verify forward costs ~1.45x a weight read but emits several tokens
    # on templated answers (measured p50 868 -> 531 ms on this row)
    p50_spec = None
    if spec_engine is not None:
        try:
            t1 = time.time()
            spec_engine.run("bench-avqa", samples[:1])
            print(f"# spec batch-1 compile+first: {time.time()-t1:.1f}s",
                  file=sys.stderr)
            slats = []
            for _ in range(lat_iters):
                t1 = time.time()
                spec_engine.run("bench-avqa", samples[:1])
                slats.append((time.time() - t1) * 1000)
            p50_spec = float(np.percentile(slats, 50))
            print(f"# spec p50 {p50_spec:.0f} ms (batch 1, "
                  f"{MAX_NEW_TOKENS} tokens, k={SPEC_K})", file=sys.stderr)
        except Exception as e:  # noqa: BLE001
            print(f"# spec p50 row failed ({e!s:.120}); skipped",
                  file=sys.stderr)

    # ---- full-budget rows: the reference's max_new_tokens=500 ---------
    lat500 = None
    clips500 = None
    clips500_spec = None
    if os.environ.get("CRAB_BENCH_500", "1") == "1":
        bench_task_named("bench-avqa-500", 500)
        t1 = time.time()
        engine.run("bench-avqa-500", samples[:1])
        print(f"# 500-token compile+first: {time.time()-t1:.1f}s", file=sys.stderr)
        t1 = time.time()
        engine.run("bench-avqa-500", samples[:1])
        lat500 = (time.time() - t1) * 1000
        print(f"# 500-token batch-1 latency: {lat500:.0f} ms", file=sys.stderr)
        if kv_quant:
            # batched full budget (needs the int8 KV cache: bf16 KV at
            # S~1204/B8 would be 10.2 GB next to 6.7 GB weights); falls
            # back to batch 8 if the full batch's cache doesn't fit.
            # Batch 20 was TRIED (2026-08-17) and RESOURCE_EXHAUSTED —
            # the ~6.3 GB cache + 6.7 GB weights leave no room for the
            # decode workspace — and, worse, the failed attempt poisons
            # the arena so even the batch-16 retry OOMs. Don't probe
            # sizes above the known-good BATCH here.
            b500 = None
            # cap the batched 500-token attempt at 16: the known-good
            # full-budget batch (batch 20 OOM'd AND poisoned the arena so
            # the retry OOM'd too — see above). A raised CRAB_BENCH_BATCH
            # affects only the 64-token serving row.
            attempts = sorted({min(BATCH, 16), 8}, reverse=True)
            for attempt in attempts:
                try:
                    t1 = time.time()
                    engine.run("bench-avqa-500", samples_all[:attempt])
                    print(
                        f"# 500-token batch-{attempt} compile+first: "
                        f"{time.time()-t1:.1f}s", file=sys.stderr,
                    )
                    b500 = attempt
                    break
                except Exception as e:  # noqa: BLE001 — HBM OOM at fetch
                    print(f"# 500-token batch-{attempt} failed ({e!s:.120}); "
                          "retrying smaller" if attempt != attempts[-1]
                          else f"# 500-token batch-{attempt} failed "
                          f"({e!s:.120}); batched row skipped",
                          file=sys.stderr)
            if b500 is not None:
                # streamed (serving) measurement: host prep + H2D of batch
                # i+1 overlap the device executing batch i — the same
                # discipline as the 64-token headline row. A serial
                # engine.run loop pays the ~1.6 s media upload on the
                # critical path of every batch.
                best = 1e9
                for _ in range(2):
                    t1 = time.time()
                    engine.run_stream(
                        "bench-avqa-500", [samples_all[:b500]] * 3, depth=depth
                    )
                    best = min(best, (time.time() - t1) / 3)
                clips500 = b500 / best
                print(f"# 500-token batch-{b500} streamed: {best:.1f} s/batch "
                      f"({clips500:.3f} clips/s)", file=sys.stderr)
            if b500 is not None and spec_engine is not None:
                # self-speculative row (lm/spec.spec_generate over the
                # int8 slot cache): long repetitive decodes are exactly
                # where n-gram drafting accepts, so the full-budget row
                # is the one speculation moves. Greedy-lossless (every
                # token is a real argmax; see lm/spec.py).
                # MEDIAN-of-3: this row straddles the >=5x threshold and
                # the relay's run-to-run variance is +-10-15%, so a
                # best-of measurement would overstate it (VERDICT r03).
                try:
                    t1 = time.time()
                    spec_engine.run("bench-avqa-500", samples_all[:b500])
                    print(f"# 500-token spec_k={SPEC_K} compile+first: "
                          f"{time.time()-t1:.1f}s", file=sys.stderr)
                    # MEDIAN of 5 streamed 3-batch runs (the row straddles
                    # the >=5x threshold and relay variance is +-10-15%;
                    # at median-of-3 one straggler run skews the median —
                    # r04 measured [9.1, 11.5, 9.7])
                    times = []
                    for _ in range(5):
                        t1 = time.time()
                        spec_engine.run_stream(
                            "bench-avqa-500", [samples_all[:b500]] * 3,
                            depth=depth,
                        )
                        times.append((time.time() - t1) / 3)
                    med = float(np.median(times))
                    clips500_spec = b500 / med
                    print(f"# 500-token batch-{b500} spec_k={SPEC_K} "
                          f"streamed: median {med:.1f} s/batch of "
                          f"{[round(t, 1) for t in times]} "
                          f"({clips500_spec:.3f} clips/s)", file=sys.stderr)
                except Exception as e:  # noqa: BLE001
                    print(f"# 500-token spec row failed ({e!s:.120}); "
                          "skipped", file=sys.stderr)

    record = {
        "metric": "avqa_e2e_clips_per_sec_per_chip",
        "llm": "Qwen2-7B" if LLM == "qwen" else "LLaMA-2-7B",
        "value": round(clips_per_sec, 4),
        "unit": (
            f"clips/s ({'Qwen2-7B' if LLM == 'qwen' else '7B'} "
            f"int{WBITS}-weight/"
            f"{'int8-act-prefill' if a8 else 'bf16-act'}/"
            f"{'int8' if kv_quant else 'bf16'}-KV, batch {BATCH}, "
            f"10f video ({'yuv420' if wire_yuv else 'rgb'} wire) "
            f"+ 10x2s pcm16 audio, {MAX_NEW_TOKENS} decode steps)"
        ),
        # same-decode-length analytic A100 anchor (see module docstring)
        "vs_baseline": round(clips_per_sec / a100_anchor(MAX_NEW_TOKENS), 3),
        # anchor honesty: every vs_* multiplier divides by a MODELED A100
        # denominator (never measured by the reference — SURVEY.md §6).
        # The band shows each multiplier under a +-25% anchor error: a
        # FASTER-than-modeled A100 (anchor x1.25) shrinks our multiplier
        # to the 'anchor_p25_faster' value. Provenance of the anchor's
        # components is recorded in BASELINE.md.
        "anchor_sensitivity": {
            "assumption": "rate_A100(n) = 8 / (1.5 + 0.045 n) clips/s",
            "vs_baseline_anchor_25pct_faster": round(
                clips_per_sec / (a100_anchor(MAX_NEW_TOKENS) * 1.25), 3
            ),
            "vs_baseline_anchor_25pct_slower": round(
                clips_per_sec / (a100_anchor(MAX_NEW_TOKENS) * 0.75), 3
            ),
        },
        **(
            {
                "clips_per_sec_spec": round(clips_spec, 4),
                "vs_baseline_spec": round(
                    clips_spec / a100_anchor(MAX_NEW_TOKENS), 3
                ),
            }
            if clips_spec
            else {}
        ),
        "p50_latency_ms": round(p50, 1),
        "p99_latency_ms": round(p99, 1),
        **({"p50_latency_ms_spec": round(p50_spec, 1)} if p50_spec else {}),
        "stage_breakdown": breakdown,
        "clips_per_sec_by_decode_len": curve,
        "a100_anchor_by_decode_len": {
            str(n): round(a100_anchor(n), 3) for n in (16, 32, 64, 128, 500)
        },
    }
    if lat500 is not None:
        record["latency_500tok_budget_ms"] = round(lat500, 1)
    if clips500 is not None:
        record["clips_per_sec_500tok"] = round(clips500, 4)
        record["batch_500tok"] = b500
        record["vs_a100_500tok"] = round(clips500 / a100_anchor(500), 2)
    if clips500_spec is not None:
        record["clips_per_sec_500tok_spec"] = round(clips500_spec, 4)
        record["spec_k"] = SPEC_K
        record["vs_a100_500tok_spec"] = round(
            clips500_spec / a100_anchor(500), 2
        )
        record["vs_a100_500tok_spec_anchor_band"] = [
            round(clips500_spec / (a100_anchor(500) * 1.25), 2),
            round(clips500_spec / (a100_anchor(500) * 0.75), 2),
        ]
    print(json.dumps(record))


if __name__ == "__main__":
    for attempt in (0, 1):
        try:
            main()
            break
        except Exception as e:  # noqa: BLE001
            # the relay throws a transient FAILED_PRECONDITION right
            # after a crashed TPU process; one retry clears it
            # (verify-skill note)
            if attempt or "FAILED_PRECONDITION" not in str(e):
                raise
            print(f"# transient {e!s:.120}; retrying once", file=sys.stderr)
            # drop the exception (and its traceback's references to the
            # failed attempt's 7B buffers) BEFORE re-initializing
            del e
        time.sleep(10)
