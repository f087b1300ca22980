#!/usr/bin/env python
"""7B training-step benchmark on one TPU chip — evidence for the train
stack's scale claims (train/state.py HBM arithmetic).

One real stage-2 finetune step at the reference's per-device scale
(``finetune_hyperlora.sh:12-14``: per-device batch 4, seq ~704 with
10-frame video + 10x2s audio): int8 frozen decoder base, bf16 MoE-LoRA +
projector trainables, trainable-only gradients, remat on, optax AdamW.
Reports ms/step, tokens/s, and peak HBM when the runtime exposes it.

Output: one JSON line. Env: CRAB_TRAIN_BATCH (default 4),
CRAB_TRAIN_AVS=1 adds the seg head + mask loss to the step,
CRAB_TRAIN_LLM ("qwen" = Qwen2-7B, the flagship backbone since round
5; "llama" = LLaMA-2-7B, the backbone TRAIN_r03.json measures).
"""

import json
import os
import sys
import time

import numpy as np

BATCH = int(os.environ.get("CRAB_TRAIN_BATCH", "4"))
AVS = os.environ.get("CRAB_TRAIN_AVS", "0") == "1"
LLM = os.environ.get("CRAB_TRAIN_LLM", "qwen")


def main():
    import jax
    import jax.numpy as jnp

    cache_dir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".jax_cache"
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    from crab_tpu.core.config import backbone_preset, crab_tiny
    from crab_tpu.fusion.splice import IGNORE_LABEL, SampleSpec, build_splice_batch
    from crab_tpu.fusion.tokens import SpecialTokens
    from crab_tpu.lm.quant import init_llama_int8
    from crab_tpu.encoders.beats import init_beats
    from crab_tpu.encoders.clip_vit import init_clip_vit
    from crab_tpu.encoders.projectors import init_projector
    from crab_tpu.seg.seg_module import init_seg
    from crab_tpu.train.state import (
        STAGE_TRAINABLE,
        init_train_state,
        make_lr_schedule,
        make_optimizer,
        make_train_step,
        trainable_mask,
    )

    tiny = os.environ.get("CRAB_TRAIN_TINY", "0") == "1"  # CPU smoke path
    if tiny:
        cfg = crab_tiny()
        special = SpecialTokens(base_vocab=400)
    else:
        base_cfg, base_vocab, _eos = backbone_preset(LLM)
        cfg = base_cfg().replace(
            compute_dtype="bfloat16", param_dtype="bfloat16"
        )
        special = SpecialTokens(base_vocab=base_vocab)

    t0 = time.time()

    @jax.jit
    def init_all(key):
        ks = jax.random.split(key, 6)
        p = {
            "vision": init_clip_vit(ks[0], cfg.vision, jnp.bfloat16),
            "audio": init_beats(ks[1], cfg.audio, jnp.bfloat16),
            "vl_projector": init_projector(
                ks[2], cfg.vl_projector, cfg.decoder.hidden_size, jnp.bfloat16
            ),
            "al_projector": init_projector(
                ks[3], cfg.al_projector, cfg.decoder.hidden_size, jnp.bfloat16
            ),
            # int8 frozen base + bf16 LoRA trainables: the single-chip 7B
            # training config (bf16 base weights + grads don't fit 16 GB)
            "decoder": init_llama_int8(ks[4], cfg.decoder),
        }
        if AVS:
            p["seg"] = init_seg(
                ks[5], cfg.seg, cfg.decoder.hidden_size, jnp.float32
            )
        return p

    params = init_all(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    print(f"# init: {time.time()-t0:.1f}s", file=sys.stderr)

    # ---- AVQA-shaped train batch: ~60 text tokens + 320 video + 320
    # audio feature tokens, answer supervised (labels elsewhere IGNORE)
    rng = np.random.default_rng(0)
    frames = 2 if tiny else 10
    windows = 1 if tiny else 10
    hi_id = special.base_vocab - 1
    qv = cfg.vl_projector.num_query_tokens * frames
    qa = cfg.al_projector.num_query_tokens * windows
    prompt = np.concatenate([
        rng.integers(10, hi_id, 40),
        [special.id("<video>"), special.id("<audio>")],
        rng.integers(10, hi_id, 18),
    ]).astype(np.int64)
    answer = rng.integers(10, hi_id, 12).astype(np.int64)
    full = np.concatenate([prompt, answer])
    labels = np.full(len(full), IGNORE_LABEL, np.int64)
    labels[len(prompt):] = answer
    specs = [
        SampleSpec(full, {"<video>": qv, "<audio>": qa}, labels, "avqa")
        for _ in range(BATCH)
    ]
    sb = build_splice_batch(specs, special, pad_to=None if tiny else 768)
    size = cfg.vision.image_size
    batch = {
        "media": {
            "video": jnp.asarray(
                rng.integers(0, 255, (BATCH, frames, size, size, 3)).astype(
                    np.uint8
                )
            ),
            "audio": jnp.asarray(
                (
                    rng.standard_normal((BATCH, windows, 32000)) * 0.05
                ).astype(np.float32)
            ),
        },
        "text_ids": jnp.asarray(sb.text_ids),
        "feat_idx": jnp.asarray(sb.feat_idx),
        "attention_mask": jnp.asarray(sb.attention_mask),
        "position_ids": jnp.asarray(sb.position_ids),
        "labels": jnp.asarray(sb.labels),
    }
    if AVS:
        batch["mask_token_pos"] = jnp.asarray(sb.mask_token_pos)
        s = cfg.seg.output_mask_size
        batch["gt_mask"] = jnp.asarray(
            (rng.random((BATCH, s, s)) > 0.5).astype(np.float32)
        )
    T = int(sb.text_ids.shape[1])

    stage = "finetune"
    mask = trainable_mask(params, STAGE_TRAINABLE[stage])
    n_train = sum(
        int(np.prod(p.shape))
        for p, m in zip(
            jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(mask)
        )
        if m
    )
    print(f"# trainable params: {n_train/1e6:.1f}M", file=sys.stderr)
    opt = make_optimizer(
        make_lr_schedule(1e-4, 1000), STAGE_TRAINABLE[stage], params
    )
    # donate the state: without it XLA holds two full param copies
    # (args 7.8 GB + out 7.8 GB, alias 0) and the step OOMs at any batch
    step = jax.jit(
        make_train_step(cfg, opt, avs=AVS, trainable=mask, dropout_seed=0),
        donate_argnums=0,
    )
    state = init_train_state(params, opt, trainable=mask)

    t0 = time.time()
    state, metrics = step(state, batch)
    loss = float(metrics["loss"])
    print(f"# compile+first step: {time.time()-t0:.1f}s loss={loss:.3f}",
          file=sys.stderr)
    assert np.isfinite(loss)

    best = 1e9
    for _ in range(3):
        t0 = time.time()
        state, metrics = step(state, batch)
        loss = float(metrics["loss"])  # forces the step through the relay
        best = min(best, time.time() - t0)
    step_ms = best * 1000

    peak_gb = None
    try:
        stats = jax.local_devices()[0].memory_stats()
        peak = stats.get("peak_bytes_in_use") or stats.get("bytes_in_use")
        if peak:
            peak_gb = round(peak / 2**30, 2)
    except Exception:
        pass

    backbone = "Qwen2-7B" if (LLM == "qwen" and not tiny) else "7B"
    record = {
        "metric": "train_step_ms_7b",
        **({} if tiny else {"llm": "Qwen2-7B" if LLM == "qwen" else "LLaMA-2-7B"}),
        "value": round(step_ms, 1),
        "unit": (
            f"ms/step ({backbone} int8-base + bf16 LoRA/projector "
            f"trainables [{n_train/1e6:.0f}M], batch {BATCH}, seq {T}, "
            f"remat, stage=finetune{'+avs' if AVS else ''})"
        ),
        "tokens_per_s": round(BATCH * T / best, 1),
        "loss_finite": bool(np.isfinite(loss)),
    }
    if peak_gb is not None:
        record["peak_hbm_gb"] = peak_gb

    # ---- data plane: real media decode per batch, prefetch 0 vs 2 ----
    # quantifies the --prefetch overlap claim (tasks/datasets.py): cv2
    # 10-frame seeks + audio decode per sample happen on worker threads
    # while the device runs the train step. Same compiled step program
    # (avqa-shaped batches at pad_to=768).
    if os.environ.get("CRAB_TRAIN_DATAPLANE", "0") == "1" and not tiny:
        import tempfile
        import zlib

        from crab_tpu.tasks.datasets import (
            TrainCollator,
            TrainDataset,
            task_batches,
        )

        class StubTok:
            def encode(self, text):
                return [
                    special.token_to_id.get(
                        w, 7 + (zlib.crc32(w.encode()) % 20000)
                    )
                    for w in text.replace(">", "> ").replace("<", " <").split()
                ]

        assets = "/root/reference/assets/example"
        ann = [
            {
                "audio_path": f"{assets}/avqa/00006835.mp3",
                "video_path": f"{assets}/avvp/6aV6c8mY0lg.mp4",
                "question": "What is the instrument on the left?",
                "answer": "piano",
            }
        ] * (3 * BATCH)
        with tempfile.NamedTemporaryFile(
            "w", suffix=".json", delete=False
        ) as f:
            json.dump(ann, f)
            ann_path = f.name
        col = TrainCollator(StubTok(), special, cfg)
        for prefetch in (0, 2):
            ds = TrainDataset({"avqa": ann_path}, special)
            walls = []
            for rep in range(2):
                t0 = time.time()
                n = 0
                for b in task_batches(
                    ds, col, BATCH, pad_to=T, prefetch=prefetch
                ):
                    b = jax.tree_util.tree_map(jnp.asarray, b)
                    state, metrics = step(state, b)
                    float(metrics["loss"])
                    n += 1
                walls.append((time.time() - t0) / max(n, 1))
            record[f"dataplane_s_per_step_prefetch{prefetch}"] = round(
                min(walls), 3
            )
            print(
                f"# dataplane prefetch={prefetch}: "
                f"{min(walls):.2f} s/step over {n} batches x 2 reps",
                file=sys.stderr,
            )
        os.unlink(ann_path)

    print(json.dumps(record))


if __name__ == "__main__":
    main()
