"""Full-split evaluation CLI — the analogue of
``scripts/finetune/inference_hyper_lora.py``.

Iterates a test annotation file for one task, runs batched (streamed)
inference, dumps JSONL records, accumulates online mask metrics for the
AVS family, and prints a final summary via the offline scorers.

Annotation schema matches docs/TRAINING.md (explicit media paths per
record; avqa records carry question/answer/question_type, ref-avs carry
exp, AVS tasks carry mask_path...).

Usage:
  python -m crab_tpu.cli.evaluate --task avqa --annotations ann/avqa_test.json \
      [--llama DIR --clip DIR --beats F.pt --tokenizer DIR --delta F.bin] \
      [--random-init --tiny] --out eval_avqa --batch-size 8
"""

from __future__ import annotations

import argparse
import json
import os
import time
from typing import Dict, List

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--task", required=True)
    p.add_argument("--annotations", required=True)
    p.add_argument("--llm", choices=["llama", "qwen"], default="llama")
    p.add_argument("--llama", default="", help="HF decoder checkpoint dir")
    p.add_argument("--clip", default="")
    p.add_argument("--beats", default="")
    p.add_argument("--tokenizer", default="")
    p.add_argument("--delta", default="")
    p.add_argument("--avs-delta", default="")
    p.add_argument("--out", required=True)
    p.add_argument("--random-init", action="store_true")
    p.add_argument("--int8", action="store_true")
    p.add_argument("--kv-quant", action="store_true")
    p.add_argument("--enc-int8", action="store_true",
                   help="W8A8 CLIP+BEATs encoders (2x MXU rate on the "
                        "encode stage; ~1e-2 rel numerics — serving "
                        "only, not for parity evals)")
    p.add_argument("--a8-prefill", action="store_true")
    p.add_argument("--flash-prefill", action="store_true",
                   help="Pallas online-softmax prefill attention (whole-"
                        "row blocks; same math as the XLA path but not "
                        "bit-parity — serving only)")
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--score-unfound", action="store_true",
                   help="score masks even when the decode lacks the six "
                        "<mask_i> tokens (the reference skips them)")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--limit", type=int, default=0)
    p.add_argument("--dump-routes", action="store_true",
                   help="dump per-sample MoE-LoRA router weights as "
                        "reference-layout .npy under <out>/routes/ "
                        "(inference_hyper_lora.py:164-205)")
    p.add_argument("--temperature", type=float, default=0.0,
                   help="sampling temperature; 0 = greedy (reference default)")
    p.add_argument("--top-k", type=int, default=0)
    p.add_argument("--top-p", type=float, default=1.0)
    p.add_argument("--seed", type=int, default=0, help="sampling seed")
    p.add_argument("--spec-k", type=int, default=0,
                   help="self-speculative decoding: verify N history-"
                        "drafted tokens per forward (greedy only; composes"
                        " with --kv-quant; token-identical; lm/spec.py)")
    p.add_argument("--profile-dir", default="",
                   help="capture a jax.profiler trace of the eval loop "
                        "into this directory (XPlane; open with "
                        "tensorboard or xprof)")
    args = p.parse_args(argv)

    from crab_tpu.runtime.engine import InferenceEngine
    from crab_tpu.tasks import metrics as M
    from crab_tpu.tasks.registry import TASKS
    from crab_tpu.cli.quick_start import build_params, build_tokenizer, select_model
    from crab_tpu.cli import score as scorer

    task = TASKS[args.task]
    # '-eval' variants (full-split prompts) score like their base task
    base_task = args.task.removesuffix("-eval")
    cfg, special, chat_style, eos_id = select_model(args)
    if args.kv_quant or args.a8_prefill or args.flash_prefill:
        import dataclasses

        cfg = cfg.replace(decoder=dataclasses.replace(
            cfg.decoder, kv_quant=args.kv_quant,
            int8_activations=args.a8_prefill,
            prefill_attn="flash" if args.flash_prefill else "xla",
            flash_block_q=768, flash_block_k=768))
    params = build_params(args, cfg)
    engine = InferenceEngine(
        cfg, params, build_tokenizer(args, special), special,
        chat_style=chat_style, eos_id=eos_id,
        temperature=args.temperature, top_k=args.top_k, top_p=args.top_p,
        sample_seed=args.seed, spec_k=args.spec_k,
    )

    with open(args.annotations) as f:
        records: List[Dict] = json.load(f)
    if args.limit:
        records = records[: args.limit]
    # AVS tasks run batch 1 in the reference (inference_hyper_lora.py:1477);
    # we batch them too, but keep batches task-homogeneous by construction.
    # Tasks with per-frame media (ms3/s4 full splits) group by clip so the
    # shared video/audio encode runs ONCE per clip (engine.run_clip).
    clip_mode = task.frame_media is not None and task.clip_key is not None
    if clip_mode:
        batches = []
        for rec in records:
            k = task.clip_key(rec)
            if batches and batches[-1][0] == k:
                batches[-1][1].append(rec)
            else:
                batches.append((k, [rec]))
        batches = [g for _, g in batches]
    else:
        B = args.batch_size
        batches = [records[i: i + B] for i in range(0, len(records), B)]

    os.makedirs(args.out, exist_ok=True)
    mask_dir = os.path.join(args.out, "pred_masks")
    if task.is_avs:
        os.makedirs(mask_dir, exist_ok=True)
    fp = os.path.join(args.out, "infer_results.jsonl")
    miou_sum = np.zeros(71)
    fsc_sum = np.zeros(71)
    cls_cnt = np.zeros(71)
    import contextlib

    prof = contextlib.ExitStack()
    if args.profile_dir:
        from crab_tpu.utils.diagnostics import trace

        prof.enter_context(trace(args.profile_dir))
    try:
        t0 = time.time()
        if clip_mode:
            # depth-2 overlap: clip i+1's host prep + H2D run while the
            # device executes clip i (same discipline as run_stream)
            outputs = engine.run_clip_stream(args.task, batches, depth=2)
        else:
            outputs = engine.run_stream(args.task, batches)
        route_dir = os.path.join(args.out, "routes")
        sample_idx = 0
        with open(fp, "w") as f:
            for out, batch in zip(outputs, batches):
                if args.dump_routes:
                    # one prefill pass with telemetry per batch; per-sample
                    # dumps in the reference's directory-per-sample layout
                    from crab_tpu.utils.diagnostics import dump_token_routes

                    routes = engine.route_telemetry(
                        args.task, batch, per_token=True
                    )
                    for i in range(len(batch)):
                        dump_token_routes(routes, route_dir, sample_idx + i, i)
                for i, rec in enumerate(batch):
                    row = {k: v for k, v in rec.items() if isinstance(v, (str, int, float, list))}
                    row["predict"] = out.texts[i]
                    if task.is_avs and out.mask_found is not None:
                        row["mask_found"] = bool(out.mask_found[i])
                    if task.is_avs and out.masks is not None and rec.get("mask_path"):
                        if (
                            not args.score_unfound
                            and out.mask_found is not None
                            and not out.mask_found[i]
                        ):
                            # decode produced fewer than the six <mask_i>
                            # tokens: the reference skips the sample
                            # (unified_llama.py:344-353 returns no masks;
                            # quick_start.py:82-84 `continue`s without
                            # counting it)
                            f.write(json.dumps(row) + "\n")
                            continue
                        logits = out.masks[i]
                        if logits.shape[-1] != 224:  # tiny-config smoke runs
                            import cv2

                            logits = np.stack(
                                [cv2.resize(c, (224, 224)) for c in logits]
                            )
                        if task.avss_head:
                            from crab_tpu.media.masks import load_avss_label_mask

                            gt = load_avss_label_mask(rec["mask_path"])
                            mi, fs, cc, _ = M.calc_color_miou_fscore(logits[None], gt)
                            miou_sum += mi
                            fsc_sum += fs
                            cls_cnt += cc
                        else:
                            from crab_tpu.media.masks import load_binary_mask

                            gt = load_binary_mask(rec["mask_path"])
                            row["miou"] = M.mask_iou(logits[:1], gt)
                            row["fscore"] = M.eval_fmeasure(logits[:1], gt)
                            if base_task == "ref-avs" and rec.get("null", False):
                                row["null_s"] = M.metric_s_for_null(logits[:1])
                        from crab_tpu.media.masks import save_mask_png

                        name = f"{len(os.listdir(mask_dir)):06d}.png"
                        save_mask_png(logits, os.path.join(mask_dir, name), task.avss_head)
                        row["pred_mask"] = name
                    f.write(json.dumps(row) + "\n")
                sample_idx += len(batch)
    finally:
        # finalize the trace on ANY exit — a failing run is exactly
        # the one whose profile you want written
        prof.close()
    wall = time.time() - t0
    print(f"{len(records)} samples in {wall:.1f}s "
          f"({len(records)/max(wall,1e-9):.2f} clips/s)")

    summary: Dict = {"task": args.task, "n": len(records), "clips_per_s": len(records)/max(wall, 1e-9)}
    if task.avss_head:
        summary.update(M.avss_summarize(miou_sum, fsc_sum, cls_cnt))
    elif base_task in scorer.SCORERS:
        summary.update(scorer.SCORERS[base_task](scorer._load(fp)))
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary, indent=1))
    return summary


if __name__ == "__main__":
    main()
