"""Serving CLI: JSONL requests in, JSONL results out.

The process-level entry for the serving engines (docs/SERVING.md). Reads
one JSON request per line from a file or stdin, serves them through
either the continuous-batching engine (default) or the dynamic-batching
server, and writes one JSON result per line.

Request line:  {"task": "avqa", "sample": {...}, "max_new": 100}
Result line:   {"id": i, "task": ..., "predict": text[, "mask_found": b]}
AVS mask logits are written as <out>/masks/<id>.png when --out is a
directory (same artifact shape as cli/evaluate.py).

Sample media fields are file paths (video_path/audio_path/image_path...)
resolved by the task's media recipe — identical schema to the evaluate
CLI annotations.

Usage:
  python -m crab_tpu.cli.serve --requests req.jsonl --out served \
      [checkpoint flags as in quick_start] [--engine continuous|batch] \
      [--slots 8 --chunk 16 --max-len 1280]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from typing import Dict, List


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--requests", required=True,
                   help="JSONL file of requests, or '-' for stdin")
    p.add_argument("--out", required=True)
    p.add_argument("--engine", choices=["continuous", "batch"],
                   default="continuous")
    p.add_argument("--slots", type=int, default=4)
    p.add_argument("--chunk", type=int, default=16)
    p.add_argument("--prefill-chunk", type=int, default=0,
                   help="admit prompts in pieces of N tokens, decoding "
                        "active slots between pieces (bounds the "
                        "admission stall); 0 = whole-prompt prefill")
    p.add_argument("--spec-k", type=int, default=0,
                   help="self-speculative decoding: verify N history-"
                        "drafted tokens per forward (greedy only, "
                        "token-identical; lm/spec.py)")
    p.add_argument("--spec-adaptive", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="with --spec-k on the continuous engine: fall "
                        "back to plain chunks when measured acceptance "
                        "is below break-even, re-probing every 8th "
                        "chunk. DEFAULT ON: tokens are identical either "
                        "way, and fixed spec loses to plain on low-"
                        "acceptance traffic (SERVE_r03.json -15% at 0.34 "
                        "acceptance; SERVE_r05.json par at 0.40 = the "
                        "modeled break-even), so the gated mode is the "
                        "safe default (--no-spec-adaptive for fixed "
                        "spec)")
    p.add_argument("--max-len", type=int, default=1280)
    p.add_argument("--llm", choices=["llama", "qwen"], default="llama")
    p.add_argument("--llama", default="")
    p.add_argument("--clip", default="")
    p.add_argument("--beats", default="")
    p.add_argument("--tokenizer", default="")
    p.add_argument("--delta", default="")
    p.add_argument("--avs-delta", default="")
    p.add_argument("--random-init", action="store_true")
    p.add_argument("--int8", action="store_true")
    p.add_argument("--enc-int8", action="store_true",
                   help="W8A8 CLIP+BEATs encoders (2x MXU rate on the "
                        "encode stage; ~1e-2 rel numerics — serving "
                        "only, not for parity evals)")
    p.add_argument("--kv-quant", action="store_true",
                   help="int8 KV cache — batch engine: KVCacheQ decode; "
                        "continuous engine: int8 slot caches (SlotStateQ, "
                        "half the per-slot HBM)")
    p.add_argument("--a8-prefill", action="store_true")
    p.add_argument("--flash-prefill", action="store_true",
                   help="Pallas online-softmax prefill attention (whole-"
                        "row blocks; same math as the XLA path but not "
                        "bit-parity — serving only)")
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--temperature", type=float, default=0.0,
                   help="sampling temperature; 0 = greedy (default)")
    p.add_argument("--top-k", type=int, default=0)
    p.add_argument("--top-p", type=float, default=1.0)
    p.add_argument("--seed", type=int, default=0, help="sampling seed")
    args = p.parse_args(argv)

    from crab_tpu.cli.quick_start import (
        build_params,
        build_tokenizer,
        select_model,
    )
    from crab_tpu.runtime.engine import InferenceEngine

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
        sample_seed=args.seed,
        # the continuous engine speculates in its own slot loop; the batch
        # engine speculates inside generate (lm/spec.spec_generate)
        spec_k=args.spec_k if args.engine == "batch" else 0,
    )

    src = sys.stdin if args.requests == "-" else open(args.requests)
    requests: List[Dict] = [json.loads(ln) for ln in src if ln.strip()]
    if src is not sys.stdin:
        src.close()

    os.makedirs(args.out, exist_ok=True)
    t0 = time.time()
    spec_summary = {}
    if args.engine == "continuous":
        from crab_tpu.runtime.continuous import ContinuousEngine

        cb = ContinuousEngine(
            engine, slots=args.slots, max_len=args.max_len, chunk=args.chunk,
            prefill_chunk=args.prefill_chunk, spec_k=args.spec_k,
            spec_adaptive=args.spec_adaptive,
        )
        results = cb.run_requests(requests)
        if args.spec_k:
            spec_summary = {
                "spec_k": args.spec_k,
                "spec_adaptive": cb.spec_adaptive,
                "spec_accepted": int(cb.spec_accepted),
                "spec_chunks": int(cb.spec_chunks),
                "plain_chunks": int(cb.plain_chunks),
            }
    else:
        import dataclasses

        from crab_tpu.runtime.server import CrabServer
        from crab_tpu.tasks.registry import TASKS

        # honor per-request max_new: the dynamic-batching server groups
        # by task name, so each distinct (task, max_new) pair gets a
        # registered variant — requests with the same cap batch together
        def task_for(r):
            mn = r.get("max_new")
            base = TASKS[r["task"]]
            if not mn or mn == base.max_new_tokens:
                return r["task"]
            name = f"{r['task']}#mn{mn}"
            if name not in TASKS:
                TASKS[name] = dataclasses.replace(
                    base, name=name, max_new_tokens=mn
                )
            return name

        server = CrabServer(engine, max_batch=args.slots)
        futs = [server.submit(task_for(r), r["sample"]) for r in requests]
        outs = [f.result() for f in futs]
        server.shutdown()
        results = []
        for o in outs:
            d: Dict = {"text": o.text, "tokens": list(o.tokens)}
            if o.mask is not None:
                d["masks"] = o.mask
                d["mask_found"] = o.mask_found
            results.append(d)
    dt = time.time() - t0

    mask_dir = os.path.join(args.out, "masks")
    out_path = os.path.join(args.out, "results.jsonl")
    with open(out_path, "w") as f:
        for i, (req, res) in enumerate(zip(requests, results)):
            row = {"id": i, "task": req["task"], "predict": res["text"]}
            if res.get("error"):
                # distinguish failed requests from genuinely empty decodes
                row["error"] = res["error"]
            if res.get("masks") is not None:
                from crab_tpu.media.masks import save_mask_png

                os.makedirs(mask_dir, exist_ok=True)
                from crab_tpu.tasks.registry import TASKS

                save_mask_png(
                    res["masks"],
                    os.path.join(mask_dir, f"{i}.png"),
                    TASKS[req["task"]].avss_head,
                )
                row["mask_found"] = res.get("mask_found")
                row["mask_path"] = os.path.join(mask_dir, f"{i}.png")
            f.write(json.dumps(row) + "\n")
    summary = {
        "requests": len(requests),
        "wall_s": round(dt, 2),
        "requests_per_s": round(len(requests) / max(dt, 1e-9), 3),
        "engine": args.engine,
        **spec_summary,
    }
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f)
    print(
        f"served {len(requests)} requests in {dt:.1f}s "
        f"({len(requests)/max(dt,1e-9):.2f} req/s) -> {out_path}"
    )
    if spec_summary:
        print(f"spec: {json.dumps(spec_summary)}")


if __name__ == "__main__":
    main()
