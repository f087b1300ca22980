"""Quick-start CLI — the analogue of ``scripts/quick_start.py``.

Runs any of the nine tasks on custom samples described by a JSON file with
the same schema as the reference's ``data/example.json``. With real
checkpoints it reproduces the reference pipeline; without (--random-init)
it exercises the full stack with random weights (useful for smoke tests
and benchmarking on machines without the model artifacts).

Usage:
  python -m crab_tpu.cli.quick_start --examples data/example.json \
      --llama /path/llama-2-7b-chat --clip /path/clip-vit-l --beats b.pt \
      --delta finetune_weights.bin [--avs-delta avs.bin] --out out/
  python -m crab_tpu.cli.quick_start --examples ex.json --random-init --tiny
"""

from __future__ import annotations

import zlib

import argparse
import json
import os
from typing import Dict

import numpy as np


def select_model(args):
    """(cfg, special_tokens, chat_style, eos_id) for --llm / --tiny —
    the reference's ``--llm_name llama|qwen`` switch
    (``finetune_hyperlora.py:44-45``)."""
    from crab_tpu.core.config import (
        backbone_preset,
        crab_qwen_tiny,
        crab_tiny,
    )
    from crab_tpu.fusion.tokens import SpecialTokens

    llm = getattr(args, "llm", "llama")
    if getattr(args, "tiny", False):
        tiny = crab_qwen_tiny() if llm == "qwen" else crab_tiny()
        return tiny, SpecialTokens(base_vocab=400), llm, 2
    # checkpoint-format constants live in one place (core/config.py):
    # LLaMA-2 </s>=2 over 32000; Qwen2 <|im_end|>=151645 over 151646
    base_cfg, base_vocab, eos_id = backbone_preset(llm)
    return base_cfg(), SpecialTokens(base_vocab=base_vocab), llm, eos_id


def build_params(args, cfg):
    import jax

    from crab_tpu.runtime.model import init_crab

    if args.random_init:
        if getattr(args, "int8", False):
            # int8 applies to random weights too — at 7B the bf16 tree
            # alone (13.5 GB) would OOM a 16 GB chip before the host
            # quantizer ever ran, so init the decoder directly in int8
            # (same recipe as bench.py)
            from crab_tpu.lm.quant import init_llama_int8

            params = init_crab(
                jax.random.PRNGKey(0), cfg, skip=("decoder",)
            )
            params["decoder"] = init_llama_int8(
                jax.random.PRNGKey(1), cfg.decoder,
                jax.numpy.dtype(cfg.param_dtype),
            )
        else:
            params = init_crab(jax.random.PRNGKey(0), cfg)
        if getattr(args, "enc_int8", False):
            from crab_tpu.encoders.quantize import quantize_encoders

            params = quantize_encoders(params)
        return params
    from crab_tpu.runtime import loading

    params = init_crab(jax.random.PRNGKey(0), cfg)
    if args.llama:
        params["decoder"] = loading.load_decoder(args.llama, cfg)
    if args.clip:
        params["vision"] = loading.load_clip(args.clip, cfg)
    if args.beats:
        params["audio"] = loading.load_beats(args.beats, cfg)
    if args.delta:
        params = loading.apply_reference_delta(params, args.delta, cfg)
    if getattr(args, "avs_delta", ""):
        params = loading.apply_reference_delta(params, args.avs_delta, cfg)
    if getattr(args, "int8", False):
        from crab_tpu.lm.quant import quantize_decoder_host

        params["decoder"] = quantize_decoder_host(params["decoder"])
    if getattr(args, "enc_int8", False):
        from crab_tpu.encoders.quantize import quantize_encoders

        params = quantize_encoders(params)
    return params


def build_tokenizer(args, special):
    if args.tokenizer:
        from transformers import AutoTokenizer

        tok = AutoTokenizer.from_pretrained(args.tokenizer, local_files_only=True)
        from crab_tpu.fusion.tokens import extend_hf_tokenizer

        extend_hf_tokenizer(tok)

        class HFWrap:
            def encode(self, text):
                return tok.convert_tokens_to_ids(tok.tokenize(text))

            def decode(self, ids):
                return tok.decode(ids, skip_special_tokens=False)

        return HFWrap()

    class Fallback:
        def encode(self, text):
            out = []
            lim = max(special.base_vocab - 10, 10)
            for w in text.replace(">", "> ").replace("<", " <").split():
                out.append(special.token_to_id.get(w, 7 + (zlib.crc32(w.encode()) % lim)))
            return out

        def decode(self, ids):
            return " ".join(str(i) for i in ids)

    return Fallback()


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--examples", required=True, help="example.json-style file")
    p.add_argument("--llm", choices=["llama", "qwen"], default="llama",
                   help="decoder family (ref --llm_name)")
    p.add_argument("--llama", default="", help="HF decoder checkpoint dir")
    p.add_argument("--clip", default="", help="HF CLIP ViT-L dir")
    p.add_argument("--beats", default="", help="BEATs .pt checkpoint")
    p.add_argument("--tokenizer", default="", help="HF tokenizer dir")
    p.add_argument("--delta", default="", help="finetune_weights.bin")
    p.add_argument("--avs-delta", default="", help="AVS stage-3 delta")
    p.add_argument("--out", default="quick_start_out")
    p.add_argument("--random-init", action="store_true")
    p.add_argument("--int8", action="store_true",
                   help="int8 weight-only decoder (single-chip serving)")
    p.add_argument("--enc-int8", action="store_true",
                   help="W8A8 CLIP+BEATs encoders (2x MXU rate on the "
                        "encode stage; ~1e-2 rel numerics — serving "
                        "only, not for parity evals)")
    p.add_argument("--a8-prefill", action="store_true",
                   help="W8A8 prefill with int8 weights (2x MXU rate; "
                        "near-lossless but not bit-parity)")
    p.add_argument("--kv-quant", action="store_true",
                   help="int8 KV cache (Pallas decode attention)")
    p.add_argument("--flash-prefill", action="store_true",
                   help="Pallas online-softmax prefill attention (whole-"
                        "row blocks; same math as the XLA path but not "
                        "bit-parity — serving only)")
    p.add_argument("--tiny", action="store_true", help="tiny config (smoke test)")
    p.add_argument("--score-unfound", action="store_true",
                   help="score masks even when the decode lacks the six "
                        "<mask_i> tokens (the reference skips them; useful "
                        "for random-weight smoke runs)")
    p.add_argument("--max-new-tokens", type=int, default=0, help="override")
    p.add_argument("--temperature", type=float, default=0.0,
                   help="sampling temperature; 0 = greedy (reference default)")
    p.add_argument("--top-k", type=int, default=0)
    p.add_argument("--top-p", type=float, default=1.0)
    p.add_argument("--seed", type=int, default=0, help="sampling seed")
    p.add_argument("--spec-k", type=int, default=0,
                   help="self-speculative decoding: verify N history-"
                        "drafted tokens per forward (greedy only; composes"
                        " with --kv-quant; token-identical; lm/spec.py)")
    args = p.parse_args(argv)

    from crab_tpu.runtime.engine import InferenceEngine
    from crab_tpu.tasks import metrics as M
    from crab_tpu.tasks.registry import TASKS

    cfg, special, chat_style, eos_id = select_model(args)
    if args.kv_quant or args.a8_prefill or args.flash_prefill:
        import dataclasses

        cfg = cfg.replace(decoder=dataclasses.replace(
            cfg.decoder, kv_quant=args.kv_quant,
            int8_activations=args.a8_prefill,
            prefill_attn="flash" if args.flash_prefill else "xla",
            flash_block_q=768, flash_block_k=768))
    params = build_params(args, cfg)
    tokenizer = build_tokenizer(args, special)
    engine = InferenceEngine(
        cfg, params, tokenizer, special, chat_style=chat_style, eos_id=eos_id,
        temperature=args.temperature, top_k=args.top_k, top_p=args.top_p,
        sample_seed=args.seed, spec_k=args.spec_k,
    )

    with open(args.examples) as f:
        examples = json.load(f)
    os.makedirs(args.out, exist_ok=True)
    results_fp = os.path.join(args.out, "results.jsonl")

    with open(results_fp, "w") as rf:
        for ex in examples:
            task_name = ex.pop("task")
            task = TASKS[task_name]
            if args.max_new_tokens > 0 and (
                task.max_new_tokens != args.max_new_tokens
            ):
                import dataclasses as _dc

                task = _dc.replace(task, max_new_tokens=args.max_new_tokens)
                TASKS[task_name] = task
            out = engine.run(task_name, [ex])
            record: Dict = {"task": task_name, "predict": out.texts[0]}
            if task.is_avs and out.mask_found is not None:
                record["mask_found"] = bool(out.mask_found[0])
            if task.is_avs and out.masks is not None and (
                args.score_unfound or out.mask_found is None or out.mask_found[0]
            ):
                mask_logits = out.masks[0]
                if mask_logits.shape[-1] != 224:  # tiny-config smoke runs
                    import cv2

                    mask_logits = np.stack(
                        [
                            cv2.resize(c, (224, 224), interpolation=cv2.INTER_LINEAR)
                            for c in mask_logits
                        ]
                    )
                np.save(
                    os.path.join(args.out, f"{task_name}_mask.npy"), mask_logits
                )
                if ex.get("mask_path"):
                    if task.avss_head:
                        from crab_tpu.media.masks import load_avss_label_mask

                        gt = load_avss_label_mask(ex["mask_path"])
                        miou, fsc, cnt, _ = M.calc_color_miou_fscore(
                            mask_logits[None], gt
                        )
                        record.update(M.avss_summarize(miou, fsc, cnt))
                    else:
                        from crab_tpu.media.masks import load_binary_mask

                        gt = load_binary_mask(ex["mask_path"])
                        record["miou"] = M.mask_iou(mask_logits[:1], gt)
                        record["fscore"] = M.eval_fmeasure(mask_logits[:1], gt)
            rf.write(json.dumps(record) + "\n")
            print(f"[{task_name}] {record}")
    print(f"results -> {results_fp}")


if __name__ == "__main__":
    main()
