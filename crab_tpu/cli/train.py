"""Training CLI — the analogue of ``scripts/pretrain/pretrain.py`` and
``scripts/finetune/finetune_hyperlora*.py``.

Three-stage recipe (SURVEY.md §5 checkpoint layout):
  stage 1: --stage pretrain_{visual,audio,seg}   (projector / seg pretrain)
  stage 2: --stage finetune                      (joint MoE-LoRA, 9 tasks)
  stage 3: --stage finetune_avs                  (seg + embeddings + head)

Each stage trains only its reference-matching module subset
(train.state.STAGE_TRAINABLE) and exports both a full orbax checkpoint
(preemption-safe, optimizer included — unlike the reference, which drops
optimizer state) and a reference-style filtered delta.

Usage:
  python -m crab_tpu.cli.train --stage finetune \
      --annotations avqa=ann/avqa.json,s4=ann/s4.json \
      [--llama DIR --clip DIR --beats F.pt --tokenizer DIR] \
      [--random-init --tiny] --out runs/stage2 --epochs 1 --batch-size 4
"""

from __future__ import annotations

import argparse
import json
import os
import time
from typing import Dict

import numpy as np


def _fit_batch_media(batch: Dict, cfg) -> Dict:
    """Host-side resize of frames/gt to the configured sizes (mirrors
    InferenceEngine._fit_media for the train path: PIL bicubic for
    frames, so train and eval see identical pixels; cv2 nearest for
    label masks)."""
    import cv2
    from PIL import Image

    size = cfg.vision.image_size
    media = dict(batch["media"])
    for key in ("video", "image", "seg_image"):
        if key in media and media[key].shape[2] != size:
            media[key] = np.stack(
                [
                    np.stack(
                        [
                            np.asarray(
                                Image.fromarray(f).resize((size, size)),
                                np.uint8,
                            )
                            for f in frames
                        ]
                    )
                    for frames in media[key]
                ]
            )
    batch = dict(batch)
    batch["media"] = media
    if "gt_mask" in batch and batch["gt_mask"].shape[-1] != cfg.seg.output_mask_size:
        s = cfg.seg.output_mask_size
        interp = cv2.INTER_NEAREST
        batch["gt_mask"] = np.stack(
            [cv2.resize(np.asarray(m, np.float32), (s, s), interpolation=interp)
             for m in batch["gt_mask"]]
        ).astype(batch["gt_mask"].dtype)
    return batch


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--stage", required=True,
                   choices=["pretrain_visual", "pretrain_audio", "pretrain_seg",
                            "finetune", "finetune_avs", "all"])
    p.add_argument("--annotations", required=True,
                   help="task=path[,task=path...]")
    p.add_argument("--llm", choices=["llama", "qwen"], default="llama")
    p.add_argument("--llama", default="", help="HF decoder checkpoint dir")
    p.add_argument("--clip", default="")
    p.add_argument("--beats", default="")
    p.add_argument("--tokenizer", default="")
    p.add_argument("--delta", default="", help="previous-stage delta to load")
    p.add_argument("--avs-delta", default="",
                   help="stage-3 AVS delta to load (resume/extend)")
    p.add_argument("--out", required=True)
    p.add_argument("--random-init", action="store_true")
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--accum-steps", type=int, default=1,
                   help="gradient accumulation (ref stage-2 uses 8)")
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--lr-schedule", choices=["cosine", "constant"],
                   default="cosine", help="ref: cosine w/ warmup_ratio 0.03")
    p.add_argument("--warmup-ratio", type=float, default=0.03)
    p.add_argument("--weight-decay", type=float, default=0.0)
    p.add_argument("--ce-weight", type=float, default=1.0)
    p.add_argument("--bce-weight", type=float, default=1.0)
    p.add_argument("--dice-weight", type=float, default=0.5)
    p.add_argument("--no-dropout", action="store_true",
                   help="disable LoRA dropout (ref trains with 0.05)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--train-lora", action="store_true",
                   help="stage-1: also train a decoder LoRA "
                        "(pretrain.py:92-109; off in the shipped .sh)")
    p.add_argument("--prefetch", type=int, default=2,
                   help="collate N batches ahead on worker threads so "
                        "host media decode overlaps the train step "
                        "(0 = synchronous)")
    p.add_argument("--group-by-length", action="store_true",
                   help="sort each shuffled megabatch window by text "
                        "length before cutting batches (the reference's "
                        "group_by_modality_length sampler, "
                        "pretrain/trainer.py:129; less padding waste)")
    p.add_argument("--save-every", type=int, default=200)
    p.add_argument("--log-every", type=int, default=1)
    p.add_argument("--resume", default="", help="orbax checkpoint to resume")
    p.add_argument("--tensorboard", action="store_true",
                   help="write TF event files (ref: --report_to tensorboard)")
    p.add_argument("--data-parallel", type=int, default=0,
                   help="devices on the data axis (0 = all)")
    p.add_argument("--model-parallel", type=int, default=1)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from crab_tpu.core.mesh import MeshSpec, make_mesh
    from crab_tpu.runtime.sharding import shard_crab_params
    from crab_tpu.tasks.datasets import TrainCollator, TrainDataset, task_batches
    from crab_tpu.tasks.registry import TASKS
    from crab_tpu.train import checkpoint as ckpt
    from crab_tpu.train.state import (
        STAGE_TRAINABLE,
        init_train_state,
        make_lr_schedule,
        make_optimizer,
        make_train_step,
        with_lora,
    )
    from crab_tpu.utils.diagnostics import StageTimer
    from crab_tpu.cli.quick_start import build_params, build_tokenizer, select_model

    cfg, special, chat_style, _ = select_model(args)
    tokenizer = build_tokenizer(args, special)

    annotations = dict(kv.split("=", 1) for kv in args.annotations.split(","))
    dataset = TrainDataset(annotations, special, chat_style=chat_style)
    collator = TrainCollator(tokenizer, special, cfg)
    print(f"dataset: {len(dataset)} examples over {sorted(annotations)}")

    params = build_params(args, cfg)
    n_dev = jax.device_count()
    dp = args.data_parallel or max(n_dev // args.model_parallel, 1)
    mesh = make_mesh(MeshSpec(data=dp, model=args.model_parallel))
    if dp * args.model_parallel > 1:
        params = shard_crab_params(params, mesh)

    modules = STAGE_TRAINABLE[args.stage]
    if args.train_lora:
        modules = with_lora(modules)
    import math

    steps_per_epoch = max(math.ceil(len(dataset) / args.batch_size), 1)
    total_updates = max(args.epochs * steps_per_epoch // args.accum_steps, 1)
    schedule = make_lr_schedule(
        args.lr, total_updates, args.warmup_ratio, args.lr_schedule
    )
    optimizer = make_optimizer(
        schedule, modules, params, args.weight_decay, accum_steps=args.accum_steps
    )
    # trainable-parameter report (the reference dumps
    # model_trainable_params.txt — finetune_hyperlora.py:202-218)
    from crab_tpu.train.state import trainable_mask

    os.makedirs(args.out, exist_ok=True)
    from crab_tpu.utils.diagnostics import param_path_name

    mask = trainable_mask(params, modules)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_m = jax.tree_util.tree_leaves(mask)
    total = trainable = 0
    # one pass writes both reference-parity dumps: trainable_params.txt
    # and model.txt (finetune_hyperlora.py:202-218 writes the pair)
    with open(os.path.join(args.out, "trainable_params.txt"), "w") as ft, \
            open(os.path.join(args.out, "model.txt"), "w") as fm:
        fm.write(f"{cfg.name}\n")
        for (path, leaf), m in zip(flat, flat_m):
            n = int(np.prod(leaf.shape))
            total += n
            name = param_path_name(path)
            fm.write(f"{name} {tuple(leaf.shape)} {leaf.dtype}\n")
            if m:
                trainable += n
                ft.write(f"{name} {tuple(leaf.shape)} {n}\n")
        ft.write(f"\ntrainable {trainable} / total {total} "
                 f"({100.0 * trainable / max(total,1):.3f}%)\n")
    print(f"trainable params: {trainable:,} / {total:,}")
    with open(os.path.join(args.out, "run_config.json"), "w") as f:
        json.dump(
            {"model": cfg.name, **{k: v for k, v in vars(args).items()
                                   if isinstance(v, (str, int, float, bool))}},
            f, indent=1,
        )
    state = init_train_state(params, optimizer, trainable=mask)
    if args.resume:
        state = ckpt.restore_state(args.resume, state)
        print(f"resumed from {args.resume} at step {int(state.step)}")

    steps = {}  # (is_avs, avss) -> jitted step
    timer = StageTimer()
    os.makedirs(args.out, exist_ok=True)
    log_fp = open(os.path.join(args.out, "train_log.jsonl"), "a")
    tb = None
    if args.tensorboard:
        from crab_tpu.utils.tb_writer import TBWriter

        tb = TBWriter(os.path.join(args.out, "tb"))

    # preemption-safe: checkpoint full state (incl. optimizer) on SIGTERM —
    # the reference loses optimizer state on any interruption (SURVEY §5)
    import signal

    preempted = {"flag": False}

    def _on_sigterm(signum, frame):
        preempted["flag"] = True

    signal.signal(signal.SIGTERM, _on_sigterm)

    global_step = int(state.step)
    for epoch in range(args.epochs):
        for batch in task_batches(
            dataset, collator, args.batch_size, prefetch=args.prefetch,
            group_by_length=args.group_by_length,
        ):
            is_avs = "gt_mask" in batch
            avss = bool(
                is_avs and batch["gt_mask"].dtype in (np.int32, np.int64)
            )
            key = (is_avs, avss)
            if key not in steps:
                lora = cfg.decoder.lora
                dropout_seed = (
                    args.seed
                    if lora is not None and lora.dropout > 0 and not args.no_dropout
                    else None
                )
                # donate the state: the step returns a full new
                # TrainState and without donation XLA holds TWO copies
                # of the 7B params (measured: args 7.8 GB + out 7.8 GB,
                # alias 0 -> RESOURCE_EXHAUSTED on a 16 GB chip)
                steps[key] = jax.jit(
                    make_train_step(
                        cfg,
                        optimizer,
                        avs=is_avs,
                        avss_head=avss,
                        trainable=mask,
                        ce_weight=args.ce_weight,
                        bce_weight=args.bce_weight,
                        dice_weight=args.dice_weight,
                        dropout_seed=dropout_seed,
                    ),
                    donate_argnums=0,
                )
            batch = _fit_batch_media(batch, cfg)
            batch = jax.tree_util.tree_map(jnp.asarray, batch)
            with timer.stage("step", sync=None):
                state, metrics = steps[key](state, batch)
            global_step += 1
            if global_step % args.log_every == 0:
                m = {k: float(v) for k, v in metrics.items()}
                m.update(step=global_step, epoch=epoch)
                log_fp.write(json.dumps(m) + "\n")
                log_fp.flush()
                print(f"step {global_step}: {m}")
                if tb is not None:
                    for k, v in m.items():
                        if k not in ("step", "epoch"):
                            tb.add_scalar(f"train/{k}", v, global_step)
                    if callable(schedule):
                        tb.add_scalar(
                            "train/lr",
                            float(schedule(global_step // args.accum_steps)),
                            global_step,
                        )
                    tb.flush()
            if preempted["flag"]:
                path = os.path.join(args.out, f"ckpt_preempt_{global_step}")
                ckpt.save_state(path, state)
                print(f"SIGTERM: state saved to {path}; exiting")
                return
            if global_step % args.save_every == 0:
                ckpt.save_state(os.path.join(args.out, f"ckpt_{global_step}"), state)
        # end of epoch: full checkpoint + reference-style delta
        ckpt.save_state(os.path.join(args.out, f"ckpt_{global_step}"), state)
        ckpt.export_delta(
            os.path.join(args.out, f"delta_{args.stage}.npz"),
            jax.device_get(state.params),
            modules,
        )
    print(f"done. {timer.report()}")


if __name__ == "__main__":
    main()
