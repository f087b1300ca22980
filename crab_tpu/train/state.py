"""Training state + jitted train step.

Replaces HF Trainer + DeepSpeed ZeRO-2 CPU-offload
(``scripts/pretrain/trainer.py``, ``deepspeed/stage2-offload.json``) with
optax under pjit: params/opt-state shard over the mesh (see
``runtime/sharding.py``), gradient reduction is a compiler-inserted
reduce-scatter/all-reduce over ICI, and selective training uses an optax
mask instead of requires_grad surgery
(``finetune_hyperlora.py:190-199``).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Sequence

import jax
import jax.numpy as jnp
import optax

from crab_tpu.core.config import CrabConfig
from crab_tpu.fusion.splice import IGNORE_LABEL
from crab_tpu.lm.llama import llama_apply
from crab_tpu.runtime.engine import splice_from_arrays
from crab_tpu.runtime.model import encode_audio, encode_video
from crab_tpu.seg.losses import avss_ce_loss, dice_loss, sigmoid_ce_loss
from crab_tpu.seg.seg_module import seg_apply
from crab_tpu.utils.diagnostics import param_path_name  # shared path naming


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Dict
    opt_state: Any


# ---------------------------------------------------------------------------
# trainable-parameter selection (the reference's save_modules mechanism)
# ---------------------------------------------------------------------------

STAGE_TRAINABLE = {
    # stage-1 per-modality pretrain: projector only, matching the shipped
    # launchers (pretrain_{visual,audio,seg}.sh all pass --lora_enable
    # False). pretrain.py:92-109 ALSO supports a standard decoder LoRA
    # over all linears — opt in via with_lora() / cli --train-lora.
    "pretrain_visual": ("vl_projector/",),
    "pretrain_audio": ("al_projector/",),
    "pretrain_seg": ("seg/",),
    # stage-2 joint finetune: projectors + MoE-LoRA
    # (finetune_hyperlora.sh:50  save_modules='vl_projector,al_projector,lora')
    "finetune": ("vl_projector/", "al_projector/", "/lora/"),
    # stage-3 AVS: seg head + embeddings + lm head
    # (finetune_hyper_lora_avs.sh:52; note 'decoder/embed' — a bare 'embed'
    # would also catch the frozen encoders' patch/position embeddings)
    "finetune_avs": ("seg/", "decoder/embed", "decoder/lm_head"),
    "all": ("",),
}


def with_lora(modules: Sequence[str]) -> tuple:
    """Add the decoder LoRA params to a stage's trainable set — the
    reference's optional stage-1 LoRA (``pretrain.py:92-109``, enabled
    by --lora_enable; the shipped pretrain .sh launchers leave it off)."""
    return tuple(modules) + ("/lora/",) if "/lora/" not in modules else tuple(modules)


def trainable_mask(params: Dict, modules: Sequence[str]) -> Dict:
    """True where any selector matches the param path (substring match,
    like the reference's ``save_modules`` filter)."""

    def match(path, leaf):
        # leading slash so prefix selectors like 'seg/' anchor cleanly
        name = "/" + param_path_name(path) + "/"
        return any(m != "" and m in name for m in modules) or "" in modules

    return jax.tree_util.tree_map_with_path(match, params)


def make_lr_schedule(
    peak_lr: float,
    total_steps: int,
    warmup_ratio: float = 0.03,
    kind: str = "cosine",
):
    """Reference schedule: HF cosine-with-warmup, warmup_ratio 0.03
    (``finetune_hyperlora.sh:85-87``). ``total_steps`` counts optimizer
    updates (i.e. accumulated steps, not micro-steps)."""
    if kind == "constant":
        return peak_lr
    warmup = max(int(total_steps * warmup_ratio), 1)
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=peak_lr,
        warmup_steps=warmup,
        decay_steps=max(total_steps, warmup + 1),
        end_value=0.0,
    )


def make_optimizer(
    learning_rate,
    modules: Sequence[str],
    params: Dict,
    weight_decay: float = 0.0,
    accum_steps: int = 1,
):
    """AdamW over the trainable subset. ``learning_rate`` may be a float or
    an optax schedule (see make_lr_schedule). ``accum_steps`` > 1 wraps the
    transform in optax.MultiSteps — gradient accumulation with the same
    semantics as the reference's ``gradient_accumulation_steps`` (HF
    Trainer + DeepSpeed, accum 8 => effective batch 32/device)."""
    tx = optax.adamw(learning_rate, b1=0.9, b2=0.999, weight_decay=weight_decay)
    mask = trainable_mask(params, modules)
    tx = optax.multi_transform(
        {"train": tx, "freeze": optax.set_to_zero()},
        jax.tree_util.tree_map(lambda t: "train" if t else "freeze", mask),
    )
    if accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum_steps)
    return tx


# ---------------------------------------------------------------------------
# frozen-parameter splitting: differentiate ONLY the trainable leaves.
# Taking grad over the full tree would materialize full-model-sized
# gradient buffers (14 GB at 7B) even though the optimizer discards them.
# Frozen leaves are replaced by 0-size dummies in the differentiated tree.
# ---------------------------------------------------------------------------


def split_trainable(params: Dict, mask: Dict) -> Dict:
    # dummies are always float32: grad() rejects integer leaves even at
    # size 0 (int8 quantized base weights live in the frozen set)
    return jax.tree_util.tree_map(
        lambda p, m: p if m else jnp.zeros((0,), jnp.float32), params, mask
    )


def merge_trainable(train_tree: Dict, params: Dict, mask: Dict) -> Dict:
    # stop_gradient on frozen leaves gives them symbolic-zero cotangents;
    # without it the scan backward still accumulates a full stacked-weight
    # cotangent buffer (~13.5 GB at 7B) before the pullback discards it
    return jax.tree_util.tree_map(
        lambda t, p, m: t if m else jax.lax.stop_gradient(p),
        train_tree,
        params,
        mask,
    )


# ---------------------------------------------------------------------------
# losses
# ---------------------------------------------------------------------------


def lm_loss(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """HF-style shifted CE: predict token t+1 from position t."""
    logits = logits[:, :-1]
    labels = labels[:, 1:]
    valid = labels != IGNORE_LABEL
    safe = jnp.where(valid, labels, 0)
    ce = optax.softmax_cross_entropy_with_integer_labels(logits, safe)
    return jnp.sum(ce * valid) / jnp.maximum(jnp.sum(valid), 1)


def seg_losses(
    masks: jnp.ndarray,  # (B, ncls, H, W) logits
    gt: jnp.ndarray,  # (B, H, W) binary float or int labels
    avss: bool,
    bce_weight: float = 1.0,
    dice_weight: float = 0.5,
) -> jnp.ndarray:
    """Mask loss mix with the reference's weight flags
    (``multimodal_encoder.py:459-491``; defaults bce 1.0 / dice 0.5 from
    ``finetune_hyperlora.sh`` --bce_loss_weight/--dice_loss_weight)."""
    B = masks.shape[0]
    if avss:
        return avss_ce_loss(masks, gt.astype(jnp.int32))
    pred = masks[:, 0]
    return bce_weight * sigmoid_ce_loss(pred, gt, B) + dice_weight * dice_loss(
        pred, gt, B
    )


# ---------------------------------------------------------------------------
# train step
# ---------------------------------------------------------------------------


def make_train_step(
    cfg: CrabConfig,
    optimizer,
    avs: bool = False,
    avss_head: bool = False,
    trainable: Dict = None,
    ce_weight: float = 1.0,
    bce_weight: float = 1.0,
    dice_weight: float = 0.5,
    dropout_seed: int = None,
):
    """Returns a jittable train_step(state, batch) -> (state, metrics).

    With ``trainable`` (a trainable_mask tree), gradients are computed
    ONLY for the selected leaves — required at 7B scale, where full-tree
    gradient buffers alone exceed HBM. Without it, the full tree is
    differentiated (fine for small configs) and the optimizer mask zeroes
    the frozen updates.

    ``ce/bce/dice_weight`` mirror the reference's --*_loss_weight flags.
    ``dropout_seed`` enables train-mode LoRA dropout (rate
    cfg.decoder.lora.dropout, ref default 0.05) with a per-step key
    derived from the state step — deterministic given the seed.

    batch (device arrays):
      media: {'audio': (B,T,ns)[, 'video'|'image': (B,T,H,W,3) u8]}
      text_ids, feat_idx, attention_mask, position_ids, labels: (B, L)
      mask_token_pos: (B, K)   [avs only]
      gt_mask: (B, H, W)       [avs only]
    """
    dtype = jnp.dtype(cfg.compute_dtype)

    def loss_fn(params, batch, step):
        media = batch["media"]
        parts = []
        seg_taps = None
        # seg_image: frame that feeds ONLY the seg head, never the prompt
        # (the reference computes multi-scale features from
        # X_modals['<image>'] without splicing it — unified_arch.py:229-251)
        taps_external = "seg_image" in media
        if "audio" in media:
            parts.append(encode_audio(params, cfg, media["audio"]))
        if "video" in media:
            tok, taps = encode_video(
                params, cfg, media["video"], avs and not taps_external
            )
            seg_taps = taps if taps is not None else seg_taps
            parts.append(tok)
        if "image" in media:
            tok, taps = encode_video(
                params, cfg, media["image"], avs and not taps_external
            )
            seg_taps = taps if taps is not None else seg_taps
            parts.append(tok)
        if avs and taps_external:
            _, seg_taps = encode_video(params, cfg, media["seg_image"], True)
        bank = jnp.concatenate(parts, axis=1)
        B, stride, D = bank.shape
        emb = splice_from_arrays(
            params["decoder"]["embed"],
            batch["text_ids"],
            batch["feat_idx"],
            bank.reshape(B * stride, D),
        ).astype(dtype)
        dropout_rng = None
        if dropout_seed is not None and cfg.decoder.lora is not None:
            dropout_rng = jax.random.fold_in(
                jax.random.PRNGKey(dropout_seed), step
            )
        logits, hidden, _, _ = llama_apply(
            params["decoder"],
            cfg.decoder,
            emb,
            attention_mask=batch["attention_mask"],
            position_ids=batch["position_ids"],
            remat=True,  # activation recompute: 7B backward fits on-chip
            dropout_rng=dropout_rng,
        )
        loss = ce_weight * lm_loss(logits, batch["labels"])
        metrics = {"lm_loss": loss}
        if avs:
            pos = batch["mask_token_pos"]  # (B, K)
            pred = jnp.take_along_axis(
                hidden, jnp.maximum(pos, 0)[..., None], axis=1
            ).astype(jnp.float32)
            masks = seg_apply(
                params["seg"],
                pred,
                seg_taps,
                cfg.seg,
                task="avss" if avss_head else "binary",
            )
            mloss = seg_losses(
                masks, batch["gt_mask"], avss_head, bce_weight, dice_weight
            )
            metrics["mask_loss"] = mloss
            loss = loss + mloss
        metrics["loss"] = loss
        return loss, metrics

    def train_step(state: TrainState, batch):
        if trainable is None:
            (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, batch, state.step
            )
            updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            return TrainState(state.step + 1, params, opt_state), metrics

        full = state.params
        train_tree = split_trainable(full, trainable)

        def loss_on_trainable(train_tree, batch):
            return loss_fn(
                merge_trainable(train_tree, full, trainable), batch, state.step
            )

        (loss, metrics), grads = jax.value_and_grad(
            loss_on_trainable, has_aux=True
        )(train_tree, batch)
        updates, opt_state = optimizer.update(grads, state.opt_state, train_tree)
        new_train = optax.apply_updates(train_tree, updates)
        params = merge_trainable(new_train, full, trainable)
        return TrainState(state.step + 1, params, opt_state), metrics

    return train_step


def init_train_state(params: Dict, optimizer, trainable: Dict = None) -> TrainState:
    target = params if trainable is None else split_trainable(params, trainable)
    return TrainState(jnp.zeros((), jnp.int32), params, optimizer.init(target))
