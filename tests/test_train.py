"""Training-stack tests: selective training, loss drop, delta export,
and multi-device sharded training on the 8-CPU mesh."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from crab_tpu.core.config import crab_tiny
from crab_tpu.core.mesh import MeshSpec, make_mesh
from crab_tpu.fusion.splice import IGNORE_LABEL, SampleSpec, build_splice_batch
from crab_tpu.fusion.tokens import SpecialTokens
from crab_tpu.runtime.model import init_crab
from crab_tpu.runtime.sharding import shard_crab_params
from crab_tpu.train.checkpoint import export_delta, load_delta
from crab_tpu.train.state import (
    STAGE_TRAINABLE,
    TrainState,
    init_train_state,
    lm_loss,
    make_optimizer,
    make_train_step,
    trainable_mask,
)

CFG = crab_tiny(vocab_size=417)
SPECIAL = SpecialTokens(base_vocab=400)


def _make_batch(rng, B=2, avs=False):
    q = CFG.al_projector.num_query_tokens
    ids = np.array(
        [5, 6, SPECIAL.id("<image>"), 7, SPECIAL.id("<audio>"), 8], np.int64
    )
    target = [9, 10, 11]
    if avs:
        target = [9, SPECIAL.id("<mask_start>")] + SPECIAL.mask_token_ids + [
            SPECIAL.id("<mask_end>")
        ]
    full = np.concatenate([ids, target])
    labels = np.full(len(full), IGNORE_LABEL, np.int64)
    labels[len(ids):] = target
    specs = [
        SampleSpec(full, {"<image>": q, "<audio>": q}, labels, "s4") for _ in range(B)
    ]
    sb = build_splice_batch(specs, SPECIAL)
    batch = {
        "media": {
            "audio": jnp.asarray(
                rng.standard_normal((B, 1, 16000)).astype(np.float32) * 0.05
            ),
            "image": jnp.asarray(
                rng.integers(0, 255, (B, 1, 56, 56, 3)).astype(np.uint8)
            ),
        },
        "text_ids": jnp.asarray(sb.text_ids),
        "feat_idx": jnp.asarray(sb.feat_idx),
        "attention_mask": jnp.asarray(sb.attention_mask),
        "position_ids": jnp.asarray(sb.position_ids),
        "labels": jnp.asarray(sb.labels),
    }
    if avs:
        batch["mask_token_pos"] = jnp.asarray(sb.mask_token_pos)
        batch["gt_mask"] = jnp.asarray(
            (rng.random((B, CFG.seg.output_mask_size, CFG.seg.output_mask_size)) > 0.5
             ).astype(np.float32)
        )
    return batch


def test_trainable_mask_selects_reference_modules():
    params = init_crab(jax.random.PRNGKey(0), CFG)
    mask = trainable_mask(params, STAGE_TRAINABLE["finetune"])
    assert mask["vl_projector"]["mlp"]["fc1"]["w"]
    assert mask["al_projector"]["ln_in"]["scale"]
    assert mask["decoder"]["layers"]["q"]["lora"]["A"]
    assert not mask["decoder"]["layers"]["q"]["w"]
    assert not mask["vision"]["pre_ln"]["scale"]
    mask3 = trainable_mask(params, STAGE_TRAINABLE["finetune_avs"])
    assert mask3["seg"]["text_fc"]["fc1"]["w"]
    assert mask3["decoder"]["embed"]
    assert mask3["decoder"]["lm_head"]
    assert not mask3["decoder"]["layers"]["q"]["lora"]["A"]


@pytest.mark.slow
def test_train_step_reduces_loss_and_freezes():
    rng = np.random.default_rng(0)
    params = init_crab(jax.random.PRNGKey(1), CFG)
    opt = make_optimizer(3e-3, STAGE_TRAINABLE["finetune"], params)
    step = jax.jit(make_train_step(CFG, opt))
    state = init_train_state(params, opt)
    batch = _make_batch(rng)
    frozen_before = np.asarray(state.params["decoder"]["layers"]["q"]["w"])
    trained_before = np.asarray(state.params["vl_projector"]["mlp"]["fc1"]["w"])
    losses = []
    for _ in range(8):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] * 0.9, losses
    np.testing.assert_array_equal(
        frozen_before, np.asarray(state.params["decoder"]["layers"]["q"]["w"])
    )
    assert not np.allclose(
        trained_before, np.asarray(state.params["vl_projector"]["mlp"]["fc1"]["w"])
    )


@pytest.mark.slow
def test_avs_train_step():
    rng = np.random.default_rng(1)
    params = init_crab(jax.random.PRNGKey(2), CFG)
    opt = make_optimizer(1e-3, STAGE_TRAINABLE["finetune_avs"], params)
    step = jax.jit(make_train_step(CFG, opt, avs=True))
    state = init_train_state(params, opt)
    batch = _make_batch(rng, avs=True)
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["mask_loss"]))
    assert float(metrics["loss"]) > float(metrics["lm_loss"]) - 1e-6


@pytest.mark.slow
def test_delta_export_roundtrip(tmp_path):
    params = init_crab(jax.random.PRNGKey(3), CFG)
    path = str(tmp_path / "delta.npz")
    export_delta(path, params, STAGE_TRAINABLE["finetune"])
    # perturb, then restore from delta
    perturbed = jax.tree_util.tree_map(lambda x: x + 1.0, params)
    restored = load_delta(path, perturbed)
    np.testing.assert_array_equal(
        np.asarray(restored["vl_projector"]["mlp"]["fc1"]["w"]),
        np.asarray(params["vl_projector"]["mlp"]["fc1"]["w"]),
    )
    # non-delta params keep the perturbed values
    np.testing.assert_array_equal(
        np.asarray(restored["decoder"]["layers"]["q"]["w"]),
        np.asarray(perturbed["decoder"]["layers"]["q"]["w"]),
    )
    import json

    with open(path + ".manifest.json") as f:
        manifest = json.load(f)
    assert any("lora" in k for k in manifest["keys"])
    assert not any(k.startswith("vision/") for k in manifest["keys"])


@pytest.mark.slow
def test_sharded_train_step_8cpu():
    """DP+TP train step over the virtual 8-device mesh."""
    assert jax.device_count() >= 8, "conftest must provide 8 CPU devices"
    mesh = make_mesh(MeshSpec(data=4, model=2))
    rng = np.random.default_rng(2)
    params = init_crab(jax.random.PRNGKey(4), CFG)
    with jax.set_mesh(mesh) if hasattr(jax, "set_mesh") else mesh:
        sharded = shard_crab_params(params, mesh)
        opt = make_optimizer(1e-3, STAGE_TRAINABLE["finetune"], sharded)
        step = jax.jit(make_train_step(CFG, opt))
        state = init_train_state(sharded, opt)
        batch = _make_batch(rng, B=4)
        state, metrics = step(state, batch)
        l1 = float(metrics["loss"])
        state, metrics = step(state, batch)
        assert np.isfinite(l1) and np.isfinite(float(metrics["loss"]))
    # parity with the unsharded step
    opt_u = make_optimizer(1e-3, STAGE_TRAINABLE["finetune"], params)
    step_u = jax.jit(make_train_step(CFG, opt_u))
    state_u = init_train_state(params, opt_u)
    _, m_u = step_u(state_u, batch)
    np.testing.assert_allclose(l1, float(m_u["loss"]), rtol=2e-3)


def test_trainable_mask_precision():
    """Selectors must not leak into frozen encoder embeddings
    ('embed' vs audio/patch_embedding regression)."""
    params = init_crab(jax.random.PRNGKey(9), CFG)
    mask = trainable_mask(params, STAGE_TRAINABLE["finetune_avs"])
    assert mask["decoder"]["embed"]
    assert mask["decoder"]["lm_head"]
    assert mask["seg"]["no_mask_embed"]
    assert not mask["audio"]["patch_embedding"]["w"]
    assert not mask["vision"]["position_embedding"]
    assert not mask["vl_projector"]["qformer"]["emb_ln"]["scale"]


@pytest.mark.slow
def test_split_trainable_step_matches_full():
    """Trainable-only differentiation gives the same update as the full
    masked step (and allocates no frozen-size gradient buffers)."""
    from crab_tpu.train.state import merge_trainable, split_trainable

    rng = np.random.default_rng(5)
    params = init_crab(jax.random.PRNGKey(6), CFG)
    mask = trainable_mask(params, STAGE_TRAINABLE["finetune"])
    opt_full = make_optimizer(1e-3, STAGE_TRAINABLE["finetune"], params)
    step_full = jax.jit(make_train_step(CFG, opt_full))
    s_full = init_train_state(params, opt_full)

    opt_split = make_optimizer(1e-3, STAGE_TRAINABLE["finetune"], params)
    step_split = jax.jit(make_train_step(CFG, opt_split, trainable=mask))
    s_split = init_train_state(params, opt_split, trainable=mask)

    batch = _make_batch(rng)
    s_full, m_full = step_full(s_full, batch)
    s_split, m_split = step_split(s_split, batch)
    np.testing.assert_allclose(float(m_full["loss"]), float(m_split["loss"]), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(s_full.params["vl_projector"]["mlp"]["fc1"]["w"]),
        np.asarray(s_split.params["vl_projector"]["mlp"]["fc1"]["w"]),
        rtol=1e-5, atol=1e-6,
    )
    # frozen leaves untouched
    np.testing.assert_array_equal(
        np.asarray(params["decoder"]["layers"]["q"]["w"]),
        np.asarray(s_split.params["decoder"]["layers"]["q"]["w"]),
    )
    # roundtrip helpers
    t = split_trainable(params, mask)
    assert t["decoder"]["layers"]["q"]["w"].size == 0
    back = merge_trainable(t, params, mask)
    np.testing.assert_array_equal(
        np.asarray(back["decoder"]["layers"]["q"]["w"]),
        np.asarray(params["decoder"]["layers"]["q"]["w"]),
    )


@pytest.mark.slow
def test_grad_accumulation_semantics():
    """accum=2: params untouched after the 1st micro-step, updated after
    the 2nd; the update equals an accum=1 step on the mean gradient."""
    from crab_tpu.train.state import with_lora

    rng = np.random.default_rng(7)
    params = init_crab(jax.random.PRNGKey(0), CFG)
    modules = STAGE_TRAINABLE["finetune"]
    mask = trainable_mask(params, modules)
    b1 = _make_batch(rng)

    opt2 = make_optimizer(1e-2, modules, params, accum_steps=2)
    step2 = jax.jit(make_train_step(CFG, opt2, trainable=mask))
    st = init_train_state(params, opt2, trainable=mask)
    st_a, _ = step2(st, b1)
    p0 = params["vl_projector"]["mlp"]["fc1"]["w"]
    np.testing.assert_array_equal(
        np.asarray(st_a.params["vl_projector"]["mlp"]["fc1"]["w"]), np.asarray(p0)
    )
    st_b, _ = step2(st_a, b1)
    upd2 = np.asarray(st_b.params["vl_projector"]["mlp"]["fc1"]["w"])
    assert not np.allclose(upd2, np.asarray(p0))

    # oracle: the same micro-batch twice has mean gradient == grad(b1),
    # so the post-accumulation Adam update must equal one accum=1 step.
    # (A mixed-batch oracle is NOT exact under Adam: eps-scale sign flips
    # on near-zero gradients turn into +-lr differences.)
    opt1 = make_optimizer(1e-2, modules, params, accum_steps=1)
    step1 = jax.jit(make_train_step(CFG, opt1, trainable=mask))
    st1 = init_train_state(params, opt1, trainable=mask)
    st1b, _ = step1(st1, b1)
    upd1 = np.asarray(st1b.params["vl_projector"]["mlp"]["fc1"]["w"])
    np.testing.assert_allclose(upd2, upd1, rtol=1e-4, atol=1e-6)

    # with_lora extends stage-1 selectors (pretrain.py:92-109 parity)
    m = trainable_mask(params, with_lora(STAGE_TRAINABLE["pretrain_visual"]))
    assert m["decoder"]["layers"]["q"]["lora"]["A"]
    assert m["vl_projector"]["mlp"]["fc1"]["w"]
    assert not m["decoder"]["layers"]["q"]["w"]


def test_lr_schedule_and_loss_weights():
    from crab_tpu.train.state import make_lr_schedule, seg_losses

    sched = make_lr_schedule(1e-4, total_steps=100, warmup_ratio=0.1)
    assert float(sched(0)) == 0.0
    np.testing.assert_allclose(float(sched(10)), 1e-4, rtol=1e-6)  # peak
    assert float(sched(100)) < 1e-6  # decayed to ~0
    assert make_lr_schedule(1e-4, 100, kind="constant") == 1e-4

    rng = np.random.default_rng(0)
    masks = jnp.asarray(rng.standard_normal((2, 1, 8, 8)).astype(np.float32))
    gt = jnp.asarray((rng.random((2, 8, 8)) > 0.5).astype(np.float32))
    base = seg_losses(masks, gt, avss=False, bce_weight=1.0, dice_weight=0.5)
    doubled = seg_losses(masks, gt, avss=False, bce_weight=2.0, dice_weight=1.0)
    np.testing.assert_allclose(float(doubled), 2 * float(base), rtol=1e-5)


@pytest.mark.slow
def test_train_step_dropout_changes_loss():
    """dropout_seed: loss differs from eval-mode but is step-deterministic."""
    import dataclasses

    # tiny cfg with nonzero-dropout lora; bump B init so the lora path
    # actually contributes
    lora = dataclasses.replace(CFG.decoder.lora, dropout=0.5)
    cfg = CFG.replace(decoder=dataclasses.replace(CFG.decoder, lora=lora))
    params = init_crab(jax.random.PRNGKey(0), cfg)
    for name in ("q", "k", "v", "o", "gate", "up", "down"):
        l = dict(params["decoder"]["layers"][name]["lora"])
        l["B"] = jax.random.normal(jax.random.PRNGKey(1), l["B"].shape) * 0.05
        params["decoder"]["layers"][name] = dict(
            params["decoder"]["layers"][name], lora=l
        )
    rng = np.random.default_rng(3)
    batch = _make_batch(rng)
    modules = STAGE_TRAINABLE["finetune"]
    mask = trainable_mask(params, modules)
    opt = make_optimizer(1e-3, modules, params)

    def loss_of(seed):
        step = jax.jit(
            make_train_step(cfg, opt, trainable=mask, dropout_seed=seed)
        )
        st = init_train_state(params, opt, trainable=mask)
        _, metrics = step(st, batch)
        return float(metrics["loss"])

    eval_loss = loss_of(None)
    train_loss = loss_of(0)
    assert train_loss != eval_loss
    assert loss_of(0) == train_loss  # same seed+step -> same loss


@pytest.mark.slow
def test_checkpoint_resume_roundtrip(tmp_path):
    """Preemption-resume (SURVEY §5): save full train state (params +
    optimizer incl. accumulation buffers + step), restore into a fresh
    template, and verify continued training is bit-identical to never
    having stopped."""
    from crab_tpu.train.checkpoint import restore_state, save_state

    rng = np.random.default_rng(11)
    params = init_crab(jax.random.PRNGKey(0), CFG)
    modules = STAGE_TRAINABLE["finetune"]
    mask = trainable_mask(params, modules)
    opt = make_optimizer(1e-3, modules, params, accum_steps=2)
    step = jax.jit(make_train_step(CFG, opt, trainable=mask))
    batch = _make_batch(rng)

    st = init_train_state(params, opt, trainable=mask)
    st, _ = step(st, batch)  # leaves a live accumulation buffer
    save_state(str(tmp_path / "ckpt"), st)

    fresh = init_train_state(params, opt, trainable=mask)
    restored = restore_state(str(tmp_path / "ckpt"), fresh)
    assert int(restored.step) == int(st.step)
    for a, b in zip(
        jax.tree_util.tree_leaves(st), jax.tree_util.tree_leaves(restored)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # continuing from the restore == continuing without interruption
    cont_a, ma = step(st, batch)
    cont_b, mb = step(restored, batch)
    np.testing.assert_array_equal(
        np.asarray(cont_a.params["vl_projector"]["mlp"]["fc1"]["w"]),
        np.asarray(cont_b.params["vl_projector"]["mlp"]["fc1"]["w"]),
    )
    assert float(ma["loss"]) == float(mb["loss"])
