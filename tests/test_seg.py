"""SegModule parity vs the reference torch implementation (read-only import
from /root/reference with unused heavy deps stubbed)."""

import importlib.machinery
import sys
import types

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from crab_tpu.core.config import SegConfig
from crab_tpu.seg.convert import convert_seg
from crab_tpu.seg.losses import avss_ce_loss, dice_loss, sigmoid_ce_loss
from crab_tpu.seg.seg_module import seg_apply

torch.manual_seed(0)


def _import_reference_seg():
    for name, attrs in [
        ("torchaudio", {}),
        ("torchaudio.compliance", {}),
        ("torchaudio.compliance.kaldi", {"fbank": None}),
    ]:
        if name not in sys.modules:
            m = types.ModuleType(name)
            m.__spec__ = importlib.machinery.ModuleSpec(name, None)
            for k, v in attrs.items():
                setattr(m, k, v)
            sys.modules[name] = m
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    # SegModule doesn't use the Q-Former or VQGAN; stub their imports
    if "models.Qformer" not in sys.modules:
        qf = types.ModuleType("models.Qformer")
        qf.BertConfig = object
        qf.BertLMHeadModel = object
        sys.modules["models.Qformer"] = qf
    if "models.taming_transformer.vqgan" not in sys.modules:
        vq = types.ModuleType("models.taming_transformer.vqgan")
        vq.VQModel = object
        sys.modules["models.taming_transformer.vqgan"] = vq
    from models.multimodal_encoder import SegModule  # noqa

    return SegModule


# The reference hardcodes 256 channels in the coarse-to-fine gate
# (multimodal_encoder.py:1114), so parity testing requires
# prompt_embed_dim=256. Keep everything else small.
CFG = SegConfig(
    prompt_embed_dim=256,
    image_scale_nums=2,
    token_nums_per_scale=3,
    transformer_depth=2,
    transformer_mlp_dim=2048,  # the reference hardcodes 2048
    num_heads=8,
    avs_query_num=16,
    query_generator_num_layers=2,
    query_generator_hidden_dim=2048,
    vit_embedding_dim=64,
    image_embedding_size=4,
    low_res_mask_size=16,
    output_mask_size=56,
)
D_MODEL = 64


@pytest.fixture(scope="module")
def torch_seg():
    SegModule = _import_reference_seg()
    m = SegModule(
        d_model=D_MODEL,
        vit_image_embedding_dim=64,
        prompt_embed_dim=256,
        image_scale_nums=2,
        mask_decoder_transformer_depth=2,
        token_nums_per_scale=3,
        avs_query_num=16,
        num_classes=1,
        query_generator_num_layers=2,
        image_size=56,
        patch_size=14,
        image_embedding_size=4,
    )
    # shrink the transformer MLP to the test config
    return m.eval()


def _torch_forward(m, pred, feats, task):
    with torch.no_grad():
        out = m(
            pred,
            feats,
            low_res_mask_size=CFG.low_res_mask_size,
            gt_mask=None,
            batch_task_names=[task] * pred.shape[0],
        )
    return torch.stack(out["pred_masks"], dim=0).numpy()  # (B, ncls, 56, 56)


@pytest.fixture(scope="module")
def io_tensors():
    rng = np.random.default_rng(0)
    pred = rng.standard_normal((2, 6, D_MODEL)).astype(np.float32)
    feats = [
        rng.standard_normal((2, 16, 64)).astype(np.float32) for _ in range(2)
    ]
    return pred, feats


@pytest.mark.parametrize("task", ["binary", "avss"])
def test_seg_parity(torch_seg, io_tensors, task):
    pred, feats = io_tensors
    tname = "s4" if task == "binary" else "avss"
    ref = _torch_forward(
        torch_seg, torch.from_numpy(pred), [torch.from_numpy(f) for f in feats], tname
    )
    params = convert_seg(torch_seg.state_dict(), CFG)
    import functools
    import jax

    fn = jax.jit(functools.partial(seg_apply, cfg=CFG, task=task))
    ours = fn(params, jnp.asarray(pred), [jnp.asarray(f) for f in feats])
    assert ours.shape == ref.shape
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-3, atol=1e-3)


def test_losses_match_torch():
    import torch.nn.functional as F

    rng = np.random.default_rng(1)
    logits = rng.standard_normal((2, 24, 24)).astype(np.float32)
    target = (rng.random((2, 24, 24)) > 0.5).astype(np.float32)
    lt = torch.from_numpy(logits)
    tt = torch.from_numpy(target)

    ref_bce = (
        F.binary_cross_entropy_with_logits(lt, tt, reduction="none")
        .flatten(1, 2)
        .mean(1)
        .sum()
        / (2 + 1e-8)
    ).item()
    ours_bce = float(sigmoid_ce_loss(jnp.asarray(logits), jnp.asarray(target), 2))
    np.testing.assert_allclose(ours_bce, ref_bce, rtol=1e-5)

    x = torch.sigmoid(lt).flatten(1, 2)
    t = tt.flatten(1, 2)
    num = 2 * (x / 1000 * t).sum(-1)
    den = (x / 1000).sum(-1) + (t / 1000).sum(-1)
    ref_dice = ((1 - (num + 1e-6) / (den + 1e-6)).sum() / (2 + 1e-8)).item()
    ours_dice = float(dice_loss(jnp.asarray(logits), jnp.asarray(target), 2))
    np.testing.assert_allclose(ours_dice, ref_dice, rtol=1e-5)

    cls_logits = rng.standard_normal((2, 71, 16, 16)).astype(np.float32)
    labels = rng.integers(0, 71, (2, 16, 16))
    ref_ce = (
        torch.nn.CrossEntropyLoss(reduction="none")(
            torch.from_numpy(cls_logits), torch.from_numpy(labels)
        )
        .mean(-1)
        .mean(-1)
        .sum()
    ).item()
    ours_ce = float(avss_ce_loss(jnp.asarray(cls_logits), jnp.asarray(labels)))
    np.testing.assert_allclose(ours_ce, ref_ce, rtol=1e-5)
