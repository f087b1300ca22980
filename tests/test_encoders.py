"""Encoder parity tests vs independent torch oracles.

- CLIP ViT: transformers.CLIPVisionModel (tiny random config)
- Q-Former: transformers.Blip2QFormerModel (independent BLIP-2 impl)
- BEATs: the reference torch implementation imported read-only from
  /root/reference (torchaudio stubbed; it is only used for preprocessing
  which crab_tpu does on-device).
"""

import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

from crab_tpu.core.config import (
    AudioEncoderConfig,
    ProjectorConfig,
    VisionEncoderConfig,
)
from crab_tpu.encoders.beats import beats_apply
from crab_tpu.encoders.clip_vit import clip_vit_apply
from crab_tpu.encoders.convert import (
    convert_beats,
    convert_clip_vit,
    convert_qformer,
)
from crab_tpu.encoders.qformer import qformer_apply

torch.manual_seed(0)


# ---------------------------------------------------------------------------
# CLIP
# ---------------------------------------------------------------------------


def test_clip_vit_parity():
    from transformers import CLIPVisionConfig, CLIPVisionModel

    hf_cfg = CLIPVisionConfig(
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=4,
        num_attention_heads=4,
        image_size=56,
        patch_size=14,
    )
    model = CLIPVisionModel(hf_cfg).eval()
    cfg = VisionEncoderConfig(
        image_size=56,
        patch_size=14,
        hidden_size=64,
        intermediate_size=128,
        num_layers=4,
        num_heads=4,
        select_layers=(2, 3, 4),
    )
    pixels = np.random.default_rng(0).standard_normal((2, 3, 56, 56)).astype(np.float32)
    with torch.no_grad():
        out = model(torch.from_numpy(pixels), output_hidden_states=True)
    params = convert_clip_vit(model.state_dict(), cfg)
    taps = clip_vit_apply(params, jnp.asarray(pixels), cfg)
    for tap, li in zip(taps, cfg.select_layers):
        ref = out.hidden_states[li][:, 1:].numpy()
        np.testing.assert_allclose(np.asarray(tap), ref, rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# Q-Former
# ---------------------------------------------------------------------------


def _blip2_to_reference_names(sd, prefix="qformer."):
    """transformers Blip2QFormer keys -> reference Qformer.py keys."""
    out = {}
    for k, v in sd.items():
        k2 = k
        k2 = k2.replace("attention.attention.", "attention.self.")
        k2 = k2.replace("crossattention.attention.", "crossattention.self.")
        if k2 == "layernorm.weight":
            k2 = "embeddings.LayerNorm.weight"
        if k2 == "layernorm.bias":
            k2 = "embeddings.LayerNorm.bias"
        out[prefix + k2] = v
    return out


def test_qformer_parity_vs_blip2():
    from transformers import Blip2QFormerConfig
    from transformers.models.blip_2.modeling_blip_2 import Blip2QFormerModel

    hf_cfg = Blip2QFormerConfig(
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=128,
        encoder_hidden_size=48,
        cross_attention_frequency=1,
    )
    model = Blip2QFormerModel(hf_cfg).eval()
    cfg = ProjectorConfig(
        encoder_width=48,
        hidden_size=64,
        num_hidden_layers=2,
        num_heads=4,
        intermediate_size=128,
        num_query_tokens=8,
    )
    rng = np.random.default_rng(1)
    queries = rng.standard_normal((1, 8, 64)).astype(np.float32)
    media = rng.standard_normal((3, 10, 48)).astype(np.float32)
    with torch.no_grad():
        ref = model(
            query_embeds=torch.from_numpy(queries).expand(3, -1, -1),
            encoder_hidden_states=torch.from_numpy(media),
        ).last_hidden_state.numpy()

    sd = _blip2_to_reference_names(model.state_dict(), prefix="bert.")
    sd["query_tokens"] = torch.from_numpy(queries)
    params = convert_qformer(sd, cfg, prefix="bert.", query_tokens_key="query_tokens")
    ours = qformer_apply(params, jnp.asarray(media), cfg)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# BEATs
# ---------------------------------------------------------------------------


def _import_reference_beats():
    """Import the reference torch BEATs with torchaudio stubbed (read-only)."""
    if "torchaudio" not in sys.modules:
        ta = types.ModuleType("torchaudio")
        comp = types.ModuleType("torchaudio.compliance")
        kaldi = types.ModuleType("torchaudio.compliance.kaldi")
        kaldi.fbank = None
        ta.compliance = comp
        comp.kaldi = kaldi
        sys.modules["torchaudio"] = ta
        sys.modules["torchaudio.compliance"] = comp
        sys.modules["torchaudio.compliance.kaldi"] = kaldi
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from models.beats.BEATs import BEATs, BEATsConfig  # noqa

    return BEATs, BEATsConfig


@pytest.mark.parametrize("gru_rel_pos", [True, False])
def test_beats_parity(gru_rel_pos):
    BEATs, BEATsConfig = _import_reference_beats()
    tcfg = BEATsConfig(
        {
            "input_patch_size": 16,
            "embed_dim": 32,
            "encoder_layers": 2,
            "encoder_embed_dim": 64,
            "encoder_ffn_embed_dim": 128,
            "encoder_attention_heads": 4,
            "conv_pos": 16,
            "conv_pos_groups": 4,
            "layer_norm_first": False,
            "deep_norm": True,
            "relative_position_embedding": True,
            "num_buckets": 32,
            "max_distance": 64,
            "gru_rel_pos": gru_rel_pos,
            "encoder_layerdrop": 0.0,
            "dropout": 0.0,
            "attention_dropout": 0.0,
            "activation_dropout": 0.0,
            "dropout_input": 0.0,
            "finetuned_model": False,
        }
    )
    torch_model = BEATs(tcfg).eval()
    cfg = AudioEncoderConfig(
        input_patch_size=16,
        embed_dim=32,
        encoder_layers=2,
        encoder_embed_dim=64,
        encoder_ffn_embed_dim=128,
        encoder_attention_heads=4,
        conv_pos=16,
        conv_pos_groups=4,
        layer_norm_first=False,
        deep_norm=True,
        relative_position_embedding=True,
        num_buckets=32,
        max_distance=64,
        gru_rel_pos=gru_rel_pos,
    )
    fbank = np.random.default_rng(2).standard_normal((2, 98, 128)).astype(np.float32)
    with torch.no_grad():
        ref, _ = torch_model.extract_features(
            torch.from_numpy(fbank), padding_mask=None, feature_only=True
        )
    params = convert_beats(torch_model.state_dict(), cfg)
    ours = beats_apply(params, jnp.asarray(fbank), cfg)
    assert ours.shape == tuple(ref.shape) == (2, 48, 64)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# W8A8 encoder quantization (encoders/quantize.py)
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_int8_encoders_close():
    """Quantized (W8A8) CLIP + BEATs track the fp32 trees on random
    weights: per-out-channel int8 weights + per-token int8 activations
    should land within ~2% relative error — the same class as the
    decoder's serving a8 prefill (lm/llama._base_proj)."""
    from crab_tpu.core.config import crab_tiny
    from crab_tpu.encoders.beats import init_beats
    from crab_tpu.encoders.clip_vit import init_clip_vit
    from crab_tpu.encoders.quantize import quantize_encoders

    cfg = crab_tiny()
    key = jax.random.PRNGKey(0)
    params = {
        "vision": init_clip_vit(key, cfg.vision, jnp.float32),
        "audio": init_beats(jax.random.fold_in(key, 1), cfg.audio, jnp.float32),
    }
    qparams = quantize_encoders(params, min_dim=8)

    # every big linear actually swapped format
    def fmt(tree):
        return sorted(
            "/".join(str(x) for x in p)
            for p, _ in jax.tree_util.tree_leaves_with_path(tree)
            if str(p[-1]) == "['w_q']"
        )

    assert len(fmt(qparams["vision"])) == 4 * cfg.vision.num_layers
    assert len(fmt(qparams["audio"])) >= 6 * cfg.audio.encoder_layers

    rng = np.random.default_rng(0)
    pixels = jnp.asarray(rng.standard_normal((2, 3, 56, 56)), jnp.float32)
    ref = clip_vit_apply(params["vision"], pixels, cfg.vision)[-1]
    got = clip_vit_apply(qparams["vision"], pixels, cfg.vision)[-1]
    rel = float(
        jnp.linalg.norm(got - ref) / (jnp.linalg.norm(ref) + 1e-9)
    )
    assert rel < 0.03, f"CLIP int8 rel err {rel}"

    fb = jnp.asarray(rng.standard_normal((2, 96, 128)) * 0.5, jnp.float32)
    ref_a = beats_apply(params["audio"], fb, cfg.audio)
    got_a = beats_apply(qparams["audio"], fb, cfg.audio)
    rel_a = float(
        jnp.linalg.norm(got_a - ref_a) / (jnp.linalg.norm(ref_a) + 1e-9)
    )
    assert rel_a < 0.05, f"BEATs int8 rel err {rel_a}"


def test_int8_quantize_skips_small_and_non_linear():
    from crab_tpu.core.config import crab_tiny
    from crab_tpu.encoders.beats import init_beats
    from crab_tpu.encoders.quantize import quantize_encoder_tree

    cfg = crab_tiny()
    params = init_beats(jax.random.PRNGKey(0), cfg.audio, jnp.float32)
    q = quantize_encoder_tree(params, min_dim=8)
    # pos_conv (3-D weight) and the gru gate (hd -> 8 with min dim 8 on
    # one side only... grep_linear is (16, 8): min dim 8 -> quantized at
    # threshold 8, so assert with the production threshold instead
    q256 = quantize_encoder_tree(params, min_dim=256)
    leaves = {
        "/".join(str(x) for x in p)
        for p, _ in jax.tree_util.tree_leaves_with_path(q256)
    }
    assert not any("w_q" in l for l in leaves)  # tiny dims: all below 256
    assert "w" in q["pos_conv"] and q["pos_conv"]["w"].ndim == 3
