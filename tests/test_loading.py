"""Checkpoint-loading chain tests with fake artifacts in the real formats:
HF save_pretrained dirs (LLaMA, CLIP), a BEATs-style .pt dict, and a
peft_hyper-style delta file (``finetune_weights.bin`` layout)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from crab_tpu.core.config import (
    AudioEncoderConfig,
    CrabConfig,
    DecoderConfig,
    MoELoRAConfig,
    ProjectorConfig,
    VisionEncoderConfig,
    crab_tiny,
)
from crab_tpu.lm.llama import llama_apply
from crab_tpu.runtime import loading

DEC = DecoderConfig(
    vocab_size=128 + 17,
    hidden_size=64,
    intermediate_size=128,
    num_layers=2,
    num_heads=4,
    num_kv_heads=4,
    head_dim=16,
    lora=MoELoRAConfig(rank=4, alpha=8, num_experts=2, dropout=0.0),
)

CFG = CrabConfig(
    name="test",
    vision=VisionEncoderConfig(
        image_size=56, patch_size=14, hidden_size=48, intermediate_size=96,
        num_layers=3, num_heads=4, select_layers=(1, 2, 3),
    ),
    audio=AudioEncoderConfig(
        embed_dim=32, encoder_layers=2, encoder_embed_dim=64,
        encoder_ffn_embed_dim=128, encoder_attention_heads=4, conv_pos=16,
        conv_pos_groups=4, num_buckets=32, max_distance=64,
    ),
    decoder=DEC,
    compute_dtype="float32",
    param_dtype="float32",
)


def test_load_decoder_hf_dir(tmp_path):
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(21)
    m = LlamaForCausalLM(
        LlamaConfig(
            vocab_size=128, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        )
    ).eval()
    d = tmp_path / "llama"
    m.save_pretrained(d)  # safetensors
    params = loading.load_decoder(str(d), CFG)
    # embeddings extended to vocab + 17
    assert params["embed"].shape == (145, 64)
    assert params["lm_head"].shape == (64, 145)
    # forward matches the torch model on base-vocab logits
    rng = np.random.default_rng(0)
    emb = rng.standard_normal((1, 5, 64)).astype(np.float32) * 0.1
    with torch.no_grad():
        ref = m(inputs_embeds=torch.from_numpy(emb)).logits.numpy()
    import dataclasses

    logits, _, _, _ = llama_apply(
        params, dataclasses.replace(DEC, lora=None), jnp.asarray(emb)
    )
    # torch default sdpa attention vs our eager math: ~4e-4 fp noise
    np.testing.assert_allclose(
        np.asarray(logits)[..., :128], ref, rtol=2e-3, atol=2e-3
    )


def test_load_clip_hf_dir(tmp_path):
    from transformers import CLIPVisionConfig, CLIPVisionModel

    torch.manual_seed(22)
    m = CLIPVisionModel(
        CLIPVisionConfig(
            hidden_size=48, intermediate_size=96, num_hidden_layers=3,
            num_attention_heads=4, image_size=56, patch_size=14,
        )
    ).eval()
    d = tmp_path / "clip"
    m.save_pretrained(d)
    params = loading.load_clip(str(d), CFG)
    from crab_tpu.encoders.clip_vit import clip_vit_apply

    rng = np.random.default_rng(1)
    px = rng.standard_normal((1, 3, 56, 56)).astype(np.float32)
    taps = clip_vit_apply(params, jnp.asarray(px), CFG.vision)
    with torch.no_grad():
        hs = m(torch.from_numpy(px), output_hidden_states=True).hidden_states
    np.testing.assert_allclose(
        np.asarray(taps[-1]), hs[3][:, 1:].numpy(), rtol=1e-4, atol=1e-4
    )


def test_load_beats_pt(tmp_path):
    from tests.test_encoders import _import_reference_beats

    BEATs, BEATsConfig = _import_reference_beats()
    tcfg = BEATsConfig(
        {
            "input_patch_size": 16, "embed_dim": 32, "encoder_layers": 2,
            "encoder_embed_dim": 64, "encoder_ffn_embed_dim": 128,
            "encoder_attention_heads": 4, "conv_pos": 16, "conv_pos_groups": 4,
            "layer_norm_first": False, "deep_norm": True,
            "relative_position_embedding": True, "num_buckets": 32,
            "max_distance": 64, "gru_rel_pos": True, "encoder_layerdrop": 0.0,
            "dropout": 0.0, "attention_dropout": 0.0, "activation_dropout": 0.0,
            "dropout_input": 0.0, "finetuned_model": False,
        }
    )
    torch.manual_seed(23)
    m = BEATs(tcfg).eval()
    p = tmp_path / "beats.pt"
    torch.save({"cfg": tcfg.__dict__, "model": m.state_dict()}, p)
    params = loading.load_beats(str(p), CFG)
    from crab_tpu.encoders.beats import beats_apply

    fb = np.random.default_rng(2).standard_normal((1, 98, 128)).astype(np.float32)
    ours = beats_apply(params, jnp.asarray(fb), CFG.audio)
    with torch.no_grad():
        ref, _ = m.extract_features(torch.from_numpy(fb), None, feature_only=True)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-4, atol=1e-4)


def test_apply_reference_delta_lora(tmp_path):
    """finetune_weights.bin-style delta: peft-prefixed MoE-LoRA keys."""
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(24)
    m = LlamaForCausalLM(
        LlamaConfig(
            vocab_size=128, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        )
    ).eval()
    d = tmp_path / "llama"
    m.save_pretrained(d)
    params = {"decoder": loading.load_decoder(str(d), CFG)}

    # build a delta with lora weights for every projection
    proj = ["self_attn.q_proj", "self_attn.k_proj", "self_attn.v_proj",
            "self_attn.o_proj", "mlp.gate_proj", "mlp.up_proj", "mlp.down_proj"]
    dims = {"self_attn.q_proj": (64, 64), "self_attn.k_proj": (64, 64),
            "self_attn.v_proj": (64, 64), "self_attn.o_proj": (64, 64),
            "mlp.gate_proj": (64, 128), "mlp.up_proj": (64, 128),
            "mlp.down_proj": (128, 64)}
    torch.manual_seed(25)
    sd = {}
    for i in range(2):
        for name in proj:
            din, dout = dims[name]
            base = f"base_model.model.model.layers.{i}.{name}"
            sd[f"{base}.lora_route.weight"] = torch.randn(2, din) * 0.1
            sd[f"{base}.lora_A.weight"] = torch.randn(4, din) * 0.1
            for e in range(2):
                sd[f"{base}.lora_B{e}.weight"] = torch.randn(dout, 4) * 0.1
    delta_p = tmp_path / "finetune_weights.bin"
    torch.save(sd, delta_p)

    out = loading.apply_reference_delta(params, str(delta_p), CFG)
    lora = out["decoder"]["layers"]["q"]["lora"]
    assert lora["B"].shape == (2, 2, 4, 64)
    np.testing.assert_allclose(
        np.asarray(lora["A"][0]),
        sd["base_model.model.model.layers.0.self_attn.q_proj.lora_A.weight"].numpy().T,
        rtol=1e-6,
    )
    # base weights survive the merge
    np.testing.assert_allclose(
        np.asarray(out["decoder"]["layers"]["q"]["w"][0]),
        m.state_dict()["model.layers.0.self_attn.q_proj.weight"].numpy().T,
        rtol=1e-5, atol=1e-6,
    )
    # and the lora-augmented forward differs from base (nonzero B)
    rng = np.random.default_rng(3)
    emb = rng.standard_normal((1, 4, 64)).astype(np.float32) * 0.1
    import dataclasses

    base_logits, _, _, _ = llama_apply(
        params["decoder"], dataclasses.replace(DEC, lora=None), jnp.asarray(emb)
    )
    lora_logits, _, _, _ = llama_apply(out["decoder"], DEC, jnp.asarray(emb))
    assert not np.allclose(np.asarray(base_logits), np.asarray(lora_logits))
