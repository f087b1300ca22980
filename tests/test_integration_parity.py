"""Whole-pipeline integration parity at tiny scale.

Composes a reference-style torch pipeline (CLIP ViT -> Q-Former projector
-> embedding splice -> LLaMA forward, mirroring
``prepare_multimodal_inputs`` + ``UnifiedForCausalLM.forward``) from HF
modules, converts every weight into crab_tpu, and requires the prefill
logits to match. This exercises the full integration surface: encoder
taps, projector wiring, splice order, padding and position ids.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from crab_tpu.core.config import (
    CrabConfig,
    DecoderConfig,
    ProjectorConfig,
    SegConfig,
    VisionEncoderConfig,
    crab_tiny,
)
from crab_tpu.encoders.convert import convert_clip_vit, convert_qformer
from crab_tpu.encoders.clip_vit import clip_vit_apply
from crab_tpu.encoders.projectors import projector_apply
from crab_tpu.fusion.splice import SampleSpec, build_splice_batch
from crab_tpu.fusion.tokens import SpecialTokens
from crab_tpu.lm.convert import convert_llama
from crab_tpu.lm.llama import llama_apply
from crab_tpu.runtime.engine import splice_from_arrays

D_MODEL = 64
VIS = VisionEncoderConfig(
    image_size=56, patch_size=14, hidden_size=48, intermediate_size=96,
    num_layers=3, num_heads=4, select_layers=(1, 2, 3),
)
PROJ = ProjectorConfig(
    encoder_width=48, hidden_size=32, num_hidden_layers=2, num_heads=4,
    intermediate_size=64, num_query_tokens=8,
)
DEC = DecoderConfig(
    vocab_size=120, hidden_size=D_MODEL, intermediate_size=128, num_layers=2,
    num_heads=4, num_kv_heads=4, head_dim=16, lora=None,
)
SPECIAL = SpecialTokens(base_vocab=100)


@pytest.fixture(scope="module")
def torch_models():
    from transformers import (
        Blip2QFormerConfig,
        CLIPVisionConfig,
        CLIPVisionModel,
        LlamaConfig,
        LlamaForCausalLM,
    )
    from transformers.models.blip_2.modeling_blip_2 import Blip2QFormerModel

    torch.manual_seed(11)
    clip = CLIPVisionModel(
        CLIPVisionConfig(
            hidden_size=48, intermediate_size=96, num_hidden_layers=3,
            num_attention_heads=4, image_size=56, patch_size=14,
        )
    ).eval()
    qf = Blip2QFormerModel(
        Blip2QFormerConfig(
            hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
            intermediate_size=64, encoder_hidden_size=48,
            cross_attention_frequency=1,
        )
    ).eval()
    llama = LlamaForCausalLM(
        LlamaConfig(
            vocab_size=120, hidden_size=D_MODEL, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
            attn_implementation="eager",
        )
    ).eval()
    extras = {
        "ln_in": torch.nn.LayerNorm(48).eval(),
        "query_tokens": torch.randn(1, 8, 32) * 0.02,
        "fc1": torch.nn.Linear(32, D_MODEL).eval(),
        "fc2": torch.nn.Linear(D_MODEL, D_MODEL).eval(),
    }
    return clip, qf, llama, extras


def _torch_projector(qf, extras, feats):
    """LN -> Q-Former -> MLP, the VLProjector composition
    (``multimodal_encoder.py:119-144``)."""
    with torch.no_grad():
        x = extras["ln_in"](feats)
        q = qf(
            query_embeds=extras["query_tokens"].expand(x.shape[0], -1, -1),
            encoder_hidden_states=x,
        ).last_hidden_state
        return extras["fc2"](torch.nn.functional.gelu(extras["fc1"](q)))


def _our_projector_params(qf, extras):
    from tests.test_encoders import _blip2_to_reference_names

    sd = _blip2_to_reference_names(qf.state_dict(), prefix="bert.")
    sd["query_tokens"] = extras["query_tokens"]
    return {
        "ln_in": {
            "scale": jnp.asarray(extras["ln_in"].weight.detach().numpy()),
            "bias": jnp.asarray(extras["ln_in"].bias.detach().numpy()),
        },
        "qformer": convert_qformer(sd, PROJ, "bert.", "query_tokens"),
        "mlp": {
            "fc1": {
                "w": jnp.asarray(extras["fc1"].weight.detach().numpy().T),
                "b": jnp.asarray(extras["fc1"].bias.detach().numpy()),
            },
            "fc2": {
                "w": jnp.asarray(extras["fc2"].weight.detach().numpy().T),
                "b": jnp.asarray(extras["fc2"].bias.detach().numpy()),
            },
        },
    }


@pytest.mark.slow
def test_full_pipeline_prefill_parity(torch_models):
    clip, qf, llama, extras = torch_models
    rng = np.random.default_rng(0)
    pixels = rng.standard_normal((1, 3, 56, 56)).astype(np.float32)

    # --- torch reference pipeline -------------------------------------
    with torch.no_grad():
        hs = clip(torch.from_numpy(pixels), output_hidden_states=True).hidden_states
        vis_feats = hs[VIS.select_layers[-1]][:, 1:]  # (1, 16, 48), last tap
        vis_tokens = _torch_projector(qf, extras, vis_feats)  # (1, 8, 64)

    prefix = [5, 6, 7]
    suffix = [8, 9]
    with torch.no_grad():
        embed = llama.get_input_embeddings()
        txt_prefix = embed(torch.tensor(prefix))[None]
        txt_suffix = embed(torch.tensor(suffix))[None]
        inputs_embeds = torch.cat([txt_prefix, vis_tokens, txt_suffix], dim=1)
        T = inputs_embeds.shape[1]
        ref_logits = llama(
            inputs_embeds=inputs_embeds,
            attention_mask=torch.ones(1, T, dtype=torch.long),
            position_ids=torch.arange(T)[None],
        ).logits.numpy()

    # --- crab_tpu pipeline --------------------------------------------
    vis_params = convert_clip_vit(clip.state_dict(), VIS)
    taps = clip_vit_apply(vis_params, jnp.asarray(pixels), VIS)
    proj_params = _our_projector_params(qf, extras)
    tokens = projector_apply(proj_params, taps[-1][:, None], PROJ)  # (1, 8, 64)

    ids = np.asarray(prefix + [SPECIAL.id("<image>")] + suffix, np.int64)
    spec = SampleSpec(ids, {"<image>": 8})
    batch = build_splice_batch([spec], SPECIAL, feature_order=("<image>",))
    dec_params = convert_llama(llama.state_dict(), DEC)
    emb = splice_from_arrays(
        dec_params["embed"],
        jnp.asarray(batch.text_ids),
        jnp.asarray(batch.feat_idx),
        tokens.reshape(-1, D_MODEL),
    )
    logits, _, _, _ = llama_apply(
        dec_params,
        DEC,
        emb,
        attention_mask=jnp.asarray(batch.attention_mask),
        position_ids=jnp.asarray(batch.position_ids),
    )
    ours = np.asarray(logits)
    assert ours.shape == ref_logits.shape
    # O(1)-magnitude projector embeds accumulate ~7e-3 of fp32 noise over
    # the decoder; per-stage parity (encoder taps 2e-6, projector 1e-7,
    # spliced embeds 1e-7) is asserted tighter by the unit tests
    np.testing.assert_allclose(ours, ref_logits, rtol=2e-2, atol=2e-2)
    # greedy continuation agrees at every position
    np.testing.assert_array_equal(ours.argmax(-1), ref_logits.argmax(-1))
