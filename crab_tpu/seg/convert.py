"""torch SegModule state dict -> crab_tpu seg params.

Note a reference quirk: ``multiseg_scalar``/``multiscale_scalar`` are plain
Python lists of nn.Parameter (``multimodal_encoder.py:297-301``) — never
registered, so they are absent from checkpoints and frozen at 1/3 and 1/2.
Conversion therefore leaves our (trainable) scalars at those constants.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

from crab_tpu.core.config import SegConfig


def _np(t):
    if hasattr(t, "detach"):
        return t.detach().cpu().float().numpy()
    return np.asarray(t, np.float32)


def _lin(sd, name):
    p = {"w": jnp.asarray(_np(sd[f"{name}.weight"]).T)}
    if f"{name}.bias" in sd:
        p["b"] = jnp.asarray(_np(sd[f"{name}.bias"]))
    return p


def _ln(sd, name):
    return {
        "scale": jnp.asarray(_np(sd[f"{name}.weight"])),
        "bias": jnp.asarray(_np(sd[f"{name}.bias"])),
    }


def _conv(sd, name, bias=True):
    p = {"w": jnp.asarray(_np(sd[f"{name}.weight"]))}
    if bias and f"{name}.bias" in sd:
        p["b"] = jnp.asarray(_np(sd[f"{name}.bias"]))
    return p


def _mha_from_torch_multihead(sd, name, dim):
    """nn.MultiheadAttention: split fused in_proj into q/k/v."""
    w = _np(sd[f"{name}.in_proj_weight"])  # (3d, d)
    b = _np(sd[f"{name}.in_proj_bias"])
    return {
        "q": {"w": jnp.asarray(w[:dim].T), "b": jnp.asarray(b[:dim])},
        "k": {"w": jnp.asarray(w[dim: 2 * dim].T), "b": jnp.asarray(b[dim: 2 * dim])},
        "v": {"w": jnp.asarray(w[2 * dim:].T), "b": jnp.asarray(b[2 * dim:])},
        "o": _lin(sd, f"{name}.out_proj"),
    }


def _sam_attn(sd, name):
    return {
        "q": _lin(sd, f"{name}.q_proj"),
        "k": _lin(sd, f"{name}.k_proj"),
        "v": _lin(sd, f"{name}.v_proj"),
        "o": _lin(sd, f"{name}.out_proj"),
    }


def convert_seg(sd: Dict, cfg: SegConfig, prefix: str = "") -> Dict:
    d = cfg.prompt_embed_dim
    params = {
        "text_fc": {
            "fc1": _lin(sd, f"{prefix}text_hidden_fcs.0.0"),
            "fc2": _lin(sd, f"{prefix}text_hidden_fcs.0.2"),
        },
        "multiseg_scalar": jnp.full(
            (cfg.token_nums_per_scale,), 1.0 / cfg.token_nums_per_scale
        ),
        "multiscale_scalar": jnp.full(
            (cfg.image_scale_nums,), 1.0 / cfg.image_scale_nums
        ),
        "no_mask_embed": jnp.asarray(_np(sd[f"{prefix}no_mask_embed.weight"])[0]),
        "neck": {
            "conv1": _conv(sd, f"{prefix}image_feature_neck.0"),
            "ln1": _ln(sd, f"{prefix}image_feature_neck.1"),
            "conv2": _conv(sd, f"{prefix}image_feature_neck.2"),
            "ln2": _ln(sd, f"{prefix}image_feature_neck.3"),
        },
        "pe_gaussian": jnp.asarray(
            _np(sd[f"{prefix}pe_layer.positional_encoding_gaussian_matrix"])
        ),
    }
    md = f"{prefix}mask_decoder"
    transformers = []
    for t in range(cfg.image_scale_nums):
        blocks = []
        for i in range(cfg.transformer_depth):
            base = f"{md}.transformer.{t}.layers.{i}"
            blocks.append(
                {
                    "self_attn": _sam_attn(sd, f"{base}.self_attn"),
                    "norm1": _ln(sd, f"{base}.norm1"),
                    "cross_t2i": _sam_attn(sd, f"{base}.cross_attn_token_to_image"),
                    "norm2": _ln(sd, f"{base}.norm2"),
                    "mlp": {
                        "fc1": _lin(sd, f"{base}.mlp.lin1"),
                        "fc2": _lin(sd, f"{base}.mlp.lin2"),
                    },
                    "norm3": _ln(sd, f"{base}.norm3"),
                    "norm4": _ln(sd, f"{base}.norm4"),
                    "cross_i2t": _sam_attn(sd, f"{base}.cross_attn_image_to_token"),
                }
            )
        transformers.append(
            {
                "blocks": blocks,
                "final_t2i": _sam_attn(
                    sd, f"{md}.transformer.{t}.final_attn_token_to_image"
                ),
                "final_norm": _ln(sd, f"{md}.transformer.{t}.norm_final_attn"),
            }
        )
    qg_layers = []
    for i in range(cfg.query_generator_num_layers):
        base = f"{md}.query_generator.layers.{i}"
        qg_layers.append(
            {
                "self_attn": _mha_from_torch_multihead(sd, f"{base}.self_attn", d),
                "cross_attn": _mha_from_torch_multihead(sd, f"{base}.cross_attn", d),
                "ffn": {
                    "fc1": _lin(sd, f"{base}.ffn.0"),
                    "fc2": _lin(sd, f"{base}.ffn.2"),
                },
                "norm1": _ln(sd, f"{base}.norm1"),
                "norm2": _ln(sd, f"{base}.norm2"),
                "norm3": _ln(sd, f"{base}.norm3"),
            }
        )
    params["decoder"] = {
        "avs_query": jnp.asarray(_np(sd[f"{md}.avs_query_tokens.weight"])),
        "query_generator": {"layers": qg_layers},
        "transformers": transformers,
        "level_embed": jnp.asarray(_np(sd[f"{md}.level_embed.weight"])),
        "hyper_mlp": {
            "fc1": _lin(sd, f"{md}.hyper_mlp.layers.0"),
            "fc2": _lin(sd, f"{md}.hyper_mlp.layers.1"),
            "fc3": _lin(sd, f"{md}.hyper_mlp.layers.2"),
        },
        "hyper_mlp_out": {
            "conv1": _conv(sd, f"{md}.hyper_mlp_out.layers.0"),
            "conv2": _conv(sd, f"{md}.hyper_mlp_out.layers.1"),
            "conv3": _conv(sd, f"{md}.hyper_mlp_out.layers.2"),
        },
        "output_upscaling": {
            "deconv": {
                "w": jnp.asarray(_np(sd[f"{md}.output_upscaling.0.weight"])),
                "b": jnp.asarray(_np(sd[f"{md}.output_upscaling.0.bias"])),
            },
            "ln": _ln(sd, f"{md}.output_upscaling.1"),
        },
        "upsample_2x": {
            "deconv": {
                "w": jnp.asarray(_np(sd[f"{md}.upsample_2x.0.weight"])),
                "b": jnp.asarray(_np(sd[f"{md}.upsample_2x.0.bias"])),
            },
            "ln": _ln(sd, f"{md}.upsample_2x.1"),
        },
        "pe1_gaussian": jnp.asarray(
            _np(sd[f"{md}.pe1.positional_encoding_gaussian_matrix"])
        ),
        # reference spells it "classfier"
        "ms3_s4_classifier": _conv(sd, f"{md}.ms3_s4_classfier", bias=False),
        "avss_classifier": _conv(sd, f"{md}.avss_classifier", bias=False),
    }
    return params
