"""torch-checkpoint -> crab_tpu param-tree converters for the encoders.

Works from plain ``{name: tensor}`` state dicts so the same code handles
real checkpoints (HF CLIP ViT-L, BEATs fairseq .pt, reference projector
deltas) and the tiny random torch models used in parity tests.

Name maps follow the reference modules:
  CLIP:      HF ``CLIPVisionModel`` (vision_model.*)
  BEATs:     ``models/beats/BEATs.py`` state dict (encoder.pos_conv uses
             weight-norm, folded here since the encoder is frozen)
  Q-Former:  ``models/Qformer.py`` BertModel under ``*_Qformer.bert.``
  Projector: ``VLProjector``/``ALProjector`` (multimodal_encoder.py:87-262)
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

from crab_tpu.core.config import AudioEncoderConfig, ProjectorConfig, VisionEncoderConfig
from crab_tpu.encoders.clip_vit import _pack_qkv


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        return t.detach().cpu().float().numpy()
    return np.asarray(t, np.float32)


def _lin(sd, name) -> dict:
    p = {"w": jnp.asarray(_np(sd[f"{name}.weight"]).T)}
    if f"{name}.bias" in sd:
        p["b"] = jnp.asarray(_np(sd[f"{name}.bias"]))
    return p


def _ln(sd, name) -> dict:
    return {
        "scale": jnp.asarray(_np(sd[f"{name}.weight"])),
        "bias": jnp.asarray(_np(sd[f"{name}.bias"])),
    }


# ---------------------------------------------------------------------------
# CLIP ViT
# ---------------------------------------------------------------------------


def convert_clip_vit(sd: Dict, cfg: VisionEncoderConfig, prefix: str = "vision_model."):
    pe = _np(sd[f"{prefix}embeddings.patch_embedding.weight"])  # (D, 3, P, P)
    D = pe.shape[0]
    params = {
        "class_embedding": jnp.asarray(_np(sd[f"{prefix}embeddings.class_embedding"])),
        "patch_embedding": jnp.asarray(pe.reshape(D, -1).T),  # (3*P*P, D)
        "position_embedding": jnp.asarray(
            _np(sd[f"{prefix}embeddings.position_embedding.weight"])
        ),
        # note: HF spells it "pre_layrnorm"
        "pre_ln": _ln(sd, f"{prefix}pre_layrnorm"),
        "layers": [],
    }
    for i in range(cfg.num_layers):
        base = f"{prefix}encoder.layers.{i}"
        params["layers"].append(
            {
                "ln1": _ln(sd, f"{base}.layer_norm1"),
                "attn": {
                    # packed (H, 3H) qkv — see clip_vit._pack_qkv
                    "qkv": _pack_qkv(
                        _lin(sd, f"{base}.self_attn.q_proj"),
                        _lin(sd, f"{base}.self_attn.k_proj"),
                        _lin(sd, f"{base}.self_attn.v_proj"),
                    ),
                    "o": _lin(sd, f"{base}.self_attn.out_proj"),
                },
                "ln2": _ln(sd, f"{base}.layer_norm2"),
                "mlp": {
                    "fc1": _lin(sd, f"{base}.mlp.fc1"),
                    "fc2": _lin(sd, f"{base}.mlp.fc2"),
                },
            }
        )
    return params


# ---------------------------------------------------------------------------
# BEATs
# ---------------------------------------------------------------------------


def convert_beats(sd: Dict, cfg: AudioEncoderConfig, prefix: str = ""):
    pw = _np(sd[f"{prefix}patch_embedding.weight"])  # (E, 1, ps, ps)
    E = pw.shape[0]
    params = {
        "patch_embedding": {"w": jnp.asarray(pw.reshape(E, -1).T)},
        "ln_patch": _ln(sd, f"{prefix}layer_norm"),
        "ln_pre": _ln(sd, f"{prefix}encoder.layer_norm"),
        "layers": [],
        "rel_bias": None,
    }
    if f"{prefix}patch_embedding.bias" in sd:
        params["patch_embedding"]["b"] = jnp.asarray(
            _np(sd[f"{prefix}patch_embedding.bias"])
        )
    if f"{prefix}post_extract_proj.weight" in sd:
        params["post_extract_proj"] = _lin(sd, f"{prefix}post_extract_proj")

    # fold weight norm: w[o,i,k] = g[0,0,k] * v[o,i,k] / ||v[:,:,k]||
    pc = f"{prefix}encoder.pos_conv.0"
    if f"{pc}.weight_g" in sd:
        g = _np(sd[f"{pc}.weight_g"])  # (1, 1, K)
        v = _np(sd[f"{pc}.weight_v"])  # (O, I, K)
        norm = np.sqrt((v**2).sum(axis=(0, 1), keepdims=True))
        w = g * v / norm
    else:
        w = _np(sd[f"{pc}.weight"])
    params["pos_conv"] = {
        "w": jnp.asarray(w.transpose(2, 1, 0)),  # (K, I, O) = 'TIO'
        "b": jnp.asarray(_np(sd[f"{pc}.bias"])),
    }

    if cfg.relative_position_embedding:
        params["rel_bias"] = jnp.asarray(
            _np(sd[f"{prefix}encoder.layers.0.self_attn.relative_attention_bias.weight"])
        )
    for i in range(cfg.encoder_layers):
        base = f"{prefix}encoder.layers.{i}"
        layer = {
            "attn": {
                "q": _lin(sd, f"{base}.self_attn.q_proj"),
                "k": _lin(sd, f"{base}.self_attn.k_proj"),
                "v": _lin(sd, f"{base}.self_attn.v_proj"),
                "o": _lin(sd, f"{base}.self_attn.out_proj"),
            },
            "ln1": _ln(sd, f"{base}.self_attn_layer_norm"),
            "fc1": _lin(sd, f"{base}.fc1"),
            "fc2": _lin(sd, f"{base}.fc2"),
            "ln2": _ln(sd, f"{base}.final_layer_norm"),
        }
        if cfg.gru_rel_pos:
            layer["grep_linear"] = _lin(sd, f"{base}.self_attn.grep_linear")
            layer["grep_a"] = jnp.asarray(_np(sd[f"{base}.self_attn.grep_a"]))
        params["layers"].append(layer)
    return params


# ---------------------------------------------------------------------------
# Q-Former + projector
# ---------------------------------------------------------------------------


def convert_qformer(sd: Dict, cfg: ProjectorConfig, prefix: str, query_tokens_key: str):
    params = {
        "query_tokens": jnp.asarray(_np(sd[query_tokens_key])[0]),  # (1,Q,H)->(Q,H)
        "emb_ln": _ln(sd, f"{prefix}embeddings.LayerNorm"),
        "layers": [],
    }
    for i in range(cfg.num_hidden_layers):
        base = f"{prefix}encoder.layer.{i}"
        params["layers"].append(
            {
                "self_attn": {
                    "q": _lin(sd, f"{base}.attention.self.query"),
                    "k": _lin(sd, f"{base}.attention.self.key"),
                    "v": _lin(sd, f"{base}.attention.self.value"),
                    "o": _lin(sd, f"{base}.attention.output.dense"),
                    "ln": _ln(sd, f"{base}.attention.output.LayerNorm"),
                },
                "cross_attn": {
                    "q": _lin(sd, f"{base}.crossattention.self.query"),
                    "k": _lin(sd, f"{base}.crossattention.self.key"),
                    "v": _lin(sd, f"{base}.crossattention.self.value"),
                    "o": _lin(sd, f"{base}.crossattention.output.dense"),
                    "ln": _ln(sd, f"{base}.crossattention.output.LayerNorm"),
                },
                "ffn": {
                    "fc1": _lin(sd, f"{base}.intermediate_query.dense"),
                    "fc2": _lin(sd, f"{base}.output_query.dense"),
                    "ln": _ln(sd, f"{base}.output_query.LayerNorm"),
                },
            }
        )
    return params


def convert_projector(sd: Dict, cfg: ProjectorConfig, modality: str):
    """modality: 'visual' or 'audio' (reference param naming)."""
    return {
        "ln_in": _ln(sd, f"{modality}_ln"),
        "qformer": convert_qformer(
            sd,
            cfg,
            prefix=f"{modality}_Qformer.bert.",
            query_tokens_key=f"{modality}_query_tokens",
        ),
        "mlp": {
            "fc1": _lin(sd, f"{modality}_proj.0"),
            "fc2": _lin(sd, f"{modality}_proj.2"),
        },
    }
