"""Modality projectors: frozen-encoder features -> decoder token embeddings.

Re-designs ``VLProjector``/``ALProjector``
(``models/multimodal_encoder.py:87-262``): input LayerNorm -> 2-layer
Q-Former with 32 queries -> 2-layer MLP to d_model. Each frame/second is
compressed independently to ``num_query_tokens`` tokens; temporal structure
is preserved by concatenation — this is the reference's token-budget
control layer (no attention-level long-context machinery needed).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from crab_tpu.core.config import ProjectorConfig
from crab_tpu.core.layers import gelu, layer_norm, layer_norm_init, linear, linear_init
from crab_tpu.encoders.qformer import init_qformer, qformer_apply


def init_projector(key, cfg: ProjectorConfig, d_model: int, dtype=jnp.float32):
    k_ln, k_qf, k_m1, k_m2 = jax.random.split(key, 4)
    return {
        "ln_in": layer_norm_init(cfg.encoder_width, dtype),
        "qformer": init_qformer(k_qf, cfg, dtype),
        # build_mlp(depth=2): Linear(H, D) -> GELU -> Linear(D, D)
        # (multimodal_encoder.py:25-30)
        "mlp": {
            "fc1": linear_init(k_m1, cfg.hidden_size, d_model, dtype=dtype),
            "fc2": linear_init(k_m2, d_model, d_model, dtype=dtype),
        },
    }


def projector_apply(params, feats, cfg: ProjectorConfig) -> jnp.ndarray:
    """(B, T, N, W) per-segment encoder features -> (B, T*Q, d_model).

    T = frames (visual) or seconds (audio); N = tokens per segment.
    For single-segment audio (reference's 3-D path,
    ``multimodal_encoder.py:246-260``) pass T=1.
    """
    B, T, N, W = feats.shape
    x = feats.reshape(B * T, N, W)
    x = layer_norm(params["ln_in"], x, eps=1e-12)
    q = qformer_apply(params["qformer"], x, cfg)  # (B*T, Q, H)
    q = linear(params["mlp"]["fc2"], gelu(linear(params["mlp"]["fc1"], q)))
    return q.reshape(B, T * cfg.num_query_tokens, -1)
