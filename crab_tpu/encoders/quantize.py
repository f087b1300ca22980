"""W8A8 quantization for the frozen perception encoders.

The encode stage (CLIP ViT-L x B*10 frames + BEATs x B*10 windows +
Q-Formers; reference hot loop #2, ``unified_arch.py:113-155``) is
MXU-compute-bound in bf16 (~82% of peak — tools/README.md encoder
table), so weight-only quantization buys nothing; the win is running
the big matmuls s8 x s8 at the MXU's doubled int8 rate. This module
converts linear params in the encoder trees to the ``w_q``/``w_s``
format that ``core.layers.linear`` executes as a W8A8 dot with
per-token activation scales and an fp32 epilogue.

Opt-in (``--enc-int8`` on the CLIs, default on in bench.py): the
encoders are frozen feature extractors, but CLIP taps [14, 22] feed the
segmentation neck, so parity/eval paths keep bf16 unless asked.
Measured numerics: rel err ~1e-2 on encoder outputs (tests/
test_encoders.py::test_int8_encoders_close), the same class as the
decoder's serving-path a8 prefill.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp


def _quantize_linear(p: Dict) -> Dict:
    """{'w': (in, out)[, 'b']} -> {'w_q', 'w_s'[, 'b']} per-out-channel
    symmetric int8 (same layout as lm/quant.quantize_weight)."""
    w = p["w"].astype(jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=0, keepdims=True)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    out = {k: v for k, v in p.items() if k != "w"}
    out["w_q"] = q
    out["w_s"] = scale
    return out


def _walk(node, min_dim: int):
    if isinstance(node, dict):
        w = node.get("w")
        if (
            w is not None
            and getattr(w, "ndim", 0) == 2
            and min(w.shape) >= min_dim
        ):
            return _quantize_linear(node)
        return {k: _walk(v, min_dim) for k, v in node.items()}
    if isinstance(node, list):
        return [_walk(v, min_dim) for v in node]
    return node


def quantize_encoder_tree(params, min_dim: int = 256):
    """Quantize every 2-D linear with both dims >= min_dim in one encoder
    param tree. Skips by construction: layer norms, biases, the BEATs
    grouped pos-conv (3-D weight, conv path reads 'w' directly), the
    tiny gru_rel_pos gate (head_dim -> 8), and bare-array embeddings
    (CLIP patch/position embeddings are not {'w': ...} dicts)."""
    return _walk(params, min_dim)


def quantize_encoders(
    params: Dict, components=("vision", "audio"), min_dim: int = 256
) -> Dict:
    """Quantize the chosen encoder components of a full Crab param tree.

    Q-Formers (~10 ms of a 303 ms encode at batch 16) and the seg neck
    stay bf16 by default: negligible time, and the seg head is the
    numerics-sensitive consumer.
    """
    out = dict(params)
    for name in components:
        if name in out:
            out[name] = quantize_encoder_tree(out[name], min_dim)
    return out
