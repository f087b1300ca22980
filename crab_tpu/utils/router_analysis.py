"""MoE-LoRA expert analysis — the analogue of ``utils/tsen_lora.py``.

The reference t-SNEs the flattened expert B matrices to visualize expert
specialization ("explicit cooperation" evidence). Here: PCA projection
(numpy-only; no sklearn in this image) plus expert-similarity statistics,
operating directly on the stacked crab_tpu decoder params.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional

import numpy as np


def _pca_2d(x: np.ndarray) -> np.ndarray:
    """(N, D) -> (N, 2) principal-component projection."""
    x = x - x.mean(axis=0, keepdims=True)
    # SVD on the (small N) gram matrix for efficiency
    u, s, _ = np.linalg.svd(x @ x.T)
    proj = u[:, :2] * np.sqrt(np.maximum(s[:2], 0.0))[None, :]
    return proj


def expert_embedding(
    decoder_params: Dict, proj: str = "q", num_experts: Optional[int] = None
) -> Dict:
    """2-D embedding + pairwise cosine of each (layer, expert) B matrix.

    Returns {'points': (L*E, 2), 'labels': [(layer, expert)...],
             'cosine': (E, E) mean over layers}.

    Handles both LoRA layouts: canonical ``B`` (L, E, r, out) and the
    packed serving layout's fused single-member ``Bd`` (L, E*r, out) —
    the latter needs ``num_experts`` to un-flatten (E is not recoverable
    from the fused shapes alone).
    """
    lora = decoder_params["layers"][proj]["lora"]
    if "B" in lora:
        B = np.asarray(lora["B"], np.float32)
    else:
        if num_experts is None:
            raise ValueError(
                f"{proj} uses the fused serving LoRA layout (Bd); pass "
                "num_experts (cfg.decoder.lora.num_experts) to un-flatten"
            )
        Bd = np.asarray(lora["Bd"], np.float32)
        L_, er, out = Bd.shape
        # the un-flatten below is valid ONLY for the single-member fused
        # layout (o/down). A multi-member block-diagonal Bd ('qkv'/'gu':
        # (L, n*E*r, sum_out)) would silently mix member blocks and zero
        # padding into the per-expert vectors — detect it via the fused
        # RA width (single member: E + r columns) and refuse.
        if "RA" in lora:
            r_implied = er // num_experts
            cols = int(np.shape(lora["RA"])[-1])
            if cols != num_experts + r_implied:
                raise ValueError(
                    f"{proj} is a multi-member packed projection "
                    f"(RA has {cols} columns, single-member would have "
                    f"{num_experts + r_implied}); analyze the canonical "
                    "(unpacked) params instead"
                )
        B = Bd.reshape(L_, num_experts, er // num_experts, out)
    L, E = B.shape[0], B.shape[1]
    flat = B.reshape(L * E, -1)
    points = _pca_2d(flat)
    labels = [(l, e) for l in range(L) for e in range(E)]

    per_layer = flat.reshape(L, E, -1)
    norms = np.linalg.norm(per_layer, axis=-1, keepdims=True) + 1e-9
    unit = per_layer / norms
    cos = np.einsum("led,lfd->lef", unit, unit).mean(axis=0)
    return {"points": points, "labels": labels, "cosine": cos}


def route_entropy(route_mean: np.ndarray) -> float:
    """Entropy of the mean routing distribution (L, E) — low entropy
    means expert collapse."""
    p = np.asarray(route_mean, np.float64)
    p = p / p.sum(axis=-1, keepdims=True)
    h = -(p * np.log(np.maximum(p, 1e-12))).sum(axis=-1)
    return float(h.mean())


def analyze(
    decoder_params: Dict,
    out_dir: Optional[str] = None,
    num_experts: Optional[int] = None,
) -> Dict:
    """``num_experts`` is required only for packed/fused serving trees
    (their o/down LoRA stores flattened ``Bd``; pass
    cfg.decoder.lora.num_experts)."""
    report = {}
    for proj in ("q", "k", "v", "o"):
        if "lora" not in decoder_params["layers"].get(proj, {}):
            continue
        emb = expert_embedding(decoder_params, proj, num_experts=num_experts)
        report[proj] = {
            "expert_cosine": emb["cosine"].tolist(),
            "spread": float(np.std(emb["points"])),
        }
        if out_dir:
            os.makedirs(out_dir, exist_ok=True)
            np.save(os.path.join(out_dir, f"{proj}_expert_points.npy"), emb["points"])
    if out_dir:
        with open(os.path.join(out_dir, "expert_report.json"), "w") as f:
            json.dump(report, f, indent=1)
    return report
