"""Multimodal token splicing with static layouts.

The reference splices modality features into the embedding sequence with
per-sample dynamic index surgery on device
(``models/unified_arch.py:217-406``). TPU-first re-design: the *layout* is
computed on host as plain integer arrays (prompts are templated, so this
is trivial), and the device does one fixed-shape gather-select:

    embeds[b, l] = feat_bank[feat_idx[b, l]]  if feat_idx[b, l] >= 0
                   embed_table[text_ids[b, l]] otherwise

which jits once per (batch, seq-bucket, feature-bank) shape regardless of
where modalities sit in the prompt. Left padding + position_ids follow the
reference exactly (``unified_arch.py:338-372``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from crab_tpu.fusion.tokens import SpecialTokens

IGNORE_LABEL = -100


@dataclass
class SampleSpec:
    """One sample's token-level description (host side).

    input_ids: prompt (+ target at train time) token ids containing single
      placeholder tokens (<audio>/<video>/<image>).
    labels: same length; IGNORE_LABEL on prompt positions (train only).
    feature_lens: tokens contributed by each placeholder occurrence, in
      order of appearance, e.g. {'<video>': 320, '<audio>': 320}.
    """

    input_ids: np.ndarray
    feature_lens: Dict[str, int]
    labels: Optional[np.ndarray] = None
    task_name: str = ""


@dataclass
class SpliceBatch:
    """Device-ready arrays; everything static-shaped."""

    text_ids: np.ndarray  # (B, L) int32 — pad_id at modality/pad slots
    feat_idx: np.ndarray  # (B, L) int32 — index into feature bank or -1
    attention_mask: np.ndarray  # (B, L) int32
    position_ids: np.ndarray  # (B, L) int32
    labels: np.ndarray  # (B, L) int32 (IGNORE_LABEL outside targets)
    mask_token_pos: np.ndarray  # (B, num_mask_tokens) int32, -1 if absent
    seq_len: int

    @property
    def batch_size(self) -> int:
        return self.text_ids.shape[0]


def build_splice_batch(
    samples: Sequence[SampleSpec],
    special: SpecialTokens,
    feature_order: Sequence[str] = ("<audio>", "<video>", "<image>"),
    feature_bank_lens: Optional[Dict[str, int]] = None,
    pad_id: int = 0,
    pad_to: Optional[int] = None,
    num_mask_tokens: int = 6,
) -> SpliceBatch:
    """Expand placeholders, left-pad, and emit gather indices.

    The feature bank layout (per sample b): features appear in
    ``feature_order``, each padded to ``feature_bank_lens[kind]`` slots
    (defaults to the max over the batch). Global bank index =
    b * bank_stride + offset_of(kind) + position_within_kind. The engine
    must build the bank with the same layout.
    """
    ph_ids = {v: k for k, v in special.placeholder_ids.items()}  # id -> token
    mask_ids = set(special.mask_token_ids)

    if feature_bank_lens is None:
        feature_bank_lens = {}
        for kind in feature_order:
            m = max((s.feature_lens.get(kind, 0) for s in samples), default=0)
            feature_bank_lens[kind] = m
    offsets = {}
    acc = 0
    for kind in feature_order:
        offsets[kind] = acc
        acc += feature_bank_lens.get(kind, 0)
    bank_stride = acc

    expanded: List[Tuple[List[int], List[int], List[int]]] = []
    max_len = 0
    for b, s in enumerate(samples):
        ids: List[int] = []
        fidx: List[int] = []
        labels_in = (
            s.labels
            if s.labels is not None
            else np.full(len(s.input_ids), IGNORE_LABEL, np.int64)
        )
        labs: List[int] = []
        for tok, lab in zip(s.input_ids.tolist(), labels_in.tolist()):
            if tok in ph_ids:
                kind = ph_ids[tok]
                n = s.feature_lens.get(kind)
                if n is None:
                    raise ValueError(
                        f"sample {b}: placeholder {kind} with no feature_lens entry"
                    )
                base = b * bank_stride + offsets[kind]
                ids.extend([pad_id] * n)
                fidx.extend(range(base, base + n))
                labs.extend([IGNORE_LABEL] * n)
            else:
                ids.append(tok)
                fidx.append(-1)
                labs.append(lab)
        expanded.append((ids, fidx, labs))
        max_len = max(max_len, len(ids))

    L = pad_to or max_len
    if L < max_len:
        raise ValueError(f"pad_to={pad_to} < longest sample {max_len}")

    B = len(samples)
    text_ids = np.full((B, L), pad_id, np.int32)
    feat_idx = np.full((B, L), -1, np.int32)
    attn = np.zeros((B, L), np.int32)
    labels = np.full((B, L), IGNORE_LABEL, np.int32)
    mask_pos = np.full((B, num_mask_tokens), -1, np.int32)

    for b, (ids, fidx, labs) in enumerate(expanded):
        n = len(ids)
        text_ids[b, L - n:] = ids
        feat_idx[b, L - n:] = fidx
        attn[b, L - n:] = 1
        labels[b, L - n:] = labs
        mp = [L - n + i for i, t in enumerate(ids) if t in mask_ids]
        for j, pidx in enumerate(mp[:num_mask_tokens]):
            mask_pos[b, j] = pidx

    position_ids = np.maximum(np.cumsum(attn, axis=-1) - 1, 0).astype(np.int32)
    return SpliceBatch(text_ids, feat_idx, attn, position_ids, labels, mask_pos, L)


def splice_embeds(
    embed_table: jnp.ndarray,  # (V, D)
    batch: SpliceBatch,
    feature_bank: jnp.ndarray,  # (B * bank_stride, D)
) -> jnp.ndarray:
    """Device-side assembly -> (B, L, D) input embeddings."""
    text_emb = jnp.take(embed_table, jnp.asarray(batch.text_ids), axis=0, mode="clip")
    feat_idx = jnp.asarray(batch.feat_idx)
    gathered = jnp.take(feature_bank, jnp.maximum(feat_idx, 0), axis=0, mode="clip")
    use_feat = (feat_idx >= 0)[..., None]
    return jnp.where(use_feat, gathered.astype(text_emb.dtype), text_emb)
