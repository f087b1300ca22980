"""Full Crab model assembly: params for every component + pure applies.

The analogue of ``UnifiedForCausalLM`` + ``init_multimodal_modules``
(``models/unified_llama.py``, ``models/unified_arch.py:31-110``), as a
param pytree and composition of the pure module functions.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from crab_tpu.core.config import CrabConfig
from crab_tpu.encoders.beats import beats_apply, init_beats
from crab_tpu.encoders.clip_vit import clip_vit_apply, init_clip_vit
from crab_tpu.encoders.projectors import init_projector, projector_apply
from crab_tpu.lm.llama import init_llama
from crab_tpu.media.fbank import FbankConfig, beats_normalize, kaldi_fbank
from crab_tpu.media.video import clip_normalize
from crab_tpu.seg.seg_module import init_seg


def init_crab(key, cfg: CrabConfig, dtype=None, skip: tuple = ()) -> Dict:
    """Random-init the full tree. ``skip`` omits components the caller
    will supply differently (e.g. an int8 decoder at 7B, where the bf16
    tree alone would exhaust a 16 GB chip)."""
    if dtype is None:
        dtype = jnp.dtype(cfg.param_dtype)
    ks = jax.random.split(key, 6)
    out = {
        "vision": lambda: init_clip_vit(ks[0], cfg.vision, dtype),
        "audio": lambda: init_beats(ks[1], cfg.audio, dtype),
        "vl_projector": lambda: init_projector(
            ks[2], cfg.vl_projector, cfg.decoder.hidden_size, dtype
        ),
        "al_projector": lambda: init_projector(
            ks[3], cfg.al_projector, cfg.decoder.hidden_size, dtype
        ),
        "decoder": lambda: init_llama(ks[4], cfg.decoder, dtype),
        "seg": lambda: init_seg(ks[5], cfg.seg, cfg.decoder.hidden_size, dtype),
    }
    return {k: f() for k, f in out.items() if k not in skip}


def encode_video(
    params, cfg: CrabConfig, frames_u8: jnp.ndarray, want_seg_taps: bool = False
) -> Tuple[jnp.ndarray, Optional[List[jnp.ndarray]]]:
    """(B, T, H, W, 3) uint8 -> (B, T*Q, D) LLM tokens [+ seg taps].

    Mirrors ``encode_video`` (``unified_arch.py:144-149``): the *last*
    hidden-state tap feeds the VL projector; the first image_scale_nums
    taps feed the segmentation neck (``unified_arch.py:229-251``).
    """
    B, T = frames_u8.shape[:2]
    px = clip_normalize(frames_u8.reshape((B * T,) + frames_u8.shape[2:]))
    px = px.astype(jnp.dtype(cfg.compute_dtype))
    taps = clip_vit_apply(params["vision"], px, cfg.vision)
    feats = taps[-1].reshape(B, T, cfg.vision.tokens_per_image, cfg.vision.hidden_size)
    tokens = projector_apply(params["vl_projector"], feats, cfg.vl_projector)
    seg_taps = None
    if want_seg_taps:
        # frame 0 only, matching `image_feature[:, 0]`
        # (multimodal_encoder.py:404)
        n = cfg.seg.image_scale_nums
        seg_taps = [
            t.reshape(B, T, cfg.vision.tokens_per_image, -1)[:, 0].astype(jnp.float32)
            for t in taps[:n]
        ]
    return tokens, seg_taps


def encode_audio(
    params, cfg: CrabConfig, waveforms: jnp.ndarray, fbank_cfg: FbankConfig = FbankConfig()
) -> jnp.ndarray:
    """(B, T, num_samples) raw audio -> (B, T*Q, D) LLM tokens.

    The whole frontend (fbank + normalize) runs on device — the
    reference's host-side librosa/torchaudio stage
    (``dataset/audio_processor.py``) is gone.
    """
    B, T, _ = waveforms.shape
    if waveforms.dtype == jnp.int16:
        # compact H2D transport (engine ships PCM16 — exact for WAV
        # sources, halves audio upload bytes through the host link);
        # kaldi_fbank expects int16-scale floats, so this IS the *32768
        w = waveforms.astype(jnp.float32)
    else:
        w = waveforms * 32768.0
    fb = beats_normalize(kaldi_fbank(w, fbank_cfg))
    fb = fb.reshape((B * T,) + fb.shape[2:]).astype(jnp.dtype(cfg.compute_dtype))
    feats = beats_apply(params["audio"], fb, cfg.audio)
    feats = feats.reshape(B, T, feats.shape[1], feats.shape[2])
    return projector_apply(params["al_projector"], feats, cfg.al_projector)
