"""Kaldi-compatible log-mel filterbank as an on-device XLA kernel.

The reference computes fbanks on the CPU per sample via
``torchaudio.compliance.kaldi.fbank(num_mel_bins=128, sample_frequency=16000,
frame_length=25, frame_shift=10)`` (``dataset/audio_processor.py:29-41``,
``models/beats/BEATs.py:119-132``) — a per-clip host bottleneck. Here the
whole pipeline (framing -> DC removal -> pre-emphasis -> povey window ->
rFFT power spectrum -> mel projection -> log) runs batched on device: the
mel projection is one (frames x 257) @ (257 x 128) matmul on the MXU and
everything else fuses into it.

Algorithm parity targets torchaudio's Kaldi-compliance implementation with
its defaults (dither=0, remove_dc_offset, preemphasis 0.97, povey window,
snip_edges, power spectrum, low_freq=20, high_freq=nyquist). The caller is
expected to pre-scale waveforms by 2**15 exactly like the reference.
"""

from __future__ import annotations

import functools
import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

EPSILON = float(np.finfo(np.float32).eps)  # torch.finfo(float32).eps


@dataclass(frozen=True)
class FbankConfig:
    sample_rate: int = 16000
    frame_length_ms: float = 25.0
    frame_shift_ms: float = 10.0
    num_mel_bins: int = 128
    low_freq: float = 20.0
    high_freq: float = 0.0  # <=0 means offset from nyquist
    preemphasis: float = 0.97
    remove_dc_offset: bool = True

    @property
    def window_size(self) -> int:
        return int(self.sample_rate * self.frame_length_ms * 0.001)  # 400

    @property
    def window_shift(self) -> int:
        return int(self.sample_rate * self.frame_shift_ms * 0.001)  # 160

    @property
    def padded_window_size(self) -> int:
        return 1 << (self.window_size - 1).bit_length()  # 512

    def num_frames(self, num_samples: int) -> int:
        # snip_edges=True framing
        if num_samples < self.window_size:
            return 0
        return 1 + (num_samples - self.window_size) // self.window_shift


def _mel_scale(freq):
    return 1127.0 * np.log(1.0 + freq / 700.0)


@functools.lru_cache(maxsize=8)
def _mel_banks_np(cfg: FbankConfig) -> np.ndarray:
    """Kaldi-style triangular mel banks, shape (padded//2 + 1, num_mel)."""
    num_fft_bins = cfg.padded_window_size // 2
    nyquist = 0.5 * cfg.sample_rate
    high_freq = cfg.high_freq if cfg.high_freq > 0 else nyquist + cfg.high_freq

    fft_bin_width = cfg.sample_rate / cfg.padded_window_size
    mel_low = _mel_scale(cfg.low_freq)
    mel_high = _mel_scale(high_freq)
    mel_delta = (mel_high - mel_low) / (cfg.num_mel_bins + 1)

    bins = np.arange(cfg.num_mel_bins, dtype=np.float64)[:, None]
    left_mel = mel_low + bins * mel_delta
    center_mel = mel_low + (bins + 1.0) * mel_delta
    right_mel = mel_low + (bins + 2.0) * mel_delta

    mel = _mel_scale(fft_bin_width * np.arange(num_fft_bins, dtype=np.float64))[None, :]
    up_slope = (mel - left_mel) / (center_mel - left_mel)
    down_slope = (right_mel - mel) / (right_mel - center_mel)
    banks = np.maximum(0.0, np.minimum(up_slope, down_slope))
    # zero weight on the nyquist bin (torchaudio pads a zero column)
    banks = np.concatenate(
        [banks, np.zeros((cfg.num_mel_bins, 1), np.float64)], axis=1
    )
    return banks.T.astype(np.float32)  # (257, num_mel)


@functools.lru_cache(maxsize=8)
def _povey_window_np(window_size: int) -> np.ndarray:
    n = np.arange(window_size, dtype=np.float64)
    hann = 0.5 - 0.5 * np.cos(2.0 * math.pi * n / (window_size - 1))
    return np.power(hann, 0.85).astype(np.float32)


@functools.partial(jax.jit, static_argnums=(1,))
def _fbank_impl(waveforms: jnp.ndarray, cfg: FbankConfig) -> jnp.ndarray:
    ws, shift, padded = cfg.window_size, cfg.window_shift, cfg.padded_window_size
    num_samples = waveforms.shape[-1]
    m = cfg.num_frames(num_samples)
    if m == 0:
        raise ValueError(f"waveform too short: {num_samples} < {ws}")

    x = waveforms.astype(jnp.float32)
    # frames: (..., m, window) — static gather, fused by XLA
    idx = jnp.arange(m)[:, None] * shift + jnp.arange(ws)[None, :]
    frames = x[..., idx]

    if cfg.remove_dc_offset:
        frames = frames - jnp.mean(frames, axis=-1, keepdims=True)
    if cfg.preemphasis != 0.0:
        prev = jnp.concatenate([frames[..., :1], frames[..., :-1]], axis=-1)
        frames = frames - cfg.preemphasis * prev

    frames = frames * jnp.asarray(_povey_window_np(ws))
    pad = [(0, 0)] * (frames.ndim - 1) + [(0, padded - ws)]
    frames = jnp.pad(frames, pad)

    spectrum = jnp.abs(jnp.fft.rfft(frames, n=padded, axis=-1)) ** 2  # (...,m,257)
    banks = jnp.asarray(_mel_banks_np(cfg))  # (257, num_mel)
    # full-fp32 matmul: the mel projection feeds a log, keep it exact
    mel = jnp.dot(spectrum, banks, precision=jax.lax.Precision.HIGHEST)
    return jnp.log(jnp.maximum(mel, EPSILON))


def kaldi_fbank(waveforms, cfg: FbankConfig = FbankConfig()) -> jnp.ndarray:
    """Batched kaldi fbank.

    Args:
      waveforms: (..., num_samples) float array, already scaled by 2**15
        (matching the reference's ``waveform * 2 ** 15``).
    Returns:
      (..., num_frames, num_mel_bins) float32 log-mel features.
    """
    return _fbank_impl(jnp.asarray(waveforms), cfg)


FBANK_MEAN = 15.41663
FBANK_STD = 6.55582


def beats_normalize(fbank: jnp.ndarray) -> jnp.ndarray:
    """BEATs input normalization (``dataset/audio_processor.py:40``)."""
    return (fbank - FBANK_MEAN) / (2.0 * FBANK_STD)


def beats_fbank(waveforms, cfg: FbankConfig = FbankConfig()) -> jnp.ndarray:
    """fbank(wav * 2**15) then BEATs normalization, fully on device."""
    return beats_normalize(kaldi_fbank(jnp.asarray(waveforms) * 32768.0, cfg))
