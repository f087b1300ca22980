"""Host-side audio IO + the per-task temporal chunkers.

The reference loads audio with librosa (C/soxr) and windows it per task
(``dataset/quick_start_dataset.py:276-620``). Here the host does only
decode + resample; windowing produces fixed-shape batches that feed the
on-device fbank kernel (see ``crab_tpu/media/fbank.py``).

When built, the native C++ data plane (``crab_tpu/native``) replaces the
numpy WAV/resample path; this module transparently uses it if present.
"""

from __future__ import annotations

import wave
from typing import Optional

import numpy as np

TARGET_SR = 16000


def _decode_pcm(raw: bytes, sampwidth: int, nchannels: int) -> np.ndarray:
    if sampwidth == 2:
        data = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif sampwidth == 4:
        data = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    elif sampwidth == 1:
        data = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported sample width {sampwidth}")
    if nchannels > 1:
        data = data.reshape(-1, nchannels).mean(axis=1)  # librosa mono=True
    return data


def resample(x: np.ndarray, sr_in: int, sr_out: int = TARGET_SR) -> np.ndarray:
    """Polyphase windowed-sinc resampling (soxr-class quality)."""
    if sr_in == sr_out:
        return x
    from math import gcd

    g = gcd(sr_in, sr_out)
    up, down = sr_out // g, sr_in // g
    # kaiser-windowed sinc low-pass at min(nyquist_in, nyquist_out)
    max_rate = max(up, down)
    half_width = 32 * max_rate
    cutoff = 1.0 / max_rate
    n = np.arange(-half_width, half_width + 1, dtype=np.float64)
    h = cutoff * np.sinc(cutoff * n) * np.kaiser(2 * half_width + 1, 8.0) * up
    # upsample by zero-stuffing, filter, downsample
    up_len = len(x) * up
    xu = np.zeros(up_len, dtype=np.float64)
    xu[::up] = x
    y = np.convolve(xu, h, mode="same")[::down]
    out_len = int(np.ceil(len(x) * sr_out / sr_in))
    return y[:out_len].astype(np.float32)


def load_audio(path: str, sr: int = TARGET_SR, duration: Optional[float] = None) -> np.ndarray:
    """Load any supported audio file (WAV, or MP3 etc. via the native
    plane's system-codec path) as mono float32 at the requested rate.

    The datasets mix formats — AVVP/AVE/AVQA ship .mp3
    (``dataset/unified_dataset.py:204,237,247``), the AVS splits .wav;
    the reference decodes all of them through librosa.
    """
    try:
        from crab_tpu.native import binding as _native

        native_ok = _native.available()
    except Exception:
        native_ok = False  # only import/build failures fall through —
        # real decode errors (missing file, corrupt stream) must surface
    if native_ok:
        return _native.load_audio(path, sr, duration)
    if not path.lower().endswith(".wav"):
        raise ValueError(
            f"{path}: non-WAV audio needs the native media plane "
            "(crab_tpu/native) with a system MPEG codec (libmpg123)"
        )
    return load_wav(path, sr, duration)


def load_wav(path: str, sr: int = TARGET_SR, duration: Optional[float] = None) -> np.ndarray:
    """Load a WAV file as mono float32 at the requested sample rate.

    Prefers the native C++ loader when available.
    """
    try:
        from crab_tpu.native import binding as _native

        if _native.available():
            return _native.load_wav(path, sr, duration)
    except Exception:
        pass
    with wave.open(path, "rb") as w:
        sr_in = w.getframerate()
        nch = w.getnchannels()
        sampwidth = w.getsampwidth()
        nframes = w.getnframes()
        if duration is not None:
            nframes = min(nframes, int(duration * sr_in))
        raw = w.readframes(nframes)
    data = _decode_pcm(raw, sampwidth, nch)
    return resample(data, sr_in, sr)


# ---------------------------------------------------------------------------
# Task chunkers — fixed output shapes, matching the reference recipes exactly.
# ---------------------------------------------------------------------------


def chunk_windows_2s_stride6(audio: np.ndarray, total_seconds: int = 60) -> np.ndarray:
    """AVQA recipe: 10 x 2s windows centered at t in {0,6,...,54}.

    Window spans [t-0.5, t+1.5) seconds where one "second" is
    len(audio)//total_seconds samples; edges are zero-padded
    (``quick_start_dataset.py:322-339``). Returns (10, 2*nps) float32.
    """
    length = len(audio)
    nps = length // total_seconds  # samples per nominal second
    out = []
    for t in range(0, total_seconds, 6):
        start_time = max(0.0, t - 0.5)
        end_time = min(float(total_seconds), t + 1.5)
        seg = audio[int(start_time * nps): int(nps * end_time)]
        if t - 0.5 < 0:
            seg = np.concatenate([np.zeros(2 * nps - len(seg), np.float32), seg])
        if t + 1.5 > total_seconds:
            seg = np.concatenate([seg, np.zeros(2 * nps - len(seg), np.float32)])
        out.append(seg.astype(np.float32))
    return np.stack(out, axis=0)


def chunk_windows_1s(audio: np.ndarray, total_seconds: int = 10) -> np.ndarray:
    """AVE/AVVP/Ref-AVS recipe: total_seconds x 1s windows, right-padded.

    (``quick_start_dataset.py:368-384``.) Returns (T, nps) float32.
    """
    length = len(audio)
    nps = length // total_seconds
    out = []
    for t in range(total_seconds):
        seg = audio[t * nps: (t + 1) * nps]
        if len(seg) < nps:
            seg = np.concatenate([seg, np.zeros(nps - len(seg), np.float32)])
        out.append(seg.astype(np.float32))
    return np.stack(out, axis=0)


def chunk_single_second(
    audio: np.ndarray, index: int, total_seconds: int, pad: bool = True
) -> np.ndarray:
    """S4/MS3/ARIG/AVSS recipe: the index-th 1-second slice of the clip.

    total_seconds = 5 (v1s/v1m/ARIG) or 10 (AVSS)
    (``quick_start_dataset.py:443-452,545-556``). Returns (nps,) float32.
    """
    nps = len(audio) // total_seconds
    seg = audio[index * nps: (index + 1) * nps]
    if pad and len(seg) < nps:
        seg = np.concatenate([seg, np.zeros(nps - len(seg), np.float32)])
    return seg.astype(np.float32)
