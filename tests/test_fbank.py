"""fbank kernel tests.

Ground truth: an independent, literal numpy transcription of the Kaldi
fbank algorithm (as implemented by torchaudio.compliance.kaldi with the
reference's arguments). torchaudio itself is not installed in this image;
if it ever is, test_against_torchaudio runs automatically as a second,
stronger oracle.
"""

import math

import numpy as np
import pytest

from crab_tpu.media.fbank import (
    FbankConfig,
    beats_fbank,
    beats_normalize,
    kaldi_fbank,
)


def _mel(f):
    return 1127.0 * np.log(1.0 + f / 700.0)


def numpy_kaldi_fbank(wave: np.ndarray) -> np.ndarray:
    """Literal Kaldi fbank, defaults: 16 kHz, 25/10 ms, 128 mel, dither 0."""
    sr, ws, shift, padded, nmel = 16000, 400, 160, 512, 128
    m = 1 + (len(wave) - ws) // shift
    frames = np.stack([wave[i * shift: i * shift + ws] for i in range(m)]).astype(
        np.float64
    )
    # remove DC
    frames = frames - frames.mean(axis=1, keepdims=True)
    # preemphasis with replicated first sample
    prev = np.concatenate([frames[:, :1], frames[:, :-1]], axis=1)
    frames = frames - 0.97 * prev
    # povey window
    n = np.arange(ws)
    window = (0.5 - 0.5 * np.cos(2 * math.pi * n / (ws - 1))) ** 0.85
    frames = frames * window
    frames = np.pad(frames, ((0, 0), (0, padded - ws)))
    spectrum = np.abs(np.fft.rfft(frames, axis=1)) ** 2  # (m, 257)
    # mel banks
    fft_bin_width = sr / padded
    mel_low, mel_high = _mel(20.0), _mel(8000.0)
    delta = (mel_high - mel_low) / (nmel + 1)
    banks = np.zeros((nmel, padded // 2 + 1))
    bin_mels = _mel(fft_bin_width * np.arange(padded // 2))
    for i in range(nmel):
        left, center, right = (
            mel_low + i * delta,
            mel_low + (i + 1) * delta,
            mel_low + (i + 2) * delta,
        )
        up = (bin_mels - left) / (center - left)
        down = (right - bin_mels) / (right - center)
        banks[i, : padded // 2] = np.maximum(0, np.minimum(up, down))
    mel_e = spectrum @ banks.T
    eps = np.finfo(np.float32).eps
    return np.log(np.maximum(mel_e, eps))


@pytest.fixture
def wave(rng):
    # 1 s of band-limited noise + tone, scaled like the reference (x * 2**15)
    t = np.arange(16000) / 16000.0
    w = 0.1 * np.sin(2 * np.pi * 440 * t) + 0.02 * rng.standard_normal(16000)
    return (w * 32768.0).astype(np.float32)


def test_shapes():
    cfg = FbankConfig()
    assert cfg.window_size == 400 and cfg.window_shift == 160
    assert cfg.padded_window_size == 512
    assert cfg.num_frames(16000) == 98  # "1s -> 98 tokens"
    assert cfg.num_frames(32000) == 198
    out = kaldi_fbank(np.zeros((2, 16000), np.float32) + 1.0)
    assert out.shape == (2, 98, 128)


def test_matches_numpy_oracle(wave):
    ours = np.asarray(kaldi_fbank(wave))
    ref = numpy_kaldi_fbank(wave.astype(np.float64))
    assert ours.shape == ref.shape == (98, 128)
    # fp32 FFT vs the fp64 oracle: ~1e-2 in log-mel space is float noise
    # (BEATs normalization later divides by ~13.1).
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=1e-2)


def test_batched_consistency(wave, rng):
    w2 = (0.05 * rng.standard_normal(16000) * 32768.0).astype(np.float32)
    batch = np.stack([wave, w2])
    out_b = np.asarray(kaldi_fbank(batch))
    out_0 = np.asarray(kaldi_fbank(wave))
    out_1 = np.asarray(kaldi_fbank(w2))
    # batched vs single FFT may take different fp32 algorithm paths in XLA
    np.testing.assert_allclose(out_b[0], out_0, rtol=1e-3, atol=1e-2)
    np.testing.assert_allclose(out_b[1], out_1, rtol=1e-3, atol=1e-2)


def test_beats_normalization(wave):
    raw = np.asarray(kaldi_fbank(wave))
    norm = np.asarray(beats_normalize(raw))
    np.testing.assert_allclose(norm, (raw - 15.41663) / (2 * 6.55582), rtol=1e-6)
    # end-to-end helper takes unscaled waveforms
    e2e = np.asarray(beats_fbank(wave / 32768.0))
    np.testing.assert_allclose(e2e, norm, rtol=1e-4, atol=1e-4)


def test_against_torchaudio(wave):
    torchaudio = pytest.importorskip("torchaudio")
    if getattr(getattr(torchaudio, "compliance", None), "kaldi", None) is None or (
        getattr(torchaudio.compliance.kaldi, "fbank", None) is None
    ):
        pytest.skip("torchaudio is a test stub (BEATs parity tests)")
    import torch

    ref = torchaudio.compliance.kaldi.fbank(
        torch.from_numpy(wave).unsqueeze(0),
        num_mel_bins=128,
        sample_frequency=16000,
        frame_length=25,
        frame_shift=10,
    ).numpy()
    ours = np.asarray(kaldi_fbank(wave))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-3)
