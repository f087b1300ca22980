"""Media data-plane tests: WAV IO, chunkers, image preprocessing, masks."""

import numpy as np
import pytest

from crab_tpu.media.audio import (
    chunk_single_second,
    chunk_windows_1s,
    chunk_windows_2s_stride6,
    load_wav,
    resample,
)
from crab_tpu.media.masks import avs_palette, color_mask_to_label
from crab_tpu.media.video import clip_normalize, uniform_frame_indices

REF_WAV = "/root/reference/assets/example/s4/audio.wav"


def test_load_wav_reference_asset():
    import os

    if not os.path.exists(REF_WAV):
        pytest.skip("reference asset missing")
    audio = load_wav(REF_WAV)
    assert audio.ndim == 1 and audio.dtype == np.float32
    # s4 clips are ~5 s at 16 kHz (80320 frames, stereo in the file)
    assert 4.5 * 16000 < len(audio) < 5.5 * 16000
    assert np.abs(audio).max() <= 1.0


@pytest.mark.slow
def test_resample_tone():
    sr_in, sr_out = 44100, 16000
    t = np.arange(sr_in) / sr_in
    x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    y = resample(x, sr_in, sr_out)
    assert abs(len(y) - sr_out) <= 1
    # the resampled tone keeps its frequency: count zero crossings
    zc = np.sum(np.abs(np.diff(np.signbit(y[100:-100]))))
    assert abs(zc / 2 - 440 * len(y[100:-100]) / sr_out) < 8


def test_chunkers_shapes():
    audio = np.random.default_rng(0).standard_normal(60 * 16000).astype(np.float32)
    w2 = chunk_windows_2s_stride6(audio, 60)
    assert w2.shape == (10, 32000)
    w1 = chunk_windows_1s(audio[: 10 * 16000], 10)
    assert w1.shape == (10, 16000)
    s = chunk_single_second(audio[: 5 * 16000], 2, 5)
    assert s.shape == (16000,)
    np.testing.assert_array_equal(s, audio[2 * 16000: 3 * 16000])


def test_chunk_2s_edge_padding():
    audio = np.ones(60 * 16000, np.float32)
    w = chunk_windows_2s_stride6(audio, 60)
    # first window starts at t=-0.5 -> first 0.5 s zero-padded
    assert np.all(w[0, :8000] == 0) and np.all(w[0, 8000:] == 1)
    # interior windows untouched
    assert np.all(w[1] == 1)
    # last window t=54 spans [53.5, 55.5] -> inside, no padding
    assert np.all(w[-1] == 1)


def test_clip_normalize():
    u8 = np.zeros((2, 4, 4, 3), np.uint8)
    u8[..., 0] = 255
    out = np.asarray(clip_normalize(u8))
    assert out.shape == (2, 3, 4, 4)
    np.testing.assert_allclose(
        out[0, 0, 0, 0], (1.0 - 0.48145466) / 0.26862954, rtol=1e-5
    )
    np.testing.assert_allclose(out[0, 1, 0, 0], -0.4578275 / 0.26130258, rtol=1e-5)


def test_uniform_frame_indices():
    assert uniform_frame_indices(100, 10) == [0, 10, 20, 30, 40, 50, 60, 70, 80, 90]
    assert len(uniform_frame_indices(7, 10)) == 7


def test_avs_palette_roundtrip():
    pal = avs_palette()
    assert pal.shape == (71, 3)
    assert tuple(pal[0]) == (0, 0, 0)
    # distinct colors
    assert len({tuple(c) for c in pal}) == 71
    # build a color mask from labels and invert it
    labels = np.random.default_rng(1).integers(0, 71, size=(16, 16))
    rgb = pal[labels]
    rec = color_mask_to_label(rgb)
    np.testing.assert_array_equal(rec, labels)


# ---------------------------------------------------------------------
# YUV420 wire format (codec-native video plane shipping)
# ---------------------------------------------------------------------


def _random_packed_yuv(rng, t=3, h=56, w=56):
    return rng.integers(0, 256, (t, h * 3 // 2, w)).astype(np.uint8)


def test_yuv420_device_matches_host_bitexact():
    from crab_tpu.media.video import yuv420_to_rgb, yuv420_to_rgb_host

    p = _random_packed_yuv(np.random.default_rng(0))
    host = yuv420_to_rgb_host(p)
    dev = np.asarray(yuv420_to_rgb(p))
    assert host.shape == (3, 56, 56, 3) and host.dtype == np.uint8
    np.testing.assert_array_equal(dev, host)


def test_yuv420_batched_shapes():
    from crab_tpu.media.video import yuv420_to_rgb_host

    p = np.random.default_rng(1).integers(0, 256, (2, 4, 84, 56), np.uint8)
    out = yuv420_to_rgb_host(p)
    assert out.shape == (2, 4, 56, 56, 3)


def test_yuv420_roundtrip_safe_range():
    """YUV -> RGB -> YUV is within rounding (+-1) when the RGB never
    clips: nearest chroma upsample + 2x2 mean recovers U/V, and Y is
    re-derived from the rounded RGB."""
    from crab_tpu.media.video import rgb_to_yuv420, yuv420_to_rgb_host

    rng = np.random.default_rng(2)
    t, h, w = 2, 56, 56
    y = rng.integers(70, 180, (t, h, w))
    # smooth, mild chroma so the 2x2 mean is representative
    u = np.repeat(np.repeat(rng.integers(110, 146, (t, h // 2 // 2, w // 2 // 2)), 2, 1), 2, 2)
    v = np.repeat(np.repeat(rng.integers(110, 146, (t, h // 2 // 2, w // 2 // 2)), 2, 1), 2, 2)
    tail = np.stack([u, v], axis=1).reshape(t, h // 2, w)
    p = np.concatenate([y, tail], axis=1).astype(np.uint8)
    rec = rgb_to_yuv420(yuv420_to_rgb_host(p))
    assert int(np.abs(rec.astype(int) - p.astype(int)).max()) <= 1


def test_gray_rgb_maps_to_neutral_chroma():
    from crab_tpu.media.video import rgb_to_yuv420, yuv420_to_rgb_host

    rgb = np.full((1, 8, 8, 3), 128, np.uint8)
    p = rgb_to_yuv420(rgb)
    h = 8
    assert np.all(p[:, h:, :] == 128)  # U == V == 128 for gray
    rec = yuv420_to_rgb_host(p)
    assert int(np.abs(rec.astype(int) - 128).max()) <= 2
