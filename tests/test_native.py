"""Native C++ media library tests (compiled on the fly)."""

import os

import numpy as np
import pytest

from crab_tpu.native import binding

REF_WAV = "/root/reference/assets/example/s4/audio.wav"


@pytest.fixture(scope="module")
def native():
    if not binding.available():
        pytest.skip("native toolchain unavailable")
    return binding


def test_native_matches_python_loader(native):
    if not os.path.exists(REF_WAV):
        pytest.skip("asset missing")
    os.environ["CRAB_TPU_NO_NATIVE"] = "1"
    try:
        from crab_tpu.media.audio import load_wav as py_load

        ref = py_load(REF_WAV)
    finally:
        del os.environ["CRAB_TPU_NO_NATIVE"]
    ours = native.load_wav(REF_WAV, 16000)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_native_resample(native, tmp_path):
    import wave

    # synthesize a 44.1 kHz stereo PCM16 tone
    sr_in = 44100
    t = np.arange(sr_in) / sr_in
    tone = (0.5 * np.sin(2 * np.pi * 440 * t) * 32767).astype(np.int16)
    stereo = np.stack([tone, tone], axis=1).reshape(-1)
    p = str(tmp_path / "tone.wav")
    with wave.open(p, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(sr_in)
        w.writeframes(stereo.tobytes())
    y = native.load_wav(p, 16000)
    assert abs(len(y) - 16000) <= 1
    zc = np.sum(np.abs(np.diff(np.signbit(y[200:-200]))))
    assert abs(zc / 2 - 440 * len(y[200:-200]) / 16000) < 8


def test_native_duration_and_missing(native):
    if not os.path.exists(REF_WAV):
        pytest.skip("asset missing")
    y = native.load_wav(REF_WAV, 16000, duration=1.0)
    assert abs(len(y) - 16000) <= 2
    with pytest.raises(FileNotFoundError):
        native.load_wav("/nonexistent.wav", 16000)


REF_MP3 = "/root/reference/assets/example/avqa/00006835.mp3"


def test_mp3_decode_vs_sdl_oracle(native):
    """crab_load_audio must decode real dataset .mp3 (AVVP/AVE/AVQA ship
    mp3 audio — unified_dataset.py:204,247) sample-identically to an
    independent decoder (SDL_mixer via pygame)."""
    if not os.path.exists(REF_MP3):
        pytest.skip("asset missing")
    if not native.has_mp3():
        pytest.skip("system MPEG codec unavailable")
    pygame = pytest.importorskip("pygame")
    # the fixture's native rate is 16 kHz (MPEG-2); decode both sides at
    # native rate so no resampler is in the comparison loop
    ours = native.load_audio(REF_MP3, 16000)
    os.environ.setdefault("SDL_AUDIODRIVER", "dummy")
    pygame.mixer.quit()
    pygame.mixer.init(frequency=16000, channels=2)
    import pygame.sndarray as sa

    ref = sa.array(pygame.mixer.Sound(REF_MP3)).astype(np.float32)
    ref = ref.mean(axis=1) / 32768.0
    assert abs(len(ours) - len(ref)) < 2
    n = min(len(ours), len(ref))
    np.testing.assert_allclose(ours[:n], ref[:n], atol=2e-4)
    # sanity: the clip is non-trivial audio
    assert float(np.sqrt((ours ** 2).mean())) > 0.01


def test_load_audio_wav_equals_load_wav(native):
    if not os.path.exists(REF_WAV):
        pytest.skip("asset missing")
    np.testing.assert_array_equal(
        native.load_audio(REF_WAV, 16000), native.load_wav(REF_WAV, 16000)
    )


def test_load_audio_python_fallback_rejects_mp3(monkeypatch):
    from crab_tpu.media import audio as A

    monkeypatch.setenv("CRAB_TPU_NO_NATIVE", "1")
    monkeypatch.setattr(binding, "_tried", True)
    monkeypatch.setattr(binding, "_lib", None)
    with pytest.raises(ValueError, match="native media plane"):
        A.load_audio("/nonexistent/clip.mp3")
