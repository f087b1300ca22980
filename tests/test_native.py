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
