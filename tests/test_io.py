"""WAV codec round trips and resampler quality."""

import numpy as np
import pytest

from spleeterrt_tpu.io import audio, resample


def test_wav_float32_round_trip(tmp_path, rng):
    x = (rng.standard_normal((2, 5000)) * 0.4).astype(np.float32)
    path = tmp_path / "t.wav"
    audio.write_wav(path, x, 44100, fmt="float32")
    got = audio.read_wav(path)
    assert got.sample_rate == 44100
    np.testing.assert_array_equal(got.samples, x)


def test_wav_pcm16_round_trip(tmp_path, rng):
    x = np.clip(rng.standard_normal((1, 3000)) * 0.3, -0.9, 0.9).astype(np.float32)
    path = tmp_path / "t16.wav"
    audio.write_wav(path, x, 22050, fmt="pcm16")
    got = audio.read_wav(path)
    assert got.sample_rate == 22050
    np.testing.assert_allclose(got.samples, x, atol=1.0 / 32768.0)


def test_wav_pcm24_decode(tmp_path, rng):
    import struct

    n = 1000
    vals = (rng.standard_normal(n) * 0.3 * 8388608.0).astype(np.int32)
    vals = np.clip(vals, -8388608, 8388607)
    payload = b"".join(struct.pack("<i", v)[:3] for v in vals)
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI", b"RIFF", 36 + len(payload), b"WAVE", b"fmt ",
        16, 1, 1, 48000, 48000 * 3, 3, 24, b"data", len(payload),
    )
    path = tmp_path / "t24.wav"
    path.write_bytes(hdr + payload)
    got = audio.read_wav(path)
    np.testing.assert_allclose(
        got.samples[0], vals / 8388608.0, atol=1e-7
    )


def test_resample_identity(rng):
    x = rng.standard_normal((2, 1000)).astype(np.float32)
    np.testing.assert_array_equal(resample.resample(x, 44100, 44100), x)


@pytest.mark.parametrize("sr_in,sr_out", [(48000, 44100), (22050, 44100), (44100, 48000)])
def test_resample_sine_fidelity(sr_in, sr_out):
    """A 1 kHz tone must survive resampling with tiny amplitude/phase error."""
    dur = 1.0
    t_in = np.arange(int(sr_in * dur)) / sr_in
    x = np.sin(2 * np.pi * 1000.0 * t_in).astype(np.float32)
    y = resample.resample(x, sr_in, sr_out)
    assert y.shape[-1] == int(np.ceil(x.size * sr_out / sr_in))
    t_out = np.arange(y.size) / sr_out
    ref = np.sin(2 * np.pi * 1000.0 * t_out)
    # ignore filter edges
    delay = 2048
    err = y[delay:-delay] - ref[delay:-delay]
    snr = 10 * np.log10(np.mean(ref**2) / np.mean(err**2))
    assert snr > 80.0, f"SNR {snr:.1f} dB"


def test_resample_rejects_alias():
    """Content above the target Nyquist must be strongly attenuated."""
    sr_in, sr_out = 48000, 16000
    t = np.arange(sr_in) / sr_in
    x = np.sin(2 * np.pi * 10000.0 * t).astype(np.float32)  # > 8 kHz Nyquist
    y = resample.resample(x, sr_in, sr_out)
    assert np.sqrt(np.mean(y[1000:-1000] ** 2)) < 1e-3


def test_load_audio_wav(tmp_path, rng):
    x = (rng.standard_normal((2, 2000)) * 0.2).astype(np.float32)
    path = tmp_path / "a.wav"
    audio.write_wav(path, x, 44100)
    got = audio.load_audio(path)
    np.testing.assert_array_equal(got.samples, x)
