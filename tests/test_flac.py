"""FLAC codec: encoder/decoder round trips and subframe-type coverage."""

import numpy as np
import pytest

from spleeterrt_tpu.io import flac


def _round_trip(x, bps=16, block_size=1024):
    data = flac.encode_flac(x, 44100, bps=bps, block_size=block_size)
    got, rate = flac.decode_flac(data)
    assert rate == 44100
    return got


def test_round_trip_stereo_tone(rng):
    t = np.arange(8000) / 44100.0
    x = np.stack(
        [0.5 * np.sin(2 * np.pi * 440 * t), 0.3 * np.sin(2 * np.pi * 880 * t)]
    ).astype(np.float32)
    got = _round_trip(x)
    assert got.shape == x.shape
    np.testing.assert_allclose(got, x, atol=1.0 / 32768.0)


def test_round_trip_noise_exact_pcm(rng):
    """Lossless: the decoded integer PCM equals the encoded integer PCM."""
    x = np.clip(rng.standard_normal((2, 5000)) * 0.4, -0.99, 0.99).astype(
        np.float32
    )
    pcm = np.round(x * 32768).astype(np.int64)
    data = flac.encode_flac(x, 44100)
    got, _ = flac.decode_flac(data)
    got_pcm = np.round(got * 32768).astype(np.int64)
    np.testing.assert_array_equal(got_pcm, np.clip(pcm, -32768, 32767))


def test_round_trip_constant_and_silence():
    x = np.zeros((1, 3000), np.float32)
    x[:, 1000:2000] = 0.25
    got = _round_trip(x, block_size=512)
    np.testing.assert_allclose(got, x, atol=1.0 / 32768.0)


def test_round_trip_24bit(rng):
    x = np.clip(rng.standard_normal((2, 4000)) * 0.3, -0.99, 0.99).astype(
        np.float32
    )
    got = _round_trip(x, bps=24)
    np.testing.assert_allclose(got, x, atol=2.0 / (1 << 23))


def test_round_trip_many_frames(rng):
    x = (rng.standard_normal((1, 10 * 256)) * 0.2).astype(np.float32)
    got = _round_trip(x, block_size=256)  # 10 frames, multi-byte frame nums ok
    assert got.shape == x.shape


def test_rejects_garbage():
    with pytest.raises(ValueError):
        flac.decode_flac(b"not a flac stream at all")


def test_lpc_subframe_decode(rng):
    """Hand-build an LPC frame; decoder must invert the integer predictor."""
    # Build a one-frame stream with an LPC subframe via the writer primitives.
    import struct

    n = 256
    order = 2
    coeffs = [3, -1]
    shift = 1
    bps = 16
    rng_x = (rng.standard_normal(n) * 2000).astype(np.int64)
    # Compute residual the encoder would write.
    res = []
    for i in range(order, n):
        pred = (coeffs[0] * rng_x[i - 1] + coeffs[1] * rng_x[i - 2]) >> shift
        res.append(int(rng_x[i] - pred))

    bw = flac.BitWriter()
    bw.write(0x3FFE, 14)
    bw.write(0, 1)
    bw.write(0, 1)
    bw.write(7, 4)  # 16-bit block size follows
    bw.write(9, 4)  # 44.1k
    bw.write(0, 4)  # 1 channel
    bw.write(4, 3)  # 16 bps
    bw.write(0, 1)
    bw.write(0, 8)  # frame 0
    bw.write(n - 1, 16)
    hdr = bw.tobytes()
    bw2 = flac.BitWriter()
    for b in hdr:
        bw2.write(b, 8)
    bw2.write(flac._crc8(hdr), 8)
    # LPC subframe: type 100000 | (order-1)
    bw2.write(0, 1)
    bw2.write(0x20 | (order - 1), 6)
    bw2.write(0, 1)
    for v in rng_x[:order]:
        bw2.write_signed(int(v), bps)
    bw2.write(15 - 1, 4)  # precision 15
    bw2.write_signed(shift, 5)
    for c in coeffs:
        bw2.write_signed(c, 15)
    flac._write_residual(bw2, np.asarray(res))
    bw2.align_byte()
    body = bw2.tobytes()
    stream = bytearray(b"fLaC")
    si = bytearray()
    si += struct.pack(">HH", n, n)
    si += b"\x00\x00\x00" * 2
    packed = (44100 << 44) | (0 << 41) | ((bps - 1) << 36) | n
    si += packed.to_bytes(8, "big")
    si += b"\x00" * 16
    stream += bytes([0x80]) + len(si).to_bytes(3, "big") + bytes(si)
    stream += body + struct.pack(">H", flac._crc16(body))

    got, rate = flac.decode_flac(bytes(stream))
    got_pcm = np.round(got[0] * 32768).astype(np.int64)
    np.testing.assert_array_equal(got_pcm, rng_x)


def test_load_audio_flac(tmp_path, rng):
    from spleeterrt_tpu.io import audio

    x = np.clip(rng.standard_normal((2, 3000)) * 0.3, -0.99, 0.99).astype(
        np.float32
    )
    path = tmp_path / "a.flac"
    path.write_bytes(flac.encode_flac(x, 22050))
    got = audio.load_audio(path)
    assert got.sample_rate == 22050
    np.testing.assert_allclose(got.samples, x, atol=1.0 / 32768.0)


def test_python_and_native_decoders_agree(rng):
    """Both decoder implementations on the same streams, incl. LPC frames."""
    x = np.clip(rng.standard_normal((2, 6000)) * 0.4, -0.99, 0.99).astype(
        np.float32
    )
    data = flac.encode_flac(x, 44100, block_size=512)
    py, rate_py = flac.decode_flac(data, prefer_native=False)
    from spleeterrt_tpu import native

    if native.get_lib() is None:
        pytest.skip("native toolchain unavailable")
    nat, rate_nat = native.decode_flac_native(data)
    assert rate_py == rate_nat
    np.testing.assert_array_equal(py, nat)
