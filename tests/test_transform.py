"""STFT/iSTFT parity vs the Hartley-convention oracle + round-trip tests."""

import numpy as np
import pytest

import jax.numpy as jnp

from spleeterrt_tpu.config import TransformConfig
from spleeterrt_tpu.core import transform
from tests.oracle import reference_oracle as oracle

CFG = TransformConfig()


def test_frame_counts():
    # ceil(data_size / hop) rows; computed frames = rangeM/hop + 1.
    for n_pcm in (4096, 10000, 44100, 44101):
        readcount = -(-n_pcm // CFG.fft_size)
        final = CFG.fft_size * readcount + 2 * CFG.fft_size
        assert transform.num_output_frames(final, CFG) == final // CFG.hop
        n_comp = transform.num_computed_frames(final, CFG)
        assert n_comp <= transform.num_output_frames(final, CFG)


def test_stft_matches_oracle(rng):
    n_pcm = 3 * 4096 + 123
    x = rng.standard_normal(n_pcm).astype(np.float32)
    padded = np.zeros(4096 * 4 + 8192, dtype=np.float32)
    padded[4096 : 4096 + n_pcm] = x
    data_size = padded.size

    spec = np.asarray(transform.stft(jnp.asarray(padded), CFG, data_size))
    re_o, im_o = oracle.stft_planes(padded.astype(np.float64), data_size)

    # Oracle planes are (2*ReX_c, -2*ImX_c) with X_c = spec * 2/(N*LAP):
    # re = spec.real * 4/(N*LAP) * N ... net: re_o = spec.real * (4/LAP)/1,
    # derived identity: hypot(re_o, im_o) * N == |spec|.
    mag_o = np.hypot(re_o, im_o) * oracle.FFTSIZE
    mag_o[:, 0] = np.abs(re_o[:, 0]) * oracle.FFTSIZE
    np.testing.assert_allclose(np.abs(spec), mag_o, atol=2e-2, rtol=2e-5)

    # Componentwise: re_o = spec.real / N, im_o = -spec.imag / N (LAP=4).
    np.testing.assert_allclose(
        spec.real / oracle.FFTSIZE, re_o, atol=1e-6, rtol=1e-5
    )
    np.testing.assert_allclose(
        -spec.imag / oracle.FFTSIZE, im_o, atol=1e-6, rtol=1e-5
    )


def test_istft_matches_oracle(rng):
    n_frames = 8
    re = rng.standard_normal((n_frames, oracle.HALFWNDLEN))
    im = rng.standard_normal((n_frames, oracle.HALFWNDLEN))
    im[:, 0] = 0.0
    im[:, -1] = 0.0

    out_o = oracle.istft_planes(re, im)

    # Framework convention: spec = (re - 1j*im) * N (see test above).
    spec = (re - 1j * im) * oracle.FFTSIZE
    out = np.asarray(transform.istft(jnp.asarray(spec, jnp.complex64), CFG))
    np.testing.assert_allclose(out, out_o, atol=1e-3, rtol=1e-4)


def test_round_trip_unity_gain(rng):
    """istft(stft(x)) == x in the fully-overlapped interior region."""
    n_pcm = 44100
    x = rng.standard_normal(n_pcm).astype(np.float32) * 0.5
    padded = np.asarray(transform.pad_offline(jnp.asarray(x), CFG))
    data_size = padded.size
    spec = transform.stft(jnp.asarray(padded), CFG, data_size)
    out = np.asarray(transform.istft(spec, CFG))
    # The driver extracts [preshift : preshift + n_pcm] (main.c:806-808).
    np.testing.assert_allclose(
        out[4096 : 4096 + n_pcm], x, atol=5e-6, rtol=1e-5
    )


def test_batched_shapes(rng):
    x = rng.standard_normal((2, 20000)).astype(np.float32)
    padded = np.asarray(transform.pad_offline(jnp.asarray(x), CFG))
    spec = transform.stft(jnp.asarray(padded), CFG, padded.shape[-1])
    assert spec.shape == (2, padded.shape[-1] // CFG.hop, CFG.num_bins)
    out = transform.istft(spec, CFG)
    assert out.shape == (2, spec.shape[1] * CFG.hop + CFG.fft_size - CFG.hop)
