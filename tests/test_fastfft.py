"""MXU matmul-FFT parity vs jnp.fft."""

import numpy as np
import jax.numpy as jnp

from spleeterrt_tpu.kernels import fastfft


def test_rfft_matches_numpy(rng):
    x = rng.standard_normal((2, 7, 4096)).astype(np.float32)
    ref = np.fft.rfft(x).astype(np.complex64)
    got = np.asarray(fastfft.rfft4096(jnp.asarray(x)))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-4)


def test_irfft_matches_numpy(rng):
    spec = (
        rng.standard_normal((3, 5, 2049)) + 1j * rng.standard_normal((3, 5, 2049))
    ).astype(np.complex64)
    ref = np.fft.irfft(spec, n=4096).astype(np.float32)
    got = np.asarray(fastfft.irfft4096(jnp.asarray(spec)))
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_round_trip(rng):
    x = rng.standard_normal((4, 4096)).astype(np.float32)
    rt = np.asarray(fastfft.irfft4096(fastfft.rfft4096(jnp.asarray(x))))
    np.testing.assert_allclose(rt, x, atol=5e-6)


def test_non_4096_falls_back(rng):
    x = rng.standard_normal((2, 1024)).astype(np.float32)
    got = np.asarray(fastfft.rfft4096(jnp.asarray(x)))
    np.testing.assert_allclose(
        got, np.fft.rfft(x).astype(np.complex64), atol=1e-4
    )


def test_parseval(rng):
    x = rng.standard_normal(4096).astype(np.float32)
    spec = np.asarray(fastfft.rfft4096(jnp.asarray(x)))
    e_time = np.sum(x.astype(np.float64) ** 2)
    mags = np.abs(spec.astype(np.complex128)) ** 2
    e_freq = (2 * np.sum(mags[1:-1]) + mags[0] + mags[-1]) / 4096
    np.testing.assert_allclose(e_freq, e_time, rtol=1e-5)
