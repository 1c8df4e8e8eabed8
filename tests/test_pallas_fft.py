"""Pallas irfft kernel parity (interpret mode on CPU)."""

import functools

import numpy as np
import pytest
import jax.numpy as jnp
from jax.experimental import pallas as pl

import spleeterrt_tpu.kernels.pallas_fft as pf


@pytest.fixture(autouse=True)
def interpret_pallas(monkeypatch):
    monkeypatch.setattr(
        pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True)
    )
    # new jit traces must not reuse compiled-mode cache entries
    pf._irfft_call.clear_cache()
    yield
    pf._irfft_call.clear_cache()


def test_irfft_matches_numpy(rng):
    spec = (
        rng.standard_normal((3, 5, 2049)) + 1j * rng.standard_normal((3, 5, 2049))
    ).astype(np.complex64)
    got = np.asarray(pf.irfft4096_pallas(jnp.asarray(spec)))
    ref = np.fft.irfft(spec, n=4096).astype(np.float32)
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_irfft_fused_window(rng):
    spec = (
        rng.standard_normal((7, 2049)) + 1j * rng.standard_normal((7, 2049))
    ).astype(np.complex64)
    w = rng.standard_normal(4096).astype(np.float32)
    pf.register_window("_test_w", w)
    got = np.asarray(pf.irfft4096_pallas(jnp.asarray(spec), "_test_w"))
    ref = np.fft.irfft(spec, n=4096).astype(np.float32) * w
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_irfft_ragged_batch(rng):
    """Batch not a multiple of FRAMES_PER_BLOCK pads and crops correctly."""
    spec = (
        rng.standard_normal((pf.FRAMES_PER_BLOCK + 3, 2049))
        + 1j * rng.standard_normal((pf.FRAMES_PER_BLOCK + 3, 2049))
    ).astype(np.complex64)
    got = np.asarray(pf.irfft4096_pallas(jnp.asarray(spec)))
    ref = np.fft.irfft(spec, n=4096).astype(np.float32)
    np.testing.assert_allclose(got, ref, atol=1e-6)
