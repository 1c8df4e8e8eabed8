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


def test_masked_irfft_matches_reference_chain(rng):
    """Fused mask+irfft+window == apply-mask -> irfft -> window."""
    import jax.numpy as jnp

    s, frames, bl = 3, 7, 512
    spec = (
        rng.standard_normal((2, frames, 2049))
        + 1j * rng.standard_normal((2, frames, 2049))
    ).astype(np.complex64)
    masks = rng.uniform(0, 1, (s, 2, frames, bl)).astype(np.float32)
    uw = np.asarray([0.25, 0.0, 0.1], np.float32)
    w = rng.standard_normal(4096).astype(np.float32)
    pf.register_window("_test_mw", w)

    got = np.asarray(
        pf.masked_irfft4096_pallas(
            jnp.asarray(spec), jnp.asarray(masks), jnp.asarray(uw), bl,
            "_test_mw",
        )
    )
    assert got.shape == (s, 2, frames, 4096)
    for i in range(s):
        m_full = np.concatenate(
            [masks[i], np.full((2, frames, 2049 - bl), uw[i], np.float32)],
            axis=-1,
        )
        ref = np.fft.irfft(spec * m_full, n=4096).astype(np.float32) * w
        np.testing.assert_allclose(got[i], ref, atol=1e-5)


def test_separate_nstem_fast_path_matches(rng, monkeypatch):
    """The fused-Pallas 4-stem graph == the plain path (forced on CPU)."""
    import jax.numpy as jnp

    from spleeterrt_tpu.config import SeparatorConfig
    from spleeterrt_tpu.core import separate, transform, weights

    cfg = SeparatorConfig(
        bin_limit=512, time_step=64, num_stems=4, compute_dtype=jnp.float32
    )
    stacked = weights.stack_params(
        [weights.blob_to_params(weights.random_blob(rng, 0.02)) for _ in range(4)]
    )
    audio = jnp.asarray(rng.standard_normal((2, 3 * 4096)), jnp.float32) * 0.3
    padded = transform.pad_offline(audio, cfg.transform)

    ref = np.asarray(separate.separate_4stem(stacked, padded, cfg))

    monkeypatch.setenv("SPLEETERRT_MXU_FFT", "1")
    separate.separate_nstem.clear_cache()
    transform.stft.clear_cache()
    try:
        got = np.asarray(separate.separate_4stem(stacked, padded, cfg))
    finally:
        monkeypatch.delenv("SPLEETERRT_MXU_FFT")
        separate.separate_nstem.clear_cache()
        transform.stft.clear_cache()
    np.testing.assert_allclose(got, ref, atol=2e-4)
