"""Fused decoder-tail (up6+up7+sigmoid) Pallas kernel parity.

Interpret mode on CPU, against the canonical XLA formulation of the same
layers (core/model.py: _tconv_same -> act-before-BN epilogue ->
_conv_dilated_final -> sigmoid).
"""

import functools

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

import spleeterrt_tpu.kernels.mask_head as mh
from spleeterrt_tpu.core import model


@pytest.fixture(autouse=True)
def interpret_pallas(monkeypatch):
    monkeypatch.setattr(
        pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True)
    )
    mh.mask_head_pallas.clear_cache()
    yield
    mh.mask_head_pallas.clear_cache()


def _canonical_head(x, w6, b6, bns, bnh, w7, b7, act):
    y = model._tconv_same(x, w6) + b6
    y = model._elu(y) if act == "elu" else jnp.maximum(y, 0.0)
    y = bns * y + bnh
    logits = model._conv_dilated_final(y, w7) + b7
    mask = jax.nn.sigmoid(logits)  # (B, T, F, 2) NHWC
    return mask.transpose(0, 3, 1, 2)  # channel-first like the kernel


def _rand_head_params(rng):
    w6 = rng.standard_normal((5, 5, 32, 1)).astype(np.float32) * 0.2
    b6 = rng.standard_normal((1,)).astype(np.float32)
    bns = rng.standard_normal((1,)).astype(np.float32)
    bnh = rng.standard_normal((1,)).astype(np.float32)
    w7 = rng.standard_normal((4, 4, 1, 2)).astype(np.float32) * 0.5
    b7 = rng.standard_normal((2,)).astype(np.float32)
    return w6, b6, bns, bnh, w7, b7


def _call_single(x, ps, act="elu"):
    stacked = [jnp.asarray(p)[None] for p in ps]
    return mh.mask_head_pallas(jnp.asarray(x), *stacked, act=act, n_stems=1)


@pytest.mark.parametrize("act", ["elu", "relu"])
def test_head_matches_canonical(rng, act):
    ps = _rand_head_params(rng)
    x = rng.standard_normal((2, 32, 64, 32)).astype(np.float32) * 0.5
    got = np.asarray(_call_single(x, ps, act))
    ref = np.asarray(_canonical_head(jnp.asarray(x), *map(jnp.asarray, ps), act))
    np.testing.assert_allclose(got, ref, atol=2e-6, rtol=1e-5)


def test_head_multi_tile_rows(rng):
    """T2 spanning several TT tiles exercises the halo row logic."""
    ps = _rand_head_params(rng)
    x = rng.standard_normal((1, 3 * mh.TT, 32, 32)).astype(np.float32) * 0.5
    got = np.asarray(_call_single(x, ps))
    ref = np.asarray(_canonical_head(jnp.asarray(x), *map(jnp.asarray, ps), "elu"))
    np.testing.assert_allclose(got, ref, atol=2e-6, rtol=1e-5)


def test_head_multi_freq_chunks(rng, monkeypatch):
    """nq > MAX_NQC exercises the frequency-chunk grid axis + quad halos."""
    monkeypatch.setattr(mh, "MAX_NQC", 8)  # 16 quads -> 2 chunks
    mh.mask_head_pallas.clear_cache()
    ps = _rand_head_params(rng)
    x = rng.standard_normal((1, mh.TT, 64, 32)).astype(np.float32) * 0.5
    got = np.asarray(_call_single(x, ps))
    ref = np.asarray(_canonical_head(jnp.asarray(x), *map(jnp.asarray, ps), "elu"))
    np.testing.assert_allclose(got, ref, atol=2e-6, rtol=1e-5)


def test_head_folded_stems(rng):
    """Stems folded into the batch axis select per-stem weights."""
    s, b = 3, 2
    x = rng.standard_normal((s * b, mh.TT, 32, 32)).astype(np.float32) * 0.5
    ps = [np.stack([p * (i + 1) for i in range(s)]) for p in _rand_head_params(rng)]
    got = np.asarray(
        mh.mask_head_pallas(
            jnp.asarray(x), *map(jnp.asarray, ps), act="elu", n_stems=s
        )
    )
    refs = []
    for i in range(s):
        refs.append(
            _canonical_head(
                jnp.asarray(x[i * b : (i + 1) * b]),
                *[jnp.asarray(p[i]) for p in ps],
                "elu",
            )
        )
    ref = np.concatenate([np.asarray(r) for r in refs], axis=0)
    np.testing.assert_allclose(got, ref, atol=3e-5, rtol=1e-4)


def test_unet_forward_pallas_head_exact(rng):
    """Full forward with the Pallas head == canonical path (fp32)."""
    params = model.init_params(jax.random.PRNGKey(3))
    mag = jnp.asarray(
        np.abs(rng.standard_normal((2, 64, 128, 2))).astype(np.float32)
    )
    try:
        model.FORCE_PALLAS_HEAD = False
        model.unet_forward.clear_cache()
        ref = np.asarray(model.unet_forward(params, mag, compute_dtype=jnp.float32))
        model.FORCE_PALLAS_HEAD = True
        model.unet_forward.clear_cache()
        got = np.asarray(model.unet_forward(params, mag, compute_dtype=jnp.float32))
    finally:
        model.FORCE_PALLAS_HEAD = None
        model.unet_forward.clear_cache()
    np.testing.assert_allclose(got, ref, atol=3e-5, rtol=1e-4)


def test_multi_stem_forward_pallas_head_exact(rng):
    """multi_stem_forward's folded-stem head == vmapped canonical (fp32)."""
    params3 = [model.init_params(jax.random.PRNGKey(i)) for i in range(3)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *params3)
    mag = jnp.asarray(
        np.abs(rng.standard_normal((2, 64, 128, 2))).astype(np.float32)
    )
    try:
        model.FORCE_PALLAS_HEAD = False
        model.unet_forward.clear_cache()
        ref = np.asarray(
            model.multi_stem_forward(stacked, mag, compute_dtype=jnp.float32)
        )
        model.FORCE_PALLAS_HEAD = True
        model.unet_forward.clear_cache()
        got = np.asarray(
            model.multi_stem_forward(stacked, mag, compute_dtype=jnp.float32)
        )
    finally:
        model.FORCE_PALLAS_HEAD = None
        model.unet_forward.clear_cache()
    np.testing.assert_allclose(got, ref, atol=3e-5, rtol=1e-4)
