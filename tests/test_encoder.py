"""Fused encoder-front (enc1-enc3) Pallas kernel parity.

Interpret mode on CPU, against the canonical XLA formulation of the same
layers (core/model.py: _conv_same + bias -> skip, BN -> activation).
"""

import functools

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

import spleeterrt_tpu.kernels.encoder as enc
from spleeterrt_tpu.core import model


@pytest.fixture(autouse=True)
def interpret_pallas(monkeypatch):
    monkeypatch.setattr(
        pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True)
    )
    enc.encoder3_pallas.clear_cache()
    model.unet_forward.clear_cache()
    yield
    enc.encoder3_pallas.clear_cache()
    model.unet_forward.clear_cache()


def _rand_enc_params(rng, scale=0.2):
    chans = ((2, 16), (16, 32), (32, 64))
    params = {}
    for i, (cin, cout) in enumerate(chans, start=1):
        params[f"down{i}"] = {
            "w": rng.standard_normal((5, 5, cin, cout)).astype(np.float32) * scale,
            "b": rng.standard_normal((cout,)).astype(np.float32) * 0.1,
            "bn_scale": (1 + 0.3 * rng.standard_normal((cout,))).astype(np.float32),
            "bn_shift": rng.standard_normal((cout,)).astype(np.float32) * 0.2,
        }
    return jax.tree.map(jnp.asarray, params)


def _canonical3(params, mag, act):
    x = mag
    skips = []
    for i in (1, 2, 3):
        ly = params[f"down{i}"]
        conv = model._conv_same(x, ly["w"]) + ly["b"]
        skips.append(conv)
        z = ly["bn_scale"] * conv + ly["bn_shift"]
        x = model._elu(z) if act == "elu" else jnp.where(z >= 0, z, 0.2 * z)
    return skips + [x]


def _stack(params, s):
    return jax.tree.map(lambda a: jnp.stack([a * (i + 1) for i in range(s)]), params)


@pytest.mark.parametrize("act", ["elu", "leaky"])
def test_encoder3_matches_canonical(rng, act):
    params = _rand_enc_params(rng)
    mag = jnp.asarray(
        np.abs(rng.standard_normal((2, 16, 64, 2))).astype(np.float32)
    )
    stacked = jax.tree.map(lambda a: a[None], params)
    got = enc.encoder3_pallas(stacked, mag, act=act, compute_dtype=jnp.float32)
    ref = _canonical3(params, mag, act)
    for g, r in zip(got, ref):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), atol=3e-5, rtol=1e-4)


def test_encoder3_freq_chunks(rng, monkeypatch):
    """nq beyond the chunk caps exercises the frequency grid + DMA windows."""
    monkeypatch.setattr(enc, "MAX_QUAD_ROWS", 4 * 8)  # t_in=8 -> nqc cap 4
    monkeypatch.setattr(enc, "MAX_QUAD_ROWS_ENC1", 2 * 8)  # t2=8 -> cap 2
    enc.encoder3_pallas.clear_cache()
    params = _rand_enc_params(rng)
    mag = jnp.asarray(
        np.abs(rng.standard_normal((1, 16, 256, 2))).astype(np.float32)
    )
    stacked = jax.tree.map(lambda a: a[None], params)
    got = enc.encoder3_pallas(stacked, mag, act="elu", compute_dtype=jnp.float32)
    ref = _canonical3(params, mag, "elu")
    for g, r in zip(got, ref):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), atol=3e-5, rtol=1e-4)


def test_encoder3_folded_stems(rng):
    """Stems folded into the batch grid select per-stem weights; the
    magnitude is shared (indexed b % batch_per_stem)."""
    s, b = 3, 2
    params = _rand_enc_params(rng)
    stacked = _stack(params, s)
    mag = jnp.asarray(
        np.abs(rng.standard_normal((b, 16, 64, 2))).astype(np.float32)
    )
    got = enc.encoder3_pallas(stacked, mag, act="elu", compute_dtype=jnp.float32)
    for i in range(s):
        p_i = jax.tree.map(lambda a: a[i], stacked)
        ref = _canonical3(p_i, mag, "elu")
        for g, r in zip(got, ref):
            # x(i+1) scaled stem weights compound over three layers; the
            # matmul-vs-conv accumulation order leaves ~1e-3 relative noise.
            np.testing.assert_allclose(
                np.asarray(g[i * b : (i + 1) * b]), np.asarray(r),
                atol=2e-3, rtol=2e-3,
            )


def test_unet_forward_pallas_encoder_exact(rng):
    """Full forward with the Pallas encoder == canonical path (fp32)."""
    params = model.init_params(jax.random.PRNGKey(3))
    mag = jnp.asarray(
        np.abs(rng.standard_normal((2, 64, 128, 2))).astype(np.float32)
    )
    try:
        model.FORCE_PALLAS_ENCODER = False
        model.unet_forward.clear_cache()
        ref = np.asarray(model.unet_forward(params, mag, compute_dtype=jnp.float32))
        model.FORCE_PALLAS_ENCODER = True
        model.unet_forward.clear_cache()
        got = np.asarray(model.unet_forward(params, mag, compute_dtype=jnp.float32))
    finally:
        model.FORCE_PALLAS_ENCODER = None
        model.unet_forward.clear_cache()
    np.testing.assert_allclose(got, ref, atol=3e-5, rtol=1e-4)


def test_multi_stem_forward_pallas_encoder_exact(rng):
    """multi_stem_forward with the folded-stem encoder == canonical (fp32)."""
    params3 = [model.init_params(jax.random.PRNGKey(i)) for i in range(3)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *params3)
    mag = jnp.asarray(
        np.abs(rng.standard_normal((2, 64, 128, 2))).astype(np.float32)
    )
    try:
        model.FORCE_PALLAS_ENCODER = False
        model.unet_forward.clear_cache()
        ref = np.asarray(
            model.multi_stem_forward(stacked, mag, compute_dtype=jnp.float32)
        )
        model.FORCE_PALLAS_ENCODER = True
        model.unet_forward.clear_cache()
        got = np.asarray(
            model.multi_stem_forward(stacked, mag, compute_dtype=jnp.float32)
        )
    finally:
        model.FORCE_PALLAS_ENCODER = None
        model.unet_forward.clear_cache()
    np.testing.assert_allclose(got, ref, atol=3e-5, rtol=1e-4)


def _rand_enc_params4(rng, scale=0.2):
    chans = ((2, 16), (16, 32), (32, 64), (64, 128))
    params = {}
    for i, (cin, cout) in enumerate(chans, start=1):
        params[f"down{i}"] = {
            "w": rng.standard_normal((5, 5, cin, cout)).astype(np.float32) * scale,
            "b": rng.standard_normal((cout,)).astype(np.float32) * 0.1,
            "bn_scale": (1 + 0.3 * rng.standard_normal((cout,))).astype(np.float32),
            "bn_shift": rng.standard_normal((cout,)).astype(np.float32) * 0.2,
        }
    return jax.tree.map(jnp.asarray, params)


def _canonical_n(params, mag, act, n):
    x = mag
    skips = []
    for i in range(1, n + 1):
        ly = params[f"down{i}"]
        conv = model._conv_same(x, ly["w"]) + ly["b"]
        skips.append(conv)
        z = ly["bn_scale"] * conv + ly["bn_shift"]
        x = model._elu(z) if act == "elu" else jnp.where(z >= 0, z, 0.2 * z)
    return skips, x


@pytest.mark.parametrize("act", ["elu", "leaky"])
def test_encoder_packed4_matches_canonical(rng, act):
    """4-layer packed chain (enc4 = Cin 64 instance of the s2 kernel)."""
    params = _rand_enc_params4(rng)
    mag = jnp.asarray(
        np.abs(rng.standard_normal((2, 32, 64, 2))).astype(np.float32)
    )
    stacked = jax.tree.map(lambda a: a[None], params)
    enc.encoder_packed.clear_cache()
    skips_pk, act4_pk = enc.encoder_packed(
        stacked, mag, n_layers=4, act=act, compute_dtype=jnp.float32
    )
    ref_skips, ref_act = _canonical_n(params, mag, act, 4)
    for i, (g_pk, r) in enumerate(zip(skips_pk, ref_skips), start=1):
        g = enc.quad_unpack(g_pk, 16 * 2 ** (i - 1))
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), atol=1e-4, rtol=2e-4
        )
    got_act = enc.quad_unpack(act4_pk, 128)
    np.testing.assert_allclose(
        np.asarray(got_act), np.asarray(ref_act), atol=1e-4, rtol=2e-4
    )


def test_encoder_packed4_folded_stems(rng):
    s, b = 2, 2
    params = _rand_enc_params4(rng)
    stacked = _stack(params, s)
    mag = jnp.asarray(
        np.abs(rng.standard_normal((b, 32, 64, 2))).astype(np.float32)
    )
    enc.encoder_packed.clear_cache()
    skips_pk, act4_pk = enc.encoder_packed(
        stacked, mag, n_layers=4, act="elu", compute_dtype=jnp.float32
    )
    got_act = enc.quad_unpack(act4_pk, 128)
    for i in range(s):
        p_i = jax.tree.map(lambda a: a[i], stacked)
        _, ref_act = _canonical_n(p_i, mag, "elu", 4)
        np.testing.assert_allclose(
            np.asarray(got_act[i * b : (i + 1) * b]), np.asarray(ref_act),
            atol=2e-3, rtol=2e-3,
        )
