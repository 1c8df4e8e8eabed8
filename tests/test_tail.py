"""Packed decoder-tail kernel parity (kernels/tail.py).

Interpret mode on CPU, against the canonical XLA formulation of up4/up5
(subpixel transposed conv + decoder epilogue) and the head (up6 + up7 +
sigmoid), with the decoder concat realized as the kernels' split-K pairs.
"""

import functools

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from spleeterrt_tpu.core import model
from spleeterrt_tpu.kernels import tail
from spleeterrt_tpu.kernels.encoder import quad_unpack


@pytest.fixture(autouse=True)
def interpret_pallas(monkeypatch):
    monkeypatch.setattr(
        pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True)
    )
    yield


def _rand_up_layer(rng, cin, cout, scale=0.2):
    return {
        "w": jnp.asarray(rng.standard_normal((5, 5, cin, cout)) * scale, jnp.float32),
        "b": jnp.asarray(rng.standard_normal((cout,)) * 0.1, jnp.float32),
        "bn_scale": jnp.asarray(1 + 0.3 * rng.standard_normal((cout,)), jnp.float32),
        "bn_shift": jnp.asarray(rng.standard_normal((cout,)) * 0.2, jnp.float32),
    }


def _canonical_up(ly, skip, prev, act):
    x = jnp.concatenate([skip, prev], axis=-1)
    y = model._tconv_same(x, ly["w"]) + ly["b"]
    a = model._elu(y) if act == "elu" else jnp.maximum(y, 0.0)
    return ly["bn_scale"] * a + ly["bn_shift"]


@pytest.mark.parametrize("cin_src,t_in,f_in", [(64, 8, 8), (32, 16, 16)])
def test_up_shallow_matches_canonical(rng, cin_src, t_in, f_in):
    """up4 (PK64 sources) / up5 (PK32 sources) vs the canonical layer."""
    cout = cin_src // 2
    ly = _rand_up_layer(rng, 2 * cin_src, cout)
    skip = jnp.asarray(
        rng.standard_normal((2, t_in, f_in, cin_src)), jnp.float32
    )
    prev = jnp.asarray(
        rng.standard_normal((2, t_in, f_in, cin_src)), jnp.float32
    )
    ref = _canonical_up(ly, skip, prev, "elu")

    w_skip = tail._pack_w_up(ly["w"][:, :, :cin_src, :], cin_src, jnp.float32)
    w_prev = tail._pack_w_up(ly["w"][:, :, cin_src:, :], cin_src, jnp.float32)
    epi = tail._up_epilogue(ly["b"], ly["bn_scale"], ly["bn_shift"])
    got_pk = tail.up_shallow(
        tail.pad_pk(tail.quad_pack_nhwc(skip, cin_src)),
        tail.pad_pk(tail.quad_pack_nhwc(prev, cin_src)),
        tuple(w[None] for w in w_skip), tuple(w[None] for w in w_prev),
        epi[None],
        t_in=t_in, act="elu", out_dtype=jnp.float32,
    )
    got = quad_unpack(got_pk, cout)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4, rtol=2e-4)


def test_up_shallow_per_stem_weights(rng):
    cin_src, t_in, f_in = 32, 8, 16
    cout = cin_src // 2
    lys = [_rand_up_layer(rng, 2 * cin_src, cout) for _ in range(2)]
    skip = jnp.asarray(rng.standard_normal((2, t_in, f_in, cin_src)), jnp.float32)
    prev = jnp.asarray(rng.standard_normal((2, t_in, f_in, cin_src)), jnp.float32)
    w_skip = tuple(
        jnp.stack(ws)
        for ws in zip(*[
            tail._pack_w_up(ly["w"][:, :, :cin_src, :], cin_src, jnp.float32)
            for ly in lys
        ])
    )
    w_prev = tuple(
        jnp.stack(ws)
        for ws in zip(*[
            tail._pack_w_up(ly["w"][:, :, cin_src:, :], cin_src, jnp.float32)
            for ly in lys
        ])
    )
    epi = jnp.stack(
        [tail._up_epilogue(ly["b"], ly["bn_scale"], ly["bn_shift"]) for ly in lys]
    )
    spk = tail.pad_pk(tail.quad_pack_nhwc(jnp.concatenate([skip, skip]), cin_src))
    ppk = tail.pad_pk(tail.quad_pack_nhwc(jnp.concatenate([prev, prev]), cin_src))
    got = quad_unpack(
        tail.up_shallow(spk, ppk, w_skip, w_prev, epi, t_in=t_in, act="relu",
                        out_dtype=jnp.float32),
        cout,
    )
    for s, ly in enumerate(lys):
        ref = _canonical_up(ly, skip, prev, "relu")
        np.testing.assert_allclose(
            np.asarray(got[2 * s : 2 * s + 2]), np.asarray(ref),
            atol=1e-4, rtol=2e-4,
        )


def test_head_packed_matches_canonical(rng):
    """Split-source head vs model._canonical_head on concat(skip1, up5out)."""
    t2, f2 = 64, 128
    params = {
        "up6": _rand_up_layer(rng, 32, 1),
        "up7": {
            "w": jnp.asarray(rng.standard_normal((4, 4, 1, 2)) * 0.3, jnp.float32),
            "b": jnp.asarray(rng.standard_normal((2,)) * 0.1, jnp.float32),
        },
    }
    skip1 = jnp.asarray(rng.standard_normal((2, t2, f2, 16)), jnp.float32)
    up5o = jnp.asarray(rng.standard_normal((2, t2, f2, 16)), jnp.float32)
    x = jnp.concatenate([skip1, up5o], axis=-1)
    ref = model._canonical_head(params, x, 1, jnp.float32, "exact")

    got_packed = tail.head_packed(
        tail.pad_pk_head(tail.quad_pack_nhwc(skip1, 16)),
        tail.pad_pk_head(tail.quad_pack_nhwc(up5o, 16)),
        params["up6"]["w"][None], params["up6"]["b"][None],
        params["up6"]["bn_scale"][None], params["up6"]["bn_shift"][None],
        params["up7"]["w"][None], params["up7"]["b"][None],
        t2=t2, act="elu", compute_dtype=jnp.float32,
    )
    got = tail.unpack_mask(got_packed, t2, f2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_head_packed_freq_chunks(rng, monkeypatch):
    """Multiple frequency chunks exercise the Element windows + qm masks."""
    monkeypatch.setattr(tail.mask_head, "MAX_NQC", 16)  # PK16 nqc cap 8
    t2, f2 = 32, 192
    params = {
        "up6": _rand_up_layer(rng, 32, 1),
        "up7": {
            "w": jnp.asarray(rng.standard_normal((4, 4, 1, 2)) * 0.3, jnp.float32),
            "b": jnp.asarray(rng.standard_normal((2,)) * 0.1, jnp.float32),
        },
    }
    skip1 = jnp.asarray(rng.standard_normal((1, t2, f2, 16)), jnp.float32)
    up5o = jnp.asarray(rng.standard_normal((1, t2, f2, 16)), jnp.float32)
    x = jnp.concatenate([skip1, up5o], axis=-1)
    ref = model._canonical_head(params, x, 0, jnp.float32, "exact")
    got = tail.unpack_mask(
        tail.head_packed(
            tail.pad_pk_head(tail.quad_pack_nhwc(skip1, 16)),
            tail.pad_pk_head(tail.quad_pack_nhwc(up5o, 16)),
            params["up6"]["w"][None], params["up6"]["b"][None],
            params["up6"]["bn_scale"][None], params["up6"]["bn_shift"][None],
            params["up7"]["w"][None], params["up7"]["b"][None],
            t2=t2, act="relu", compute_dtype=jnp.float32,
        ),
        t2, f2,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_packed_unet_matches_canonical(rng):
    """Full packed trunk (Pallas enc1-4 + XLA mid + Pallas tail) ==
    canonical multi_stem_forward (fp32)."""
    params2 = [model.init_params(jax.random.PRNGKey(i)) for i in range(2)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *params2)
    mag = jnp.asarray(
        np.abs(rng.standard_normal((2, 64, 128, 2))).astype(np.float32)
    )
    try:
        model.FORCE_PACKED_UNET = False
        model.FORCE_PALLAS_ENCODER = False
        model.FORCE_PALLAS_HEAD = False
        model.unet_forward.clear_cache()
        ref = np.asarray(
            model.multi_stem_forward(stacked, mag, compute_dtype=jnp.float32)
        )
        model.FORCE_PACKED_UNET = True
        model.FORCE_PALLAS_ENCODER = None
        model.FORCE_PALLAS_HEAD = None
        model.unet_forward.clear_cache()
        got = np.asarray(
            model.multi_stem_forward(stacked, mag, compute_dtype=jnp.float32)
        )
    finally:
        model.FORCE_PACKED_UNET = None
        model.FORCE_PALLAS_ENCODER = None
        model.FORCE_PALLAS_HEAD = None
        model.unet_forward.clear_cache()
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=2e-4)


def test_packed_unet_single_net(rng):
    params = model.init_params(jax.random.PRNGKey(7))
    mag = jnp.asarray(
        np.abs(rng.standard_normal((1, 64, 64, 2))).astype(np.float32)
    )
    try:
        model.FORCE_PACKED_UNET = False
        model.FORCE_PALLAS_ENCODER = False
        model.FORCE_PALLAS_HEAD = False
        model.unet_forward.clear_cache()
        ref = np.asarray(model.unet_forward(params, mag, compute_dtype=jnp.float32))
        model.FORCE_PACKED_UNET = True
        model.unet_forward.clear_cache()
        got = np.asarray(model.unet_forward(params, mag, compute_dtype=jnp.float32))
    finally:
        model.FORCE_PACKED_UNET = None
        model.FORCE_PALLAS_ENCODER = None
        model.FORCE_PALLAS_HEAD = None
        model.unet_forward.clear_cache()
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=2e-4)


def test_fused_separation_with_packed_unet_cd_masks(rng):
    """End-to-end fused graph with the packed U-Net's [c, d] mask path ==
    the canonical separation (fp32, interpret)."""
    import os
    from unittest import mock

    from spleeterrt_tpu.config import SeparatorConfig
    from spleeterrt_tpu.core import separate, transform

    cfg = SeparatorConfig(
        bin_limit=512, time_step=64, num_stems=4, compute_dtype=jnp.float32
    )
    params2 = [model.init_params(jax.random.PRNGKey(i)) for i in range(2)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *params2)
    audio = jnp.asarray(rng.standard_normal((2, 3 * 4096)) * 0.3, jnp.float32)
    padded = transform.pad_offline(audio, cfg.transform)
    ob = (0.25, 0.0)

    try:
        model.FORCE_PACKED_UNET = False
        separate.separate_nstem.clear_cache()
        ref = np.asarray(
            separate.separate_nstem(stacked, padded, cfg, ob, pallas=False)
        )
        model.FORCE_PACKED_UNET = True
        separate.separate_nstem.clear_cache()
        with mock.patch.dict(os.environ, {"SPLEETERRT_FUSED_STFT": "1"}):
            got = np.asarray(
                separate.separate_nstem(stacked, padded, cfg, ob)
            )
    finally:
        model.FORCE_PACKED_UNET = None
        separate.separate_nstem.clear_cache()
    np.testing.assert_allclose(got, ref, atol=5e-4)


def test_batched_separation_with_packed_unet_cd_masks(rng):
    """separate_nstem_batch's [c, d] mask interleave == per-track canonical.

    Regression: the batch path hard-coded 32 mask lanes while
    unpack_mask_cd emits the COMPACT bin_limit//64 lanes (r04 bench_batch
    crash); here bin_limit=512 -> 8 lanes exercises the interleave reshape.
    """
    import os
    from unittest import mock

    from spleeterrt_tpu.config import SeparatorConfig
    from spleeterrt_tpu.core import separate, transform

    cfg = SeparatorConfig(
        bin_limit=512, time_step=64, num_stems=4, compute_dtype=jnp.float32
    )
    params2 = [model.init_params(jax.random.PRNGKey(i)) for i in range(2)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *params2)
    tracks = jnp.asarray(rng.standard_normal((2, 2, 3 * 4096)) * 0.3, jnp.float32)
    padded = jnp.stack(
        [transform.pad_offline(t, cfg.transform) for t in tracks]
    )
    ob = (0.25, 0.0)

    try:
        model.FORCE_PACKED_UNET = False
        separate.separate_nstem.clear_cache()
        separate.separate_nstem_batch.clear_cache()
        ref = np.stack(
            [
                np.asarray(
                    separate.separate_nstem(stacked, p, cfg, ob, pallas=False)
                )
                for p in padded
            ]
        )
        model.FORCE_PACKED_UNET = True
        separate.separate_nstem_batch.clear_cache()
        with mock.patch.dict(os.environ, {"SPLEETERRT_FUSED_STFT": "1"}):
            got = np.asarray(
                separate.separate_nstem_batch(stacked, padded, cfg, ob)
            )
    finally:
        model.FORCE_PACKED_UNET = None
        separate.separate_nstem.clear_cache()
        separate.separate_nstem_batch.clear_cache()
    np.testing.assert_allclose(got, ref, atol=5e-4)
