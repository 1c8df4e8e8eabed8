"""Fused STFT / masked-iSTFT kernel parity (kernels/stft_fused.py).

Interpret-mode kernel parity against the canonical transform formulation,
plus full-pipeline equivalence with the fused path force-enabled on CPU
(compiled pallas_call; same pattern as the SPLEETERRT_MXU_FFT test).
"""

import functools

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from spleeterrt_tpu.config import SeparatorConfig
from spleeterrt_tpu.core import model, separate, transform, weights
from spleeterrt_tpu.kernels import stft_fused

CFG = SeparatorConfig(
    bin_limit=512, time_step=64, num_stems=4, compute_dtype=jnp.float32
)


@pytest.fixture
def interpret_pallas(monkeypatch):
    monkeypatch.setattr(
        pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True)
    )
    stft_fused.stft4096_packed.clear_cache()
    stft_fused.masked_istft4096_cd.clear_cache()
    yield
    stft_fused.stft4096_packed.clear_cache()
    stft_fused.masked_istft4096_cd.clear_cache()


def _packed_setup(rng, n=90000):
    tcfg = CFG.transform
    audio = jnp.asarray(rng.standard_normal((2, n)) * 0.3, jnp.float32)
    padded = transform.pad_offline(audio, tcfg)
    ds = padded.shape[-1]
    n_out = transform.num_output_frames(ds, tcfg)
    n_comp = transform.num_computed_frames(ds, tcfg)
    nt = separate.num_tiles(n_out, CFG.time_step)
    n_req = nt * CFG.time_step
    spec_ref = jax.jit(lambda p: transform.stft(p, tcfg, ds))(padded)
    return padded, ds, n_out, n_comp, n_req, spec_ref


def test_stft_packed_matches_canonical(rng, interpret_pallas):
    padded, ds, n_out, n_comp, n_req, spec_ref = _packed_setup(rng)
    win = transform.analysis_window(CFG.transform.fft_size)
    s_r, s_i = stft_fused.stft4096_packed(padded, win, n_comp, n_req)
    assert s_r.shape[1] % stft_fused.FB == 0 and s_r.shape[1] >= n_req
    got = np.asarray(stft_fused.packed_to_complex(s_r, s_i))
    ref = np.asarray(spec_ref)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(got[:, :n_out], ref, atol=2e-6 * scale)
    # Tile-padding frames beyond the computed range are exactly zero.
    assert np.all(got[:, n_comp:] == 0)

    mag = np.asarray(stft_fused.packed_magnitude(s_r, s_i, CFG.bin_limit))
    np.testing.assert_allclose(
        mag[:, :n_out], np.abs(ref)[..., : CFG.bin_limit], atol=2e-6 * scale
    )


def test_masked_istft_packed_matches_canonical(rng, interpret_pallas):
    padded, ds, n_out, n_comp, n_req, spec_ref = _packed_setup(rng)
    tcfg = CFG.transform
    win = transform.analysis_window(tcfg.fft_size)
    s_r, s_i = stft_fused.stft4096_packed(padded, win, n_comp, n_req)

    n_stems = 3
    masks = jnp.asarray(
        rng.uniform(0.0, 1.0, (n_stems, 2, n_req, CFG.bin_limit)), jnp.float32
    )
    uw = jnp.asarray([0.25, 0.0, 0.1])
    got = stft_fused.masked_istft4096_packed(
        s_r, s_i, masks, uw, CFG.bin_limit,
        transform.synthesis_window(tcfg), n_out,
    )

    def one(mask, w):
        in_band = spec_ref[..., : CFG.bin_limit] * mask[:, :n_out]
        oob = spec_ref[..., CFG.bin_limit :] * w
        return transform.istft(
            jnp.concatenate([in_band, oob], axis=-1), tcfg
        )

    ref = np.asarray(jax.vmap(one)(masks, uw))
    assert got.shape == ref.shape  # (S, 2, n_out*hop + fft - hop)
    np.testing.assert_allclose(
        np.asarray(got), ref, atol=3e-7 * max(1.0, np.abs(ref).max())
    )


def test_masked_istft_flat_masks_match_cd(rng, interpret_pallas):
    """The flat d-major mask layout (tail.unpack_mask_dc_flat ->
    masked_istft4096_cd's 4-D contract, un-flattened per block in VMEM)
    is bit-identical to the 5-D [c, d] layout."""
    padded, ds, n_out, n_comp, n_req, _ = _packed_setup(rng, n=70000)
    tcfg = CFG.transform
    s_r, s_i = stft_fused.stft4096_packed(
        padded, transform.analysis_window(tcfg.fft_size), n_comp, n_req
    )
    n_pad = s_r.shape[1]
    d = CFG.bin_limit // 64
    masks_cd = jnp.asarray(
        rng.uniform(0.0, 1.0, (2, 2, n_pad, 64, d)), jnp.float32
    )
    # flat index = 64*d + c  <=>  transpose the (c, d) minor pair.
    masks_flat = jnp.swapaxes(masks_cd, -1, -2).reshape(2, 2, n_pad, d * 64)
    uw = jnp.asarray([0.25, 0.1])
    win = transform.synthesis_window(tcfg)
    ref = stft_fused.masked_istft4096_cd(
        s_r, s_i, masks_cd, uw, CFG.bin_limit, win, n_out
    )
    got = stft_fused.masked_istft4096_cd(
        s_r, s_i, masks_flat, uw, CFG.bin_limit, win, n_out
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_unpack_mask_dc_flat_consistent(rng):
    """unpack_mask_dc_flat == unpack_mask_cd up to the documented minor
    reordering (flat = 64*d + c)."""
    from spleeterrt_tpu.kernels import tail

    s, nt, t2, f2 = 2, 3, 8, 64
    g = f2 // 16
    out = jnp.asarray(
        rng.standard_normal((s * nt, g, t2, 128)), jnp.float32
    )
    cd = np.asarray(tail.unpack_mask_cd(out, s, t2, f2))
    flat = np.asarray(tail.unpack_mask_dc_flat(out, s, t2, f2))
    d = g // 2
    np.testing.assert_array_equal(
        flat.reshape(s, 2, nt * 2 * t2, d, 64).transpose(0, 1, 2, 4, 3), cd
    )


def test_mask_of_ones_roundtrip(rng, interpret_pallas):
    """Unity-gain invariant: mask of ones + out_band 1.0 reproduces the
    input (the reference's scale-chain contract, Executable/stftFix.c)."""
    padded, ds, n_out, n_comp, n_req, _ = _packed_setup(rng, n=70000)
    tcfg = CFG.transform
    s_r, s_i = stft_fused.stft4096_packed(
        padded, transform.analysis_window(tcfg.fft_size), n_comp, n_req
    )
    ones = jnp.ones((1, 2, n_req, CFG.bin_limit), jnp.float32)
    out = np.asarray(
        stft_fused.masked_istft4096_packed(
            s_r, s_i, ones, jnp.asarray([1.0]), CFG.bin_limit,
            transform.synthesis_window(tcfg), n_out,
        )
    )[0]
    x = np.asarray(padded)
    # Valid interior (first/last fft_size samples lack full overlap).
    n = tcfg.fft_size
    np.testing.assert_allclose(
        out[:, n : ds - n], x[:, n : ds - n], atol=5e-6
    )


def test_separate_4stem_fused_equals_canonical(rng, monkeypatch, interpret_pallas):
    """Force the fused path on CPU (interpret-mode pallas_call) and compare
    the full 4-stem graph against the canonical formulation."""
    stacked = weights.stack_params(
        [model.init_params(jax.random.PRNGKey(i)) for i in range(4)]
    )
    audio = jnp.asarray(rng.standard_normal((2, 3 * 4096)), jnp.float32) * 0.3
    padded = transform.pad_offline(audio, CFG.transform)

    ref = np.asarray(separate.separate_4stem(stacked, padded, CFG))

    monkeypatch.setenv("SPLEETERRT_FUSED_STFT", "1")
    separate.separate_nstem.clear_cache()
    try:
        got = np.asarray(separate.separate_4stem(stacked, padded, CFG))
    finally:
        monkeypatch.delenv("SPLEETERRT_FUSED_STFT")
        separate.separate_nstem.clear_cache()
    np.testing.assert_allclose(got, ref, atol=2e-4)


def test_separate_2stem_batch_fused_equals_per_track(rng, monkeypatch, interpret_pallas):
    """The batched single-net 2-stem graph's fused path (track batch folded
    into the kernel row axis, STEM_MODE_2 activations) vs the per-track
    canonical formulation (Executable/main.c:773,779-808)."""
    cfg = SeparatorConfig(
        bin_limit=512, time_step=64, num_stems=2, compute_dtype=jnp.float32
    )
    params = model.init_params(jax.random.PRNGKey(5))
    tracks = jnp.asarray(
        rng.standard_normal((3, 2, 2 * 4096)), jnp.float32
    ) * 0.3
    padded = jax.vmap(
        lambda a: transform.pad_offline(a, cfg.transform)
    )(tracks)

    ref = np.stack(
        [np.asarray(separate.separate_2stem(params, p, cfg)) for p in padded]
    )

    monkeypatch.setenv("SPLEETERRT_FUSED_STFT", "1")
    separate.separate_2stem_batch.clear_cache()
    try:
        got = np.asarray(separate.separate_2stem_batch(params, padded, cfg))
    finally:
        monkeypatch.delenv("SPLEETERRT_FUSED_STFT")
        separate.separate_2stem_batch.clear_cache()
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-4)


def test_separate_3stem_fused_equals_canonical(rng, monkeypatch, interpret_pallas):
    """The fused 3-stem graph (one STFT, one 3-stem masked-iSTFT with
    composed masks on the original spectrum) vs the canonical two-pass
    formulation (three full iSTFTs, Executable/main.c:845-970)."""
    cfg = SeparatorConfig(
        bin_limit=512, time_step=64, num_stems=3, compute_dtype=jnp.float32
    )
    params4 = model.init_params(jax.random.PRNGKey(1))
    params2 = model.init_params(jax.random.PRNGKey(2))
    audio = jnp.asarray(rng.standard_normal((2, 3 * 4096)), jnp.float32) * 0.3
    padded = transform.pad_offline(audio, cfg.transform)

    ref = np.asarray(separate.separate_3stem(params4, params2, padded, cfg))

    monkeypatch.setenv("SPLEETERRT_FUSED_STFT", "1")
    separate.separate_3stem.clear_cache()
    try:
        got = np.asarray(separate.separate_3stem(params4, params2, padded, cfg))
    finally:
        monkeypatch.delenv("SPLEETERRT_FUSED_STFT")
        separate.separate_3stem.clear_cache()
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-4)
    # 3-stem conservation: drums + vocals + accompaniment reconstruct the
    # unaffected-weight-blended input exactly as the canonical graph does.
    np.testing.assert_allclose(got[1] + got[2], ref[1] + ref[2], atol=2e-4)


def test_separate_3stem_batch_fused_equals_per_track(rng, monkeypatch, interpret_pallas):
    """The batched fused 3-stem graph (track batch folded into the kernel
    row axis, two mask passes + one 3-stem masked iSTFT) vs the per-track
    canonical two-pass formulation."""
    cfg = SeparatorConfig(
        bin_limit=512, time_step=64, num_stems=3, compute_dtype=jnp.float32
    )
    params4 = model.init_params(jax.random.PRNGKey(6))
    params2 = model.init_params(jax.random.PRNGKey(7))
    tracks = jnp.asarray(
        rng.standard_normal((3, 2, 2 * 4096)), jnp.float32
    ) * 0.3
    padded = jax.vmap(lambda a: transform.pad_offline(a, cfg.transform))(tracks)

    ref = np.stack(
        [np.asarray(separate.separate_3stem(params4, params2, p, cfg))
         for p in padded]
    )

    monkeypatch.setenv("SPLEETERRT_FUSED_STFT", "1")
    separate.separate_3stem_batch.clear_cache()
    try:
        got = np.asarray(
            separate.separate_3stem_batch(params4, params2, padded, cfg)
        )
    finally:
        monkeypatch.delenv("SPLEETERRT_FUSED_STFT")
        separate.separate_3stem_batch.clear_cache()
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-4)


def test_separate_2stem_fused_equals_canonical(rng, monkeypatch, interpret_pallas):
    cfg = SeparatorConfig(
        bin_limit=512, time_step=64, num_stems=2, compute_dtype=jnp.float32
    )
    params = model.init_params(jax.random.PRNGKey(3))
    audio = jnp.asarray(rng.standard_normal((2, 2 * 4096)), jnp.float32) * 0.3
    padded = transform.pad_offline(audio, cfg.transform)

    ref = np.asarray(separate.separate_2stem(params, padded, cfg))

    monkeypatch.setenv("SPLEETERRT_FUSED_STFT", "1")
    separate.separate_2stem.clear_cache()
    try:
        got = np.asarray(separate.separate_2stem(params, padded, cfg))
    finally:
        monkeypatch.delenv("SPLEETERRT_FUSED_STFT")
        separate.separate_2stem.clear_cache()
    np.testing.assert_allclose(got, ref, atol=2e-4)
    # 2-stem conservation survives the fused path: stems sum to the input.
    ds = padded.shape[-1]
    np.testing.assert_allclose(
        (got[0] + got[1])[:, :ds], np.asarray(padded), atol=1e-5
    )
    assert np.all(np.abs((got[0] + got[1])[:, ds:]) < 1e-5)
