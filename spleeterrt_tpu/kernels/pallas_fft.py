"""Pallas TPU kernel: fused 4096-point inverse real FFT (+ window).

kernels/fastfft.py showed the matmul FFT formulation ties XLA's FFT when
each stage round-trips HBM (both ~19 ms for the 4-stem iSTFT batch). This
kernel keeps every intermediate of a 64x64 two-stage decomposition in VMEM:
HBM traffic drops to the roofline minimum (read 2049 complex bins, write
4096 real samples per frame) and the stage matmuls run back-to-back on the
MXU.

Formulation (chosen to avoid lane reversals and a final transpose, neither
of which Mosaic lowers well): for a Hermitian spectrum X,

    out[n] = Re( (2/N) * sum_{k=0}^{2048} w_k X_k e^{+2 pi i k n / N} )

with w_0 = w_{2048} = 1/2 (imaginary parts of DC/Nyquist zeroed). Factoring
k = c + 64 d, n = 64 a + b:

    out[64a + b] = Re sum_c E64[c, a] * ( T[c, b] * sum_d Y[d, c] E64[d, b] )

where Y[d, c] = w_k X_k laid out exactly as the (pad to 4096 =) 64x64
reshape of the bin axis, E64[i, j] = exp(+2 pi i i j / 64) and
T[c, b] = exp(+2 pi i c b / 4096). Stage 1 contracts d via dot_general
(no transpose), the twiddle is elementwise, stage 2 contracts c and lands
directly in [a, b] = row-major time order. 4 + 2 real matmuls per stage
pair (output is real-only).

The synthesis window multiply of the iSTFT is fused (pass a registered
window key); `window_key=None` gives a plain irfft. Parity:
tests/test_pallas_fft.py (interpret mode vs jnp.fft.irfft).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 4096
R = 64
FRAMES_PER_BLOCK = 32  # grid-step overhead amortization vs VMEM budget
N_BINS = N // 2 + 1


@functools.cache
def _inv_tables():
    """Packed complex-as-real matmul tables.

    Stage 1 contracts the complex pair in one K=128, N=128 matmul
    ([yt_r | yt_i] @ W1 = [z_r | z_i]); stage 2 takes the real part only
    ([wt_r | wt_i] @ W2). The packing quadruples MXU utilization over
    separate 64x64 matmuls (which run at 25% lane/depth occupancy).
    """
    i = np.arange(R)
    e64 = np.exp(2j * np.pi * np.outer(i, i) / R)  # (i, j), symmetric
    tw = np.exp(2j * np.pi * np.outer(i, i) / N)  # T[c, b]
    er = np.asarray(e64.real, np.float32)
    ei = np.asarray(e64.imag, np.float32)
    w1 = np.block([[er, ei], [-ei, er]])  # (128, 128)
    w2 = np.concatenate([er, -ei], axis=0)  # (128, 64)
    return (
        w1,
        w2,
        np.asarray(tw.real, np.float32),
        np.asarray(tw.imag, np.float32),
    )


def _irfft_kernel(yr_ref, yi_ref, w1_ref, w2_ref, tr_ref, ti_ref, win_ref,
                  out_ref, *, windowed: bool):
    fb = yr_ref.shape[0]
    # Y laid out (FB, 64, 64) = [f, d, c]; bins >= 2049 are zero-padded and
    # the w_k * 2/N scaling was applied host-side.
    y_r = yr_ref[:]
    y_i = yi_ref[:]
    tr = tr_ref[:]
    ti = ti_ref[:]

    # Stage 1: Z[f, c, b] = sum_d Y[f, d, c] E64[d, b]. Contract d by
    # transposing Y to [f, c, d] (VMEM transpose), packing the complex
    # pair on K, then one full-width matmul.
    yt_r = jnp.swapaxes(y_r, 1, 2).reshape(fb * R, R)  # [f*c, d]
    yt_i = jnp.swapaxes(y_i, 1, 2).reshape(fb * R, R)
    x1 = jnp.concatenate([yt_r, yt_i], axis=-1)  # (fb*R, 128)
    z = jnp.dot(x1, w1_ref[:], preferred_element_type=jnp.float32)
    z_r = z[:, :R].reshape(fb, R, R)  # [f, c, b]
    z_i = z[:, R:].reshape(fb, R, R)
    # Twiddle T[c, b].
    w_r = z_r * tr - z_i * ti
    w_i = z_r * ti + z_i * tr
    # Stage 2: out[f, a, b] = Re sum_c E64[c, a] W[f, c, b]. Contract c:
    # transpose W to [f, b, c], pack the pair on K, real-part matmul.
    wt_r = jnp.swapaxes(w_r, 1, 2).reshape(fb * R, R)  # [f*b, c]
    wt_i = jnp.swapaxes(w_i, 1, 2).reshape(fb * R, R)
    x2 = jnp.concatenate([wt_r, wt_i], axis=-1)  # (fb*R, 128)
    o = jnp.dot(x2, w2_ref[:], preferred_element_type=jnp.float32).reshape(
        fb, R, R
    )  # [f, b, a]
    out = jnp.swapaxes(o, 1, 2)  # [f, a, b]; n = 64 a + b flattens outside
    if windowed:
        out = out * win_ref[:].reshape(1, R, R)
    out_ref[:] = out


@functools.partial(jax.jit, static_argnames=("window_key",))
def _irfft_call(s_r, s_i, window_key=None):
    from spleeterrt_tpu.kernels import pallas_fft as me

    window = me._WINDOWS.get(window_key) if window_key else None
    win = jnp.asarray(
        window if window is not None else np.ones(N, np.float32), jnp.float32
    ).reshape(1, R, R)  # [a, b] layout of n = 64 a + b
    batch = s_r.shape[:-1]
    total = int(np.prod(batch))
    fb = FRAMES_PER_BLOCK
    n_pad = -(-total // fb) * fb

    # Host-side prep (fused by XLA into one cheap pass): zero DC/Nyquist
    # imag, apply w_k * 2/N, pad bins to 4096 and reshape to [d, c].
    scale = np.full(N_BINS, 2.0 / N, np.float32)
    scale[0] = scale[-1] = 1.0 / N
    s_r2 = s_r.reshape(total, N_BINS) * scale
    s_i2 = s_i.reshape(total, N_BINS) * scale
    s_i2 = s_i2.at[:, 0].set(0.0).at[:, -1].set(0.0)
    s_r2 = jnp.pad(s_r2, ((0, n_pad - total), (0, N - N_BINS)))
    s_i2 = jnp.pad(s_i2, ((0, n_pad - total), (0, N - N_BINS)))
    y_r = s_r2.reshape(n_pad, R, R)  # k = c + 64 d -> [d, c]
    y_i = s_i2.reshape(n_pad, R, R)
    w1, w2, tr, ti = _inv_tables()

    out = pl.pallas_call(
        functools.partial(_irfft_kernel, windowed=window is not None),
        out_shape=jax.ShapeDtypeStruct((n_pad, R, R), jnp.float32),
        grid=(n_pad // fb,),
        in_specs=[
            pl.BlockSpec((fb, R, R), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((fb, R, R), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * R, 2 * R), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * R, R), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, R), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, R), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, R), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (fb, R, R), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
    )(
        y_r, y_i,
        jnp.asarray(w1), jnp.asarray(w2), jnp.asarray(tr), jnp.asarray(ti),
        win,
    )
    return out.reshape(n_pad, N)[:total].reshape(*batch, N)


# Registry of fusable windows (static keys -> numpy arrays).
_WINDOWS: dict[str, np.ndarray] = {}


def register_window(key: str, window: np.ndarray) -> str:
    _WINDOWS[key] = np.asarray(window, np.float32)
    return key


def irfft4096_pallas(
    spec: jax.Array, window_key: str | None = None
) -> jax.Array:
    """(..., 2049) complex -> (..., 4096) real (x window if key given)."""
    return _irfft_call(
        spec.real.astype(jnp.float32),
        spec.imag.astype(jnp.float32),
        window_key,
    )


# ---------------------------------------------------------------------------
# Mask-fused variant: per-stem soft-mask multiply + out-of-band weight +
# inverse FFT + synthesis window in one VMEM-resident kernel. Replaces the
# apply_mask -> irfft -> window chain of the N-stem iSTFT without
# materializing the per-stem masked complex spectrogram in HBM.
# ---------------------------------------------------------------------------


def _masked_irfft_kernel(
    uw_ref, yr_ref, yi_ref, m_ref, w1_ref, w2_ref, tr_ref, ti_ref, win_ref,
    out_ref, *, windowed: bool, mask_rows: int,
):
    fb = yr_ref.shape[0]
    mask = m_ref[0]  # (fb, mask_rows, 64)
    uw = uw_ref[pl.program_id(0)]  # scalar-prefetched per-stem weight
    fill = jnp.full((fb, R - mask_rows, R), uw, jnp.float32)
    m_full = jnp.concatenate([mask, fill], axis=1)  # (fb, 64, 64) [d, c]
    y_r = yr_ref[:] * m_full
    y_i = yi_ref[:] * m_full
    tr = tr_ref[:]
    ti = ti_ref[:]

    # Packed complex-as-real matmuls (see _inv_tables/_irfft_kernel).
    yt_r = jnp.swapaxes(y_r, 1, 2).reshape(fb * R, R)
    yt_i = jnp.swapaxes(y_i, 1, 2).reshape(fb * R, R)
    x1 = jnp.concatenate([yt_r, yt_i], axis=-1)
    z = jnp.dot(x1, w1_ref[:], preferred_element_type=jnp.float32)
    z_r = z[:, :R].reshape(fb, R, R)
    z_i = z[:, R:].reshape(fb, R, R)
    w_r = z_r * tr - z_i * ti
    w_i = z_r * ti + z_i * tr
    wt_r = jnp.swapaxes(w_r, 1, 2).reshape(fb * R, R)
    wt_i = jnp.swapaxes(w_i, 1, 2).reshape(fb * R, R)
    x2 = jnp.concatenate([wt_r, wt_i], axis=-1)
    o = jnp.dot(x2, w2_ref[:], preferred_element_type=jnp.float32).reshape(
        fb, R, R
    )
    out = jnp.swapaxes(o, 1, 2)  # [f, a, b]
    if windowed:
        out = out * win_ref[:].reshape(1, R, R)
    out_ref[0] = out


@functools.partial(jax.jit, static_argnames=("window_key", "bin_limit"))
def masked_irfft4096_pallas(
    spec: jax.Array,  # (..., n_frames, 2049) complex, shared across stems
    masks: jax.Array,  # (S, ..., n_frames, bin_limit) float32
    out_band: jax.Array,  # (S,) float32
    bin_limit: int,
    window_key: str | None = None,
) -> jax.Array:
    """-> (S, ..., n_frames, 4096) real: irfft(spec * mask_s) * window."""
    if bin_limit % R:
        raise ValueError("bin_limit must be a multiple of 64")
    window = _WINDOWS.get(window_key) if window_key else None
    win = jnp.asarray(
        window if window is not None else np.ones(N, np.float32), jnp.float32
    ).reshape(1, R, R)
    n_stems = masks.shape[0]
    batch = spec.shape[:-1]
    total = int(np.prod(batch))
    fb = FRAMES_PER_BLOCK
    n_pad = -(-total // fb) * fb
    mask_rows = bin_limit // R

    scale = np.full(N_BINS, 2.0 / N, np.float32)
    scale[0] = scale[-1] = 1.0 / N
    s_r = spec.real.astype(jnp.float32).reshape(total, N_BINS) * scale
    s_i = spec.imag.astype(jnp.float32).reshape(total, N_BINS) * scale
    s_i = s_i.at[:, 0].set(0.0).at[:, -1].set(0.0)
    s_r = jnp.pad(s_r, ((0, n_pad - total), (0, N - N_BINS))).reshape(n_pad, R, R)
    s_i = jnp.pad(s_i, ((0, n_pad - total), (0, N - N_BINS))).reshape(n_pad, R, R)

    m = masks.astype(jnp.float32).reshape(n_stems, total, mask_rows, R)
    if n_pad != total:
        m = jnp.pad(m, ((0, 0), (0, n_pad - total), (0, 0), (0, 0)))
    uw = out_band.astype(jnp.float32).reshape(n_stems)
    w1, w2, tr, ti = _inv_tables()

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_stems, n_pad // fb),
        in_specs=[
            pl.BlockSpec((fb, R, R), lambda s, i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((fb, R, R), lambda s, i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, fb, mask_rows, R), lambda s, i, *_: (s, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((2 * R, 2 * R), lambda s, i, *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * R, R), lambda s, i, *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, R), lambda s, i, *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, R), lambda s, i, *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, R), lambda s, i, *_: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, fb, R, R), lambda s, i, *_: (s, i, 0, 0), memory_space=pltpu.VMEM
        ),
    )

    out = pl.pallas_call(
        functools.partial(
            _masked_irfft_kernel,
            windowed=window is not None,
            mask_rows=mask_rows,
        ),
        out_shape=jax.ShapeDtypeStruct((n_stems, n_pad, R, R), jnp.float32),
        grid_spec=grid_spec,
    )(uw, s_r, s_i, m, jnp.asarray(w1), jnp.asarray(w2), jnp.asarray(tr),
      jnp.asarray(ti), win)
    out = out.reshape(n_stems, n_pad, N)[:, :total]
    return out.reshape(n_stems, *batch, N)
