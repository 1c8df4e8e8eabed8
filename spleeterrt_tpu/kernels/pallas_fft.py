"""Pallas TPU kernel: fused 4096-point inverse real FFT (+ window).

kernels/fastfft.py showed the matmul FFT formulation ties XLA's FFT when
each stage round-trips HBM (both ~19 ms for the 4-stem iSTFT batch). This
kernel keeps every intermediate of the 64x64 six-step decomposition in VMEM:
HBM traffic drops to the roofline minimum (read 2049 complex bins, write
4096 real samples per frame) and the stage matmuls run back-to-back on the
MXU.

Grid: one program per block of FRAMES_PER_BLOCK frames. Inputs are separate
re/im planes (Pallas has no complex dtype); DFT/twiddle tables ride along as
small VMEM operands. The synthesis window multiply of the iSTFT is fused in
(pass `window=None` for a plain irfft).

Parity: tests/test_pallas_fft.py checks bit-level agreement with
kernels/fastfft.py (same arithmetic, same order) and jnp.fft.irfft
tolerance on CPU interpret mode; the TPU path is exercised by the
transform-level dispatch tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spleeterrt_tpu.kernels.fastfft import N, R, _tables

FRAMES_PER_BLOCK = 16


def _irfft_kernel(re_ref, im_ref, wr_ref, wi_ref, tr_ref, ti_ref, win_ref,
                  out_ref, *, windowed: bool):
    fb = re_ref.shape[0]
    s_r = re_ref[:]  # (FB, 2049)
    s_i = im_ref[:]
    # Hermitian expansion with conjugation folded in (inverse = conj path):
    # x = conj(full spectrum): x_r = [s_r, rev(s_r[1:2048])],
    # x_i = [-s_i, rev(s_i[1:2048])] with Im(DC)=Im(Nyq)=0.
    mid_r = jnp.flip(s_r[:, 1:2048], axis=1)
    mid_i = jnp.flip(s_i[:, 1:2048], axis=1)
    first_i = -s_i
    # zero the DC and Nyquist imaginary parts (jnp.fft.irfft semantics)
    col = jax.lax.broadcasted_iota(jnp.int32, (fb, 2049), 1)
    first_i = jnp.where((col == 0) | (col == 2048), 0.0, first_i)
    x_r = jnp.concatenate([s_r, mid_r], axis=1)  # (FB, 4096)
    x_i = jnp.concatenate([first_i, mid_i], axis=1)

    wr = wr_ref[:]
    wi = wi_ref[:]
    tr = tr_ref[:]
    ti = ti_ref[:]

    # [f, a, b] -> [f, b, a] -> 2D GEMMs over the trailing dim.
    def stage(x2_r, x2_i, post_twiddle):
        # x2: (FB, 64, 64) indexed [*, b, a]; contract a with W64.
        m_r = x2_r.reshape(fb * R, R)
        m_i = x2_i.reshape(fb * R, R)
        y_r = (
            jnp.dot(m_r, wr, preferred_element_type=jnp.float32)
            - jnp.dot(m_i, wi, preferred_element_type=jnp.float32)
        ).reshape(fb, R, R)
        y_i = (
            jnp.dot(m_r, wi, preferred_element_type=jnp.float32)
            + jnp.dot(m_i, wr, preferred_element_type=jnp.float32)
        ).reshape(fb, R, R)
        if post_twiddle:
            z_r = y_r * tr - y_i * ti
            z_i = y_r * ti + y_i * tr
            return z_r, z_i
        return y_r, y_i

    xa_r = x_r.reshape(fb, R, R)  # [f, a, b]
    xa_i = x_i.reshape(fb, R, R)
    xt_r = jnp.swapaxes(xa_r, 1, 2)  # [f, b, a]
    xt_i = jnp.swapaxes(xa_i, 1, 2)
    z_r, z_i = stage(xt_r, xt_i, post_twiddle=True)  # [f, b, c] * T[b, c]
    z_r = jnp.swapaxes(z_r, 1, 2)  # [f, c, b]
    z_i = jnp.swapaxes(z_i, 1, 2)
    # Last stage: real part only. Re(Z W) = Zr Wr - Zi Wi.
    m_r = z_r.reshape(fb * R, R)
    m_i = z_i.reshape(fb * R, R)
    o_r = (
        jnp.dot(m_r, wr, preferred_element_type=jnp.float32)
        - jnp.dot(m_i, wi, preferred_element_type=jnp.float32)
    ).reshape(fb, R, R)
    # k = c + 64 d: layout [d, c]
    out = jnp.swapaxes(o_r, 1, 2).reshape(fb, N) * (1.0 / N)
    if windowed:
        out = out * win_ref[:].reshape(1, N)
    out_ref[:] = out


@functools.partial(jax.jit, static_argnames=("window_key",))
def _irfft_call(s_r, s_i, window_key=None):
    from spleeterrt_tpu.kernels import pallas_fft as me

    window = me._WINDOWS.get(window_key) if window_key else None
    win = jnp.asarray(
        window if window is not None else np.ones(N, np.float32), jnp.float32
    ).reshape(1, N)
    batch = s_r.shape[:-1]
    total = int(np.prod(batch))
    fb = FRAMES_PER_BLOCK
    n_pad = -(-total // fb) * fb
    s_r2 = s_r.reshape(total, 2049)
    s_i2 = s_i.reshape(total, 2049)
    if n_pad != total:
        s_r2 = jnp.pad(s_r2, ((0, n_pad - total), (0, 0)))
        s_i2 = jnp.pad(s_i2, ((0, n_pad - total), (0, 0)))
    wr, wi, tr, ti = _tables()

    out = pl.pallas_call(
        functools.partial(_irfft_kernel, windowed=window is not None),
        out_shape=jax.ShapeDtypeStruct((n_pad, N), jnp.float32),
        grid=(n_pad // fb,),
        in_specs=[
            pl.BlockSpec((fb, 2049), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((fb, 2049), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, R), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, R), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, R), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, R), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((fb, N), lambda i: (i, 0), memory_space=pltpu.VMEM),
    )(
        s_r2, s_i2,
        jnp.asarray(wr), jnp.asarray(wi), jnp.asarray(tr), jnp.asarray(ti),
        win,
    )
    return out[:total].reshape(*batch, N)


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
