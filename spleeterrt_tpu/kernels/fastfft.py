"""MXU-native 4096-point real FFTs as 64x64 matmul pipelines.

XLA's generic TPU FFT lowering is far from speed-of-light for this
pipeline's shapes (tens of thousands of 4096-point transforms per track).
4096 = 64 * 64 factors the DFT into two stages of 64x64 matrix multiplies --
exactly the MXU tile -- with one twiddle multiply in between (the classic
four/six-step algorithm):

    n = 64a + b, k = c + 64d
    X[c + 64d] = sum_b [ (sum_a x[64a + b] W64[a, c]) * T[b, c] ] W64[b, d]

with W64[a, c] = exp(-2 pi i a c / 64) and T[b, c] = exp(-2 pi i b c / 4096).

Real-input forward and Hermitian-input inverse specializations keep only
the needed real matmuls (2 + 4 fp32 GEMMs forward, 4 + 2 inverse). Used by
the transform layer in place of jnp.fft.rfft/irfft when the frame length is
4096 (the reference's only FFT size, Executable/stftFix.h:14); any other
size falls back to jnp.fft.

Numerics: fp32 matmuls; max abs error vs jnp.fft ~1e-3 on +-1 frames
(relative ~1e-6 of the spectral magnitude scale), well inside the fp32
Hartley rounding of the reference itself. Precision pinned with
jax.lax.Precision.HIGHEST so the MXU does not drop to bf16 passes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

N = 4096
R = 64  # radix: N = R * R
PRECISION = jax.lax.Precision.HIGHEST


@functools.cache
def _tables():
    # NumPy constants (not jnp): safe to cache across jit traces.
    a = np.arange(R)
    w64 = np.exp(-2j * np.pi * np.outer(a, a) / R)  # (a, c)
    b = np.arange(R)
    c = np.arange(R)
    tw = np.exp(-2j * np.pi * np.outer(b, c) / N)  # (b, c)
    return (
        np.asarray(w64.real, np.float32),
        np.asarray(w64.imag, np.float32),
        np.asarray(tw.real, np.float32),
        np.asarray(tw.imag, np.float32),
    )


def _mm(x, w):
    return jnp.dot(x, w, precision=PRECISION)


def rfft4096(x: jax.Array) -> jax.Array:
    """(..., 4096) real -> (..., 2049) complex64, == jnp.fft.rfft(x)."""
    if x.shape[-1] != N:
        return jnp.fft.rfft(x, axis=-1)
    wr, wi, tr, ti = _tables()
    batch = x.shape[:-1]
    xa = x.astype(jnp.float32).reshape(*batch, R, R)  # [a, b]
    # Stage 1 over a: Y[b, c] = sum_a x[a, b] W64[a, c]  (real input)
    xt = jnp.swapaxes(xa, -1, -2)  # [b, a]
    y_r = _mm(xt, wr)  # [b, c]
    y_i = _mm(xt, wi)
    # Twiddle T[b, c]
    z_r = y_r * tr - y_i * ti
    z_i = y_r * ti + y_i * tr
    # Stage 2 over b: X[c, d] = sum_b Z[b, c] W64[b, d]
    z_r = jnp.swapaxes(z_r, -1, -2)  # [c, b]
    z_i = jnp.swapaxes(z_i, -1, -2)
    o_r = _mm(z_r, wr) - _mm(z_i, wi)  # [c, d]
    o_i = _mm(z_r, wi) + _mm(z_i, wr)
    # k = c + 64 d -> flat layout [d, c]
    o_r = jnp.swapaxes(o_r, -1, -2).reshape(*batch, N)
    o_i = jnp.swapaxes(o_i, -1, -2).reshape(*batch, N)
    out = jax.lax.complex(o_r, o_i)
    return out[..., : N // 2 + 1]


def irfft4096(spec: jax.Array) -> jax.Array:
    """(..., 2049) complex -> (..., 4096) real, == jnp.fft.irfft(spec, 4096).

    Reconstructs the Hermitian spectrum, runs the inverse matmul pipeline,
    and keeps only the real output (2 GEMMs in the last stage). Matches
    jnp.fft.irfft semantics: imaginary parts of DC/Nyquist are ignored.
    """
    if spec.shape[-1] != N // 2 + 1:
        return jnp.fft.irfft(spec, n=spec.shape[-1] * 2 - 2, axis=-1)
    wr, wi, tr, ti = _tables()
    batch = spec.shape[:-1]
    s_r = spec.real.astype(jnp.float32)
    s_i = spec.imag.astype(jnp.float32)
    # jnp.irfft ignores Im(DC), Im(Nyquist); enforce for exact agreement.
    s_i = s_i.at[..., 0].set(0.0).at[..., -1].set(0.0)
    # Full Hermitian spectrum: X[N - k] = conj(X[k]).
    x_r = jnp.concatenate([s_r, s_r[..., -2:0:-1]], axis=-1)
    x_i = jnp.concatenate([s_i, -s_i[..., -2:0:-1]], axis=-1)
    # Inverse DFT = (1/N) * conj(DFT(conj(x))): run the forward pipeline on
    # the conjugate and conjugate the (real) result -- only Re is needed.
    x_i = -x_i
    xa_r = x_r.reshape(*batch, R, R)
    xa_i = x_i.reshape(*batch, R, R)
    xt_r = jnp.swapaxes(xa_r, -1, -2)  # [b, a]
    xt_i = jnp.swapaxes(xa_i, -1, -2)
    y_r = _mm(xt_r, wr) - _mm(xt_i, wi)
    y_i = _mm(xt_r, wi) + _mm(xt_i, wr)
    z_r = y_r * tr - y_i * ti
    z_i = y_r * ti + y_i * tr
    z_r = jnp.swapaxes(z_r, -1, -2)
    z_i = jnp.swapaxes(z_i, -1, -2)
    # Real part only: Re(Z W) = Zr Wr - Zi Wi.
    o_r = _mm(z_r, wr) - _mm(z_i, wi)  # [c, d]
    out = jnp.swapaxes(o_r, -1, -2).reshape(*batch, N)
    return out * (1.0 / N)
