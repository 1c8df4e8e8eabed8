"""Pallas TPU kernels: fused forward STFT and fused masked iSTFT-to-audio.

Round-3 profiling (docs/PERF.md) put the transform side of the offline
pipeline at ~74 ms of the 209 ms 300-second 4-stem separation -- ~2.5x its
HBM roofline -- because (a) the forward path materializes the 75%-redundant
frame matrix in HBM (framing + window + per-stage matmul round trips), (b)
the masked inverse kernel (kernels/pallas_fft.py) re-reads the full complex
spectrogram once PER STEM and pays a host-side scale/pad prep pass, and (c)
overlap-add re-reads the 1.7 GB frame tensor the inverse kernel wrote.

These two kernels reduce the chain to its roofline:

- `stft4096_packed`: audio is DMA'd once per 32-frame block (the
  4096-sample window overlap is served from VMEM), windowed, and
  transformed by the 64x64 matmul FFT (kernels/fastfft.py formulation,
  fp32 MXU matmuls), writing the spectrum directly in the [d, c] packed
  layout (bin k = c + 64 d) the inverse kernel consumes. HBM traffic: read
  the audio once, write the spectrum once.
- `masked_istft4096_packed`: per (channel row, frame block) grid step the
  packed spectrum block is loaded ONCE and all S stems' mask multiply +
  inverse FFT + synthesis window + overlap-add run in VMEM; the
  (2/N, DC/Nyquist, >Nyquist-zero) scale chain is folded into constant
  [d, c] tables, and overlap-add uses a 3072-sample VMEM carry across the
  (sequential) grid steps, so the kernel writes finished AUDIO -- the
  per-stem frame tensor never exists. A final all-zero flush step per row
  drains the carry.

Reference semantics: the offline stft/istft drivers
(Executable/stftFix.c:363-579, window chain per core/transform.py) and the
mask application loops (Executable/main.c:473-494 in-band,
unaffectedWeight out-of-band). Parity: tests/test_stft_fused.py (interpret
mode vs core/transform.py's canonical formulation).
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
N_BINS = N // 2 + 1
HOP = 1024  # the reference's only hop (Executable/stftFix.h:14-18)
FB = 32  # frames per grid step
LAP = N // HOP  # 4 overlapping chunk streams
CHUNK_ROWS = HOP // R  # 16 rows of 64 samples per hop chunk
TAIL_ROWS = (LAP - 1) * CHUNK_ROWS  # 48 rows = 3072 carried samples


@functools.cache
def _fwd_tables():
    """Forward 4096-pt FFT matmul tables (fastfft.py formulation).

    Stage 1 (real input): the kernel holds frames as (32, 128) rows of 128
    samples (the HBM DMA tiling), i.e. the [a, b] matrix with even a in
    lanes [0, 64) and odd a in [64, 128); the contraction over a becomes
    one K = 64 matmul against E64's rows in (even, odd) interleave order.
    Stage 2: one complex-packed (128, 128) matmul [[er, ei], [-ei, er]].
    """
    i = np.arange(R)
    e64 = np.exp(-2j * np.pi * np.outer(i, i) / R)
    tw = np.exp(-2j * np.pi * np.outer(i, i) / N)  # T[b, c]
    er = np.asarray(e64.real, np.float32)
    ei = np.asarray(e64.imag, np.float32)
    e1r = np.concatenate([er[0::2], er[1::2]], axis=0)  # (64, 64), a-parity
    e1i = np.concatenate([ei[0::2], ei[1::2]], axis=0)
    w2 = np.block([[er, ei], [-ei, er]]).astype(np.float32)
    return (
        e1r.astype(np.float32), e1i.astype(np.float32),
        np.asarray(tw.real, np.float32), np.asarray(tw.imag, np.float32),
        w2,
    )


@functools.cache
def _inv_tables():
    """Inverse tables: synthesis form out[n] = Re sum_k w_k X_k e^{+2pi ikn/N}
    (see kernels/pallas_fft.py); both stages complex-packed on K."""
    i = np.arange(R)
    e64 = np.exp(2j * np.pi * np.outer(i, i) / R)
    tw = np.exp(2j * np.pi * np.outer(i, i) / N)
    er = np.asarray(e64.real, np.float32)
    ei = np.asarray(e64.imag, np.float32)
    w1 = np.block([[er, ei], [-ei, er]]).astype(np.float32)  # (128, 128)
    w2 = np.concatenate([er, -ei], axis=0).astype(np.float32)  # (128, 64)
    return (
        w1, w2,
        np.asarray(tw.real, np.float32), np.asarray(tw.imag, np.float32),
    )


@functools.cache
def _scale_tables(mask_rows: int):
    """(64, 64) [d, c] tables folding the inverse scale chain.

    real: 2/N for k <= 2048 (1/N at DC and Nyquist), 0 above Nyquist.
    imag: same with DC/Nyquist zeroed (jnp.fft.irfft ignores their imag).
    band: 1.0 on bins < mask_rows*64 (the masked band), 0 outside -- used
    to blend `mask` vs the scalar out-of-band weight.
    """
    d = np.arange(R)[:, None]
    c = np.arange(R)[None, :]
    k = c + 64 * d
    sr = np.where(k <= N // 2, 2.0 / N, 0.0)
    sr = np.where((k == 0) | (k == N // 2), 1.0 / N, sr)
    si = np.where((k == 0) | (k == N // 2), 0.0, sr)
    band = (k < mask_rows * R).astype(np.float32)
    return (
        sr.astype(np.float32), si.astype(np.float32), band,
    )


# ---------------------------------------------------------------------------
# Forward: audio -> packed spectrum [d, c]
# ---------------------------------------------------------------------------


def _stft_kernel(x_hbm, win_ref, e1r_ref, e1i_ref, tr_ref, ti_ref, w2_ref,
                 or_ref, oi_ref, xbuf, sem, *, n_comp: int):
    """One (row, frame-block) step: 32 frames' window + forward FFT.

    x_hbm: (rows, M, 128) audio in HBM (Mosaic DMA slices need 128-lane
    rows); frame f = rows [8f, 8f + 32), i.e. sample n = 64 a + b sits at
    row a//2, lane 64*(a%2) + b.
    or/oi: (1, FB, 64, 64) spectrum block, [d, c] layout (k = c + 64 d).
    """
    r = pl.program_id(0)
    b = pl.program_id(1)
    rows_hop = HOP // 128  # 8
    dma = pltpu.make_async_copy(
        x_hbm.at[
            r, pl.ds(b * FB * rows_hop, (FB + LAP - 1) * rows_hop)
        ],
        xbuf, sem,
    )
    dma.start()
    dma.wait()
    groups = xbuf[:].reshape(FB + LAP - 1, rows_hop, 2 * R)
    # frames[f] = audio rows [8 f, 8 f + 32): four leading-axis slices.
    frames = jnp.concatenate(
        [groups[c : c + FB] for c in range(LAP)], axis=1
    )  # (FB, 32, 128): [a-pair, b | b+64]
    frames = frames * win_ref[:].reshape(1, N // (2 * R), 2 * R)

    # Stage 1 over a: Y[b, c] = sum_a x[a, b] E64[a, c] (real input). The
    # (32, 128) frame holds even a in lanes [0:64), odd a in [64:128); the
    # two halves transpose to [b, a-parity] and contract against the
    # parity-interleaved E64 rows in ONE K = 64 matmul per re/im.
    xl = jnp.swapaxes(frames[..., :R], 1, 2)  # (FB, 64 b, 32 even-a)
    xr = jnp.swapaxes(frames[..., R:], 1, 2)  # (FB, 64 b, 32 odd-a)
    xt = jnp.concatenate([xl, xr], axis=-1).reshape(FB * R, R)
    y_r = jnp.dot(xt, e1r_ref[:], preferred_element_type=jnp.float32)
    y_i = jnp.dot(xt, e1i_ref[:], preferred_element_type=jnp.float32)
    y_r = y_r.reshape(FB, R, R)  # [b, c]
    y_i = y_i.reshape(FB, R, R)
    z_r = y_r * tr_ref[:] - y_i * ti_ref[:]
    z_i = y_r * ti_ref[:] + y_i * tr_ref[:]
    # Stage 2 over b: X[c, d] = sum_b Z[b, c] E64[b, d], complex-packed K.
    zt_r = jnp.swapaxes(z_r, 1, 2).reshape(FB * R, R)  # [f*c, b]
    zt_i = jnp.swapaxes(z_i, 1, 2).reshape(FB * R, R)
    x2 = jnp.concatenate([zt_r, zt_i], axis=-1)  # (FB*R, 128)
    o = jnp.dot(x2, w2_ref[:], preferred_element_type=jnp.float32)
    o_r = jnp.swapaxes(o[:, :R].reshape(FB, R, R), 1, 2)  # [c,d] -> [d,c]
    o_i = jnp.swapaxes(o[:, R:].reshape(FB, R, R), 1, 2)
    # Frames >= n_comp are zero (the reference computes rangeM/hop + 1
    # frames and leaves the rest zero, Executable/stftFix.c:377,460).
    valid = (
        b * FB + jax.lax.broadcasted_iota(jnp.int32, (FB, 1, 1), 0) < n_comp
    ).astype(jnp.float32)
    or_ref[0] = o_r * valid
    oi_ref[0] = o_i * valid


@functools.partial(jax.jit, static_argnames=("n_comp", "n_frames"))
def stft4096_packed(
    audio: jax.Array,  # (rows, data_size) float32
    window: jax.Array,  # (4096,) analysis window
    n_comp: int,
    n_frames: int,
) -> tuple[jax.Array, jax.Array]:
    """-> (s_r, s_i): (rows, n_pad, 64, 64) fp32, [d, c] packed, where
    n_pad = ceil(n_frames / 32) * 32 and frames >= n_comp are zero.

    Equivalent to rfft(frame(audio) * window) with the upper half of the
    4096-bin axis holding the conjugate bins (callers use k <= 2048 only;
    the inverse kernel's scale table zeroes the rest).
    """
    rows, data_size = audio.shape
    nblocks = -(-n_frames // FB)
    n_pad = nblocks * FB
    need = n_pad * HOP + (N - HOP)
    x = jnp.pad(audio.astype(jnp.float32), ((0, 0), (0, need - data_size)))
    x = x.reshape(rows, need // (2 * R), 2 * R)
    e1r, e1i, tr, ti, w2 = _fwd_tables()

    out_spec = pl.BlockSpec(
        (1, FB, R, R), lambda r, b: (r, b, 0, 0), memory_space=pltpu.VMEM
    )
    tbl = lambda shape: pl.BlockSpec(
        shape, lambda r, b: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    s_r, s_i = pl.pallas_call(
        functools.partial(_stft_kernel, n_comp=n_comp),
        out_shape=(
            jax.ShapeDtypeStruct((rows, n_pad, R, R), jnp.float32),
            jax.ShapeDtypeStruct((rows, n_pad, R, R), jnp.float32),
        ),
        grid=(rows, nblocks),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # audio: DMA'd manually
            tbl((N // (2 * R), 2 * R)),  # window, (32, 128) DMA-row layout
            tbl((R, R)), tbl((R, R)),  # stage-1 E64 re/im (a-parity rows)
            tbl((R, R)), tbl((R, R)),  # twiddle re/im
            tbl((2 * R, 2 * R)),  # stage-2 packed
        ],
        out_specs=(out_spec, out_spec),
        scratch_shapes=[
            pltpu.VMEM(((FB + LAP - 1) * HOP // 128, 2 * R), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )(
        x, window.astype(jnp.float32).reshape(N // (2 * R), 2 * R),
        jnp.asarray(e1r), jnp.asarray(e1i),
        jnp.asarray(tr), jnp.asarray(ti), jnp.asarray(w2),
    )
    return s_r, s_i


def packed_to_complex(s_r: jax.Array, s_i: jax.Array) -> jax.Array:
    """(rows, n_pad, 64, 64) [d, c] -> (rows, n_pad, 2049) complex spectrum."""
    rows, n_pad = s_r.shape[:2]
    flat_r = s_r.reshape(rows, n_pad, N)[..., :N_BINS]
    flat_i = s_i.reshape(rows, n_pad, N)[..., :N_BINS]
    return jax.lax.complex(flat_r, flat_i)


def packed_magnitude(s_r: jax.Array, s_i: jax.Array, bin_limit: int) -> jax.Array:
    """|spec| on bins < bin_limit -> (rows, n_pad, bin_limit); reads only the
    in-band [d, c] rows (bin_limit/64 of 64)."""
    if bin_limit % R:
        raise ValueError("bin_limit must be a multiple of 64")
    rows, n_pad = s_r.shape[:2]
    mr = bin_limit // R
    r = s_r[:, :, :mr]
    i = s_i[:, :, :mr]
    return jnp.sqrt(r * r + i * i).reshape(rows, n_pad, bin_limit)


# ---------------------------------------------------------------------------
# Inverse: packed spectrum + per-stem masks -> overlap-added audio
# ---------------------------------------------------------------------------


def _mistft_kernel(yr_ref, yi_ref, m_ref, uw_ref, w1_ref, w2_ref, tr_ref,
                   ti_ref, sr_ref, si_ref, bnd_ref, win_ref, out_ref, carry,
                   *, n_stems: int, mask_rows: int, nblocks: int):
    """One (row, frame-block) step: all stems' mask + iFFT + window + OLA.

    yr/yi: (1, FB, 64, 64) packed spectrum block (shared across stems).
    m_ref: (S, 1, 1, FB, mask_rows, 64) in-band masks, [d, c] rows.
    uw_ref:(1, S) SMEM per-stem out-of-band weights.
    out:   (S, 1, 1, FB*16, 64) finished audio rows.
    carry: (S, 48, 64) VMEM: the 3072-sample overlap tail across steps.
    Step `nblocks` (one past the data) is the flush: frames are zeroed so
    the carry drains into the output block.
    """
    b = pl.program_id(1)

    @pl.when(b == 0)
    def _zero_carry():
        carry[:] = jnp.zeros_like(carry)

    live = jnp.where(b < nblocks, 1.0, 0.0)
    sr = sr_ref[:] * live  # fold the flush-zeroing into the scale tables
    si = si_ref[:] * live
    band = bnd_ref[:]
    y_r = yr_ref[0]  # (FB, 64, 64) [d, c]
    y_i = yi_ref[0]
    tr = tr_ref[:]
    ti = ti_ref[:]
    win = win_ref[:].reshape(1, R, R)

    for s in range(n_stems):
        m_in = m_ref[s, 0, 0]  # (FB, mask_rows, 64), host-split lanes
        pad = jnp.zeros((FB, R - mask_rows, R), jnp.float32)
        m = jnp.concatenate([m_in, pad], axis=1) * band + uw_ref[0, s] * (1.0 - band)
        a_r = y_r * m * sr
        a_i = y_i * m * si
        # Inverse transform (kernels/pallas_fft.py formulation).
        yt_r = jnp.swapaxes(a_r, 1, 2).reshape(FB * R, R)  # [f*c, d]
        yt_i = jnp.swapaxes(a_i, 1, 2).reshape(FB * R, R)
        x1 = jnp.concatenate([yt_r, yt_i], axis=-1)
        z = jnp.dot(x1, w1_ref[:], preferred_element_type=jnp.float32)
        z_r = z[:, :R].reshape(FB, R, R)  # [c, b]
        z_i = z[:, R:].reshape(FB, R, R)
        w_r = z_r * tr - z_i * ti
        w_i = z_r * ti + z_i * tr
        wt_r = jnp.swapaxes(w_r, 1, 2).reshape(FB * R, R)  # [f*b, c]
        wt_i = jnp.swapaxes(w_i, 1, 2).reshape(FB * R, R)
        x2 = jnp.concatenate([wt_r, wt_i], axis=-1)
        o = jnp.dot(x2, w2_ref[:], preferred_element_type=jnp.float32)
        frames = jnp.swapaxes(o.reshape(FB, R, R), 1, 2) * win  # [f, a, b]

        # Overlap-add: frame f covers output rows [16 f, 16 f + 64); the
        # four hop chunks become leading-axis-shifted streams.
        chunks = frames.reshape(FB, LAP, CHUNK_ROWS, R)
        acc = None
        for c in range(LAP):
            parts = [chunks[:, c]]  # stream c lands at rows [c, c + FB)
            if c:
                parts.insert(0, jnp.zeros((c, CHUNK_ROWS, R), jnp.float32))
            if LAP - 1 - c:
                parts.append(
                    jnp.zeros((LAP - 1 - c, CHUNK_ROWS, R), jnp.float32)
                )
            part = jnp.concatenate(parts, axis=0)  # (FB + 3, 16, 64)
            acc = part if acc is None else acc + part
        head = acc[: LAP - 1].reshape(TAIL_ROWS, R) + carry[s]
        carry[s] = acc[FB : FB + LAP - 1].reshape(TAIL_ROWS, R)
        out = jnp.concatenate(
            [head.reshape(LAP - 1, CHUNK_ROWS, R), acc[LAP - 1 : FB]], axis=0
        )
        out_ref[s, 0, 0] = out.reshape(FB * CHUNK_ROWS, R)


@functools.partial(jax.jit, static_argnames=("bin_limit", "n_frames"))
def masked_istft4096_packed(
    s_r: jax.Array,  # (rows, n_pad, 64, 64) packed spectrum (stft4096_packed)
    s_i: jax.Array,
    masks: jax.Array,  # (S, rows, >= n_pad frames, bin_limit) float32
    out_band: jax.Array,  # (S,) float32 out-of-band weights
    bin_limit: int,
    window: jax.Array,  # (4096,) synthesis window (scale chain folded)
    n_frames: int,  # valid frames (rows beyond are zero)
) -> jax.Array:
    """-> (S, rows, n_frames*1024 + 3072) audio: for each stem s,
    overlap_add(irfft(spec * blend(mask_s, out_band_s)) * window).

    The scale chain (2/N, DC/Nyquist halving, >Nyquist zero) matches
    jnp.fft.irfft on the 2049-bin spectrum; see _scale_tables.
    """
    if bin_limit % R:
        raise ValueError("bin_limit must be a multiple of 64")
    rows, n_pad = s_r.shape[:2]
    if n_pad % FB:
        raise ValueError("spectrum frames must be 32-aligned (stft4096_packed)")
    n_stems = masks.shape[0]
    mask_rows = bin_limit // R
    nblocks = n_pad // FB
    m = masks[:, :, :n_pad].astype(jnp.float32).reshape(
        n_stems, rows, nblocks, FB, mask_rows, R
    )
    uw = out_band.astype(jnp.float32).reshape(1, n_stems)
    w1, w2, tr, ti = _inv_tables()
    srt, sit, band = _scale_tables(mask_rows)

    def clamp(b):
        return jnp.minimum(b, nblocks - 1)

    spec_spec = pl.BlockSpec(
        (1, FB, R, R), lambda r, b: (r, clamp(b), 0, 0),
        memory_space=pltpu.VMEM,
    )
    tbl = lambda shape: pl.BlockSpec(
        shape, lambda r, b: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        functools.partial(
            _mistft_kernel,
            n_stems=n_stems, mask_rows=mask_rows, nblocks=nblocks,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (n_stems, rows, nblocks + 1, FB * CHUNK_ROWS, R), jnp.float32
        ),
        grid=(rows, nblocks + 1),
        in_specs=[
            spec_spec, spec_spec,
            pl.BlockSpec(
                (n_stems, 1, 1, FB, mask_rows, R),
                lambda r, b: (0, r, clamp(b), 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # out-of-band weights
            tbl((2 * R, 2 * R)), tbl((2 * R, R)),  # inverse stages
            tbl((R, R)), tbl((R, R)),  # twiddle
            tbl((R, R)), tbl((R, R)), tbl((R, R)),  # scale re/im, band
            tbl((R, R)),  # synthesis window [a, b]
        ],
        out_specs=pl.BlockSpec(
            (n_stems, 1, 1, FB * CHUNK_ROWS, R),
            lambda r, b: (0, r, b, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((n_stems, TAIL_ROWS, R), jnp.float32)],
    )(
        s_r, s_i, m, uw,
        jnp.asarray(w1), jnp.asarray(w2), jnp.asarray(tr), jnp.asarray(ti),
        jnp.asarray(srt), jnp.asarray(sit), jnp.asarray(band),
        window.astype(jnp.float32).reshape(R, R),
    )
    audio = out.reshape(n_stems, rows, (nblocks + 1) * FB * HOP)
    return audio[..., : n_frames * HOP + (N - HOP)]
