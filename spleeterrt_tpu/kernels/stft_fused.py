"""Pallas TPU kernels: fused forward STFT and fused masked iSTFT-to-audio.

Round-3 put the transform chain at its HBM roofline for *traffic*, but
round-4 profiling showed both kernels running far above their compute
floor: every (frame-block, stem) step paid 4-6 in-VMEM `swapaxes`
relayouts (~1 MB each) to feed the matmul FFT stages -- ~16 GB of VMEM
relayout traffic per 300 s separation, ~25 ms of the ~40 ms chain.

This version restructures the two-stage 64x64 matmul FFT so that every
stage's contraction dimension already sits on the operand's lane axis (or
belongs to a static table used as the matmul LHS) -- ZERO data transposes
inside either kernel:

- The packed spectrum is stored [c, d] (bin k = c + 64*d; c on sublanes,
  d on lanes; the d >= 33 lanes hold the conjugate-half bins no consumer
  reads).
- Forward: stage 1 contracts the frame-sample axis with a STATIC packed
  table as the matmul LHS (output rows = c); the twiddle is elementwise in
  [c, b]; stage 2 contracts b -- the running operand's lane axis (natural
  LHS form) -- and lands directly in [c, d].
- Inverse: the mask multiply runs in compact [c, d < 32] (masks are
  provided as (S, rows, frames, 64, 32) -- the packed U-Net head emits
  this layout for free via kernels/tail.py::unpack_mask_cd, and
  `masks_flat_to_cd` adapts canonical producers with one host transpose).
  Stage 1 contracts d as three K = 32 matmuls (real/imag low halves plus
  the d >= 32 half that only carries Nyquist through its scale table),
  with the complex packing moved to the N axis so no operand concat is
  needed; stage 2 contracts c with a static packed LHS and lands in
  row-major [a, b] time order for the windowed overlap-add.

The OLA uses the same 3072-sample VMEM carry across sequential grid steps
as round 3, so the kernel still writes finished AUDIO; per-stem frame
tensors never exist in HBM. Both kernels fetch their inputs through
Element-indexed BlockSpecs (kernels/blockspec.py), so the Pallas pipeline
double-buffers the overlapping audio windows.

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

from spleeterrt_tpu.kernels.blockspec import element_window

N = 4096
R = 64
D_LO = 32  # mask d-lanes: k = c + 64 d < 2048 in-band rows
N_BINS = N // 2 + 1
HOP = 1024  # the reference's only hop (Executable/stftFix.h:14-18)
FB = 32  # frames per forward grid step
# Inverse frames per grid step: the [c, d<32] mask blocks pad their 32
# lanes to 128 in VMEM vregs (4x), so the inverse runs half-size blocks to
# stay inside the 16 MB scoped-vmem limit at 4 stems.
FB_INV = 16
LAP = N // HOP  # 4 overlapping chunk streams
CHUNK_ROWS = HOP // R  # 16 rows of 64 samples per hop chunk
TAIL_ROWS = (LAP - 1) * CHUNK_ROWS  # 48 rows = 3072 carried samples


def _shared_lhs_matmul(table: jax.Array, x: jax.Array) -> jax.Array:
    """out[f, r, n] = sum_k table[r, k] * x[f, k, n] with a STATIC lhs --
    the one batched-matmul shape the zero-transpose chain needs."""
    return jnp.einsum(
        "rk,fkn->frn", table, x, preferred_element_type=jnp.float32
    )


@functools.cache
def _fwd_tables():
    """Forward tables for the transpose-free chain.

    e1e/e1o: (128, 32) static LHS for stage 1 -- rows [c_real; c_imag],
    columns the even/odd sample-pair index a//2 (the DMA'd frame rows hold
    even a in lanes [0:64) and odd a in [64:128)).
    tr/ti: (64, 64) twiddle exp(-2pi i c b / N)[c, b] (symmetric).
    w2: (128, 128) stage-2 packed complex rhs [[er, ei], [-ei, er]] over
    (b_r; b_i) -> (d_r | d_i).
    """
    i = np.arange(R)
    e64 = np.exp(-2j * np.pi * np.outer(i, i) / R)  # symmetric
    tw = np.exp(-2j * np.pi * np.outer(i, i) / N)
    er = np.asarray(e64.real, np.float64)
    ei = np.asarray(e64.imag, np.float64)

    def pack_lhs(par):
        cols = e64[par::2, :]  # (32 a-idx, 64 c)
        return np.concatenate(
            [cols.real.T, cols.imag.T], axis=0
        ).astype(np.float32)  # (128 rows = [c_r; c_i], 32 a-idx)

    w2 = np.block([[er, ei], [-ei, er]]).astype(np.float32)
    return (
        pack_lhs(0), pack_lhs(1),
        np.asarray(tw.real, np.float32), np.asarray(tw.imag, np.float32),
        w2,
    )


@functools.cache
def _inv_tables():
    """Inverse tables.

    w1r_lo/w1i_lo: (32, 128) stage-1 rhs for d < 32: N = [b_r | b_i]
    (complex packing on the OUTPUT axis, so the real/imag operands never
    concatenate). w1r_hi: same for d in [32, 64) -- only Nyquist (d = 32)
    survives its scale table, and its imag is dropped like jnp.fft.irfft.
    tr/ti: (64, 64) twiddle exp(+2pi i c b / N)[c, b].
    e2t: (128, 64) stage-2 rhs: out[b, a] = Re sum_c E[c, a] w^T[b, c]
    -> rows [0:64) = cos(2pi a c / 64), rows [64:) = -sin(...).
    """
    i = np.arange(R)
    e64 = np.exp(2j * np.pi * np.outer(i, i) / R)
    tw = np.exp(2j * np.pi * np.outer(i, i) / N)

    def pack_rhs(rows, sign_i=1.0):
        return np.concatenate(
            [sign_i * rows.real, sign_i * rows.imag], axis=1
        ).astype(np.float32)

    e_lo = e64[:D_LO]
    e_hi = e64[D_LO:]
    w1r_lo = pack_rhs(e_lo)
    w1i_lo = np.concatenate(
        [-e_lo.imag, e_lo.real], axis=1
    ).astype(np.float32)
    w1r_hi = pack_rhs(e_hi)
    e2t = np.concatenate(
        [e64.real, -e64.imag], axis=0
    ).astype(np.float32)  # (128 [c_r; c_i], 64 a); e64 symmetric
    return (
        w1r_lo, w1i_lo, w1r_hi,
        np.asarray(tw.real, np.float32), np.asarray(tw.imag, np.float32),
        e2t,
    )


@functools.cache
def _scale_tables(mask_d: int):
    """[c, d] f32 tables folding the inverse scale chain.

    sr_in/si_in: (64, mask_d): 2/N on the masked band (1/N at DC, DC imag
    zeroed) -- every (c, d < mask_d) bin is in-band, so no separate band
    blend is needed. sr_mid/si_mid: (64, 32 - mask_d) for the unmasked
    d < 32 rows (out-of-band, scalar weight). sr_hi: (64, 32) for
    d in [32, 64): zero except Nyquist (c = 0, d = 32) at 1/N (its imag is
    dropped entirely, like jnp.fft.irfft).
    """
    c = np.arange(R)[:, None]

    def lo(d0, d1):
        d = np.arange(d0, d1)[None, :]
        k = c + 64 * d
        sr = np.full(k.shape, 2.0 / N)
        si = np.full(k.shape, 2.0 / N)
        if d0 == 0:
            sr[0, 0] = 1.0 / N
            si[0, 0] = 0.0
        return sr.astype(np.float32), si.astype(np.float32)

    sr_in, si_in = lo(0, mask_d)
    sr_mid, si_mid = lo(mask_d, D_LO)
    sr_hi = np.zeros((R, D_LO))
    sr_hi[0, 0] = 1.0 / N  # k = 2048 (Nyquist)
    return sr_in, si_in, sr_mid, si_mid, sr_hi.astype(np.float32)


# ---------------------------------------------------------------------------
# Forward: audio -> [c, d] packed spectrum
# ---------------------------------------------------------------------------


def _stft_kernel(x_ref, win_ref, e1e_ref, e1o_ref, tr_ref, ti_ref, w2_ref,
                 or_ref, oi_ref, *, n_comp: int):
    """One (row, frame-block) step: 32 frames' window + forward FFT.

    x_ref: (1, (FB+3)*8, 128) audio rows (sample n = 64 a + b at row a//2,
    lane 64*(a%2) + b), Element-fetched with a 3-hop overlap.
    or/oi: (1, FB, 64, 64) spectrum block, [c, d] layout (k = c + 64 d).
    """
    b = pl.program_id(1)
    rows_hop = HOP // 128  # 8
    groups = x_ref[0].reshape(FB + LAP - 1, rows_hop, 2 * R)
    # frames[f] = audio rows [8 f, 8 f + 32): four leading-axis slices.
    frames = jnp.concatenate(
        [groups[c : c + FB] for c in range(LAP)], axis=1
    )  # (FB, 32, 128): [a-pair, b | b+64]
    frames = frames * win_ref[:].reshape(1, N // (2 * R), 2 * R)

    # Stage 1 over a (static packed LHS; even/odd sample-pair halves):
    # z rows [0:64) = Re Y[c, b], [64:128) = Im.
    z = _shared_lhs_matmul(
        e1e_ref[:], frames[..., :R]
    ) + _shared_lhs_matmul(e1o_ref[:], frames[..., R:])  # (FB, 128, 64)
    z_r = z[:, :R]
    z_i = z[:, R:]
    w_r = z_r * tr_ref[:] - z_i * ti_ref[:]
    w_i = z_r * ti_ref[:] + z_i * tr_ref[:]
    # Stage 2 over b (natural LHS: b is the lane axis) -> [c, d_r | d_i].
    x2 = jnp.concatenate([w_r, w_i], axis=-1).reshape(FB * R, 2 * R)
    o = jnp.dot(x2, w2_ref[:], preferred_element_type=jnp.float32)
    o = o.reshape(FB, R, 2 * R)
    # Frames >= n_comp are zero (the reference computes rangeM/hop + 1
    # frames and leaves the rest zero, Executable/stftFix.c:377,460).
    valid = (
        b * FB + jax.lax.broadcasted_iota(jnp.int32, (FB, 1, 1), 0) < n_comp
    ).astype(jnp.float32)
    or_ref[0] = o[:, :, :R] * valid
    oi_ref[0] = o[:, :, R:] * valid


@functools.partial(jax.jit, static_argnames=("n_comp", "n_frames"))
def stft4096_packed(
    audio: jax.Array,  # (rows, data_size) float32
    window: jax.Array,  # (4096,) analysis window
    n_comp: int,
    n_frames: int,
) -> tuple[jax.Array, jax.Array]:
    """-> (s_r, s_i): (rows, n_pad, 64, 64) fp32, [c, d] packed
    (k = c + 64 d), where n_pad = ceil(n_frames / 32) * 32 and frames
    >= n_comp are zero.

    Equivalent to rfft(frame(audio) * window) with the d >= 33 lanes
    holding the conjugate bins (callers use k <= 2048 only; the inverse
    kernel's scale tables zero the rest).
    """
    rows, data_size = audio.shape
    nblocks = -(-n_frames // FB)
    n_pad = nblocks * FB
    need = n_pad * HOP + (N - HOP)
    x = jnp.pad(audio.astype(jnp.float32), ((0, 0), (0, need - data_size)))
    x = x.reshape(rows, need // (2 * R), 2 * R)
    e1e, e1o, tr, ti, w2 = _fwd_tables()

    rows_hop = HOP // 128
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
            element_window(
                (1, (FB + LAP - 1) * rows_hop, 2 * R),
                lambda r, b: (r, b * FB * rows_hop, 0),
                memory_space=pltpu.VMEM,
            ),
            tbl((N // (2 * R), 2 * R)),  # window, DMA-row layout
            tbl((2 * R, D_LO)), tbl((2 * R, D_LO)),  # stage-1 packed LHS
            tbl((R, R)), tbl((R, R)),  # twiddle re/im
            tbl((2 * R, 2 * R)),  # stage-2 packed rhs
        ],
        out_specs=(out_spec, out_spec),
    )(
        x, window.astype(jnp.float32).reshape(N // (2 * R), 2 * R),
        jnp.asarray(e1e), jnp.asarray(e1o),
        jnp.asarray(tr), jnp.asarray(ti), jnp.asarray(w2),
    )
    return s_r, s_i


def packed_to_complex(s_r: jax.Array, s_i: jax.Array) -> jax.Array:
    """[c, d] packed spectrum -> (rows, n_pad, 2049) complex bins."""
    rows, n_pad = s_r.shape[:2]
    flat_r = s_r.transpose(0, 1, 3, 2).reshape(rows, n_pad, N)[..., :N_BINS]
    flat_i = s_i.transpose(0, 1, 3, 2).reshape(rows, n_pad, N)[..., :N_BINS]
    return jax.lax.complex(flat_r, flat_i)


def packed_magnitude(s_r: jax.Array, s_i: jax.Array, bin_limit: int) -> jax.Array:
    """|spec| on bins < bin_limit -> (rows, n_pad, bin_limit), bin-ordered
    (one XLA transpose pass [c, d] -> [d, c], fused with the hypot)."""
    if bin_limit % R:
        raise ValueError("bin_limit must be a multiple of 64")
    rows, n_pad = s_r.shape[:2]
    mr = bin_limit // R
    r = s_r[:, :, :, :mr]
    i = s_i[:, :, :, :mr]
    mag = jnp.sqrt(r * r + i * i)  # (rows, n_pad, 64 c, mr d)
    return mag.transpose(0, 1, 3, 2).reshape(rows, n_pad, bin_limit)


# ---------------------------------------------------------------------------
# Inverse: packed spectrum + per-stem [c, d] masks -> overlap-added audio
# ---------------------------------------------------------------------------


def masks_flat_to_cd(masks: jax.Array, n_pad: int) -> jax.Array:
    """(S, rows, >= n_pad frames, bin_limit) bin-ordered masks -> the
    kernel's (S, rows, n_pad, 64, bin_limit//64) [c, d] layout (one XLA
    transpose pass; the packed U-Net head emits this layout directly --
    kernels/tail.py::unpack_mask_cd)."""
    s, rows = masks.shape[:2]
    bl = masks.shape[-1]
    m = masks[:, :, :n_pad].astype(jnp.float32).reshape(
        s, rows, n_pad, bl // R, R
    )
    return m.transpose(0, 1, 2, 4, 3)  # (S, rows, n_pad, 64 c, mask_d)


def _mistft_kernel(yr_ref, yi_ref, m_ref, uw_ref, w1rl_ref, w1il_ref,
                   w1rh_ref, tr_ref, ti_ref, e2t_ref, sri_ref, sii_ref,
                   srm_ref, sim_ref, srh_ref, win_ref, out_ref, carry,
                   *, n_stems: int, nblocks: int, mask_d: int,
                   mask_flat: bool):
    """One (row, frame-block) step: all stems' mask + iFFT + window + OLA.

    yr/yi: (1, FB_INV, 64, 64) packed [c, d] spectrum block (shared).
    m_ref: (S, 1, 1, FB_INV, 64, mask_d) [c, d] in-band masks (every bin
           with d < mask_d is in-band, so the mask IS the blend).
    out:   (S, 1, 1, FB_INV*16, 64) finished audio rows.
    carry: (S, 48, 64) VMEM: the 3072-sample overlap tail across steps.
    Step `nblocks` (one past the data) is the flush: frames are zeroed so
    the carry drains into the output block.
    """
    b = pl.program_id(1)

    @pl.when(b == 0)
    def _zero_carry():
        carry[:] = jnp.zeros_like(carry)

    live = jnp.where(b < nblocks, 1.0, 0.0)
    sr_in = sri_ref[:] * live  # fold the flush-zeroing into the scales
    si_in = sii_ref[:] * live
    sr_mid = srm_ref[:] * live
    si_mid = sim_ref[:] * live
    sr_hi = srh_ref[:] * live
    tr = tr_ref[:]
    ti = ti_ref[:]
    win = win_ref[:].reshape(1, R, R)
    sfb = n_stems * FB_INV

    # Every stage below runs ALL STEMS in one batched op (stems fold into
    # the leading/matmul-M axis): 4x fewer, 4x larger matmuls + relayouts
    # than the round-3 per-stem loop.
    if mask_flat:
        # d-major masks (tail.unpack_mask_dc_flat, host-split to
        # (.., mask_d, 64) -- a layout-neutral reshape): swap the small
        # minor pair in VMEM, far cheaper than the XLA transpose writing
        # 24-float runs. (Splitting the 1536-lane axis IN-kernel is an
        # unsupported Mosaic shape cast; the host split keeps lanes = 64.)
        m = jnp.swapaxes(m_ref[:, 0, 0], -1, -2)  # (S, FB_INV, 64, mask_d)
    else:
        m = m_ref[:, 0, 0]  # (S, FB_INV, 64, mask_d)
    y1_r = yr_ref[0]  # (FB_INV, 64, 64): the spectrum, shared by stems
    y1_i = yi_ref[0]
    y_r = jnp.broadcast_to(y1_r[None], (n_stems, FB_INV, R, R))
    y_i = jnp.broadcast_to(y1_i[None], (n_stems, FB_INV, R, R))

    def k32(x, w):
        return jnp.dot(
            x.reshape(-1, x.shape[-1]), w,
            preferred_element_type=jnp.float32,
        )

    # Stage 1 over d: K-split matmuls (in-band / out-of-band-mid /
    # Nyquist-high), complex packing on the N axis -- no concats. The
    # out-of-band rows carry no mask -- per stem they are uw_s times ONE
    # shared matmul of the spectrum, so that half of stage 1 runs once
    # instead of n_stems times (round-5: stage-1 FLOPs x0.625 at 4 stems).
    z_in = (
        k32(y_r[..., :mask_d] * m * sr_in, w1rl_ref[:mask_d])
        + k32(y_i[..., :mask_d] * m * si_in, w1il_ref[:mask_d])
    ).reshape(n_stems, FB_INV * R, 2 * R)
    z_oob = (
        k32(y1_r[..., mask_d:D_LO] * sr_mid, w1rl_ref[mask_d:])
        + k32(y1_i[..., mask_d:D_LO] * si_mid, w1il_ref[mask_d:])
        + k32(y1_r[..., D_LO:] * sr_hi, w1rh_ref[:])
    )  # (FB_INV * R, 128)
    uw2 = uw_ref[:].reshape(n_stems, 1, 1)
    z = (z_in + uw2 * z_oob[None]).reshape(sfb, R, 2 * R)  # [c, b_r | b_i]
    # Stage 2 over c: c must move from sublanes to lanes -- the chain's one
    # unavoidable relayout (batched over stems x frames). Transpose the
    # complex halves BEFORE the twiddle: the twiddle tables are symmetric,
    # so the elementwise multiply commutes with the transpose bit-for-bit,
    # and two square 64x64 swaps replace round-4's pack-concat + 64x128
    # swap + re-concat (one 2 MB lane concat per step dropped).
    zt_r = jnp.swapaxes(z[..., :R], 1, 2)  # (sfb, 64 b, 64 c)
    zt_i = jnp.swapaxes(z[..., R:], 1, 2)
    wt_r = zt_r * tr - zt_i * ti  # [b, c]; tr/ti symmetric
    wt_i = zt_r * ti + zt_i * tr
    x2 = jnp.concatenate([wt_r, wt_i], axis=-1)  # (sfb, 64 b, 128 [c_r|c_i])
    o = jnp.dot(
        x2.reshape(sfb * R, 2 * R), e2t_ref[:],
        preferred_element_type=jnp.float32,
    ).reshape(sfb, R, R)  # [b, a] per frame
    frames = jnp.swapaxes(o, 1, 2) * win  # (sfb, 64 a, 64 b) row-major

    # Overlap-add: frame f covers output rows [16 f, 16 f + 64); the
    # four hop chunks become leading-axis-shifted streams, batched over
    # stems on the leading axis.
    chunks = frames.reshape(n_stems, FB_INV, LAP, CHUNK_ROWS, R)
    acc = None
    for c in range(LAP):
        parts = [chunks[:, :, c]]  # stream c lands at rows [c, c + FB_INV)
        if c:
            parts.insert(
                0, jnp.zeros((n_stems, c, CHUNK_ROWS, R), jnp.float32)
            )
        if LAP - 1 - c:
            parts.append(
                jnp.zeros((n_stems, LAP - 1 - c, CHUNK_ROWS, R), jnp.float32)
            )
        part = jnp.concatenate(parts, axis=1)  # (S, FB_INV + 3, 16, 64)
        acc = part if acc is None else acc + part
    head = acc[:, : LAP - 1].reshape(n_stems, TAIL_ROWS, R) + carry[:]
    carry[:] = acc[:, FB_INV : FB_INV + LAP - 1].reshape(n_stems, TAIL_ROWS, R)
    out = jnp.concatenate(
        [
            head.reshape(n_stems, LAP - 1, CHUNK_ROWS, R),
            acc[:, LAP - 1 : FB_INV],
        ],
        axis=1,
    )
    out_ref[:, 0, 0] = out.reshape(n_stems, FB_INV * CHUNK_ROWS, R)


@functools.partial(jax.jit, static_argnames=("bin_limit", "n_frames"))
def masked_istft4096_cd(
    s_r: jax.Array,  # (rows, n_pad, 64, 64) [c, d] spectrum
    s_i: jax.Array,
    masks_cd: jax.Array,  # (S, rows, n_pad, 64, bin_limit//64) [c, d], OR
    # the FLAT d-major layout (S, rows, n_pad, bin_limit): flat index =
    # 64*d + c (tail.unpack_mask_dc_flat); un-flattened per block in VMEM.
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
    if n_pad % FB_INV:
        raise ValueError("spectrum frames must be 32-aligned (stft4096_packed)")
    n_stems = masks_cd.shape[0]
    mask_flat = masks_cd.ndim == 4
    mask_d = (masks_cd.shape[-1] // R) if mask_flat else masks_cd.shape[-1]
    if mask_d != bin_limit // R:
        raise ValueError("masks_cd d-lanes must equal bin_limit // 64")
    nblocks = n_pad // FB_INV
    if mask_flat:
        # Layout-neutral minor split of the flat (.., 1536) axis.
        m = masks_cd.reshape(n_stems, rows, nblocks, FB_INV, mask_d, R)
    else:
        m = masks_cd.reshape(n_stems, rows, nblocks, FB_INV, R, mask_d)
    uw = out_band.astype(jnp.float32).reshape(n_stems, 1)
    w1rl, w1il, w1rh, tr, ti, e2t = _inv_tables()
    sr_in, si_in, sr_mid, si_mid, sr_hi = _scale_tables(mask_d)

    def clamp(b):
        return jnp.minimum(b, nblocks - 1)

    spec_spec = pl.BlockSpec(
        (1, FB_INV, R, R), lambda r, b: (r, clamp(b), 0, 0),
        memory_space=pltpu.VMEM,
    )
    tbl = lambda shape: pl.BlockSpec(
        shape, lambda r, b: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    mask_spec = (
        pl.BlockSpec(
            (n_stems, 1, 1, FB_INV, mask_d, R),
            lambda r, b: (0, r, clamp(b), 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        if mask_flat
        else pl.BlockSpec(
            (n_stems, 1, 1, FB_INV, R, mask_d),
            lambda r, b: (0, r, clamp(b), 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
    )
    out = pl.pallas_call(
        functools.partial(
            _mistft_kernel, n_stems=n_stems, nblocks=nblocks, mask_d=mask_d,
            mask_flat=mask_flat,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (n_stems, rows, nblocks + 1, FB_INV * CHUNK_ROWS, R), jnp.float32
        ),
        grid=(rows, nblocks + 1),
        in_specs=[
            spec_spec, spec_spec,
            mask_spec,
            tbl((masks_cd.shape[0], 1)),  # out-of-band weights
            tbl((D_LO, 2 * R)), tbl((D_LO, 2 * R)), tbl((D_LO, 2 * R)),
            tbl((R, R)), tbl((R, R)),  # twiddle
            tbl((2 * R, R)),  # stage-2 packed rhs (e2t)
            tbl((R, mask_d)), tbl((R, mask_d)),  # in-band scales
            tbl((R, D_LO - mask_d)), tbl((R, D_LO - mask_d)),  # mid scales
            tbl((R, D_LO)),  # Nyquist-high scale
            tbl((R, R)),  # synthesis window [a, b]
        ],
        out_specs=pl.BlockSpec(
            (n_stems, 1, 1, FB_INV * CHUNK_ROWS, R),
            lambda r, b: (0, r, b, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((n_stems, TAIL_ROWS, R), jnp.float32)],
        # The stems-batched step's temporaries exceed the default 16 MB
        # scoped-vmem budget by ~0.6 MB at 4 stems; raise the cap (v5e has
        # headroom above the default).
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=24 * 1024 * 1024
        ),
    )(
        s_r, s_i, m, uw,
        jnp.asarray(w1rl), jnp.asarray(w1il), jnp.asarray(w1rh),
        jnp.asarray(tr), jnp.asarray(ti), jnp.asarray(e2t),
        jnp.asarray(sr_in), jnp.asarray(si_in),
        jnp.asarray(sr_mid), jnp.asarray(si_mid), jnp.asarray(sr_hi),
        window.astype(jnp.float32).reshape(R, R),
    )
    audio = out.reshape(n_stems, rows, (nblocks + 1) * FB_INV * HOP)
    return audio[..., : n_frames * HOP + (N - HOP)]


def masked_istft4096_packed(
    s_r: jax.Array,
    s_i: jax.Array,
    masks: jax.Array,  # (S, rows, >= n_pad frames, bin_limit) bin-ordered
    out_band: jax.Array,
    bin_limit: int,
    window: jax.Array,
    n_frames: int,
) -> jax.Array:
    """Flat-mask wrapper of masked_istft4096_cd (one host transpose pass;
    the packed U-Net path feeds the cd entry point directly)."""
    n_pad = s_r.shape[1]
    return masked_istft4096_cd(
        s_r, s_i, masks_flat_to_cd(masks, n_pad), out_band, bin_limit,
        window, n_frames,
    )
