"""Pallas TPU kernel: fused U-Net decoder tail (up6 + up7 + sigmoid).

The channel-poor decoder exit dominates the U-Net's device time on TPU
(docs/PERF.md): up6 (32->1ch transposed conv) and up7 (1->2ch dilated conv)
put C in {1, 2, 4} on the 128-lane axis, so XLA pays layout transitions and
padded epilogue passes worth ~2x the conv FLOPs. This kernel computes

    y6   = bn_scale * act(tconv5x5_s2(x, w6) + b6) + bn_shift     (up6)
    mask = sigmoid(conv4x4_dil2(y6, w7) + b7)                     (up7)

entirely in VMEM per (batch, time-tile, frequency-chunk) grid step. The
stem axis is folded into the batch grid axis (weights are indexed by
program // batch_per_stem in the BlockSpec index maps) so one launch covers
every stem of a multi-stem separation without vmap.

Layout: frequency columns are packed in QUADS -- lane = 32*(col phase j) +
channel c fills all 128 lanes exactly -- and the quad index rides the
LEADING (untiled) axis. Compute rows are GROUPS of four quads (16 half-res
columns), which makes both conv stages matmuls with N = 64 output lanes:

- up6 (subpixel decomposition, core/model.py::_pack_tconv_kernel: a 3x3
  stride-1 conv whose 4 output channels are the (dp, dq) parities of the
  full-res output): per output group the column window spans 6 quads, so
  three MXU matmuls (one per kernel row a, applied post-matmul as sublane
  slice + add) with K = 6*128 = 768, N = 16 cols x 4 parities = 64.
- up7 (rhs_dilation-2 4x4 conv, taps at {-3,-1,+1,+3}; the nonstandard
  reference geometry per Executable/im2col_dilated.c:13, see
  core/model.py) never materializes the full-res plane: every tap offset
  is odd, so output parity row q reads only y6 parity rows 1-q (likewise
  columns), i.e. a parity-mixing linear map. Per output group the window
  is covered by two adjacent y6 groups: 8 MXU matmuls (q, a) with
  K = 2*64 = 128, N = 32 full-res cols x 2 channels = 64.

Mosaic constraints that shaped the code: lane-concats are only of
full-width, offset-0 (axis-0-sliced) tensors; row/quad shifts are leading-
axis slices or post-matmul sublane slice+adds; expm1 has no lowering; the
overlapping input windows are fetched by an explicit HBM->VMEM DMA (a
host-side jnp.stack gather measured ~15 ms of pure copying at the 4-stem
VST workload) with the row-slice size 8-aligned.

Domain masks: the up6 epilogue maps zero-padded halo rows/quads to a
nonzero constant, but up7's TF-SAME padding needs true zeros outside the
global plane, so 0/1 row- and quad-validity masks re-zero them.

Reference semantics: Executable/spleeter.c:239-301 (decoder activation
BEFORE batch norm; final conv = 4x4 dilation 2 + bias + sigmoid).
Parity: tests/test_mask_head.py (interpret mode vs the canonical XLA path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HALO = 3  # input halo rows per side at half resolution (see tiling note)
QHALO = 3  # input halo quads per side (up6's 6-quad window + up7's +-1)
TT = 32  # half-resolution output rows per grid step
MAX_NQC = 96  # max quads per grid step (VMEM budget); must stay 4-aligned
N_PAR = 4  # subpixel parities (dp, dq)
QUAD = 4  # frequency columns packed per 128-lane group
# DMA'd rows per step: TT + 2*HALO rounded up to the 8-row sublane tiling
# (Mosaic requires DMA slice sizes aligned to the tile); the extra rows are
# zero padding, never consumed by the row-tap slices.
ROWS_DMA = -(-(TT + 2 * HALO) // 8) * 8

# Scalar table layout (per stem, (1, 80) f32):
# [0]=b6  [1]=bn_scale6  [2]=bn_shift6  [8:72) = b7[n % 2] over out lanes.
_SCAL_B6, _SCAL_BNS, _SCAL_BNH = 0, 1, 2
_SCAL_B7L = 8
_SCAL_LEN = 80


def _elu_f32(x: jax.Array) -> jax.Array:
    # Reference ELU with the denormal guard (Executable/spleeter.c:51-56).
    # exp(x)-1 instead of expm1 (Mosaic has no expm1 lowering); the fp32
    # cancellation error near 0 is ~1e-7 absolute, below test tolerance.
    safe = jnp.maximum(x, -15.0)
    return jnp.where(x >= 0, x, jnp.where(x < -15.0, -1.0, jnp.exp(safe) - 1.0))


def _head_kernel(xq_ref, w2_ref, u7_ref, scal_ref, rowm_ref, qm_ref, out_ref,
                 xbuf, sem, *, act: str, nqc: int):
    """One (batch*stem, time-tile, frequency-chunk) step.

    xq_ref:  (SB, nq + 2*QHALO + 2, T2 + ROWS_DMA - TT, 128) quad-packed
             up6 input in HBM (rows padded by HALO, quads by QHALO(+2 on
             the right for the group reshape), zeros); windows are DMA'd.
    w2_ref:  (1, 3, 768, 64) this stem's subpixel weights.
    u7_ref:  (1, 2, 4, 128, 64) this stem's up7 parity-mix weights.
    scal_ref:(1, 1, 80) f32 this stem's scalar table.
    rowm_ref:(1, 1, TT+4, 1) f32 0/1 row validity (y6 halo rows).
    qm_ref:  (1, nqc//4+1, 1, 64) f32 0/1 per-lane quad validity.
    out_ref: (1, nqc//4, TT, 128) packed mask tile,
             lane L = 64q + 2*(8*ko + w) + co.
    xbuf:    VMEM scratch (nqc + 8, ROWS_DMA, 128).
    """
    b = pl.program_id(0)
    t = pl.program_id(1)
    f = pl.program_id(2)
    ngo = nqc // QUAD  # output groups (4 quads = 32 full-res cols each)
    ngy = ngo + 1  # y6 groups computed (quads [-2, nqc+2) in groups of 4)
    th = ROWS_DMA  # input rows held (incl. alignment padding)
    ty = TT + 4  # y6 rows (+-2 halo at half resolution)

    dma = pltpu.make_async_copy(
        xq_ref.at[b, pl.ds(f * nqc, nqc + 8), pl.ds(t * TT, th), :],
        xbuf,
        sem,
    )
    dma.start()
    dma.wait()
    # x local quad L <-> global quad f*nqc - QHALO + L.
    x4 = xbuf[:].reshape(ngy + 1, QUAD, th, 128)

    # --- up6: 6-quad window im2col via group slices, 3 row-tap matmuls -----
    # y6 group m0 covers global quads F0-2+4m0+(0..3); window piece i
    # (0..5) is local quad 4m0 + i = x4[m0 + i//4, i%4].
    xc = jnp.concatenate(
        [x4[0:ngy, 0], x4[0:ngy, 1], x4[0:ngy, 2], x4[0:ngy, 3],
         x4[1 : ngy + 1, 0], x4[1 : ngy + 1, 1]],
        axis=-1,
    )  # (ngy, th, 768)
    # Row tap a reads operand rows [a, a + ty): slicing the bf16 OPERAND
    # (an address offset on the matmul M axis) replaces the misaligned f32
    # product slice-adds (same rewrite as kernels/tail.py, round 5).
    acc = None
    for a in range(3):
        op = xc[:, a : a + ty].reshape(ngy * ty, 6 * 128)
        za = jnp.dot(op, w2_ref[0, a], preferred_element_type=jnp.float32)
        acc = za if acc is None else acc + za
    acc = acc.reshape(ngy, ty, 64)

    # Epilogue: act BEFORE batch norm (spleeter.c:244-245); cout = 1 so the
    # bias/BN terms are scalars shared by all parities.
    z = acc + scal_ref[0, 0:1, _SCAL_B6 : _SCAL_B6 + 1]
    z = _elu_f32(z) if act == "elu" else jnp.maximum(z, 0.0)
    y6 = (
        scal_ref[0, 0:1, _SCAL_BNS : _SCAL_BNS + 1] * z
        + scal_ref[0, 0:1, _SCAL_BNH : _SCAL_BNH + 1]
    )
    y6 = (y6 * rowm_ref[0] * qm_ref[0]).astype(x4.dtype)  # domain masks

    # --- up7: 8 parity-mix matmuls; window = two adjacent y6 groups --------
    yc = jnp.concatenate([y6[0:ngo], y6[1:ngy]], axis=-1)  # (ngo, ty, 128)
    b7l = scal_ref[0, 0:1, _SCAL_B7L : _SCAL_B7L + 64]
    for q in range(2):
        oq = None
        for a in range(4):
            # Output row u reads y6 row u + a - 2 + q (local u + a + q):
            # slice the operand rows per (q, a) term.
            op = yc[:, a + q : a + q + TT].reshape(ngo * TT, 128)
            zqa = jnp.dot(
                op, u7_ref[0, q, a], preferred_element_type=jnp.float32
            )
            oq = zqa if oq is None else oq + zqa
        oq = oq.reshape(ngo, TT, 64)
        # Lane L = 64q + n; halves stored separately (a lane concat of the
        # offset-layout slice results does not lower in Mosaic).
        out_ref[0, :, :, 64 * q : 64 * q + 64] = jax.nn.sigmoid(oq + b7l)


# Tiling note: output full-res rows [G, G + 2*TT), G = 2*t*TT. Row 2u+q
# reads plane rows 2u+q + 2a-3 for a in 0..3; since the offsets are odd the
# plane row parity is 1-q, i.e. y6 row u' = u + a - 2 + q. Over u in
# [t*TT, t*TT + TT) that spans u' in [t*TT - 2, t*TT + TT + 2): ty = TT+4
# rows, which read up6-input rows u'-1..u'+1 = [t*TT - 3, t*TT + TT + 3)
# (HALO = 3). Columns: output group m0 (quads 4m0..4m0+3 of the chunk)
# reads plane columns spanning quads 4m0-1..4m0+4, i.e. y6 locals
# 4m0+1..4m0+6 (base -2), covered by y6 groups m0 and m0+1; those y6 quads
# read input quads one further out (local 4m0..4m0+5, QHALO = 3). Host-side
# zero padding at the global edges reproduces up6/up7's TF-SAME zero
# padding there (after the domain masks re-zero the epilogue constant).


def _pack_head_weights(packed: jax.Array, dtype) -> jax.Array:
    """(3,3,32,4) subpixel kernel -> (3, 768, 64) group matmul weights.

    Output column cc = 4k + j' (within the 16-col group) at parity p taps
    window column W = cc + b - 1 + 4 (the window starts one quad early),
    i.e. im2col lane 128*(W//4) + 32*(W%4) + c, against packed[a, b, c, p];
    the N axis is 4*cc + p.
    """
    w2 = jnp.zeros((3, 6 * 128, 64), dtype)
    for cc in range(16):
        for b in range(3):
            w = cc + b + 3
            g, j = w // 4, w % 4
            w2 = w2.at[
                :, 128 * g + 32 * j : 128 * g + 32 * j + 32,
                4 * cc : 4 * cc + 4,
            ].set(packed[:, b].astype(dtype))
    return w2


def _pack_up7_weights(w7: jax.Array, dtype) -> jax.Array:
    """(4,4,1,2) dilated kernel -> (2, 4, 128, 64) parity-mix weights.

    For output row parity q, group column c32 = 8*ko + w, channel co, tap
    (a, b): s = w + 2b - 3 selects input quad ko + (s+8)//8 - 1 (local
    y6 index ko + (s+8)//8 + 1 over the two-group window) and y6 lane
    4*(s%8//2) + 2*(1-q) + s%2; the N axis is 2*c32 + co.
    """
    sel = _up7_selection()
    return (
        jnp.einsum(
            "qakcb,abo->qakco",
            jnp.asarray(sel),
            w7[:, :, 0, :].astype(jnp.float32),
        )
        .reshape(2, 4, 128, 64)
        .astype(dtype)
    )


@functools.cache
def _up7_selection() -> np.ndarray:
    """Static 0/1 tensor mapping w7 taps into (q, a, K, c32, b) slots."""
    sel = np.zeros((2, 4, 128, 32, 4), np.float32)
    for q in range(2):
        for c32 in range(32):
            ko, w = c32 // 8, c32 % 8
            for a in range(4):
                for b in range(4):
                    s = w + 2 * b - 3
                    gq, wpp = (s + 8) // 8, s % 8
                    lq = ko + gq + 1  # y6 local quad over the 2-group window
                    lane = (
                        64 * (lq // 4)
                        + 16 * (lq % 4)
                        + 4 * (wpp // 2)
                        + 2 * (1 - q)
                        + (wpp % 2)
                    )
                    sel[q, a, lane, c32, b] = 1.0
    return sel


def _chunk_quads(nq: int) -> int:
    """Largest 4-aligned divisor of nq that is <= MAX_NQC."""
    for c in range(min(nq, MAX_NQC), 0, -4):
        if c % 4 == 0 and nq % c == 0:
            return c
    raise ValueError(f"nq={nq} has no 4-aligned chunk")


def _scal_table(b6, bns, bnh, b7) -> jax.Array:
    scal = jnp.zeros((_SCAL_LEN,), jnp.float32)
    scal = scal.at[_SCAL_B6].set(b6.astype(jnp.float32)[0])
    scal = scal.at[_SCAL_BNS].set(bns.astype(jnp.float32)[0])
    scal = scal.at[_SCAL_BNH].set(bnh.astype(jnp.float32)[0])
    scal = scal.at[_SCAL_B7L : _SCAL_B7L + 64].set(
        jnp.tile(b7.astype(jnp.float32), 32)  # b7[n % 2] over packed lanes
    )
    return scal.reshape(1, _SCAL_LEN)


@functools.partial(jax.jit, static_argnames=("act", "n_stems"))
def mask_head_pallas(
    x: jax.Array,  # (S*B, T2, F2, 32) = concat([conv1 skip, up5 out], lanes)
    w6: jax.Array,  # (S, 5, 5, 32, 1) per-stem up6 transposed-conv kernels
    b6: jax.Array,  # (S, 1)
    bn_scale6: jax.Array,  # (S, 1)
    bn_shift6: jax.Array,  # (S, 1)
    w7: jax.Array,  # (S, 4, 4, 1, 2) per-stem final dilated conv kernels
    b7: jax.Array,  # (S, 2)
    act: str = "elu",
    n_stems: int = 1,
) -> jax.Array:
    """-> mask (S*B, 2, 2*T2, 2*F2) f32 (channel-first).

    Batch rows [s*B, (s+1)*B) use stem s's weights.
    """
    from spleeterrt_tpu.core.model import _pack_tconv_kernel

    sb, t2, f2, cin = x.shape
    if cin != 32 or f2 % (4 * QUAD) or t2 % TT or sb % n_stems:
        raise ValueError(f"unsupported head shape {x.shape}")
    bper = sb // n_stems
    nt = t2 // TT
    nq = f2 // QUAD
    nqc = _chunk_quads(nq)
    nf = nq // nqc
    ngo = nqc // QUAD
    ngy = ngo + 1
    ty = TT + 4

    w2 = jax.vmap(
        lambda w: _pack_head_weights(_pack_tconv_kernel(w.astype(x.dtype)), x.dtype)
    )(w6)
    u7 = jax.vmap(lambda w: _pack_up7_weights(w, x.dtype))(w7)
    scal = jax.vmap(_scal_table)(b6, bn_scale6, bn_shift6, b7)

    g = TT * np.arange(nt)[:, None] - 2 + np.arange(ty)[None, :]
    rowm = jnp.asarray(
        ((g >= 0) & (g < t2)).astype(np.float32).reshape(nt, 1, ty, 1)
    )
    # Per-lane quad validity of y6 group m0: lane 16k + l' holds global
    # quad f*nqc - 2 + 4*m0 + k.
    gq = (
        nqc * np.arange(nf)[:, None, None]
        - 2
        + 4 * np.arange(ngy)[None, :, None]
        + (np.arange(64) // 16)[None, None, :]
    )
    qm = jnp.asarray(
        ((gq >= 0) & (gq < nq)).astype(np.float32).reshape(nf, ngy, 1, 64)
    )

    # Host-side prep (cheap fused pads; the lane repack (F2, 32)->(nq, 128)
    # is a pure reshape): rows padded by HALO (+DMA alignment), quads by
    # QHALO (+2 right, for the in-kernel group reshape), quads moved to the
    # leading axis for the kernel's leading-axis im2col slices.
    # The lane repack (F2, 32) -> (nq, 128) is a free bitcast reshape, and
    # both halo pads fuse into ONE pass (two separate pads measured ~10 ms
    # at the 300 s 4-stem workload); the quads-to-leading transpose stays
    # host-side (doing it per-step in VMEM measured ~3x more expensive).
    xq = jnp.pad(
        x.reshape(sb, t2, nq, QUAD * cin),
        ((0, 0), (HALO, ROWS_DMA - TT - HALO), (QHALO, QHALO + 2), (0, 0)),
    ).transpose(0, 2, 1, 3)  # (SB, nq + 8, T2 + ROWS_DMA - TT, 128)

    out = pl.pallas_call(
        functools.partial(_head_kernel, act=act, nqc=nqc),
        out_shape=jax.ShapeDtypeStruct((sb, nq // QUAD, t2, 128), jnp.float32),
        grid=(sb, nt, nf),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # DMA'd manually
            pl.BlockSpec(
                (1, 3, 6 * 128, 64), lambda b, t, f: (b // bper, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 2, 4, 128, 64), lambda b, t, f: (b // bper, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, _SCAL_LEN), lambda b, t, f: (b // bper, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, ty, 1), lambda b, t, f: (t, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, ngy, 1, 64), lambda b, t, f: (f, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, ngo, TT, 128), lambda b, t, f: (b, f, t, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((nqc + 8, ROWS_DMA, QUAD * 32), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )(xq, w2, u7, scal, rowm, qm)

    # Unpack lane L = 64q + 2*c32 + co of group m0, row u to
    # (co, 2u+q, 32*m0 + c32): one XLA transpose pass.
    out = out.reshape(sb, nq // QUAD, t2, 2, 32, 2).transpose(0, 5, 2, 3, 1, 4)
    return out.reshape(sb, 2, 2 * t2, 2 * f2)
