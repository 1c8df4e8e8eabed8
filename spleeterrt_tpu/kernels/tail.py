"""Pallas TPU kernels: quad-packed U-Net decoder tail (up4 + up5 + head).

Round-3's fused kernels lost to XLA at the production batch because their
inputs/outputs crossed an XLA<->packed-layout boundary (the host pack of
the head input alone measured ~10.7 ms at S*B = 204) and their manual
DMA chains serialized fetch against compute. This module keeps the whole
decoder tail in ONE packed layout:

    skip3/up3out (PK64) --up4--> PK32 --up5--> PK16 --head--> packed mask

with skip2/skip1 (from kernels/encoder.py's packed chain) consumed
directly, the decoder concats expressed as split-K matmul pairs (K rows
for the skip source + K rows for the upsampled source -- a concat feeding
a matmul is just a sum of two matmuls), and every input fetched through
an overlapping Element-indexed BlockSpec so the standard Pallas pipeline
double-buffers it (kernels/blockspec.py).

Layouts. PK(C) packs (B, T, F, C) as (B, F*C//128, T, 128) with
lane = j*C + c over g = 128//C frequency columns per quad, quads on the
LEADING (untiled) axis (same convention as kernels/encoder.py). Every
up-layer halves C and doubles (T, F), so the quad count nq = F*C/128 is
INVARIANT down the tail (96 at the VST config) and output quad q always
covers the same frequency span as input quad q.

up4/up5 (5x5 stride-2 transposed convs, Executable/spleeter.c:239-288) run
in subpixel form (core/model.py::_pack_tconv_kernel): a 3x3 stride-1 conv
whose 4 output channels per Cout are the (dp, dq) output parities. Per
output quad the 3-column window spans 3 input quads (inputs host-padded by
one zero quad per side), so each row tap is one K = 3*128 matmul per
source with the column selection folded into zero-structured weights; the
three row taps accumulate into per-tap accumulators and are combined by
three sublane shifts at the end (per-matmul shifted adds measured ~3x the
kernels' matmul floor in round-3 -- misaligned sublane slices are VMEM
relayouts). N = 256 = [dp, (2*col + dq), cout] lanes; the row-parity
halves are interleaved in VMEM (one sublane relayout) so the output is a
plain PK(Cout) tensor at doubled resolution.

The head (up6 + up7 + sigmoid, Executable/spleeter.c:239-301) reuses the
round-3 mask_head.py compute structure (y6 in 16-column groups x 4
subpixel parities on 64 lanes; up7 as 8 parity-mix matmuls; identical
output layout) but replaces its XLA-side input pack with two PK16 sources
(skip1, up5out) read through 4-quad Element windows and split-K weights.

Parity: tests/test_tail.py (interpret mode vs the canonical XLA layers).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spleeterrt_tpu.kernels.blockspec import element_window
from spleeterrt_tpu.kernels import mask_head
from spleeterrt_tpu.kernels.encoder import _round8

# Per-step VMEM budget for up_shallow in quad-rows (quads x padded rows):
# the step holds two Element-windowed sources, two 384-lane im2col
# operands, and three f32 256-lane accumulators, so the cap is tighter
# than the encoder kernels'.
UP_QUAD_ROWS = 1024
# Head grid constants are mask_head's (TT, HALO, ROWS_DMA, QUAD).


def _act_f32(z: jax.Array, act: str) -> jax.Array:
    if act == "elu":
        safe = jnp.maximum(z, -15.0)
        return jnp.where(z >= 0, z, jnp.where(z < -15.0, -1.0, jnp.exp(safe) - 1.0))
    if act == "relu":
        return jnp.maximum(z, 0.0)
    raise ValueError(act)


# ---------------------------------------------------------------------------
# Host-side packing helpers
# ---------------------------------------------------------------------------


def pad_pk(x: jax.Array, row_pad: tuple[int, int] | None = None) -> jax.Array:
    """(SB, nq, t, 128) -> (SB, nq + 2, rows, 128): one zero window quad per
    side; rows get `row_pad` (default: 1 on top -- the 3x3 subpixel row
    halo -- and zeros to the 8-row DMA alignment below)."""
    t = x.shape[2]
    if row_pad is None:
        row_pad = (1, _round8(t + 2) - t - 1)
    return jnp.pad(x, ((0, 0), (1, 1), row_pad, (0, 0)))


def pad_pk_head(x: jax.Array) -> jax.Array:
    """Head-source padding: TWO window quads per side (y6 groups start 8
    half-res columns before their output group, mask_head tiling note),
    HALO rows on top and zeros to cover the last time-chunk's DMA window
    below."""
    t = x.shape[2]  # t2 (half-resolution rows)
    nt = t // mask_head.TT
    rows_total = (nt - 1) * mask_head.TT + mask_head.ROWS_DMA
    return jnp.pad(
        x, ((0, 0), (2, 2), (mask_head.HALO, rows_total - t - mask_head.HALO),
            (0, 0))
    )


def quad_pack_nhwc(x: jax.Array, c: int) -> jax.Array:
    """(B, T, F, C) -> PK(C) (B, F*C//128, T, 128)."""
    b, t, f, cc = x.shape
    assert cc == c and (f * c) % 128 == 0
    g = 128 // c
    return x.reshape(b, t, f // g, 128).transpose(0, 2, 1, 3)


# ---------------------------------------------------------------------------
# up4/up5: subpixel transposed conv over two packed sources
# ---------------------------------------------------------------------------


@functools.cache
def _up_sel_pair() -> np.ndarray:
    """g=2 (up4): 0/1 (wq=2, j=2, p=2, b=3) over the EXACT 4-column window
    held by the half-shifted quad pair (sh[q], sh[q+1]) = columns
    [2q-1, 2q+2]: local column lc = p + b -> (wq, j) = (lc//2, lc%2)."""
    sel = np.zeros((2, 2, 2, 3), np.float32)
    for p in range(2):
        for b in range(3):
            lc = p + b
            sel[lc // 2, lc % 2, p, b] = 1.0
    return sel


@functools.cache
def _up_sel_quad() -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """g=4 (up5): selections for the three exact-window operands.

    op0 (aligned quad, columns 4q..4q+3) serves output columns p in {1, 2}
    (window p-1+b); sh0 (half-shifted, columns 4q-2..4q+1) serves p = 0
    (local column 1+b); sh1 (= sh0 shifted one quad, columns 4q+2..4q+5)
    serves p = 3 (local column b).
    """
    s0 = np.zeros((4, 2, 3), np.float32)  # (j, p-1, b)
    for p2 in range(2):
        for b in range(3):
            s0[p2 + b, p2, b] = 1.0
    sm = np.zeros((4, 3), np.float32)
    sp = np.zeros((4, 3), np.float32)
    for b in range(3):
        sm[1 + b, b] = 1.0
        sp[b, b] = 1.0
    return s0, sm, sp


def _pack_w_up(w5: jax.Array, cin: int, dtype):
    """(5,5,Cin,Cout) transposed-conv kernel -> per-row-tap exact-window
    matmul weights for one source half.

    g = 2 (up4): one (3, 256, 256) table over the sh-pair window (K row =
    wq*128 + j*cin + ci; N = dp*128 + (2p + dq)*cout + co).
    g = 4 (up5): a ((3, 128, 128), (3, 128, 64), (3, 128, 64)) triple for
    (op0 -> p in {1,2}: N = dp*64 + (p-1)*2*cout + dq*cout + co;
     sh0 -> p = 0 and sh1 -> p = 3: N = dp*32 + dq*cout + co).
    """
    from spleeterrt_tpu.core.model import _pack_tconv_kernel

    g = 128 // cin
    cout = w5.shape[-1]
    pk = _pack_tconv_kernel(w5.astype(jnp.float32))  # (3, 3, cin, 4*cout)
    if g == 2:
        sel = jnp.asarray(_up_sel_pair())
        w = jnp.einsum("wjpb,abcP->awjcpP", sel, pk)
        w = w.reshape(3, 2, 2, cin, 2, 2, 2, cout)
        w = w.transpose(0, 1, 2, 3, 5, 4, 6, 7)  # (a,wq,j,ci,dp,p,dq,co)
        return (w.reshape(3, 2 * 128, 256).astype(dtype),)
    if g != 4:
        raise ValueError(f"unsupported source channel count {cin}")
    s0, sm, sp = (jnp.asarray(s) for s in _up_sel_quad())
    w0 = jnp.einsum("jpb,abcP->ajcpP", s0, pk)  # (a, j, ci, p2, 4cout)
    w0 = w0.reshape(3, 4, cin, 2, 2, 2, cout)
    w0 = w0.transpose(0, 1, 2, 4, 3, 5, 6)  # (a, j, ci, dp, p2, dq, co)
    w0 = w0.reshape(3, 128, 128)
    wm = jnp.einsum("jb,abcP->ajcP", sm, pk).reshape(3, 4, cin, 2, 2, cout)
    wm = wm.reshape(3, 128, 64)
    wp = jnp.einsum("jb,abcP->ajcP", sp, pk).reshape(3, 4, cin, 2, 2, cout)
    wp = wp.reshape(3, 128, 64)
    return (
        w0.astype(dtype), wm.astype(dtype), wp.astype(dtype),
    )


def _up_epilogue(b: jax.Array, bns: jax.Array, bnh: jax.Array) -> jax.Array:
    """(3, 256) f32 lane table: bias / bn_scale / bn_shift at lane % cout."""
    cout = b.shape[0]
    reps = 256 // cout
    return jnp.stack(
        [
            jnp.tile(b.astype(jnp.float32), reps),
            jnp.tile(bns.astype(jnp.float32), reps),
            jnp.tile(bnh.astype(jnp.float32), reps),
        ]
    )


def _up_finish(acc, epi_ref, out_ref, act, nqc, t_in):
    """Decoder epilogue (activation BEFORE batch norm, spleeter.c:244-245)
    + row-parity interleave (lanes [0:128) even rows, [128:256) odd; the
    stack + reshape is one sublane relayout)."""
    z = acc + epi_ref[0, 0:1]
    y = epi_ref[0, 1:2] * _act_f32(z, act) + epi_ref[0, 2:3]
    y2 = jnp.stack([y[..., :128], y[..., 128:]], axis=2)
    out_ref[0] = y2.reshape(nqc, 2 * t_in, 128).astype(out_ref.dtype)


def _sh_operand(x, n):
    """Half-quad-shifted operand: sh[i] = [x[i][64:] | x[i+1][:64]] for
    i in [0, n) -- the 64-lane slices and concat are vreg-half aligned."""
    return jnp.concatenate([x[0:n, :, 64:], x[1 : n + 1, :, :64]], axis=-1)


def _up_kernel_pair(a_ref, b_ref, wa_ref, wb_ref, epi_ref, out_ref,
                    *, act: str, nqc: int, t_in: int):
    """g = 2 (up4) step: exact 4-column windows via sh-operand pairs.

    a_ref/b_ref: (1, nqc + 2, round8(t_in + 2), 128) packed skip / prev
        windows (pad_pk layout), Element-fetched with 1-quad overlap.
    wa/wb: (1, 3, 256, 256) per-stem exact-window weights per source.
    epi_ref: (1, 3, 256) f32 epilogue lane table.
    out_ref: (1, nqc, 2*t_in, 128) PK(cout) output, rows interleaved.
    """
    def xc(x):
        sh = _sh_operand(x, nqc + 1)
        return jnp.concatenate([sh[0:nqc], sh[1 : nqc + 1]], axis=-1)

    xca = xc(a_ref[0])  # (nqc, tp, 256)
    xcb = xc(b_ref[0])
    # Row-tap a reads operand rows [a, a + t_in): slicing the bf16 OPERAND
    # (matmul M rows are address-offset, not vreg-realigned) replaces the
    # round-4 form's three misaligned f32 accumulator slice-adds, and every
    # matmul shrinks from M = nqc*tp to the exact nqc*t_in.
    acc = None
    for a in range(3):
        opa = xca[:, a : a + t_in].reshape(nqc * t_in, 256)
        opb = xcb[:, a : a + t_in].reshape(nqc * t_in, 256)
        z = jnp.dot(opa, wa_ref[0, a], preferred_element_type=jnp.float32)
        z = z + jnp.dot(opb, wb_ref[0, a], preferred_element_type=jnp.float32)
        acc = z if acc is None else acc + z
    acc = acc.reshape(nqc, t_in, 256)
    _up_finish(acc, epi_ref, out_ref, act, nqc, t_in)


def _up_kernel_quad(a_ref, b_ref, wa0_ref, wam_ref, wap_ref, wb0_ref,
                    wbm_ref, wbp_ref, epi_ref, out_ref,
                    *, act: str, nqc: int, t_in: int):
    """g = 4 (up5) step: three exact-window K = 128 operands per source
    (aligned quad for output columns {1, 2}; half-shifted sh / sh+1 for
    columns 0 / 3), pieces assembled into (dp, p, dq, co) lane order once.
    """
    xa = a_ref[0]
    xb = b_ref[0]
    sha = _sh_operand(xa, nqc + 1)
    shb = _sh_operand(xb, nqc + 1)
    ops = [
        (xa[1 : nqc + 1], wa0_ref, xb[1 : nqc + 1], wb0_ref),
        (sha[0:nqc], wam_ref, shb[0:nqc], wbm_ref),
        (sha[1 : nqc + 1], wap_ref, shb[1 : nqc + 1], wbp_ref),
    ]
    pieces = []
    for xo_a, w_a, xo_b, w_b in ops:
        # Per-tap operand row slices instead of misaligned f32 accumulator
        # slice-adds (see _up_kernel_pair).
        acc = None
        for a in range(3):
            opa = xo_a[:, a : a + t_in].reshape(nqc * t_in, 128)
            opb = xo_b[:, a : a + t_in].reshape(nqc * t_in, 128)
            z = jnp.dot(opa, w_a[0, a], preferred_element_type=jnp.float32)
            z = z + jnp.dot(opb, w_b[0, a], preferred_element_type=jnp.float32)
            acc = z if acc is None else acc + z
        pieces.append(acc.reshape(nqc, t_in, acc.shape[-1]))
    p12, p0, p3 = pieces  # N orders: (dp,p2,dq,co)128 / (dp,dq,co)64 x2
    acc = jnp.concatenate(
        [
            p0[..., :32], p12[..., :64], p3[..., :32],
            p0[..., 32:], p12[..., 64:], p3[..., 32:],
        ],
        axis=-1,
    )  # (nqc, t_in, 256) in (dp, p, dq, co) order
    _up_finish(acc, epi_ref, out_ref, act, nqc, t_in)


def up_shallow(
    skip_pk: jax.Array,  # (SB, nq + 2, rows, 128) pad_pk'd PK(cin)
    prev_pk: jax.Array,  # same layout/shape
    w_skip: tuple,  # _pack_w_up tuple for the skip K-half (leading S each)
    w_prev: tuple,  # same for the upsampled half
    epi: jax.Array,  # (S, 3, 256)
    *,
    t_in: int,
    act: str,
    out_dtype,
) -> jax.Array:
    """-> (SB, nq, 2*t_in, 128) PK(cout) at doubled resolution."""
    sb, nq2, rows, _ = skip_pk.shape
    nq = nq2 - 2
    n_stems = w_skip[0].shape[0]
    bper = sb // n_stems
    cap = max(1, UP_QUAD_ROWS // rows)
    nqc = 1
    for c in range(min(nq, cap), 0, -1):
        if nq % c == 0:
            nqc = c
            break
    nf = nq // nqc

    src_spec = element_window(
        (1, nqc + 2, rows, 128), lambda b, f: (b, f * nqc, 0, 0),
        memory_space=pltpu.VMEM,
    )

    def w_spec(w):
        shape = (1,) + w.shape[1:]
        return pl.BlockSpec(
            shape, lambda b, f: (b // bper,) + (0,) * (len(shape) - 1),
            memory_space=pltpu.VMEM,
        )

    kernel = _up_kernel_pair if len(w_skip) == 1 else _up_kernel_quad
    weights = list(w_skip) + list(w_prev)
    return pl.pallas_call(
        functools.partial(kernel, act=act, nqc=nqc, t_in=t_in),
        out_shape=jax.ShapeDtypeStruct((sb, nq, 2 * t_in, 128), out_dtype),
        grid=(sb, nf),
        in_specs=[src_spec, src_spec]
        + [w_spec(w) for w in weights]
        + [
            pl.BlockSpec(
                (1, 3, 256), lambda b, f: (b // bper, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, nqc, 2 * t_in, 128), lambda b, f: (b, f, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )(skip_pk, prev_pk, *weights, epi)


# ---------------------------------------------------------------------------
# Head (up6 + up7 + sigmoid) over two PK16 sources
# ---------------------------------------------------------------------------


@functools.cache
def _head_selection() -> np.ndarray:
    """0/1 (wq=4, j=8, cc=16, b=3): output col cc of a 16-col group, col
    tap b -> window quad wq, in-quad col j over the 4-quad window of
    1-quad-left-padded PK16 (window col cc - 1 + b + 8)."""
    sel = np.zeros((4, 8, 16, 3), np.float32)
    for cc in range(16):
        for b in range(3):
            lc = cc - 1 + b + 8
            sel[lc // 8, lc % 8, cc, b] = 1.0
    return sel


def _pack_w_head6(w6: jax.Array, k_half: slice, dtype) -> jax.Array:
    """up6 kernel (5,5,32,1) -> (3, 512, 64) split-K window weights for one
    16-channel source half (k_half selects the skip [0:16) or prev [16:32)
    rows of the subpixel kernel). N col = 4*cc + parity (mask_head order).
    """
    from spleeterrt_tpu.core.model import _pack_tconv_kernel

    pk = _pack_tconv_kernel(w6.astype(jnp.float32))[:, :, k_half, :]  # (3,3,16,4)
    sel = jnp.asarray(_head_selection())
    w = jnp.einsum("wjcb,abip->awjicp", sel, pk)  # (a, wq, j, ci, cc, p)
    return w.reshape(3, 4 * 128, 64).astype(dtype)


def _head_kernel(s1_ref, s5_ref, wa_ref, wb_ref, u7_ref, scal_ref, rowm_ref,
                 qm_ref, out_ref, *, act: str, nqc: int):
    """One (stem*batch, time-tile, frequency-chunk) step.

    s1_ref/s5_ref: (1, nqc + 4, ROWS_DMA, 128) PK16 skip1 / up5out windows
        (pad_pk_head layout), Element-fetched (quad overlap 4, row overlap
        ROWS_DMA - TT).
    wa/wb: (1, 3, 512, 64) split-K up6 weights (skip / prev halves).
    u7_ref: (1, 2, 4, 128, 64) parity-mix up7 weights (mask_head).
    scal_ref: (1, 1, 80) f32 scalar table (mask_head layout).
    rowm/qm: y6 domain-validity masks (mask_head).
    out_ref: (1, nqc//2//4? ...) -- (1, ngo, TT, 128) packed mask tile,
        identical to mask_head's output layout.
    """
    TT = mask_head.TT
    th = mask_head.ROWS_DMA
    ngo = nqc // 2  # output groups: 16 half-res cols = 2 PK16 quads
    ngy = ngo + 1  # y6 groups incl. the +1 halo group
    ty = TT + 4

    xa = s1_ref[0]
    xb = s5_ref[0]

    # 4-quad window im2col: y6 group m reads padded quads [2m, 2m + 4).
    # Quad pairs via a free leading reshape (strided leading-axis slices
    # lower to an unsupported gather in Mosaic).
    def xc(x):
        x4 = x.reshape((nqc + 4) // 2, 2, th, 128)
        return jnp.concatenate(
            [x4[0:ngy, 0], x4[0:ngy, 1], x4[1 : ngy + 1, 0], x4[1 : ngy + 1, 1]],
            axis=-1,
        )  # (ngy, th, 512)

    xca = xc(xa)
    xcb = xc(xb)

    # Per-tap operand row slices instead of misaligned f32 accumulator
    # slice-adds (see _up_kernel_pair); M shrinks from ngy*th to ngy*ty.
    acc = None
    for a in range(3):
        opa = xca[:, a : a + ty].reshape(ngy * ty, 512)
        opb = xcb[:, a : a + ty].reshape(ngy * ty, 512)
        z = jnp.dot(opa, wa_ref[0, a], preferred_element_type=jnp.float32)
        z = z + jnp.dot(opb, wb_ref[0, a], preferred_element_type=jnp.float32)
        acc = z if acc is None else acc + z
    acc = acc.reshape(ngy, ty, 64)

    # Epilogue: act BEFORE batch norm; cout = 1 so bias/BN are scalars.
    z = acc + scal_ref[0, 0:1, 0:1]
    z = _act_f32(z, act)
    y6 = scal_ref[0, 0:1, 1:2] * z + scal_ref[0, 0:1, 2:3]
    y6 = (y6 * rowm_ref[0] * qm_ref[0]).astype(xa.dtype)

    # up7 parity-mix stage (mask_head compute structure): each (q, a) term
    # reads y6 rows [a + q, a + q + TT) -- slice the bf16 operand per term
    # (address-offset M rows) instead of slicing the f32 product.
    yc = jnp.concatenate([y6[0:ngo], y6[1:ngy]], axis=-1)  # (ngo, ty, 128)
    b7l = scal_ref[0, 0:1, mask_head._SCAL_B7L : mask_head._SCAL_B7L + 64]
    for q in range(2):
        oq = None
        for a in range(4):
            op = yc[:, a + q : a + q + TT].reshape(ngo * TT, 128)
            zqa = jnp.dot(
                op, u7_ref[0, q, a], preferred_element_type=jnp.float32
            )
            oq = zqa if oq is None else oq + zqa
        oq = oq.reshape(ngo, TT, 64)
        out_ref[0, :, :, 64 * q : 64 * q + 64] = jax.nn.sigmoid(oq + b7l)


def head_packed(
    skip1_pk: jax.Array,  # (SB, nq + 2, rows, 128) pad_pk_head'd PK16
    up5_pk: jax.Array,  # same
    w6: jax.Array,  # (S, 5, 5, 32, 1)
    b6: jax.Array, bn_scale6: jax.Array, bn_shift6: jax.Array,  # (S, 1)
    w7: jax.Array,  # (S, 4, 4, 1, 2)
    b7: jax.Array,  # (S, 2)
    *,
    t2: int,
    act: str,
    compute_dtype,
) -> jax.Array:
    """-> (SB, nq//8, t2*... ) packed mask in mask_head's output layout:
    (SB, n_full_quads, 2*t2, 128) with lane L = 64q + 2*c32 + co; unpack
    with `unpack_mask` below."""
    TT = mask_head.TT
    sb, nq4, rows, _ = skip1_pk.shape
    nq = nq4 - 4  # PK16 quads = f2/8
    f2 = nq * 8
    n_stems = w6.shape[0]
    bper = sb // n_stems
    nt = t2 // TT
    ngo_total = f2 // 16  # 16-col output groups
    # PK16 quads per step: even divisor of nq (MAX_NQC 32ch-quads = 4-col
    # units -> /2 for 8-col PK16 quads).
    nqc = 2
    for c in range(min(nq, mask_head.MAX_NQC // 2), 1, -2):
        if nq % c == 0:
            nqc = c
            break
    nf = nq // nqc
    ngo = nqc // 2
    ngy = ngo + 1
    ty = TT + 4
    dtype = jnp.dtype(compute_dtype)

    wa = jax.vmap(lambda w: _pack_w_head6(w, slice(0, 16), dtype))(w6)
    wb = jax.vmap(lambda w: _pack_w_head6(w, slice(16, 32), dtype))(w6)
    u7 = jax.vmap(lambda w: mask_head._pack_up7_weights(w, dtype))(w7)
    scal = jax.vmap(mask_head._scal_table)(b6, bn_scale6, bn_shift6, b7)

    g = TT * np.arange(nt)[:, None] - 2 + np.arange(ty)[None, :]
    rowm = jnp.asarray(
        ((g >= 0) & (g < t2)).astype(np.float32).reshape(nt, 1, ty, 1)
    )
    gq = (
        nqc * 2 * np.arange(nf)[:, None, None]
        - 2
        + 4 * np.arange(ngy)[None, :, None]
        + (np.arange(64) // 16)[None, None, :]
    )
    qm = jnp.asarray(
        ((gq >= 0) & (gq < f2 // 4)).astype(np.float32).reshape(nf, ngy, 1, 64)
    )

    src_spec = element_window(
        (1, nqc + 4, mask_head.ROWS_DMA, 128),
        lambda b, t, f: (b, f * nqc, t * TT, 0),
        memory_space=pltpu.VMEM,
    )
    out = pl.pallas_call(
        functools.partial(_head_kernel, act=act, nqc=nqc),
        out_shape=jax.ShapeDtypeStruct(
            (sb, ngo_total, t2, 128), jnp.float32
        ),
        grid=(sb, nt, nf),
        in_specs=[
            src_spec, src_spec,
            pl.BlockSpec(
                (1, 3, 512, 64), lambda b, t, f: (b // bper, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 3, 512, 64), lambda b, t, f: (b // bper, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 2, 4, 128, 64), lambda b, t, f: (b // bper, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, mask_head._SCAL_LEN), lambda b, t, f: (b // bper, 0, 0),
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
    )(skip1_pk, up5_pk, wa, wb, u7, scal, rowm, qm)
    return out


def unpack_mask(out: jax.Array, t2: int, f2: int) -> jax.Array:
    """Packed head output -> NHWC (SB, 2*t2, 2*f2, 2) masks (one XLA
    transpose pass; lane L = 64q + 2*c32 + co of group m0, row u maps to
    (co, 2u + q, 32*m0 + c32) -- mask_head's documented layout)."""
    sb = out.shape[0]
    out = out.reshape(sb, f2 // 16, t2, 2, 32, 2)
    # lane L = 64q + 2*c32 + co at (group m0, row u) -> value at time
    # 2u + q, full-res frequency 32*m0 + c32, channel co.
    out = out.transpose(0, 2, 3, 1, 4, 5)  # (sb, t2, q, m0, c32, co)
    return out.reshape(sb, 2 * t2, 2 * f2, 2)


def unpack_mask_cd(
    out: jax.Array, n_stems: int, t2: int, f2: int
) -> jax.Array:
    """Packed head output -> (S, 2ch, nt*2*t2 frames, 64, bin_limit//64)
    masks in kernels/stft_fused.py's compact [c, d] layout (bin =
    c + 64*d). Same single-XLA-transpose cost as unpack_mask: the packed
    lanes/groups map straight onto (c, d) because the head's 32-column
    groups tile the bin axis (bin = 32*m0 + c32 -> c = 32*(m0%2) + c32,
    d = m0//2)."""
    sb, g = out.shape[:2]
    nt = sb // n_stems
    d = g // 2  # = bin_limit // 64
    x = out.reshape(n_stems, nt, d, 2, t2, 2, 32, 2)
    # (S, co, nt, u, q, m0par, c32, d)
    x = x.transpose(0, 7, 1, 4, 5, 3, 6, 2)
    return x.reshape(n_stems, 2, nt * 2 * t2, 64, d)


def unpack_mask_dc_flat(
    out: jax.Array, n_stems: int, t2: int, f2: int
) -> jax.Array:
    """Packed head output -> (S, 2ch, nt*2*t2 frames, d*64) masks in the
    fused iSTFT's FLAT d-major layout (index = d*64 + c; see
    stft_fused.masked_istft4096_cd's `masks_flat` contract).

    Same permute as `unpack_mask_cd` up to the final axis order, but the
    minor axes (d, m0par, c32) stay in source-contiguous order, so the
    transpose WRITES stream in 1536-float contiguous runs instead of
    24-float scattered runs -- measured ~2x faster at the production
    shape; the kernel un-flattens per block in VMEM (cheap, pipelined)."""
    sb, g = out.shape[:2]
    nt = sb // n_stems
    d = g // 2
    x = out.reshape(n_stems, nt, d, 2, t2, 2, 32, 2)
    # (S, co, nt, u, q, d, m0par, c32): flat = 64*d + 32*m0par + c32
    x = x.transpose(0, 7, 1, 4, 5, 2, 3, 6)
    return x.reshape(n_stems, 2, nt * 2 * t2, d * 64)
