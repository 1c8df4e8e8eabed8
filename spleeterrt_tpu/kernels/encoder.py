"""Pallas TPU kernels: fused U-Net encoder front (enc1 + enc2 + enc3).

The channel-poor encoder entry dominates the XLA trunk's device time
(docs/PERF.md): enc1-enc3 put C in {2, 16, 32} on the 128-lane axis, so XLA
pays inter-conv layout transitions plus separate epilogue passes worth ~2x
the conv FLOPs. These kernels compute, per layer,

    skip = conv5x5_s2(x, w) + b          (the pre-activation skip tensor)
    act  = act(bn_scale * skip + bn_shift)

with the convs as MXU matmuls and the epilogue fused in fp32 registers, at a
fixed quad-packed layout shared between the layers so XLA never relayouts
the chain. Reference semantics: Executable/spleeter.c:177-238 (encoder
act(bn*(conv+bias)+shift), pre-activation skips kept for the decoder).

Layout ("quad-packed"): activation (B, T, F, C) is stored (B, nq, T, 128)
with g = 128//C frequency columns per 128-lane quad, lane = j*C + c, and the
quad index on the LEADING (untiled) axis, so the conv's column windows are
leading-axis slices (the mask_head.py trick). Between kernels the tensors
stay packed in HBM; only the tensors that cross back into XLA-land (the
three skips and enc3's activated output) are unpacked, one XLA transpose
each.

Conv decomposition per layer:

- enc1 runs in space-to-depth form (core/model.py::_pack_enc_kernel): a
  stride-1 3x3 conv over (T/2, F/2, 8). Each input quad (16 columns) yields
  one 256-lane pair of output quads reading an 18-column window = two input
  quads: 3 row taps x 2 window quads = 6 matmuls with K = 128, N = 256.
  Row taps are post-matmul sublane slice+adds on host-padded rows.
- enc2/enc3 run the 5x5 stride-2 conv directly. Stride-2 rows: the
  (T, 128) sublane x lane block reshapes to (T/2, 256), splitting even rows
  into lanes [0:128) and odd rows into [128:256) -- a tile-level relayout
  Mosaic lowers natively -- after which the five row taps become stride-1
  offsets on the parity planes (even taps {1,3} at offsets {1,2}, odd taps
  {0,2,4} at {0,1,2}). Stride-2 columns: one output quad advances one input
  quad (qo = qi/2 since Cout = 2*Cin), and the 2*qo+3-column window spans
  input quads [m-1, m+2): 5 row taps x 3 window quads = 15 matmuls with
  K = 128, N = 128.

Padding: the host pads zero rows/quads around the real data (TF-SAME zero
padding); every computed output position is in-domain, so no epilogue
re-masking is needed (unlike mask_head.py, whose up6 epilogue feeds a
second in-kernel conv).

Frequency chunking bounds VMEM: the grid is (S*B, nf) and the overlapping
window chunks are fetched by explicit HBM->VMEM DMA. Stems fold into the
batch grid axis; enc1 reads the stem-SHARED magnitude (input index
b % batch_per_stem) so the spectrogram is not replicated per stem.

Parity: tests/test_encoder.py (interpret mode vs the canonical XLA convs).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spleeterrt_tpu.kernels.blockspec import element_window

# Per-grid-step VMEM budget in quad-rows (quads x input rows). The Mosaic
# stack cost scales with nqc * t_in; 32 quads x 128 rows fits under the
# 16 MB scoped-vmem limit on v5e (48 x 128 hit 17.6 MB, 32 x 256 hit
# 19.4 MB), so the cap scales inversely with the layer's row count. enc1's
# N=256 accumulator doubles its per-quad footprint: half the budget.
MAX_QUAD_ROWS = 32 * 128
MAX_QUAD_ROWS_ENC1 = 16 * 128


def _act_f32(z: jax.Array, act: str) -> jax.Array:
    if act == "elu":
        # Reference ELU with the denormal guard (Executable/spleeter.c:51-56);
        # exp(x)-1 instead of expm1 (no Mosaic lowering), error ~1e-7 abs.
        safe = jnp.maximum(z, -15.0)
        return jnp.where(z >= 0, z, jnp.where(z < -15.0, -1.0, jnp.exp(safe) - 1.0))
    if act == "leaky":
        return jnp.where(z >= 0, z, 0.2 * z)  # spleeter.c:43-46
    raise ValueError(act)


# ---------------------------------------------------------------------------
# Layout helpers (host side, one XLA fusion each)
# ---------------------------------------------------------------------------


def quad_pack(x: jax.Array, c: int) -> jax.Array:
    """(B, T, F, C) -> (B, F*C//128, T, 128), lane = j*C + c."""
    b, t, f, cc = x.shape
    assert cc == c and (f * c) % 128 == 0
    g = 128 // c
    return x.reshape(b, t, f // g, 128).transpose(0, 2, 1, 3)


def quad_unpack(y: jax.Array, c: int) -> jax.Array:
    """(B, nq, T, 128) -> (B, T, nq*(128//C), C)."""
    b, nq, t, _ = y.shape
    g = 128 // c
    return y.transpose(0, 2, 1, 3).reshape(b, t, nq * g, c)


def _epilogue_table(b: jax.Array, bns: jax.Array, bnh: jax.Array, n: int):
    """Per-stem (3, n) f32 lane table: bias / bn_scale / bn_shift at n % Cout."""
    cout = b.shape[0]
    reps = n // cout
    return jnp.stack(
        [
            jnp.tile(b.astype(jnp.float32), reps),
            jnp.tile(bns.astype(jnp.float32), reps),
            jnp.tile(bnh.astype(jnp.float32), reps),
        ]
    )


# ---------------------------------------------------------------------------
# Window-matmul weight packing (static 0/1 scatters folded via einsum)
# ---------------------------------------------------------------------------


@functools.cache
def _enc1_selection() -> np.ndarray:
    """0/1 (wq, j, p, l): output col phase p, col tap l -> window quad wq,
    in-quad column j. Window column p + l (host left-pads one zero col)."""
    sel = np.zeros((2, 16, 16, 3), np.float32)
    for p in range(16):
        for l in range(3):
            lc = p + l
            sel[lc // 16, lc % 16, p, l] = 1.0
    return sel


def _pack_w_enc1(w3: jax.Array, dtype) -> tuple[jax.Array, jax.Array]:
    """s2d kernel (3,3,8,16) -> ((3, 128, 256), (3, 128, 128)):
    K = j*8 + ci, N = p*16 + co; window quad g+1 (second element) carries
    only the upper output half (col phases p >= 14 -- the rest of its
    full-width block is structurally zero, see _enc1_kernel)."""
    w4 = jnp.einsum(
        "wjpl,alio->awjipo", jnp.asarray(_enc1_selection()),
        w3.astype(jnp.float32),
    ).reshape(3, 2, 128, 256)
    return (
        w4[:, 0].astype(dtype),
        w4[:, 1, :, 128:].astype(dtype),
    )


@functools.cache
def _s2_selection(cin: int) -> np.ndarray:
    """0/1 (wq, j, p, l) for the direct 5x5 stride-2 conv: window column
    qi + 2p + l - 1 over the 3-quad window (one zero pad quad per side)."""
    qi = 128 // cin
    qo = qi // 2
    sel = np.zeros((3, qi, qo, 5), np.float32)
    for p in range(qo):
        for l in range(5):
            lc = qi + 2 * p + l - 1
            sel[lc // qi, lc % qi, p, l] = 1.0
    return sel


def _pack_w_s2(w5: jax.Array, cin: int, dtype) -> jax.Array:
    """(5,5,Cin,2Cin) -> (5, 3, 128, 128): K = j*Cin + ci, N = p*Cout + co."""
    w4 = jnp.einsum(
        "wjpl,klio->kwjipo", jnp.asarray(_s2_selection(cin)),
        w5.astype(jnp.float32),
    )
    return w4.reshape(5, 3, 128, 128).astype(dtype)


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------


def _round8(n: int) -> int:
    """Mosaic requires DMA slice sizes aligned to the (8, 128) tile."""
    return -(-n // 8) * 8


def _enc1_kernel(xq_ref, w_ref, w1_ref, epi_ref, skip_ref, act_ref,
                 *, act: str, nqc: int, t2: int, bper: int):
    """One (stem*batch, frequency-chunk) step of the s2d enc1 conv.

    xq_ref: (1, nqc + 1, round8(t2 + 2), 128) s2d quad-packed input window
            (one zero row on top, zeros below data to the DMA alignment,
            one window quad appended right), stem-shared; fetched as an
            overlapping Element window so the pipeline double-buffers it.
    w_ref:  (1, 3, 128, 256) window quad g's matmul weights per row tap.
    w1_ref: (1, 3, 128, 128) window quad g+1's weights (upper output half).
    epi_ref:(1, 3, 256) f32 bias / bn_scale / bn_shift lane table.
    skip_ref, act_ref: (1, nqc, 2, t2, 128) packed outputs; the pair axis
            holds the two output quads of each input quad (a free host
            reshape restores plain quad order).
    """
    x = xq_ref[0]

    # Pre-shift the INPUT once per row tap (bf16, 3 small relayouts)
    # instead of sublane-slicing each f32 matmul result (round-3 profiling
    # put those misaligned output slices at ~3x the kernels' matmul floor).
    ops = [x[:, a : a + t2] for a in range(3)]

    # Split-N second window quad: quad g+1's columns only feed output col
    # phases p >= 14 (window col p + l >= 16), i.e. the upper 128 output
    # lanes -- its full-width weight block is ~94% zeros, so it runs as an
    # N = 128 matmul into the upper half (25% FLOP cut for the layer).
    acc_lo = jnp.zeros((nqc, t2, 128), jnp.float32)
    acc_hi = jnp.zeros((nqc, t2, 128), jnp.float32)
    for a in range(3):  # row taps: output row r reads padded rows r + a
        za0 = jnp.dot(
            ops[a][0:nqc].reshape(nqc * t2, 128),
            w_ref[0, a],
            preferred_element_type=jnp.float32,
        ).reshape(nqc, t2, 256)
        za1 = jnp.dot(
            ops[a][1 : nqc + 1].reshape(nqc * t2, 128),
            w1_ref[0, a],
            preferred_element_type=jnp.float32,
        ).reshape(nqc, t2, 128)
        acc_lo = acc_lo + za0[..., :128]
        acc_hi = acc_hi + za0[..., 128:] + za1

    for half, acc in ((0, acc_lo), (1, acc_hi)):
        skip = acc + epi_ref[0, 0:1, 128 * half : 128 * half + 128]
        actv = _act_f32(
            epi_ref[0, 1:2, 128 * half : 128 * half + 128] * skip
            + epi_ref[0, 2:3, 128 * half : 128 * half + 128],
            act,
        )
        # 256 output lanes = the (2m, 2m+1) output quad pair.
        skip_ref[0, :, half] = skip.astype(skip_ref.dtype)
        act_ref[0, :, half] = actv.astype(act_ref.dtype)


# (row tap k) -> (parity plane: 0 even / 1 odd, row offset on the plane).
# Input row 2r + k - 1 with 2 pad rows: even plane row j holds global row
# 2j - 2, odd plane row j holds 2j - 1.
_S2_TAPS = ((0, 1, 0), (1, 0, 1), (2, 1, 1), (3, 0, 2), (4, 1, 2))


def _s2_kernel(xq_ref, w_ref, epi_ref, skip_ref, act_ref,
               *, act: str, nqc: int, t_in: int):
    """One (stem*batch, frequency-chunk) step of a stride-2 encoder layer.

    xq_ref: (1, nqc + 2, round8(t_in + 4), 128) quad-packed input window,
            2 zero rows on top, zeros below data to the DMA alignment, and
            1 zero quad left/right (host-added); fetched as an overlapping
            Element window so the pipeline double-buffers it.
    w_ref:  (1, 5, 3, 128, 128) this stem's window matmul weights.
    epi_ref:(1, 3, 128) f32 bias / bn_scale / bn_shift lane table.
    skip_ref, act_ref: (1, nqc, t_in//2, 128) packed outputs.
    """
    t2 = t_in // 2
    tp = _round8(t_in + 4) // 2  # parity-plane rows (global -2 .. pad)

    # Parity fold: row pair (2j, 2j+1) -> lanes [0:128), [128:256) of row j.
    xf = xq_ref[0].reshape(nqc + 2, tp, 256)

    # Pre-shift the input once per distinct (parity, row offset) -- five
    # small bf16 relayouts -- so every matmul result accumulates aligned
    # (the round-3 per-matmul f32 output slices cost ~3x the matmul floor).
    ops = {}
    for _, parity, off in _S2_TAPS:
        if (parity, off) not in ops:
            plane = xf[..., 128:] if parity else xf[..., :128]
            ops[(parity, off)] = plane[:, off : off + t2]

    acc = jnp.zeros((nqc, t2, 128), jnp.float32)
    for k, parity, off in _S2_TAPS:
        x_op = ops[(parity, off)]
        for wq in range(3):  # window quads m - 1, m, m + 1 (padded: m..m+2)
            acc = acc + jnp.dot(
                x_op[wq : wq + nqc].reshape(nqc * t2, 128),
                w_ref[0, k, wq],
                preferred_element_type=jnp.float32,
            ).reshape(nqc, t2, 128)

    skip = acc + epi_ref[0, 0:1]
    actv = _act_f32(epi_ref[0, 1:2] * skip + epi_ref[0, 2:3], act)
    skip_ref[0] = skip.astype(skip_ref.dtype)
    act_ref[0] = actv.astype(act_ref.dtype)


# ---------------------------------------------------------------------------
# Host-side drivers
# ---------------------------------------------------------------------------


def _chunk(nq: int, quad_rows: int, t_in: int) -> int:
    cap = max(1, quad_rows // max(t_in, 1))
    for c in range(min(nq, cap), 0, -1):
        if nq % c == 0:
            return c
    raise ValueError(f"no chunk for nq={nq}")


def _enc1_call(xq, w, epi, *, t2, bper, act, dtype):
    """xq (B, nq+1, round8(t2+2), 128) -> (skip, act) (S*B, 2*nq, t2, 128).

    `w` is the (w0, w1) pair from _pack_w_enc1 (leading stem axis each).
    """
    w0, w1 = w
    _, nq1, tdma, _ = xq.shape
    nq = nq1 - 1
    sb = w0.shape[0] * bper
    nqc = _chunk(nq, MAX_QUAD_ROWS_ENC1, t2)
    nf = nq // nqc

    out_spec = pl.BlockSpec(
        (1, nqc, 2, t2, 128), lambda b, f: (b, f, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    skip, actv = pl.pallas_call(
        functools.partial(_enc1_kernel, act=act, nqc=nqc, t2=t2, bper=bper),
        out_shape=(
            jax.ShapeDtypeStruct((sb, nq, 2, t2, 128), dtype),
            jax.ShapeDtypeStruct((sb, nq, 2, t2, 128), dtype),
        ),
        grid=(sb, nf),
        in_specs=[
            element_window(
                (1, nqc + 1, tdma, 128),
                lambda b, f: (b % bper, f * nqc, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 3, 128, 256), lambda b, f: (b // bper, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 3, 128, 128), lambda b, f: (b // bper, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 3, 256), lambda b, f: (b // bper, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=(out_spec, out_spec),
    )(xq, w0, w1, epi)
    return (
        skip.reshape(sb, 2 * nq, t2, 128),
        actv.reshape(sb, 2 * nq, t2, 128),
    )


def _s2_call(xq, w, epi, *, t_in, bper, act, dtype):
    """xq (SB, nq+2, round8(t+4), 128) -> (skip, act) (SB, nq, t//2, 128)."""
    sb, nq2, tdma, _ = xq.shape
    nq = nq2 - 2
    nqc = _chunk(nq, MAX_QUAD_ROWS, t_in)
    nf = nq // nqc

    out_spec = pl.BlockSpec(
        (1, nqc, t_in // 2, 128), lambda b, f: (b, f, 0, 0),
        memory_space=pltpu.VMEM,
    )
    return pl.pallas_call(
        functools.partial(_s2_kernel, act=act, nqc=nqc, t_in=t_in),
        out_shape=(
            jax.ShapeDtypeStruct((sb, nq, t_in // 2, 128), dtype),
            jax.ShapeDtypeStruct((sb, nq, t_in // 2, 128), dtype),
        ),
        grid=(sb, nf),
        in_specs=[
            element_window(
                (1, nqc + 2, tdma, 128),
                lambda b, f: (b, f * nqc, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 5, 3, 128, 128), lambda b, f: (b // bper, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 3, 128), lambda b, f: (b // bper, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=(out_spec, out_spec),
    )(xq, w, epi)


def _pad_s2_input(y: jax.Array) -> jax.Array:
    """Packed (SB, nq, T, 128) -> (SB, nq+2, round8(T+4), 128), TF-SAME
    zeros plus bottom rows to the DMA tile alignment."""
    t = y.shape[2]
    return jnp.pad(y, ((0, 0), (1, 1), (2, _round8(t + 4) - t - 2), (0, 0)))


def supports(t: int, f: int, cin: int) -> bool:
    """Shape gate: the three layers' quad/row divisibility constraints."""
    return cin == 2 and t % 8 == 0 and t >= 16 and f % 32 == 0 and f >= 32


def supports4(t: int, f: int, cin: int) -> bool:
    """Shape gate for the 4-layer chain (adds enc4's halvings)."""
    return cin == 2 and t % 16 == 0 and t >= 32 and f % 64 == 0 and f >= 64


def _prep_enc1_input(magnitude: jax.Array, t2: int, f2: int, dtype) -> jax.Array:
    """(B, T, F, 2) -> space-to-depth quad-packed enc1 DMA layout.

    Space-to-depth (c' = (dh*2+dw)*2 + c), one left zero column + 15 right
    (quad alignment), one zero row on top + bottom rows to the DMA tile
    alignment, quad-pack -- one XLA fusion over the stem-shared magnitude.
    """
    bsz = magnitude.shape[0]
    xs2d = magnitude.reshape(bsz, t2, 2, f2, 2, 2).transpose(0, 1, 3, 2, 4, 5)
    xs2d = xs2d.reshape(bsz, t2, f2, 8).astype(dtype)
    xs2d = jnp.pad(
        xs2d, ((0, 0), (1, _round8(t2 + 2) - t2 - 1), (1, 15), (0, 0))
    )
    return quad_pack(xs2d, 8)  # (B, f2/16 + 1, round8(t2 + 2), 128)


@functools.partial(
    jax.jit, static_argnames=("n_layers", "act", "compute_dtype")
)
def encoder_packed(
    stacked_params,  # {down1..down_n: {w,b,bn_scale,bn_shift}}, leading S
    magnitude: jax.Array,  # (B, T, F, 2), shared across stems
    n_layers: int = 4,
    act: str = "elu",
    compute_dtype=jnp.bfloat16,
):
    """enc1..enc_n fused Pallas chain with every tensor quad-packed.

    Returns (skips, act_n): skips is a tuple of n_layers packed tensors
    (S*B, nq_i, T/2^i, 128) holding conv_i + bias (the pre-BN/activation
    decoder concat operands, Executable/spleeter.c:239-288), act_n is layer
    n's activated output in the same packed layout. Packed layout per
    kernels/encoder.py module docstring: lane = j*C + c, quads leading.
    Unpack with quad_unpack(x, C_i) where C_i = 16 * 2**(i-1).

    Layers 2..n reuse the one stride-2 window-matmul kernel (`_s2_kernel`);
    enc4 is the Cin=64 instance (qi = 2 columns per quad, one output column
    per quad). Batch rows [s*B, (s+1)*B) use stem s's weights.
    """
    bsz, t, f, cin = magnitude.shape
    if not (supports4(t, f, cin) if n_layers >= 4 else supports(t, f, cin)):
        raise ValueError(f"unsupported encoder shape {magnitude.shape}")
    if not 2 <= n_layers <= 4:
        raise ValueError("n_layers must be in [2, 4]")
    dtype = jnp.dtype(compute_dtype)
    t2, f2 = t // 2, f // 2

    d1 = stacked_params["down1"]
    w1 = jax.vmap(
        lambda w: _pack_w_enc1(_pack_enc_kernel_f32(w), dtype)
    )(d1["w"])
    epi1 = jax.vmap(lambda b, s, h: _epilogue_table(b, s, h, 256))(
        d1["b"], d1["bn_scale"], d1["bn_shift"]
    )
    xq1 = _prep_enc1_input(magnitude, t2, f2, dtype)
    skip, actv = _enc1_call(
        xq1, w1, epi1, t2=t2, bper=bsz, act=act, dtype=dtype
    )
    skips = [skip]

    t_in = t2
    for i in range(2, n_layers + 1):
        ly = stacked_params[f"down{i}"]
        cin_i = 16 * 2 ** (i - 2)
        w = jax.vmap(lambda w: _pack_w_s2(w, cin_i, dtype))(ly["w"])
        # 128-lane table; cout = 2*cin_i repeats over the packed lanes.
        epi = jax.vmap(lambda b, s, h: _epilogue_table(b, s, h, 128))(
            ly["b"], ly["bn_scale"], ly["bn_shift"]
        )
        skip, actv = _s2_call(
            _pad_s2_input(actv), w, epi, t_in=t_in, bper=bsz, act=act,
            dtype=dtype,
        )
        skips.append(skip)
        t_in //= 2

    return tuple(skips), actv


def _pack_enc_kernel_f32(w: jax.Array) -> jax.Array:
    from spleeterrt_tpu.core.model import _pack_enc_kernel

    return _pack_enc_kernel(w.astype(jnp.float32))


@functools.partial(jax.jit, static_argnames=("act", "compute_dtype"))
def encoder3_pallas(
    stacked_params,  # {down1,down2,down3: {w,b,bn_scale,bn_shift}}, leading S
    magnitude: jax.Array,  # (B, T, F, 2), shared across stems
    act: str = "elu",
    compute_dtype=jnp.bfloat16,
):
    """-> (skip1, skip2, skip3, act3), NHWC with leading axis S*B.

    skip_i = conv_i + bias (pre-BN/activation, the decoder concat operands,
    Executable/spleeter.c:239-288); act3 = enc3's activated output feeding
    enc4. Batch rows [s*B, (s+1)*B) use stem s's weights.
    """
    from spleeterrt_tpu.core.model import _pack_enc_kernel

    bsz, t, f, cin = magnitude.shape
    if not supports(t, f, cin):
        raise ValueError(f"unsupported encoder shape {magnitude.shape}")
    dtype = jnp.dtype(compute_dtype)
    t2, f2 = t // 2, f // 2

    d1, d2, d3 = (stacked_params[k] for k in ("down1", "down2", "down3"))
    w1 = jax.vmap(
        lambda w: _pack_w_enc1(_pack_enc_kernel(w.astype(jnp.float32)), dtype)
    )(d1["w"])
    w2 = jax.vmap(lambda w: _pack_w_s2(w, 16, dtype))(d2["w"])
    w3 = jax.vmap(lambda w: _pack_w_s2(w, 32, dtype))(d3["w"])
    epi1 = jax.vmap(lambda b, s, h: _epilogue_table(b, s, h, 256))(
        d1["b"], d1["bn_scale"], d1["bn_shift"]
    )
    epi2 = jax.vmap(lambda b, s, h: _epilogue_table(b, s, h, 128))(
        d2["b"], d2["bn_scale"], d2["bn_shift"]
    )
    epi3 = jax.vmap(lambda b, s, h: _epilogue_table(b, s, h, 128))(
        d3["b"], d3["bn_scale"], d3["bn_shift"]
    )

    # Host prep: space-to-depth (c' = (dh*2+dw)*2 + c), one left zero column
    # + 15 right (quad alignment), one zero row on top + bottom rows to the
    # DMA tile alignment, quad-pack -- one XLA fusion over the stem-shared
    # input magnitude.
    xs2d = magnitude.reshape(bsz, t2, 2, f2, 2, 2).transpose(0, 1, 3, 2, 4, 5)
    xs2d = xs2d.reshape(bsz, t2, f2, 8).astype(dtype)
    xs2d = jnp.pad(
        xs2d, ((0, 0), (1, _round8(t2 + 2) - t2 - 1), (1, 15), (0, 0))
    )
    xq1 = quad_pack(xs2d, 8)  # (B, f2/16 + 1, round8(t2 + 2), 128)

    skip1, act1 = _enc1_call(
        xq1, w1, epi1, t2=t2, bper=bsz, act=act, dtype=dtype
    )
    skip2, act2 = _s2_call(
        _pad_s2_input(act1), w2, epi2, t_in=t2, bper=bsz, act=act, dtype=dtype
    )
    skip3, act3 = _s2_call(
        _pad_s2_input(act2), w3, epi3, t_in=t2 // 2, bper=bsz, act=act,
        dtype=dtype,
    )

    return (
        quad_unpack(skip1, 16),
        quad_unpack(skip2, 32),
        quad_unpack(skip3, 64),
        quad_unpack(act3, 64),
    )
