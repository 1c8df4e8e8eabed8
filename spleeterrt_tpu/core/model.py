"""Spleeter U-Net forward pass as a pure function over a params pytree.

Reference semantics (Executable/spleeter.c:111-301), re-derived for
`lax.conv_general_dilated` in NHWC/HWIO (TPU-native layouts):

- 6 encoder convs: 5x5, stride 2. The reference's im2col offset arithmetic
  (pad = padding + dilation - 1 = 2, hoffset/woffset = 2,
  Executable/spleeter.c:91,144-149 + Executable/im2col_dilated.c:10-33)
  resolves to input index `2*out + k - 1`, i.e. exact TF-SAME asymmetric
  padding (1, 2) per spatial dim for even input sizes.
- 6 decoder transposed convs: 5x5, stride 2, output_padding 1, offsets (1,1)
  (Executable/spleeter.c:150-155). The col2im scatter
  (Executable/im2col_dilated.c:42-65 with the extra -1 crop at :34-41)
  resolves to `out[2*in + k - 1] += x[in] * w[k]`, i.e. TF-SAME
  conv2d_transpose: lhs_dilation 2 with padding (3, 2) and a spatially
  flipped kernel.
- Final conv: 4x4, dilation 2, stride 1 (Executable/spleeter.c:156). The
  nonstandard effective-kernel formula `(d-1)*(k+1)+k = 9`
  (Executable/im2col_dilated.c:13) plus offsets (1,1) resolves to taps at
  {-3, -1, +1, +3}: a standard rhs_dilation-2 conv with padding (3, 3).
- Fusion order (Executable/spleeter.c:177-301): encoder
  `act(bn_scale * (conv + bias) + bn_shift)` with the PRE-activation
  `conv + bias` retained as the skip tensor; bottleneck bias-only; decoder
  `bn_scale * act(tconv + bias) + bn_shift` (activation BEFORE batch norm);
  skip concat is [skip, upsampled] along channels; mask =
  sigmoid(final_conv + bias).

Activations (Executable/spleeter.c:43-56,130-139): stem mode 0 (2-stem
subnet) uses leakyReLU(0.2) encoder / ReLU decoder; mode 1 (4-stem family)
uses ELU everywhere with inputs below -15 clamped to -1.

Input layout: the C code runs CHW planes of shape (2, timeStep, binLimit)
(Executable/main.c:468: magnitude[ch][time][bin]); here NHWC
(batch, time, bins, 2) so channels ride the TPU lane dimension.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax import lax

from spleeterrt_tpu.config import STEM_MODE_2, STEM_MODE_4

# (Cin, Cout) per encoder layer (Executable/spleeter.c:144-149).
ENCODER_CHANNELS = ((2, 16), (16, 32), (32, 64), (64, 128), (128, 256), (256, 512))
# (Cin, Cout) per decoder layer; Cin includes the skip concat
# (Executable/spleeter.c:150-155).
DECODER_CHANNELS = ((512, 256), (512, 128), (256, 64), (128, 32), (64, 16), (32, 1))
FINAL_CHANNELS = (1, 2)

Params = dict[str, Any]

_DIMS = ("NHWC", "HWIO", "NHWC")


def init_params(key: jax.Array, dtype=jnp.float32) -> Params:
    """Random params with the blob's shapes; he-normal fan-in init."""
    params: Params = {}
    n_layers = len(ENCODER_CHANNELS) + len(DECODER_CHANNELS) + 1
    keys = jax.random.split(key, n_layers)
    ki = 0

    def conv_init(k, kh, kw, cin, cout):
        fan_in = kh * kw * cin
        return jax.random.normal(k, (kh, kw, cin, cout), dtype) * jnp.sqrt(2.0 / fan_in)

    for i, (cin, cout) in enumerate(ENCODER_CHANNELS, start=1):
        layer = {
            "w": conv_init(keys[ki], 5, 5, cin, cout),
            "b": jnp.zeros((cout,), dtype),
        }
        if i < 6:  # down6 (bottleneck) has no batch norm
            layer["bn_scale"] = jnp.ones((cout,), dtype)
            layer["bn_shift"] = jnp.zeros((cout,), dtype)
        params[f"down{i}"] = layer
        ki += 1
    for i, (cin, cout) in enumerate(DECODER_CHANNELS, start=1):
        params[f"up{i}"] = {
            "w": conv_init(keys[ki], 5, 5, cin, cout),
            "b": jnp.zeros((cout,), dtype),
            "bn_scale": jnp.ones((cout,), dtype),
            "bn_shift": jnp.zeros((cout,), dtype),
        }
        ki += 1
    params["up7"] = {
        "w": conv_init(keys[ki], 4, 4, *FINAL_CHANNELS),
        "b": jnp.zeros((FINAL_CHANNELS[1],), dtype),
    }
    return params


def _act_encoder(x: jax.Array, stem_mode: int) -> jax.Array:
    if stem_mode == STEM_MODE_2:
        return jnp.where(x >= 0, x, 0.2 * x)  # leakyReLU (spleeter.c:43-46)
    return _elu(x)


def _act_decoder(x: jax.Array, stem_mode: int) -> jax.Array:
    if stem_mode == STEM_MODE_2:
        return jnp.maximum(x, 0.0)  # ReLU (spleeter.c:47-50)
    return _elu(x)


def _elu(x: jax.Array) -> jax.Array:
    # Denormal guard: x < -15 -> -1 exactly (Executable/spleeter.c:51-56).
    # The upper clamp never changes the forward value (expm1(safe) is only
    # selected when x < 0) -- it keeps the BACKWARD finite: without it,
    # d(expm1)/dx = exp(safe) overflows to inf wherever x > ~88, and the
    # where-zeroed cotangent times inf is NaN (0 * inf), which killed
    # training the moment any pre-activation crossed 88 (round-5 fix).
    safe = jnp.clip(x, -15.0, 80.0)
    return jnp.where(x >= 0, x, jnp.where(x < -15.0, -1.0, jnp.expm1(safe)))


def fast_sigmoid(x: jax.Array) -> jax.Array:
    """Piecewise-linear sigmoid over 1025 knots on [-7, 7], clamped outside.

    Regenerates the reference exe's LUT behaviour (Executable/spleeter.c:30-42;
    the table there is sigmoid sampled at -7 + i*14/1024 with the last entry
    forced to 1) for bit-parity testing; the VST uses the exact sigmoid.
    """
    step = 14.0 / 1024.0
    idx = jnp.clip(jnp.floor((x + 7.0) / step), 0, 1023)
    x1 = -7.0 + step * idx
    y0 = jax.nn.sigmoid(x1)
    y1 = jnp.where(idx >= 1023, 1.0, jax.nn.sigmoid(x1 + step))
    y = y0 + (y1 - y0) / step * (x - x1)
    return jnp.where(x > 7.0, 1.0, jnp.where(x < -7.0, 0.0, y))


def _conv_same(x: jax.Array, w: jax.Array) -> jax.Array:
    """5x5 stride-2 conv with the reference's TF-SAME (1,2) padding."""
    return lax.conv_general_dilated(
        x, w, window_strides=(2, 2), padding=((1, 2), (1, 2)),
        dimension_numbers=_DIMS,
    )


def _tconv_same(x: jax.Array, w: jax.Array) -> jax.Array:
    """5x5 stride-2 TF-SAME transposed conv (out[2h + k - 1] += x[h] w[k])."""
    return lax.conv_general_dilated(
        x, w[::-1, ::-1], window_strides=(1, 1), padding=((3, 2), (3, 2)),
        lhs_dilation=(2, 2), dimension_numbers=_DIMS,
    )


# ---------------------------------------------------------------------------
# TPU fast layouts: exact algebraic rewrites of the channel-poor layers.
#
# The shallow ends of the U-Net underutilize the MXU's 128 lanes (Cin=2 at
# the input, Cout=1/16 at the decoder exit); measured on v5e, the
# lhs-dilated transposed convs there are ~1.75x slower than the equivalent
# "subpixel" rewrite and the stride-2 input conv ~1.5x slower than its
# space-to-depth form. Both rewrites are exact (see the derivations below
# and test_model.py::test_fast_layouts_exact); CPU keeps the canonical
# forms (its conv lowering prefers them and the oracle parity tests pin
# them bit-for-bit).
# ---------------------------------------------------------------------------

# None = force canonical (False) / fast (True) regardless of backend.
FORCE_FAST_LAYOUTS: bool | None = None
# Same, for the fused Pallas decoder tail (kernels/mask_head.py).
FORCE_PALLAS_HEAD: bool | None = None
# Same, for the fused Pallas encoder front (kernels/encoder.py).
FORCE_PALLAS_ENCODER: bool | None = None
# Same, for the round-4 fully packed trunk (kernels/encoder.py 4-layer
# chain + XLA mid + kernels/tail.py up4/up5/head). When it applies it
# supersedes the enc/head gates above.
FORCE_PACKED_UNET: bool | None = None


def _use_fast_layouts() -> bool:
    if FORCE_FAST_LAYOUTS is not None:
        return FORCE_FAST_LAYOUTS
    return jax.default_backend() != "cpu"


# Above this many (stem * tile) batch rows the XLA head formulation wins
# OVER THE ROUND-3 KERNEL: its host-side quad pack/unpack transposes scale
# with batch (docs/PERF.md round-4 study: input pack alone 10.7 ms at
# S*B = 204). The round-4 packed trunk (_use_packed_unet) supersedes this
# whole gate for the standard architecture; it remains for the fallback
# kernel on non-standard architectures at small batch.
PALLAS_HEAD_MAX_BATCH = 64


def _use_pallas_head(params: Params, magnitude: jax.Array, sigmoid: str) -> bool:
    """Fused up6+up7+sigmoid kernel: accelerator fast path only.

    The kernel hard-codes the standard architecture's decoder tail (32->1ch
    up6, 1->2ch 4x4 up7) and needs quad-packable frequency columns and
    TT-divisible time rows at half resolution. `params` may carry a leading
    stem axis (only the trailing shape is checked). Large batches take the
    XLA head instead (see PALLAS_HEAD_MAX_BATCH).
    """
    from spleeterrt_tpu.kernels import mask_head

    t, f = magnitude.shape[-3], magnitude.shape[-2]
    n_stems = jax.tree.leaves(params)[0].shape[0] if _is_stacked(params) else 1
    batch = magnitude.shape[0] if magnitude.ndim == 4 else 1
    ok = (
        sigmoid == "exact"
        and params["up6"]["w"].shape[-4:] == (5, 5, 32, 1)
        and params["up7"]["w"].shape[-4:] == (4, 4, 1, 2)
        and (f // 2) % (4 * mask_head.QUAD) == 0
        and (t // 2) % mask_head.TT == 0
    )
    if FORCE_PALLAS_HEAD is not None:
        return FORCE_PALLAS_HEAD and ok
    ok = ok and n_stems * batch <= PALLAS_HEAD_MAX_BATCH
    # Deliberately NOT _use_fast_layouts(): forcing the XLA layout rewrites
    # on CPU (tests) must not drag in a compiled-mode Pallas kernel.
    return jax.default_backend() != "cpu" and ok


def _is_stacked(params: Params) -> bool:
    """True if `params` carries a leading stem axis (5-D conv kernels)."""
    return params["up6"]["w"].ndim == 5


def _pack_tconv_kernel(w: jax.Array) -> jax.Array:
    """(5,5,Cin,Cout) -> (3,3,Cin,4*Cout) subpixel kernel.

    out[2h'+dp] = sum_j x[h'-j] W[2j+dp+1]: parity class dp uses taps
    {W[3],W[1]} (dp=0) / {W[4],W[2],W[0]} (dp=1) as a stride-1 3-kernel
    (zero-padded); the four (dp,dq) classes stack on the output channels.
    """
    cin, cout = w.shape[2], w.shape[3]
    idx = {0: [3, 1, None], 1: [4, 2, 0]}
    out = jnp.zeros((3, 3, cin, 4 * cout), w.dtype)
    for dp in (0, 1):
        for dq in (0, 1):
            for a in range(3):
                for b in range(3):
                    ia, ib = idx[dp][a], idx[dq][b]
                    if ia is None or ib is None:
                        continue
                    out = out.at[
                        a, b, :, (dp * 2 + dq) * cout : (dp * 2 + dq + 1) * cout
                    ].set(w[ia, ib])
    return out


def _tconv_subpixel(x: jax.Array, w: jax.Array) -> jax.Array:
    """== _tconv_same via one stride-1 conv + depth-to-space."""
    bsz, h, ww_, cin = x.shape
    cout = w.shape[3]
    y = lax.conv_general_dilated(
        x, _pack_tconv_kernel(w), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=_DIMS,
    )
    y = y.reshape(bsz, h, ww_, 2, 2, cout)
    return y.transpose(0, 1, 3, 2, 4, 5).reshape(bsz, 2 * h, 2 * ww_, cout)


def _pack_enc_kernel(w: jax.Array) -> jax.Array:
    """(5,5,Cin,Cout) -> (3,3,4*Cin,Cout) space-to-depth kernel.

    x index 2h'+kh-1 = 2g+dh with kh = 2(a-1)+dh+1: the stride-2 5x5 conv
    becomes a stride-1 3x3 conv over (dh,dw,ci)-packed input.
    """
    cin, cout = w.shape[2], w.shape[3]
    out = jnp.zeros((3, 3, 4 * cin, cout), w.dtype)
    for a in range(3):
        for b in range(3):
            for dh in (0, 1):
                for dw in (0, 1):
                    ia = 2 * (a - 1) + dh + 1
                    ib = 2 * (b - 1) + dw + 1
                    if not (0 <= ia < 5 and 0 <= ib < 5):
                        continue
                    out = out.at[
                        a, b, (dh * 2 + dw) * cin : (dh * 2 + dw + 1) * cin, :
                    ].set(w[ia, ib])
    return out


def _conv_same_s2d(x: jax.Array, w: jax.Array) -> jax.Array:
    """== _conv_same via space-to-depth packing + one stride-1 conv."""
    bsz, h, ww_, cin = x.shape
    xp = x.reshape(bsz, h // 2, 2, ww_ // 2, 2, cin)
    xp = xp.transpose(0, 1, 3, 2, 4, 5).reshape(bsz, h // 2, ww_ // 2, 4 * cin)
    return lax.conv_general_dilated(
        xp, _pack_enc_kernel(w), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=_DIMS,
    )


def _conv_encoder(x: jax.Array, w: jax.Array, layer: int) -> jax.Array:
    if _use_fast_layouts() and layer == 1:
        return _conv_same_s2d(x, w)
    return _conv_same(x, w)


def _tconv_decoder(x: jax.Array, w: jax.Array, layer: int) -> jax.Array:
    if _use_fast_layouts() and layer >= 5:  # up5 (Cout=16), up6 (Cout=1)
        return _tconv_subpixel(x, w)
    return _tconv_same(x, w)


def _conv_dilated_final(x: jax.Array, w: jax.Array) -> jax.Array:
    """4x4 rhs_dilation-2 stride-1 conv, padding (3,3): taps at -3,-1,+1,+3."""
    return lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=((3, 3), (3, 3)),
        rhs_dilation=(2, 2), dimension_numbers=_DIMS,
    )


# Like PALLAS_HEAD_MAX_BATCH: above this many (stem * tile) rows the XLA
# encoder front won over the ROUND-3 kernel (docs/PERF.md round-4 study:
# the unpack boundary + serialized DMAs). Superseded by _use_packed_unet
# for the standard architecture.
PALLAS_ENCODER_MAX_BATCH = 64


def _use_pallas_encoder(params: Params, magnitude: jax.Array) -> bool:
    """Fused enc1-enc3 kernels: accelerator fast path only.

    The kernels hard-code the standard channel ladder (2->16->32->64) and
    need quad/row-divisible shapes. `params` may carry a leading stem axis.
    Large batches take the XLA front (see PALLAS_ENCODER_MAX_BATCH).
    """
    from spleeterrt_tpu.kernels import encoder

    t, f, c = magnitude.shape[-3], magnitude.shape[-2], magnitude.shape[-1]
    n_stems = jax.tree.leaves(params)[0].shape[0] if _is_stacked(params) else 1
    batch = magnitude.shape[0] if magnitude.ndim == 4 else 1
    ok = (
        params["down1"]["w"].shape[-4:] == (5, 5, 2, 16)
        and params["down2"]["w"].shape[-4:] == (5, 5, 16, 32)
        and params["down3"]["w"].shape[-4:] == (5, 5, 32, 64)
        and encoder.supports(t, f, c)
    )
    if FORCE_PALLAS_ENCODER is not None:
        return FORCE_PALLAS_ENCODER and ok
    ok = ok and n_stems * batch <= PALLAS_ENCODER_MAX_BATCH
    return jax.default_backend() != "cpu" and ok


def _trunk_tail(
    params: Params,
    x: jax.Array,  # enc3's activated output (batch, T/8, F/8, 64)
    skips3: tuple[jax.Array, jax.Array, jax.Array],  # conv1..conv3 pre-act
    stem_mode: int,
    compute_dtype,
) -> jax.Array:
    """enc4..enc6 + up1..up5 -> up6's input (batch, T/2, F/2, 32)
    = concat([conv1 skip, up5 output], channels)."""
    cast = lambda a: a.astype(compute_dtype)
    skips = list(skips3)
    for i in range(4, 7):
        ly = params[f"down{i}"]
        conv = _conv_encoder(x, cast(ly["w"]), i) + cast(ly["b"])
        if i < 6:
            skips.append(conv)
            x = _act_encoder(
                cast(ly["bn_scale"]) * conv + cast(ly["bn_shift"]), stem_mode
            )
        else:
            x = conv  # bottleneck: bias only (spleeter.c:231-238)

    for i in range(1, 6):
        ly = params[f"up{i}"]
        y = _tconv_decoder(x, cast(ly["w"]), i) + cast(ly["b"])
        y = cast(ly["bn_scale"]) * _act_decoder(y, stem_mode) + cast(ly["bn_shift"])
        # concat [skip, upsampled]; skips are pre-BN/act conv outputs
        # (spleeter.c:239-288, README "Fast neural network inference").
        x = jnp.concatenate([skips[5 - i], y], axis=-1)
    return x


def _unet_trunk(
    params: Params, magnitude: jax.Array, stem_mode: int, compute_dtype
) -> jax.Array:
    """Encoder + decoder through up5 (canonical XLA enc1-enc3 front)."""
    x = magnitude.astype(compute_dtype)
    cast = lambda a: a.astype(compute_dtype)

    skips = []
    for i in range(1, 4):
        ly = params[f"down{i}"]
        conv = _conv_encoder(x, cast(ly["w"]), i) + cast(ly["b"])
        skips.append(conv)
        x = _act_encoder(
            cast(ly["bn_scale"]) * conv + cast(ly["bn_shift"]), stem_mode
        )
    return _trunk_tail(params, x, tuple(skips), stem_mode, compute_dtype)


def _use_packed_unet(params: Params, magnitude: jax.Array, sigmoid: str) -> bool:
    """Round-4 packed trunk: Pallas enc1-4 + XLA mid + Pallas up4/up5/head
    with every boundary tensor staying in the quad-packed layout. Wins at
    every batch size measured on v5e (docs/PERF.md round-4 table), so it is
    the accelerator default whenever the standard architecture + shape
    constraints hold."""
    from spleeterrt_tpu.kernels import encoder, mask_head

    t, f = magnitude.shape[-3], magnitude.shape[-2]
    c = magnitude.shape[-1]
    keys = ("down1", "down2", "down3", "down4", "up4", "up5", "up6", "up7")
    if not all(k in params for k in keys):
        return False
    shapes_ok = (
        sigmoid == "exact"
        and params["down1"]["w"].shape[-4:] == (5, 5, 2, 16)
        and params["down2"]["w"].shape[-4:] == (5, 5, 16, 32)
        and params["down3"]["w"].shape[-4:] == (5, 5, 32, 64)
        and params["down4"]["w"].shape[-4:] == (5, 5, 64, 128)
        and params["up4"]["w"].shape[-4:] == (5, 5, 128, 32)
        and params["up5"]["w"].shape[-4:] == (5, 5, 64, 16)
        and params["up6"]["w"].shape[-4:] == (5, 5, 32, 1)
        and params["up7"]["w"].shape[-4:] == (4, 4, 1, 2)
        and encoder.supports4(t, f, c)
        and t % 64 == 0 and f % 64 == 0
        and (t // 2) % mask_head.TT == 0
        and (f // 2) % 16 == 0
    )
    if FORCE_PACKED_UNET is not None:
        return FORCE_PACKED_UNET and shapes_ok
    return jax.default_backend() != "cpu" and shapes_ok


def _mid_trunk_xla(
    params: Params,
    act4: jax.Array,  # (B, T/16, F/16, 128) enc4's activated output
    skip4: jax.Array,  # (B, T/16, F/16, 128) enc4's pre-act skip
    stem_mode: int,
    compute_dtype,
) -> jax.Array:
    """enc5 + enc6 + up1..up3 in plain XLA (C >= 64: MXU-efficient there,
    docs/PERF.md round-4: ~9 ms of the 75 ms XLA U-Net at S*B = 204).
    Returns up3's post-BN output (B, T/8, F/8, 64), before the skip3
    concat (the packed up4 kernel performs that concat as split-K)."""
    cast = lambda a: a.astype(compute_dtype)
    ly5 = params["down5"]
    conv5 = _conv_encoder(act4, cast(ly5["w"]), 5) + cast(ly5["b"])
    x = _act_encoder(
        cast(ly5["bn_scale"]) * conv5 + cast(ly5["bn_shift"]), stem_mode
    )
    ly6 = params["down6"]
    x = _conv_encoder(x, cast(ly6["w"]), 6) + cast(ly6["b"])  # bias only

    skips = {1: conv5, 2: skip4}
    for i in range(1, 4):
        ly = params[f"up{i}"]
        y = _tconv_decoder(x, cast(ly["w"]), i) + cast(ly["b"])
        y = cast(ly["bn_scale"]) * _act_decoder(y, stem_mode) + cast(ly["bn_shift"])
        x = jnp.concatenate([skips[i], y], axis=-1) if i < 3 else y
    return x


def _packed_unet_core(
    stacked_params: Params,
    magnitude: jax.Array,  # (B, T, F, 2), shared across stems
    stem_mode: int,
    compute_dtype,
) -> jax.Array:
    """Packed multi-stem forward -> the head's PACKED mask output
    (S*B, F/32 groups, T/2, 128); unpack with tail.unpack_mask (NHWC) or
    tail.unpack_mask_cd (the fused iSTFT's [c, d] layout, free).

    Dataflow (reference semantics Executable/spleeter.c:177-301):
    Pallas enc1-4 (quad-packed, skips stay packed) -> XLA enc5..up3 on the
    small deep tensors -> Pallas up4/up5 (split-K concats, packed) ->
    Pallas head.
    """
    from spleeterrt_tpu.kernels import encoder, tail

    s = jax.tree.leaves(stacked_params)[0].shape[0]
    b, t, f, _ = magnitude.shape
    dt = jnp.dtype(compute_dtype)
    enc_act = "elu" if stem_mode == STEM_MODE_4 else "leaky"
    dec_act = "elu" if stem_mode == STEM_MODE_4 else "relu"

    (s1pk, s2pk, s3pk, s4pk), act4_pk = encoder.encoder_packed(
        {k: stacked_params[k] for k in ("down1", "down2", "down3", "down4")},
        magnitude, n_layers=4, act=enc_act, compute_dtype=dt,
    )
    act4 = encoder.quad_unpack(act4_pk, 128).reshape(s, b, t // 16, f // 16, 128)
    skip4 = encoder.quad_unpack(s4pk, 128).reshape(s, b, t // 16, f // 16, 128)
    up3out = jax.vmap(
        lambda p, x, s4: _mid_trunk_xla(p, x, s4, stem_mode, dt)
    )(stacked_params, act4, skip4)  # (S, B, T/8, F/8, 64)
    up3pk = tail.quad_pack_nhwc(
        up3out.reshape(s * b, t // 8, f // 8, 64), 64
    ).astype(dt)

    def pack_up(w, csrc):
        return (
            jax.vmap(lambda ww: tail._pack_w_up(ww[:, :, :csrc, :], csrc, dt))(w),
            jax.vmap(lambda ww: tail._pack_w_up(ww[:, :, csrc:, :], csrc, dt))(w),
        )

    ly = stacked_params["up4"]
    w_skip, w_prev = pack_up(ly["w"], 64)
    epi = jax.vmap(tail._up_epilogue)(ly["b"], ly["bn_scale"], ly["bn_shift"])
    up4pk = tail.up_shallow(
        tail.pad_pk(s3pk), tail.pad_pk(up3pk), w_skip, w_prev, epi,
        t_in=t // 8, act=dec_act, out_dtype=dt,
    )

    ly = stacked_params["up5"]
    w_skip, w_prev = pack_up(ly["w"], 32)
    epi = jax.vmap(tail._up_epilogue)(ly["b"], ly["bn_scale"], ly["bn_shift"])
    up5pk = tail.up_shallow(
        tail.pad_pk(s2pk), tail.pad_pk(up4pk), w_skip, w_prev, epi,
        t_in=t // 4, act=dec_act, out_dtype=dt,
    )

    ly6, ly7 = stacked_params["up6"], stacked_params["up7"]
    return tail.head_packed(
        tail.pad_pk_head(s1pk), tail.pad_pk_head(up5pk),
        ly6["w"], ly6["b"], ly6["bn_scale"], ly6["bn_shift"],
        ly7["w"], ly7["b"],
        t2=t // 2, act=dec_act, compute_dtype=dt,
    )


def _packed_unet(
    stacked_params: Params,
    magnitude: jax.Array,
    stem_mode: int,
    compute_dtype,
) -> jax.Array:
    """Fully packed multi-stem forward -> (S, B, T, F, 2) NHWC masks."""
    from spleeterrt_tpu.kernels import tail

    s = jax.tree.leaves(stacked_params)[0].shape[0]
    b, t, f, _ = magnitude.shape
    masks_packed = _packed_unet_core(
        stacked_params, magnitude, stem_mode, compute_dtype
    )
    masks = tail.unpack_mask(masks_packed, t // 2, f // 2)
    return masks.reshape(s, b, t, f, 2)


def multi_stem_masks_cd(
    stacked_params: Params,
    magnitude: jax.Array,  # (B, T, F, 2), shared across stems
    stem_mode: int = STEM_MODE_4,
    compute_dtype=jnp.bfloat16,
    sigmoid: str = "exact",
    layout: str = "cd",
) -> jax.Array | None:
    """Masks in the fused iSTFT's [c, d] layout, or None when the packed
    U-Net path does not apply (caller falls back to NHWC masks + one host
    transpose). Returns (S, 2ch, B*T frames, 64, bin_limit//64) compact
    in-band lanes with c + 64 d = bin
    (kernels/stft_fused.masked_istft4096_cd's mask contract); the tile
    batch B must be the track's time-ordered tile sequence.

    layout="dcflat" returns (S, 2ch, B*T, bin_limit) in the iSTFT's flat
    d-major layout instead (64*d + c): the same permute but with
    contiguous-run writes, ~2x faster at production shape -- use it when
    the masks feed masked_istft4096_cd directly; "cd" when the caller
    multiplies them against the packed spectrum elementwise."""
    from spleeterrt_tpu.kernels import tail

    if not _use_packed_unet(stacked_params, magnitude, sigmoid):
        return None
    s = jax.tree.leaves(stacked_params)[0].shape[0]
    b, t, f, _ = magnitude.shape
    masks_packed = _packed_unet_core(
        stacked_params, magnitude, stem_mode, compute_dtype
    )
    unpack = (
        tail.unpack_mask_dc_flat if layout == "dcflat" else tail.unpack_mask_cd
    )
    return unpack(masks_packed, s, t // 2, f // 2)


def _multi_stem_trunk(
    stacked_params: Params,
    magnitude: jax.Array,  # (B, T, F, 2), shared across stems
    stem_mode: int,
    compute_dtype,
    pallas_encoder: bool = True,
) -> jax.Array:
    """All-stems trunk -> (S, B, T/2, F/2, 32).

    On accelerators the enc1-enc3 front runs as fused Pallas kernels with
    stems folded into the batch grid axis (kernels/encoder.py); the
    remaining layers stay on XLA convs (C >= 128, already MXU-efficient).
    """
    if pallas_encoder and _use_pallas_encoder(stacked_params, magnitude):
        from spleeterrt_tpu.kernels import encoder

        s = jax.tree.leaves(stacked_params)[0].shape[0]
        b = magnitude.shape[0]
        act = "elu" if stem_mode == STEM_MODE_4 else "leaky"
        skip1, skip2, skip3, act3 = encoder.encoder3_pallas(
            {k: stacked_params[k] for k in ("down1", "down2", "down3")},
            magnitude,
            act=act,
            compute_dtype=compute_dtype,
        )
        unstack = lambda a: a.reshape(s, b, *a.shape[1:])
        return jax.vmap(
            lambda p, x, s1, s2, s3: _trunk_tail(
                p, x, (s1, s2, s3), stem_mode, compute_dtype
            )
        )(
            stacked_params,
            unstack(act3),
            unstack(skip1),
            unstack(skip2),
            unstack(skip3),
        )
    return jax.vmap(
        lambda p: _unet_trunk(p, magnitude, stem_mode, compute_dtype)
    )(stacked_params)


def _canonical_head(
    params: Params, x: jax.Array, stem_mode: int, compute_dtype, sigmoid: str
) -> jax.Array:
    """up6 + up7 + sigmoid in plain XLA (the oracle-parity formulation)."""
    cast = lambda a: a.astype(compute_dtype)
    ly6, ly7 = params["up6"], params["up7"]
    y = _tconv_decoder(x, cast(ly6["w"]), 6) + cast(ly6["b"])
    y = cast(ly6["bn_scale"]) * _act_decoder(y, stem_mode) + cast(ly6["bn_shift"])
    logits = _conv_dilated_final(y, cast(ly7["w"])).astype(
        jnp.float32
    ) + ly7["b"].astype(jnp.float32)
    if sigmoid == "lut":
        return fast_sigmoid(logits)
    return jax.nn.sigmoid(logits)


def _pallas_head(
    stacked_params: Params, x: jax.Array, stem_mode: int, n_stems: int
) -> jax.Array:
    """Fused decoder tail; x is (S*B, T2, F2, 32), params carry a leading
    stem axis. Returns NHWC (S*B, T, F, 2)."""
    from spleeterrt_tpu.kernels import mask_head

    ly6, ly7 = stacked_params["up6"], stacked_params["up7"]
    mask_cf = mask_head.mask_head_pallas(
        x,
        ly6["w"], ly6["b"], ly6["bn_scale"], ly6["bn_shift"],
        ly7["w"], ly7["b"],
        act="elu" if stem_mode == STEM_MODE_4 else "relu",
        n_stems=n_stems,
    )
    # Channel-first -> NHWC for API parity; inside a jit XLA folds this
    # into downstream transposes (tiles_to_frames wants channel-first).
    return mask_cf.transpose(0, 2, 3, 1)


@functools.partial(
    jax.jit,
    static_argnames=(
        "stem_mode", "compute_dtype", "sigmoid", "pallas_head",
        "pallas_encoder",
    ),
)
def unet_forward(
    params: Params,
    magnitude: jax.Array,
    stem_mode: int = STEM_MODE_4,
    compute_dtype=jnp.float32,
    sigmoid: str = "exact",
    pallas_head: bool = True,
    pallas_encoder: bool = True,
) -> jax.Array:
    """Magnitude (batch, T, F, 2) -> soft mask (batch, T, F, 2) in [0, 1].

    T and F must be divisible by 64 (six stride-2 halvings). Everything runs
    in `compute_dtype` (bf16 on the MXU by default at the pipeline level; the
    TPU accumulates bf16 matmuls in fp32 internally); only the final logits
    are promoted to fp32 for the sigmoid. fp32 `compute_dtype` gives the
    oracle-parity path.
    """
    if (
        pallas_head and pallas_encoder
        and _use_packed_unet(params, magnitude, sigmoid)
    ):
        stacked = jax.tree.map(lambda a: a[None], params)
        mag = magnitude if magnitude.ndim == 4 else magnitude[None]
        out = _packed_unet(stacked, mag, stem_mode, compute_dtype)[0]
        return out if magnitude.ndim == 4 else out[0]
    if pallas_encoder and _use_pallas_encoder(params, magnitude):
        stacked = jax.tree.map(lambda a: a[None], params)
        x = _multi_stem_trunk(stacked, magnitude, stem_mode, compute_dtype)[0]
    else:
        x = _unet_trunk(params, magnitude, stem_mode, compute_dtype)
    if pallas_head and _use_pallas_head(params, magnitude, sigmoid):
        stacked = jax.tree.map(lambda a: a[None], params)
        return _pallas_head(stacked, x, stem_mode, 1)
    return _canonical_head(params, x, stem_mode, compute_dtype, sigmoid)


def multi_stem_forward(
    stacked_params: Params,
    magnitude: jax.Array,
    stem_mode: int = STEM_MODE_4,
    compute_dtype=jnp.float32,
    sigmoid: str = "exact",
    pallas_head: bool = True,
    pallas_encoder: bool = True,
) -> jax.Array:
    """Run S stacked U-Nets over one magnitude batch -> (S, batch, T, F, 2).

    The reference runs one net per pthread (VST/Source/Spleeter4Stems.c:135,
    TASK_NB=5); here the stem axis is a vmap so XLA fuses all stems into
    batched/grouped convolutions on the MXU. On accelerators the decoder
    tail runs as one Pallas launch with stems folded into the batch grid
    axis (kernels/mask_head.py).

    Pass `pallas_head=False, pallas_encoder=False` from any path that is
    differentiated: `pallas_call` has no reverse-mode AD rule, so the
    training loss must stay on the canonical XLA formulation
    (core/train.py::separation_loss).
    """
    if (
        pallas_head and pallas_encoder
        and _use_packed_unet(stacked_params, magnitude, sigmoid)
    ):
        mag = magnitude if magnitude.ndim == 4 else magnitude[None]
        out = _packed_unet(stacked_params, mag, stem_mode, compute_dtype)
        return out if magnitude.ndim == 4 else out[:, 0]
    use_head = pallas_head and _use_pallas_head(
        stacked_params, magnitude, sigmoid
    )
    use_enc = pallas_encoder and _use_pallas_encoder(stacked_params, magnitude)
    if use_head or use_enc:
        # Stems folded into the Pallas batch grid: the fused kernels are not
        # vmappable, so the trunk handles the stem axis itself.
        trunk = _multi_stem_trunk(
            stacked_params, magnitude, stem_mode, compute_dtype, pallas_encoder
        )  # (S, B, T2, F2, 32)
        s, b = trunk.shape[:2]
        if use_head:
            masks = _pallas_head(
                stacked_params, trunk.reshape(s * b, *trunk.shape[2:]),
                stem_mode, s,
            )
            return masks.reshape(s, b, *masks.shape[1:])
        return jax.vmap(
            lambda p, x: _canonical_head(p, x, stem_mode, compute_dtype, sigmoid)
        )(stacked_params, trunk)
    # Both gates are off at the stacked level; force them off inside the
    # vmap too (the per-stem trace would re-evaluate the batch-size gate
    # without the stem axis and try to vmap a Pallas call, which the
    # manual-DMA kernels do not support).
    fwd = lambda p: unet_forward(
        p, magnitude, stem_mode, compute_dtype, sigmoid, False, False,
    )
    return jax.vmap(fwd)(stacked_params)
