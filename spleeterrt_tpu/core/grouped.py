"""Stem-grouped U-Net forward: all stems ride the channel axis.

`multi_stem_forward`'s vmap lowers to feature-grouped convs but keeps the
stem axis as a separate tensor dimension, so shallow activations stay
C-minor with C in {16, 32} -- 4-8x lane padding on every elementwise pass
(see docs/PERF.md). This module runs the S per-stem U-Nets as ONE network
whose channel axis is [stem-major x channel]: convs use
`feature_group_count=S` (exactly the per-stem math, zero FLOP inflation),
and every activation carries S * C channels, filling the 128-lane dimension
4x better on the channel-poor layers.

Numerically identical to vmapped unet_forward (tests force both paths on
CPU); layer geometry identical to core/model.py (same reference citations).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from spleeterrt_tpu.config import STEM_MODE_4
from spleeterrt_tpu.core.model import (
    Params,
    _act_decoder,
    _act_encoder,
    _conv_dilated_final,
    fast_sigmoid,
)

_DIMS = ("NHWC", "HWIO", "NHWC")


def _gw(stacked_w: jax.Array) -> jax.Array:
    """(S, kh, kw, Ci, Co) -> grouped kernel (kh, kw, Ci, S*Co)."""
    s, kh, kw, ci, co = stacked_w.shape
    return stacked_w.transpose(1, 2, 3, 0, 4).reshape(kh, kw, ci, s * co)


def _gv(stacked_v: jax.Array) -> jax.Array:
    """(S, C) -> (S*C) matching channel index g*C + c."""
    return stacked_v.reshape(-1)


def _conv_g(x, w, s):
    return lax.conv_general_dilated(
        x, w, (2, 2), ((1, 2), (1, 2)), dimension_numbers=_DIMS,
        feature_group_count=s,
    )


def _tconv_g(x, w, s):
    return lax.conv_general_dilated(
        x, w[::-1, ::-1], (1, 1), ((3, 2), (3, 2)), lhs_dilation=(2, 2),
        dimension_numbers=_DIMS, feature_group_count=s,
    )


def _final_g(x, w, s):
    return lax.conv_general_dilated(
        x, w, (1, 1), ((3, 3), (3, 3)), rhs_dilation=(2, 2),
        dimension_numbers=_DIMS, feature_group_count=s,
    )


@functools.partial(
    jax.jit, static_argnames=("stem_mode", "compute_dtype", "sigmoid")
)
def multi_stem_forward_grouped(
    stacked_params: Params,
    magnitude: jax.Array,  # (B, T, F, 2)
    stem_mode: int = STEM_MODE_4,
    compute_dtype=jnp.bfloat16,
    sigmoid: str = "exact",
) -> jax.Array:
    """S stacked nets on one magnitude batch -> (S, B, T, F, 2)."""
    s = jax.tree.leaves(stacked_params)[0].shape[0]
    cast = lambda a: a.astype(compute_dtype)
    b, t, f, _ = magnitude.shape
    # Input group-major: stem g sees channels [2g, 2g+1].
    x = jnp.tile(magnitude.astype(compute_dtype), (1, 1, 1, s))

    skips = []
    for i in range(1, 7):
        ly = stacked_params[f"down{i}"]
        conv = _conv_g(x, cast(_gw(ly["w"])), s) + cast(_gv(ly["b"]))
        if i < 6:
            skips.append(conv)
            x = _act_encoder(
                cast(_gv(ly["bn_scale"])) * conv + cast(_gv(ly["bn_shift"])),
                stem_mode,
            )
        else:
            x = conv

    for i in range(1, 7):
        ly = stacked_params[f"up{i}"]
        y = _tconv_g(x, cast(_gw(ly["w"])), s) + cast(_gv(ly["b"]))
        y = (
            cast(_gv(ly["bn_scale"])) * _act_decoder(y, stem_mode)
            + cast(_gv(ly["bn_shift"]))
        )
        if i < 6:
            # Group-aware skip concat: per stem [skip_g, y_g].
            skip = skips[5 - i]
            cs = skip.shape[-1] // s
            cy = y.shape[-1] // s
            bb, hh, ww, _ = y.shape
            merged = jnp.concatenate(
                [
                    skip.reshape(bb, hh, ww, s, cs),
                    y.reshape(bb, hh, ww, s, cy),
                ],
                axis=-1,
            )
            x = merged.reshape(bb, hh, ww, s * (cs + cy))
        else:
            x = y

    logits = _final_g(x, cast(_gw(stacked_params["up7"]["w"])), s).astype(
        jnp.float32
    ) + _gv(stacked_params["up7"]["b"]).astype(jnp.float32)
    mask = fast_sigmoid(logits) if sigmoid == "lut" else jax.nn.sigmoid(logits)
    # (B, T, F, S*2) -> (S, B, T, F, 2)
    return mask.reshape(b, t, f, s, 2).transpose(3, 0, 1, 2, 4)
