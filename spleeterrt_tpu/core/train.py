"""Training for the Spleeter U-Net (a capability the reference lacks).

The reference ships fixed pre-trained weights only (Executable/model.7z,
VST .dat blobs; no training code anywhere). To make the framework
self-sufficient we provide the standard Spleeter training objective: per-stem
L1 between `mask * |mix|` and the target stem magnitude, optimized with
optax, with the stem axis sharded like inference (parallel/mesh.py).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from spleeterrt_tpu.config import STEM_MODE_4
from spleeterrt_tpu.core.model import Params, multi_stem_forward


class TrainState(NamedTuple):
    params: Params  # stacked per-stem params (leading stem axis)
    opt_state: optax.OptState
    step: jax.Array


def separation_loss(
    stacked_params: Params,
    mix_mag: jax.Array,
    target_mags: jax.Array,
    stem_mode: int = STEM_MODE_4,
    compute_dtype=jnp.bfloat16,
) -> jax.Array:
    """L1(mask * |mix|, |stem|) averaged over stems.

    mix_mag: (B, T, F, 2); target_mags: (S, B, T, F, 2).
    """
    masks = multi_stem_forward(
        stacked_params, mix_mag, stem_mode, compute_dtype, "exact"
    )
    est = masks * mix_mag[None].astype(masks.dtype)
    return jnp.mean(jnp.abs(est - target_mags.astype(masks.dtype)))


def init_train_state(
    stacked_params: Params, optimizer: optax.GradientTransformation
) -> TrainState:
    return TrainState(
        params=stacked_params,
        opt_state=optimizer.init(stacked_params),
        step=jnp.zeros((), jnp.int32),
    )


def make_train_step(
    optimizer: optax.GradientTransformation,
    stem_mode: int = STEM_MODE_4,
    compute_dtype=jnp.bfloat16,
):
    """Returns `train_step(state, mix_mag, target_mags) -> (state, loss)`."""

    def train_step(state: TrainState, mix_mag, target_mags):
        loss, grads = jax.value_and_grad(separation_loss)(
            state.params, mix_mag, target_mags, stem_mode, compute_dtype
        )
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    return train_step


def shard_train_state(state: TrainState, mesh: Mesh, n_stems: int) -> TrainState:
    """Place the train state on the mesh: every leaf whose leading axis is
    the stem axis shards over "stem" (expert-style model parallelism of the
    per-stem nets); scalars (optimizer counts, step) replicate."""

    def place(leaf):
        leaf = jnp.asarray(leaf)
        stem_led = leaf.ndim >= 1 and leaf.shape[0] == n_stems
        spec = P("stem") if stem_led else P()
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree.map(place, state)


def make_sharded_train_step(
    mesh: Mesh,
    optimizer: optax.GradientTransformation,
    stem_mode: int = STEM_MODE_4,
    compute_dtype=jnp.bfloat16,
):
    """jit the train step over a (stem, data) mesh.

    State must be placed with :func:`shard_train_state`; batch inputs shard
    their batch axis over "data" (data parallelism over spectrogram tiles)
    and targets additionally shard stems over "stem". Stem-sharded params
    need no cross-stem collective; the batch-mean gradient reduction becomes
    a psum over "data" via sharding propagation.
    """
    step = make_train_step(optimizer, stem_mode, compute_dtype)

    def sharded_step(state, mix_mag, target_mags):
        mix_mag = jax.lax.with_sharding_constraint(
            mix_mag, NamedSharding(mesh, P("data"))
        )
        target_mags = jax.lax.with_sharding_constraint(
            target_mags, NamedSharding(mesh, P("stem", "data"))
        )
        return step(state, mix_mag, target_mags)

    return jax.jit(sharded_step, donate_argnums=(0,))
