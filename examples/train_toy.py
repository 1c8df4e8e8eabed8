"""Toy training run: fit 2 stem nets on synthetic tone-vs-noise mixtures.

Demonstrates the training subsystem end-to-end (the reference ships fixed
weights only): data synthesis -> STFT magnitudes -> sharded train step ->
checkpoint -> export back to the reference's .dat blob format.

Run: python examples/train_toy.py [--steps 50]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from spleeterrt_tpu.config import SeparatorConfig
from spleeterrt_tpu.core import checkpoint, model, train, transform, weights
from spleeterrt_tpu.parallel.mesh import make_mesh


def make_batch(rng, cfg, batch):
    """Mixture = tone stem + noise stem; targets are the stem magnitudes."""
    n = cfg.time_step * cfg.transform.hop + cfg.transform.fft_size
    t = np.arange(n) / 44100.0
    freqs = rng.uniform(200, 2000, size=batch)
    tone = 0.4 * np.sin(2 * np.pi * freqs[:, None] * t)[:, None, :]
    noise = 0.1 * rng.standard_normal((batch, 1, n))
    tone = np.repeat(tone, 2, axis=1).astype(np.float32)
    noise = np.repeat(noise, 2, axis=1).astype(np.float32)
    mix = tone + noise

    def mags(x):
        spec = transform.stft(jnp.asarray(x), cfg.transform, n)
        m = jnp.abs(spec[..., : cfg.bin_limit])[:, :, : cfg.time_step]
        # Scale into O(1) for stable from-scratch training (the reference's
        # pre-trained weights absorb the raw |rfft| magnitudes instead).
        m = m / cfg.transform.fft_size
        return m.transpose(0, 2, 3, 1)  # (B, T, F, 2)

    return mags(mix), jnp.stack([mags(tone), mags(noise)])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--ckpt", default=None)
    args = ap.parse_args()

    cfg = SeparatorConfig(bin_limit=512, time_step=64, num_stems=2)
    rng = np.random.default_rng(0)

    stacked = weights.stack_params(
        [model.init_params(jax.random.PRNGKey(i)) for i in range(2)]
    )
    opt = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(3e-4))
    state = train.init_train_state(stacked, opt)

    n_dev = len(jax.devices())
    stem_par = 2 if n_dev % 2 == 0 else 1
    mesh = make_mesh(stem_parallel=stem_par)
    state = train.shard_train_state(state, mesh, n_stems=2)
    step = train.make_sharded_train_step(mesh, opt)

    print(f"training on {n_dev} device(s), mesh {dict(mesh.shape)}")
    t0 = time.perf_counter()
    for i in range(args.steps):
        mix, targets = make_batch(rng, cfg, args.batch)
        state, loss = step(state, mix, targets)
        if i % 10 == 0 or i == args.steps - 1:
            print(f"step {int(state.step):4d}  loss {float(loss):.5f}")
    print(f"{args.steps} steps in {time.perf_counter() - t0:.1f} s")

    if args.ckpt:
        checkpoint.save(f"{args.ckpt}/step_{int(state.step)}", state)
        # Export stem 0 back to the reference's raw blob format.
        p0 = jax.tree.map(lambda a: np.asarray(a[0]), state.params)
        weights.save_coeff_file(p0, f"{args.ckpt}/tone.dat")
        print(f"saved checkpoint + blob under {args.ckpt}")


if __name__ == "__main__":
    main()
