"""On-chip breakdown of the 4-stem forward at the VST config.

Times each pipeline stage with LICM-proofed fori_loops (scalar feedback into
the loop carry -- see docs/PERF.md) and one synchronous dispatch per
measurement (queued async dispatches wedge the axon tunnel, CLAUDE.md).

Usage: python benchmarks/profile_unet.py [--iters 10] [--tiles 11]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

_CACHE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".cache", "jaxcache",
)
os.makedirs(_CACHE, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import jax.numpy as jnp
import numpy as np
from jax import lax

from spleeterrt_tpu.config import SeparatorConfig
from spleeterrt_tpu.core import model, separate, transform


def sync_time(fn, *args, reps=3):
    """Best-of wall time of a scalar-returning jit, synchronous dispatches."""
    float(fn(*args))  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--tiles", type=int, default=11)
    args = ap.parse_args()
    iters = args.iters

    cfg = SeparatorConfig(
        bin_limit=1536, time_step=256, num_stems=4, compute_dtype=jnp.bfloat16
    )
    params4 = [model.init_params(jax.random.PRNGKey(i)) for i in range(4)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *params4)

    rng = np.random.default_rng(0)
    tiles = jnp.asarray(
        np.abs(rng.standard_normal((args.tiles, 256, 1536, 2))), jnp.float32
    )

    results = {}

    # Dispatch floor: a trivial jit round trip.
    @jax.jit
    def trivial(x):
        return jnp.sum(x) * 1.000001

    disp = sync_time(trivial, jnp.ones((8, 128)))
    results["dispatch_floor_ms"] = disp * 1e3

    def loops(body_fn, init):
        @jax.jit
        def run(carry):
            def body(i, c):
                return body_fn(c)

            return jnp.sum(jnp.abs(lax.fori_loop(0, iters, body, carry)))

        return run

    # Full fused multi-stem U-Net (trunk + Pallas head).
    def full_body(t):
        masks = model.multi_stem_forward(
            stacked, t, 1, jnp.bfloat16, "exact", pallas_head=True
        )
        return t + 1e-20 * jnp.sum(masks)

    results["unet_full_ms"] = (
        (sync_time(loops(full_body, tiles), tiles) - disp) / iters * 1e3
    )

    # Trunk only (encoder + up1..up5 concat, vmapped over stems).
    def trunk_body(t):
        out = jax.vmap(lambda p: model._unet_trunk(p, t, 1, jnp.bfloat16))(
            stacked
        )
        return t + 1e-20 * jnp.sum(out)

    results["unet_trunk_ms"] = (
        (sync_time(loops(trunk_body, tiles), tiles) - disp) / iters * 1e3
    )

    # Pallas decoder head only, on a representative trunk output.
    x_head = jnp.asarray(
        rng.standard_normal((4 * args.tiles, 128, 768, 32)), jnp.bfloat16
    )

    def head_body(x):
        masks = model._pallas_head(stacked, x, 1, 4)
        return x + (1e-20 * jnp.sum(masks)).astype(x.dtype)

    results["pallas_head_ms"] = (
        (sync_time(loops(head_body, x_head), x_head) - disp) / iters * 1e3
    )

    # Canonical XLA head for comparison.
    def xla_head_body(x):
        masks = jax.vmap(
            lambda p, xx: model._canonical_head(p, xx, 1, jnp.bfloat16, "exact")
        )(stacked, x.reshape(4, args.tiles, 128, 768, 32))
        return x + (1e-20 * jnp.sum(masks)).astype(x.dtype)

    results["xla_head_ms"] = (
        (sync_time(loops(xla_head_body, x_head), x_head) - disp) / iters * 1e3
    )

    # End-to-end 300 s separation (one dispatch, amortized workload).
    seconds = 300.0
    n = int(seconds * 44100)
    audio = jnp.asarray(rng.standard_normal((2, n)) * 0.3, jnp.float32)
    padded = jax.device_put(transform.pad_offline(audio, cfg.transform))

    @jax.jit
    def checksum(stacked, padded):
        out = separate.separate_4stem(stacked, padded, cfg)
        return jnp.sum(jnp.abs(out))

    e2e = sync_time(checksum, stacked, padded)
    results["e2e_300s_ms"] = e2e * 1e3
    results["rtf"] = seconds / e2e

    print(json.dumps({k: round(v, 3) for k, v in results.items()}, indent=1))


if __name__ == "__main__":
    main()
