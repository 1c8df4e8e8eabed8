"""On-chip parity + timing for the fused Pallas encoder front (enc1-enc3).

1. Parity: multi_stem_forward masks with FORCE_PALLAS_ENCODER on vs off at
   the VST 4-stem shape, fp32 compute (bf16 compared separately).
2. Timing: LICM-proofed fori_loop around the full fused forward, both ways.

Synchronous dispatches only (axon tunnel, CLAUDE.md).
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

from spleeterrt_tpu.core import model


def sync_time(fn, *args, reps=3):
    float(fn(*args))
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
    ap.add_argument("--skip-parity", action="store_true")
    args = ap.parse_args()
    iters = args.iters

    params4 = [model.init_params(jax.random.PRNGKey(i)) for i in range(4)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *params4)
    rng = np.random.default_rng(0)
    tiles = jnp.asarray(
        np.abs(rng.standard_normal((args.tiles, 256, 1536, 2))), jnp.float32
    )
    results = {}

    def forward(t, dtype):
        return model.multi_stem_forward(
            stacked, t, 1, dtype, "exact", pallas_head=True
        )

    if not args.skip_parity:
        # Parity, fp32 compute (small tile count to bound transfer time).
        small = tiles[:2]
        model.FORCE_PALLAS_ENCODER = False
        ref = np.asarray(jax.jit(lambda t: forward(t, jnp.float32))(small))
        model.FORCE_PALLAS_ENCODER = True
        got = np.asarray(jax.jit(lambda t: forward(t, jnp.float32))(small))
        model.FORCE_PALLAS_ENCODER = None
        err = float(np.max(np.abs(got - ref)))
        results["parity_fp32_max_abs_err"] = err
        # bf16 compute: sanity SNR.
        model.FORCE_PALLAS_ENCODER = False
        ref16 = np.asarray(
            jax.jit(lambda t: forward(t, jnp.bfloat16))(small), np.float32
        )
        model.FORCE_PALLAS_ENCODER = True
        got16 = np.asarray(
            jax.jit(lambda t: forward(t, jnp.bfloat16))(small), np.float32
        )
        model.FORCE_PALLAS_ENCODER = None
        num = float(np.sum(ref16**2))
        den = float(np.sum((got16 - ref16) ** 2)) + 1e-30
        results["parity_bf16_snr_db"] = 10 * np.log10(num / den)

    # Timing.
    @jax.jit
    def trivial(x):
        return jnp.sum(x) * 1.000001

    disp = sync_time(trivial, jnp.ones((8, 128)))
    results["dispatch_floor_ms"] = disp * 1e3

    def timed(force):
        model.FORCE_PALLAS_ENCODER = force
        model.unet_forward.clear_cache()

        @jax.jit
        def run(t):
            def body(i, c):
                masks = forward(c, jnp.bfloat16)
                return c + 1e-20 * jnp.sum(masks)

            return jnp.sum(jnp.abs(lax.fori_loop(0, iters, body, t)))

        out = (sync_time(run, tiles) - disp) / iters * 1e3
        model.FORCE_PALLAS_ENCODER = None
        return out

    results["unet_full_xla_enc_ms"] = timed(False)
    results["unet_full_pallas_enc_ms"] = timed(True)

    print(json.dumps({k: round(v, 4) for k, v in results.items()}, indent=1))


if __name__ == "__main__":
    main()
