"""Per-section U-Net trunk profile at the production (300 s, 4-stem) batch.

Sections: Pallas vs XLA encoder front (enc1-3), mid (enc4-6 + up1-3),
decoder tail (up4-5 + concats), XLA vs Pallas head (up6-7). LICM-proofed
fori_loops, synchronous dispatch, dispatch floor subtracted.

Usage: python benchmarks/profile_trunk.py [--iters 8] [--tiles 51]
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
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--tiles", type=int, default=51)
    args = ap.parse_args()
    iters = args.iters
    B = args.tiles
    S = 4
    DT = jnp.bfloat16

    params4 = [model.init_params(jax.random.PRNGKey(i)) for i in range(S)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *params4)
    rng = np.random.default_rng(0)
    tiles = jnp.asarray(
        np.abs(rng.standard_normal((B, 256, 1536, 2))), jnp.float32
    )

    results = {}

    @jax.jit
    def trivial(x):
        return jnp.sum(x) * 1.000001

    disp = sync_time(trivial, jnp.ones((8, 128)))
    results["dispatch_floor_ms"] = disp * 1e3

    def timed_loop(body_fn, *xs):
        @jax.jit
        def run(*carry):
            def body(i, c):
                return body_fn(*c)

            out = lax.fori_loop(0, iters, body, carry)
            return sum(jnp.sum(jnp.abs(o)).astype(jnp.float32) for o in out)

        return (sync_time(run, *xs) - disp) / iters * 1e3

    # --- encoder front (enc1-3) ---------------------------------------------
    def enc_pallas(t):
        from spleeterrt_tpu.kernels import encoder

        s1, s2, s3, a3 = encoder.encoder3_pallas(
            {k: stacked[k] for k in ("down1", "down2", "down3")}, t,
            act="elu", compute_dtype=DT,
        )
        return (t + 1e-20 * (jnp.sum(a3) + jnp.sum(s1[0, 0, 0])).astype(t.dtype),)

    results["enc123_pallas_ms"] = timed_loop(enc_pallas, tiles)

    def enc_xla(t):
        def one(p):
            x = t.astype(DT)
            outs = []
            for i in range(1, 4):
                ly = p[f"down{i}"]
                conv = model._conv_encoder(x, ly["w"].astype(DT), i) + ly["b"].astype(DT)
                outs.append(conv)
                x = model._act_encoder(
                    ly["bn_scale"].astype(DT) * conv + ly["bn_shift"].astype(DT), 1
                )
            return x, outs[0]
        a3, s1 = jax.vmap(one)(stacked)
        return (t + 1e-20 * (jnp.sum(a3) + jnp.sum(s1)).astype(t.dtype),)

    results["enc123_xla_ms"] = timed_loop(enc_xla, tiles)

    # --- mid + tail: _trunk_tail on representative enc3 activations ---------
    x3 = jnp.asarray(rng.standard_normal((S, B, 32, 192, 64)), DT)
    sk1 = jnp.asarray(rng.standard_normal((S, B, 128, 768, 16)), DT)
    sk2 = jnp.asarray(rng.standard_normal((S, B, 64, 384, 32)), DT)
    sk3 = jnp.asarray(rng.standard_normal((S, B, 32, 192, 64)), DT)

    def tail_body(x3, sk1, sk2, sk3):
        out = jax.vmap(
            lambda p, x, a, b, c: model._trunk_tail(p, x, (a, b, c), 1, DT)
        )(stacked, x3, sk1, sk2, sk3)
        return (x3 + 1e-20 * jnp.sum(out).astype(DT), sk1, sk2, sk3)

    results["trunk_tail_enc456_up12345_ms"] = timed_loop(
        tail_body, x3, sk1, sk2, sk3
    )

    # up4 + up5 alone (channel-poor tail before the head).
    up3out = jnp.asarray(rng.standard_normal((S, B, 32, 192, 128)), DT)

    def up45_body(x, sk2, sk1):
        def one(p, xx, s2_, s1_):
            y = model._tconv_decoder(xx, p["up4"]["w"].astype(DT), 4) + p["up4"]["b"].astype(DT)
            y = p["up4"]["bn_scale"].astype(DT) * model._act_decoder(y, 1) + p["up4"]["bn_shift"].astype(DT)
            x5 = jnp.concatenate([s2_, y], axis=-1)
            y = model._tconv_decoder(x5, p["up5"]["w"].astype(DT), 5) + p["up5"]["b"].astype(DT)
            y = p["up5"]["bn_scale"].astype(DT) * model._act_decoder(y, 1) + p["up5"]["bn_shift"].astype(DT)
            return jnp.concatenate([s1_, y], axis=-1)
        out = jax.vmap(one)(stacked, x, sk2, sk1)
        return (x + 1e-20 * jnp.sum(out).astype(DT), sk2, sk1)

    results["up45_ms"] = timed_loop(up45_body, up3out, sk2, sk1)

    # --- head (up6-7) --------------------------------------------------------
    x_head = jnp.asarray(rng.standard_normal((S * B, 128, 768, 32)), DT)

    def head_xla(x):
        masks = jax.vmap(
            lambda p, xx: model._canonical_head(p, xx, 1, DT, "exact")
        )(stacked, x.reshape(S, B, 128, 768, 32))
        return (x + (1e-20 * jnp.sum(masks)).astype(x.dtype),)

    results["head_xla_ms"] = timed_loop(head_xla, x_head)

    def head_pallas(x):
        masks = model._pallas_head(stacked, x, 1, S)
        return (x + (1e-20 * jnp.sum(masks)).astype(x.dtype),)

    results["head_pallas_ms"] = timed_loop(head_pallas, x_head)

    print(json.dumps({k: round(v, 3) for k, v in results.items()}, indent=1))


if __name__ == "__main__":
    main()
