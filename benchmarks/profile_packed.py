"""Per-stage profile of the PACKED U-Net trunk + cd masked-iSTFT variants.

Times each stage of the shipped round-4/5 composition at the production
300 s 4-stem batch (S*B = 204): Pallas enc1-4, XLA mid, packed up4, up5,
head, unpack, and the masked-iSTFT at FB_INV in {16, 32}. LICM-proofed
fori_loops, dispatch floor subtracted.

Usage: python benchmarks/profile_packed.py [--iters 8] [--tiles 51]
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
from spleeterrt_tpu.kernels import encoder, stft_fused, tail


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
    b, t, f = args.tiles, 256, 1536
    s = 4
    dt = jnp.bfloat16

    params4 = [model.init_params(jax.random.PRNGKey(i)) for i in range(s)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *params4)
    rng = np.random.default_rng(0)
    tiles = jnp.asarray(
        np.abs(rng.standard_normal((b, t, f, 2))) * 0.1, jnp.float32
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

    enc_params = {
        k: stacked[k] for k in ("down1", "down2", "down3", "down4")
    }

    def enc_body(x):
        (s1, s2, s3, s4), a4 = encoder.encoder_packed(
            enc_params, x, n_layers=4, act="elu", compute_dtype=dt
        )
        return (x + 1e-20 * a4[0, 0, 0, 0].astype(x.dtype),)

    results["enc1_4_packed_ms"] = timed_loop(enc_body, tiles)

    # Materialize boundary tensors once for the downstream stages.
    (s1pk, s2pk, s3pk, s4pk), act4_pk = jax.jit(
        lambda x: encoder.encoder_packed(
            enc_params, x, n_layers=4, act="elu", compute_dtype=dt
        )
    )(tiles)
    act4 = encoder.quad_unpack(act4_pk, 128).reshape(s, b, t // 16, f // 16, 128)
    skip4 = encoder.quad_unpack(s4pk, 128).reshape(s, b, t // 16, f // 16, 128)

    def mid_body(a4, sk4):
        up3out = jax.vmap(
            lambda p, x, s4_: model._mid_trunk_xla(p, x, s4_, 1, dt)
        )(stacked, a4, sk4)
        return (a4 + 1e-20 * up3out[0, 0, 0, 0, 0].astype(a4.dtype), sk4)

    results["mid_xla_ms"] = timed_loop(mid_body, act4, skip4)

    up3out = jax.jit(
        lambda a4, sk4: jax.vmap(
            lambda p, x, s4_: model._mid_trunk_xla(p, x, s4_, 1, dt)
        )(stacked, a4, sk4)
    )(act4, skip4)
    up3pk = tail.quad_pack_nhwc(
        up3out.reshape(s * b, t // 8, f // 8, 64), 64
    ).astype(dt)

    def pack_up(w, csrc):
        return (
            jax.vmap(lambda ww: tail._pack_w_up(ww[:, :, :csrc, :], csrc, dt))(w),
            jax.vmap(lambda ww: tail._pack_w_up(ww[:, :, csrc:, :], csrc, dt))(w),
        )

    ly4 = stacked["up4"]
    w_skip4, w_prev4 = pack_up(ly4["w"], 64)
    epi4 = jax.vmap(tail._up_epilogue)(ly4["b"], ly4["bn_scale"], ly4["bn_shift"])

    def up4_body(s3, u3):
        out = tail.up_shallow(
            tail.pad_pk(s3), tail.pad_pk(u3), w_skip4, w_prev4, epi4,
            t_in=t // 8, act="elu", out_dtype=dt,
        )
        return (s3 + 1e-20 * out[0, 0, 0, 0].astype(s3.dtype), u3)

    results["up4_packed_ms"] = timed_loop(up4_body, s3pk, up3pk)

    up4pk = jax.jit(
        lambda s3, u3: tail.up_shallow(
            tail.pad_pk(s3), tail.pad_pk(u3), w_skip4, w_prev4, epi4,
            t_in=t // 8, act="elu", out_dtype=dt,
        )
    )(s3pk, up3pk)

    ly5 = stacked["up5"]
    w_skip5, w_prev5 = pack_up(ly5["w"], 32)
    epi5 = jax.vmap(tail._up_epilogue)(ly5["b"], ly5["bn_scale"], ly5["bn_shift"])

    def up5_body(s2, u4):
        out = tail.up_shallow(
            tail.pad_pk(s2), tail.pad_pk(u4), w_skip5, w_prev5, epi5,
            t_in=t // 4, act="elu", out_dtype=dt,
        )
        return (s2 + 1e-20 * out[0, 0, 0, 0].astype(s2.dtype), u4)

    results["up5_packed_ms"] = timed_loop(up5_body, s2pk, up4pk)

    up5pk = jax.jit(
        lambda s2, u4: tail.up_shallow(
            tail.pad_pk(s2), tail.pad_pk(u4), w_skip5, w_prev5, epi5,
            t_in=t // 4, act="elu", out_dtype=dt,
        )
    )(s2pk, up4pk)

    ly6, ly7 = stacked["up6"], stacked["up7"]

    def head_body(s1, u5):
        out = tail.head_packed(
            tail.pad_pk_head(s1), tail.pad_pk_head(u5),
            ly6["w"], ly6["b"], ly6["bn_scale"], ly6["bn_shift"],
            ly7["w"], ly7["b"], t2=t // 2, act="elu", compute_dtype=dt,
        )
        return (s1 + 1e-20 * out[0, 0, 0, 0].astype(s1.dtype), u5)

    results["head_packed_ms"] = timed_loop(head_body, s1pk, up5pk)

    head_out = jax.jit(
        lambda s1, u5: tail.head_packed(
            tail.pad_pk_head(s1), tail.pad_pk_head(u5),
            ly6["w"], ly6["b"], ly6["bn_scale"], ly6["bn_shift"],
            ly7["w"], ly7["b"], t2=t // 2, act="elu", compute_dtype=dt,
        )
    )(s1pk, up5pk)

    def unpack_body(h):
        m = tail.unpack_mask_cd(h, s, t // 2, f // 2)
        return (h + 1e-20 * m[0, 0, 0, 0, 0].astype(h.dtype),)

    results["unpack_cd_ms"] = timed_loop(unpack_body, head_out)

    # --- masked iSTFT FB_INV A/B at the 300 s spectrum shape ----------------
    n_req = b * t
    zr = jnp.asarray(rng.standard_normal((2, n_req, 64, 64)) * 0.1, jnp.float32)
    zi = jnp.asarray(rng.standard_normal((2, n_req, 64, 64)) * 0.1, jnp.float32)
    masks = jnp.asarray(
        rng.uniform(0, 1, (s, 2, n_req, 64, f // 64)), jnp.bfloat16
    )
    uw = jnp.asarray([0.25, 0.0, 0.25, 0.25])
    win = jnp.asarray(rng.standard_normal(4096) * 0.01, jnp.float32)

    for fb in (16, 32):
        stft_fused.FB_INV = fb
        stft_fused.masked_istft4096_cd.clear_cache()

        def istft_body(sr, si, m):
            out = stft_fused.masked_istft4096_cd(
                sr, si, m, uw, f, win, n_req
            )
            return (sr + 1e-30 * out[0, 0, 0], si, m)

        try:
            results[f"masked_istft_cd_FB{fb}_ms"] = timed_loop(
                istft_body, zr, zi, masks
            )
        except Exception as e:  # noqa: BLE001 - record and continue
            results[f"masked_istft_cd_FB{fb}_ms"] = f"FAILED: {type(e).__name__}"
        stft_fused.FB_INV = 16
        stft_fused.masked_istft4096_cd.clear_cache()

    print(json.dumps({k: (round(v, 3) if isinstance(v, float) else v)
                      for k, v in results.items()}, indent=1))


if __name__ == "__main__":
    main()
