"""Stage-by-stage decomposition of the 300 s 4-stem offline pipeline.

Every stage is timed with a LICM-proofed fori_loop (scalar feedback into the
carry) and synchronous dispatches; the dispatch floor is subtracted. Used to
attribute the e2e time (bench.py) to stft / tiles / trunk / head / masked
iSTFT / overlap-add, and to A/B the Pallas encoder + head gates at the
production batch size.

Usage: python benchmarks/bench_stages.py [--iters 8] [--seconds 300]
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
    float(fn(*args))  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--seconds", type=float, default=300.0)
    args = ap.parse_args()
    iters = args.iters

    cfg = SeparatorConfig(
        bin_limit=1536, time_step=256, num_stems=4, compute_dtype=jnp.bfloat16
    )
    tcfg = cfg.transform
    params4 = [model.init_params(jax.random.PRNGKey(i)) for i in range(4)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *params4)

    rng = np.random.default_rng(0)
    n = int(args.seconds * 44100)
    audio = jnp.asarray(rng.standard_normal((2, n)) * 0.3, jnp.float32)
    padded = jax.device_put(transform.pad_offline(audio, tcfg))
    data_size = padded.shape[-1]
    spec = jax.jit(
        lambda p: transform.stft(p, tcfg, data_size)
    )(padded)
    spec = jax.block_until_ready(spec)
    n_frames = spec.shape[-2]
    nt = separate.num_tiles(n_frames, cfg.time_step)
    tiles = jax.jit(lambda s: separate.spec_to_tiles(s, cfg))(spec)
    tiles = jax.block_until_ready(tiles)
    masks4 = jnp.ones((4, 2, n_frames, cfg.bin_limit), jnp.float32)
    uw = jnp.asarray(separate.OUT_BAND_4)
    wkey = transform.synthesis_window_key(tcfg)
    print(f"# frames={n_frames} tiles={nt}", file=sys.stderr)

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

    # --- fused transform stages (kernels/stft_fused.py) ---------------------
    from spleeterrt_tpu.kernels import stft_fused

    n_comp = transform.num_computed_frames(data_size, tcfg)
    n_req = nt * cfg.time_step
    awin = transform.analysis_window(tcfg.fft_size)
    swin = transform.synthesis_window(tcfg)

    def fstft_body(p):
        s_r, s_i = stft_fused.stft4096_packed(p, awin, n_comp, n_req)
        return (p + 1e-30 * s_r[0, 0, 0, 0],)

    results["stft_fused_ms"] = timed_loop(fstft_body, padded)

    s_r, s_i = jax.block_until_ready(
        stft_fused.stft4096_packed(padded, awin, n_comp, n_req)
    )
    masks_cf = jnp.ones((4, 2, n_req, cfg.bin_limit), jnp.float32)

    def ftiles_body(sr, si):
        mag = stft_fused.packed_magnitude(sr, si, cfg.bin_limit)
        t = mag.reshape(2, nt, cfg.time_step, cfg.bin_limit).transpose(1, 2, 3, 0)
        return (sr + 1e-30 * t[0, 0, 0, 0], si)

    results["packed_mag_tiles_ms"] = timed_loop(ftiles_body, s_r, s_i)

    def fistft_body(sr, si, m):
        out = stft_fused.masked_istft4096_packed(
            sr, si, m, uw, cfg.bin_limit, swin, n_frames
        )
        return (sr + 1e-30 * out[0, 0, 0], si, m)

    results["masked_istft_fused_ms"] = timed_loop(fistft_body, s_r, s_i, masks_cf)

    masks_cd = jnp.ones(
        (4, 2, s_r.shape[1], 64, cfg.bin_limit // 64), jnp.float32
    )

    def fistft_cd_body(sr, si, m):
        out = stft_fused.masked_istft4096_cd(
            sr, si, m, uw, cfg.bin_limit, swin, n_frames
        )
        return (sr + 1e-30 * out[0, 0, 0], si, m)

    results["masked_istft_cd_ms"] = timed_loop(fistft_cd_body, s_r, s_i, masks_cd)

    # Mask relayout NHWC tiles -> (S, 2, frames, F) (feeds the iSTFT).
    masks_tiles = jnp.ones((4, nt, cfg.time_step, cfg.bin_limit, 2), jnp.float32)

    def mt_body(m):
        cf = m.transpose(0, 4, 1, 2, 3).reshape(4, 2, n_req, cfg.bin_limit)
        return (m + 1e-30 * cf[0, 0, 0, 0],)

    results["mask_relayout_ms"] = timed_loop(mt_body, masks_tiles)

    # --- canonical transform stages ------------------------------------------
    def stft_body(p):
        s = transform.stft(p, tcfg, data_size)
        return (p + 1e-30 * jnp.abs(s[0, 0, 0]),)

    results["stft_ms"] = timed_loop(stft_body, padded)

    def tiles_body(s):
        t = separate.spec_to_tiles(s, cfg)
        return (s + 1e-30 * t[0, 0, 0, 0],)

    results["spec_to_tiles_ms"] = timed_loop(tiles_body, spec)

    from spleeterrt_tpu.kernels import pallas_fft

    def mirfft_body(s, m):
        fr = pallas_fft.masked_irfft4096_pallas(s, m, uw, cfg.bin_limit, wkey)
        return (s + 1e-30 * fr[0, 0, 0, 0], m)

    results["masked_irfft_ms"] = timed_loop(mirfft_body, spec, masks4)

    def ola_body(s, m):
        fr = pallas_fft.masked_irfft4096_pallas(s, m, uw, cfg.bin_limit, wkey)
        out = jax.vmap(lambda f: transform.overlap_add(f, tcfg))(fr)
        return (s + 1e-30 * out[0, 0, 0], m)

    results["masked_irfft_plus_ola_ms"] = timed_loop(ola_body, spec, masks4)

    # --- packed U-Net (round 4) ---------------------------------------------
    def unet_packed_body(t):
        masks = model.multi_stem_masks_cd(
            stacked, t, 1, jnp.bfloat16, "exact"
        )
        return (t + 1e-20 * jnp.sum(masks).astype(t.dtype),)

    model.FORCE_PACKED_UNET = True
    results["unet_packed_cd_ms"] = timed_loop(unet_packed_body, tiles)
    model.FORCE_PACKED_UNET = None

    # --- U-Net stages at the production batch --------------------------------
    for enc in (False, True):
        for head in (False, True):
            model.FORCE_PALLAS_ENCODER = enc
            model.FORCE_PALLAS_HEAD = head  # past the batch-size gate

            def unet_body(t):
                masks = model.multi_stem_forward(
                    stacked, t, 1, jnp.bfloat16, "exact", pallas_head=head
                )
                return (t + 1e-20 * jnp.sum(masks),)

            key = f"unet_enc={'pallas' if enc else 'xla'}_head={'pallas' if head else 'xla'}_ms"
            results[key] = timed_loop(unet_body, tiles)
            model.FORCE_PALLAS_ENCODER = None
            model.FORCE_PALLAS_HEAD = None

    print(json.dumps({k: round(v, 3) for k, v in results.items()}, indent=1))


if __name__ == "__main__":
    main()
