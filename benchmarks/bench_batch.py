"""Multi-track batched separation: samples/s and MFU vs batch size.

The TPU's structural advantage over the reference's one-song CLI
(Executable/main.c:444-674) is fleet throughput: many tracks per dispatch
keep the MXU fed instead of paying the per-dispatch prologue per song.
Measures `parallel.mesh.make_batch_fn` (single chip, 1-device mesh) at
B in {1, 4, 16, 64} tracks per dispatch, VST 4-stem config.

Per config prints one JSON line with:
  audio samples/s/chip, total realtime factor, and MFU (XLA cost-analysis
  FLOPs / wall time / 197 TFLOP/s v5e bf16 peak).

Usage: python benchmarks/bench_batch.py [--reps 3]
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

from spleeterrt_tpu.config import SeparatorConfig
from spleeterrt_tpu.core import model, transform
from spleeterrt_tpu.parallel import mesh as mesh_mod

SR = 44100
V5E_BF16_PEAK = 197e12

# (tracks per dispatch, seconds per track): 64 x 15 s bounds the batch's
# pre-overlap-add frame tensor (~5.6 GB) inside v5e HBM.
CONFIGS = [(1, 60.0), (4, 60.0), (16, 60.0), (64, 15.0)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--configs", type=str, default=None,
                    help="comma list like 1:60,16:60")
    args = ap.parse_args()
    configs = CONFIGS
    if args.configs:
        configs = [
            (int(b), float(s))
            for b, s in (c.split(":") for c in args.configs.split(","))
        ]

    cfg = SeparatorConfig(
        bin_limit=1536, time_step=256, num_stems=4, compute_dtype=jnp.bfloat16
    )
    params4 = [model.init_params(jax.random.PRNGKey(i)) for i in range(4)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *params4)
    mesh = mesh_mod.make_mesh(stem_parallel=1)
    rng = np.random.default_rng(0)

    for b, seconds in configs:
        n = int(seconds * SR)
        tracks = np.asarray(
            rng.standard_normal((b, 2, n)) * 0.3, np.float32
        )
        padded = np.stack(
            [np.asarray(transform.pad_offline(t, cfg.transform)) for t in tracks]
        )
        padded = jax.device_put(jnp.asarray(padded))

        batch_fn, _ = mesh_mod.make_batch_fn(cfg, mesh, 4)

        @jax.jit
        def run(params, tracks):
            return jnp.sum(jnp.abs(batch_fn(params, tracks)))

        lowered = run.lower(stacked, padded)
        compiled = lowered.compile()
        try:
            flops = float(compiled.cost_analysis()["flops"])
        except Exception:
            flops = float("nan")

        float(run(stacked, padded))  # warm
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            float(run(stacked, padded))
            best = min(best, time.perf_counter() - t0)

        total_audio = b * seconds
        print(
            json.dumps(
                {
                    "metric": f"batch_B{b}_L{int(seconds)}s",
                    "value": round(total_audio * SR / best, 0),
                    "unit": "audio_samples_per_s_per_chip",
                    "vs_baseline": round(total_audio / best, 1),
                    "dispatch_ms": round(best * 1e3, 1),
                    "mfu_pct": round(100 * flops / best / V5E_BF16_PEAK, 2)
                    if flops == flops
                    else None,
                    "xla_gflops": round(flops / 1e9, 1) if flops == flops else None,
                }
            )
        )


if __name__ == "__main__":
    main()
