"""Scaling-efficiency harness (BASELINE: >=80% at 1 chip / 1 host / N hosts).

Measures samples/s of the 4-stem pipeline at increasing device counts using
whatever devices are visible:

- On a multi-chip host or pod slice: real scaling numbers.
- On one chip: prints the single-chip figure only.
- With JAX_PLATFORMS=cpu and --virtual N: functional scaling check on the
  virtual host mesh (exercises the sharded program, not real bandwidth).

Usage: python benchmarks/bench_scaling.py [--seconds 60] [--virtual 8]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=60.0)
    ap.add_argument("--virtual", type=int, default=0,
                    help="force N virtual CPU devices (functional check)")
    ap.add_argument("--stem-parallel", type=int, default=1)
    args = ap.parse_args()

    if args.virtual:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.virtual}"
        )
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    if args.virtual:
        # The axon plugin rewrites jax_platforms at import; pin it back.
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from spleeterrt_tpu.config import SeparatorConfig
    from spleeterrt_tpu.core import model, transform
    from spleeterrt_tpu.parallel import mesh as pmesh, timeshard

    if args.virtual:
        # Functional scaling check: tiny config so CPU compiles stay fast;
        # throughput numbers are NOT meaningful off-accelerator.
        cfg = SeparatorConfig(
            bin_limit=512, time_step=64, num_stems=4,
            compute_dtype=jnp.float32,
        )
    else:
        cfg = SeparatorConfig(
            bin_limit=1536, time_step=256, num_stems=4,
            compute_dtype=jnp.bfloat16,
        )
    params4 = [model.init_params(jax.random.PRNGKey(i)) for i in range(4)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *params4)

    n = int(args.seconds * 44100)
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal((2, n)) * 0.3, jnp.float32)

    devices = jax.devices()
    results = {}
    counts = [d for d in (1, 2, 4, 8, len(devices)) if d <= len(devices)]
    for nd in sorted(set(counts)):
        m = pmesh.make_mesh(devices[:nd], stem_parallel=min(args.stem_parallel, nd))

        def run():
            out = timeshard.separate_4stem_timesharded_padded(
                stacked, audio, cfg, m
            )
            return jnp.sum(jnp.abs(out))

        f = jax.jit(run)
        float(f())  # compile + warm
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(f())
            ts.append(time.perf_counter() - t0)
        sps = n / min(ts)
        results[nd] = sps
        eff = sps / (results[1] * nd) if 1 in results and nd > 1 else 1.0
        print(json.dumps({
            "devices": nd,
            "samples_per_sec": round(sps),
            "rtf": round(sps / 44100, 1),
            "scaling_efficiency": round(eff, 3),
            "functional_check": bool(args.virtual),
        }), flush=True)


if __name__ == "__main__":
    main()
