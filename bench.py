"""Benchmark: 4-stem separation real-time factor per chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference separates 14 s of audio in ~600 ms on a desktop CPU
with MKL (README.MD "Fast neural network inference"), i.e. ~23.3x real time;
BASELINE.md targets >=100x real time per v5e chip at 4-stem 44.1 kHz.

Timing note: the output is reduced to a scalar checksum inside the jit so
the host materialization forces full execution with a 4-byte transfer --
`block_until_ready` alone under-reports on the tunneled (axon) backend, and
materializing the full stems would time the tunnel, not the chip.

Workload note: 300 s of audio per dispatch. The metric is throughput
(samples/s/chip); each synchronous call over the axon tunnel carries a
~28 ms host<->device round trip plus ~25 ms of fixed device-side prologue,
which a production serving loop amortizes over long tracks or batches (the
chunked executor and separate_batch_sharded already do). 60 s per call
measures ~650x; the marginal rate is ~1800x.
"""

import json
import os
import time

import jax

# Repo-local persistent compilation cache: tunneled-TPU compiles are slow.
_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".cache", "jaxcache")
os.makedirs(_CACHE, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import jax.numpy as jnp
import numpy as np

from spleeterrt_tpu.config import SeparatorConfig
from spleeterrt_tpu.core import model, separate, transform

BASELINE_RTF = 14.0 / 0.6  # reference README claim
SECONDS = 300.0
SR = 44100


def main():
    cfg = SeparatorConfig(
        bin_limit=1536,  # VST 4-stem config (PluginProcessor.cpp:124)
        time_step=256,
        num_stems=4,
        compute_dtype=jnp.bfloat16,
    )
    params4 = [model.init_params(jax.random.PRNGKey(i)) for i in range(4)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *params4)

    n = int(SECONDS * SR)
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal((2, n)) * 0.3, jnp.float32)
    padded = jax.device_put(transform.pad_offline(audio, cfg.transform))

    @jax.jit
    def checksum(stacked, padded):
        out = separate.separate_4stem(stacked, padded, cfg)
        return jnp.sum(jnp.abs(out))

    float(checksum(stacked, padded))  # compile + warm
    # NOTE: queueing multiple async dispatches hangs the tunneled (axon)
    # backend, so this times synchronous calls; each includes a ~28 ms
    # host<->device round trip that a production serving loop would amortize.
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(checksum(stacked, padded))
        times.append(time.perf_counter() - t0)
    best = min(times)
    rtf = SECONDS / best
    print(
        json.dumps(
            {
                "metric": "realtime_factor_4stem_44k1",
                "value": round(rtf, 2),
                "unit": "x_realtime_per_chip",
                "vs_baseline": round(rtf / BASELINE_RTF, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
