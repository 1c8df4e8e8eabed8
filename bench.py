"""Benchmark: 4-stem separation real-time factor per chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", plus
"marginal_rtf" (dispatch overhead subtracted) and "mfu_pct"}.

Baseline: the reference separates 14 s of audio in ~600 ms on a desktop CPU
with MKL (README.MD "Fast neural network inference"), i.e. ~23.3x real time;
BASELINE.md targets >=100x real time per v5e chip at 4-stem 44.1 kHz.

Timing note: the output is reduced to a scalar checksum inside the jit so
the host materialization forces full execution with a 4-byte transfer --
`block_until_ready` alone under-reports on the tunneled (axon) backend, and
materializing the full stems would time the tunnel, not the chip.

Workload note: 300 s of audio per dispatch. The metric is throughput
(samples/s/chip); each synchronous call over the axon tunnel carries a
~28 ms host<->device round trip plus fixed device-side prologue, which a
production serving loop amortizes over long tracks or batches (the chunked
executor and separate_batch_sharded already do). The marginal rate -- the
slope between a 300 s and a 150 s dispatch, which cancels every fixed
per-call cost -- is reported alongside; per-round numbers live in
BENCH_r*.json and the stage-level study in docs/PERF.md.
"""

import json
import math
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
SECONDS_SMALL = 150.0  # second size for the marginal (slope) rate
SR = 44100

# Peak dense bf16 matmul throughput per chip, for the MFU estimate.
_PEAK_BF16 = {
    "TPU v5 lite": 197e12,  # v5e
    "TPU v5e": 197e12,
    "TPU v4": 275e12,
    "TPU v6 lite": 918e12,  # v6e / Trillium
}


def _unet_flops_per_tile(cfg: SeparatorConfig) -> float:
    """Analytical conv MACs*2 of one U-Net forward over one (T, F) tile."""
    t, f = cfg.time_step, cfg.bin_limit
    total = 0.0
    th, fh = t, f
    for cin, cout in model.ENCODER_CHANNELS:
        th, fh = th // 2, fh // 2
        total += 2.0 * th * fh * cout * 25 * cin
    th, fh = t // 64, f // 64
    for cin, cout in model.DECODER_CHANNELS:
        # transposed conv: every input position drives 25 taps
        total += 2.0 * th * fh * cin * 25 * cout
        th, fh = th * 2, fh * 2
    total += 2.0 * t * f * 2 * 16  # final 4x4 dilated conv, 1->2 ch
    return total


def _pipeline_flops(seconds: float, cfg: SeparatorConfig, n_stems: int) -> float:
    """Useful FLOPs of one 4-stem dispatch: U-Net convs + true-FFT cost
    (2.5 N log2 N per real transform, NOT the matmul-FFT's inflated count)."""
    n = int(seconds * SR)
    _, final = transform.offline_pad_sizes(n, cfg.transform)
    tcfg = cfg.transform
    n_out = transform.num_output_frames(final, tcfg)
    nt = separate.num_tiles(n_out, cfg.time_step)
    fft = 2.5 * tcfg.fft_size * math.log2(tcfg.fft_size)
    n_fft = 2 * n_out * (1 + n_stems)  # fwd (2ch) + S stems x 2ch inverse
    return nt * n_stems * _unet_flops_per_tile(cfg) + n_fft * fft


def main():
    cfg = SeparatorConfig(
        bin_limit=1536,  # VST 4-stem config (PluginProcessor.cpp:124)
        time_step=256,
        num_stems=4,
        compute_dtype=jnp.bfloat16,
    )
    params4 = [model.init_params(jax.random.PRNGKey(i)) for i in range(4)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *params4)

    @jax.jit
    def checksum(stacked, padded):
        out = separate.separate_4stem(stacked, padded, cfg)
        return jnp.sum(jnp.abs(out))

    def timed(seconds: float) -> float:
        n = int(seconds * SR)
        rng = np.random.default_rng(0)
        audio = jnp.asarray(rng.standard_normal((2, n)) * 0.3, jnp.float32)
        padded = jax.device_put(transform.pad_offline(audio, cfg.transform))
        float(checksum(stacked, padded))  # compile + warm
        # NOTE: queueing multiple async dispatches hangs the tunneled (axon)
        # backend, so this times synchronous calls; each includes a ~28 ms
        # host<->device round trip that the marginal rate cancels.
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(checksum(stacked, padded))
            times.append(time.perf_counter() - t0)
        return min(times)

    t_small = timed(SECONDS_SMALL)
    t_big = timed(SECONDS)
    rtf = SECONDS / t_big
    marginal = (SECONDS - SECONDS_SMALL) / max(t_big - t_small, 1e-9)

    kind = jax.devices()[0].device_kind
    peak = _PEAK_BF16.get(kind, 197e12)
    mfu = _pipeline_flops(SECONDS, cfg, 4) / t_big / peak

    print(
        json.dumps(
            {
                "metric": "realtime_factor_4stem_44k1",
                "value": round(rtf, 2),
                "unit": "x_realtime_per_chip",
                "vs_baseline": round(rtf / BASELINE_RTF, 2),
                "marginal_rtf": round(marginal, 2),
                "mfu_pct": round(100.0 * mfu, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
