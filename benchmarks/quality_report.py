"""Quality-acceptance report: fused-vs-canonical and bf16-vs-fp32 bounds.

BASELINE.md's acceptance criterion is that separated stems match the
reference within an SNR/SDR bound (the reference itself claims ~1e-4 MSE
against the TensorFlow model, README.MD). The oracle tests pin the
canonical formulation to the C semantics bit-for-bit on small shapes; this
script records the END-TO-END numbers at the production config on a
deterministic synthetic track, so the bound is a committed artifact
(benchmarks/results/quality.json + docs/PARITY.md) rather than a test
assertion threshold.

Variants compared (each runs in its own subprocess so the backend and
kernel gates are what a user would actually get):

- cpu_fp32:      true-CPU canonical formulation, float32 -- the truth.
- tpu_can_fp32:  canonical formulation on the chip, float32 (XLA numerics).
- tpu_fused_f32: fused Pallas graph (stft_fused + packed U-Net), float32.
- tpu_fused_bf16: the production default (bfloat16 compute).

Reported: per-stem SNR / SI-SDR / MSE of each variant against cpu_fp32,
plus fused-vs-canonical-on-chip and bf16-vs-fp32 isolations, for the
4-stem graph and the fused 3-stem graph.

Usage: python benchmarks/quality_report.py            (orchestrates)
       python benchmarks/quality_report.py --stage compute ...  (internal)
"""

import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SR = 44100
SECONDS = 12.0


def synth_track(n: int) -> np.ndarray:
    """Deterministic tone-stack + noise stereo mixture."""
    rng = np.random.default_rng(0)
    t = np.arange(n) / SR
    x = np.zeros((2, n), np.float32)
    for freq, amp in ((110.0, 0.2), (440.0, 0.15), (1320.0, 0.1), (3500.0, 0.05)):
        ph = rng.uniform(0, 2 * np.pi, size=2)[:, None]
        x += amp * np.sin(2 * np.pi * freq * t[None, :] + ph).astype(np.float32)
    x += 0.1 * rng.standard_normal((2, n)).astype(np.float32)
    return x


def compute_stage(args):
    import jax

    if args.backend == "cpu":
        jax.config.update("jax_platforms", "cpu")
    else:
        cache = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".cache", "jaxcache",
        )
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    import jax.numpy as jnp

    from spleeterrt_tpu.config import SeparatorConfig
    from spleeterrt_tpu.core import model, separate, transform, weights

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    cfg = SeparatorConfig(
        bin_limit=1536, time_step=256, num_stems=4, compute_dtype=dtype
    )
    n = int(SECONDS * SR)
    audio = jnp.asarray(synth_track(n))
    padded = transform.pad_offline(audio, cfg.transform)
    preshift, _ = transform.offline_pad_sizes(n, cfg.transform)
    pallas = args.formulation == "fused"

    params4 = weights.stack_params(
        [model.init_params(jax.random.PRNGKey(i)) for i in range(4)]
    )
    stems4 = separate.separate_nstem(
        params4, padded, cfg, separate.OUT_BAND_4, pallas=pallas
    )
    stems4 = np.asarray(stems4[..., preshift : preshift + n], np.float32)

    p4 = model.init_params(jax.random.PRNGKey(10))
    p2 = model.init_params(jax.random.PRNGKey(11))
    stems3 = separate.separate_3stem(p4, p2, padded, cfg, pallas=pallas)
    stems3 = np.asarray(stems3[..., preshift : preshift + n], np.float32)

    np.savez(args.out, stems4=stems4, stems3=stems3)
    print(f"saved {args.out} backend={jax.default_backend()}", file=sys.stderr)


VARIANTS = {
    "cpu_fp32": ["--backend", "cpu", "--dtype", "fp32", "--formulation", "canonical"],
    "tpu_can_fp32": ["--backend", "default", "--dtype", "fp32", "--formulation", "canonical"],
    "tpu_fused_fp32": ["--backend", "default", "--dtype", "fp32", "--formulation", "fused"],
    "tpu_fused_bf16": ["--backend", "default", "--dtype", "bf16", "--formulation", "fused"],
}

STEMS4 = ("drums", "bass", "accompaniment", "vocals")
STEMS3 = ("drums", "vocals", "accompaniment")


def compare(a: np.lib.npyio.NpzFile, b, key, names):
    from spleeterrt_tpu.utils import metrics

    out = {}
    for i, name in enumerate(names):
        out[name] = {
            "snr_db": round(metrics.snr_db(b[key][i], a[key][i]), 2),
            "si_sdr_db": round(metrics.si_sdr_db(b[key][i], a[key][i]), 2),
            "mse": float(f"{metrics.mse(b[key][i], a[key][i]):.3e}"),
        }
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", choices=["compute"], default=None)
    ap.add_argument("--backend", default="default")
    ap.add_argument("--dtype", default="fp32")
    ap.add_argument("--formulation", default="canonical")
    ap.add_argument("--out", default=None)
    ap.add_argument("--workdir", default="/tmp/spleeterrt_quality")
    args = ap.parse_args()
    if args.stage == "compute":
        compute_stage(args)
        return

    os.makedirs(args.workdir, exist_ok=True)
    files = {}
    for name, flags in VARIANTS.items():
        out = os.path.join(args.workdir, f"{name}.npz")
        files[name] = out
        if os.path.exists(out):
            print(f"# reusing {out}", file=sys.stderr)
            continue
        subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--stage", "compute",
             *flags, "--out", out],
            check=True,
        )

    loaded = {k: np.load(v) for k, v in files.items()}
    truth = loaded["cpu_fp32"]
    report = {"config": "bin_limit=1536 time_step=256, 12 s synthetic track"}
    for name in ("tpu_can_fp32", "tpu_fused_fp32", "tpu_fused_bf16"):
        report[f"{name}_vs_cpu_fp32_4stem"] = compare(
            truth, loaded[name], "stems4", STEMS4
        )
    report["tpu_fused_bf16_vs_cpu_fp32_3stem"] = compare(
        truth, loaded["tpu_fused_bf16"], "stems3", STEMS3
    )
    # Isolations: formulation alone (same chip, fp32) and dtype alone.
    report["fused_vs_canonical_on_chip_fp32_4stem"] = compare(
        loaded["tpu_can_fp32"], loaded["tpu_fused_fp32"], "stems4", STEMS4
    )
    report["bf16_vs_fp32_fused_4stem"] = compare(
        loaded["tpu_fused_fp32"], loaded["tpu_fused_bf16"], "stems4", STEMS4
    )
    report["fused_vs_canonical_on_chip_fp32_3stem"] = compare(
        loaded["tpu_can_fp32"], loaded["tpu_fused_fp32"], "stems3", STEMS3
    )
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
