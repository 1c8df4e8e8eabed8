"""Train stem nets on a musdb-layout corpus with checkpoint-resume + eval.

Layout (the convention upstream Spleeter models were trained on):

    <root>/train/<track>/{mixture.wav, vocals.wav, drums.wav, ...}
    <root>/test/<track>/...            (holdout; SI-SDR eval)

The dataset streams crops from disk (seeked WAV reads -- RAM stays O(crops),
not O(corpus)), silent-stem crops are masked out of the loss, params keep an
EMA shadow for deployment, and checkpoints resume exactly (params + opt
state + step + EMA, core/checkpoint.py). Eval runs the REAL separation
pipeline (STFT -> masks -> iSTFT) and reports per-stem SI-SDR on the
holdout. The reference ships fixed weights only (SURVEY.md section 5); this
closes the loop back into its .dat blob format via --export.

Run: python examples/train.py --data <root> [--stems vocals accompaniment]
     [--steps 2000 --batch 8 --ckpt ckpts --eval-every 500]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from spleeterrt_tpu.config import SeparatorConfig
from spleeterrt_tpu.core import checkpoint, model, train, weights
from spleeterrt_tpu.data import dataset as ds
from spleeterrt_tpu.parallel.mesh import make_mesh


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True, help="musdb-layout root")
    ap.add_argument(
        "--stems", nargs="+", default=["vocals", "accompaniment"]
    )
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--ema", type=float, default=0.999)
    ap.add_argument("--ckpt", default=None, help="checkpoint root (resume)")
    ap.add_argument("--ckpt-every", type=int, default=500)
    ap.add_argument("--eval-every", type=int, default=500)
    ap.add_argument("--eval-seconds", type=float, default=12.0)
    ap.add_argument("--export", default=None, help=".dat blob dir")
    ap.add_argument("--bin-limit", type=int, default=1024)
    ap.add_argument("--time-step", type=int, default=256)
    args = ap.parse_args()

    stems = tuple(args.stems)
    cfg = SeparatorConfig(
        bin_limit=args.bin_limit, time_step=args.time_step,
        num_stems=len(stems),
    )
    train_set = ds.StemDataset(os.path.join(args.data, "train"), stems)
    eval_dir = os.path.join(args.data, "test")
    eval_set = ds.StemDataset(eval_dir, stems) if os.path.isdir(eval_dir) else None
    n_streaming = sum(t.streaming for t in train_set.tracks)
    print(
        f"{len(train_set.tracks)} train tracks ({n_streaming} streamed from"
        f" disk), {len(eval_set.tracks) if eval_set else 0} eval tracks"
    )

    stacked = weights.stack_params(
        [model.init_params(jax.random.PRNGKey(i)) for i in range(len(stems))]
    )
    opt = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(args.lr))
    state = train.init_train_state(stacked, opt, ema=args.ema > 0)

    if args.ckpt:
        latest = checkpoint.latest_step_dir(args.ckpt)
        if latest:
            state = checkpoint.restore(latest, state)
            print(f"resumed from {latest} (step {int(state.step)})")

    n_dev = len(jax.devices())
    stem_par = len(stems) if n_dev % len(stems) == 0 else 1
    mesh = make_mesh(stem_parallel=stem_par)
    state = train.shard_train_state(state, mesh, n_stems=len(stems))
    step_fn = train.make_sharded_train_step(mesh, opt, ema_decay=args.ema)
    print(f"training on {n_dev} device(s), mesh {dict(mesh.shape)}")

    def save(state):
        if args.ckpt:
            host = jax.tree.map(np.asarray, state)
            checkpoint.save(
                os.path.join(args.ckpt, f"step_{int(state.step)}"), host
            )

    def evaluate(state):
        if eval_set is None:
            return
        p = state.ema_params if state.ema_params is not None else state.params
        rep = train.evaluate_si_sdr(
            jax.tree.map(np.asarray, p), eval_set, cfg,
            seconds=args.eval_seconds,
        )
        line = "  ".join(f"{k} {v:+.2f} dB" for k, v in rep.items())
        print(f"eval @ step {int(state.step)}: {line}")

    start_step = int(state.step)
    t0 = time.perf_counter()
    it = ds.batches(
        train_set, cfg, args.batch, seed=start_step,
        steps=max(0, args.steps - start_step),
    )
    for mix_mag, tgt, active in it:
        state, loss = step_fn(state, mix_mag, tgt, active)
        s = int(state.step)
        if s % 25 == 0 or s == args.steps:
            dt = time.perf_counter() - t0
            print(f"step {s:5d}  loss {float(loss):.5f}  ({dt:.1f}s)")
        if args.ckpt_every and s % args.ckpt_every == 0:
            save(state)
        if args.eval_every and s % args.eval_every == 0:
            evaluate(state)

    save(state)
    evaluate(state)

    if args.export:
        os.makedirs(args.export, exist_ok=True)
        p = state.ema_params if state.ema_params is not None else state.params
        folded = train.deploy_params(
            jax.tree.map(np.asarray, p), cfg.transform.fft_size
        )
        for i, name in enumerate(stems):
            p_i = jax.tree.map(lambda a: np.asarray(a[i]), folded)
            weights.save_coeff_file(p_i, os.path.join(args.export, f"{name}.dat"))
        print(f"exported {len(stems)} blobs to {args.export}")


if __name__ == "__main__":
    main()
