"""Training data pipeline: dataset loading, cropping, magnitude batching."""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from spleeterrt_tpu.config import SeparatorConfig
from spleeterrt_tpu.core import model, train, weights
from spleeterrt_tpu.data import dataset as ds
from spleeterrt_tpu.io import audio

CFG = SeparatorConfig(
    bin_limit=512, time_step=64, num_stems=2, compute_dtype=jnp.float32
)
STEMS = ("vocals", "accompaniment")


def _make_dataset(tmp_path, rng, n_tracks=2, n=70000):
    for k in range(n_tracks):
        d = tmp_path / f"track{k}"
        d.mkdir()
        t = np.arange(n) / 44100.0
        vocals = (0.3 * np.sin(2 * np.pi * (300 + 100 * k) * t))[None].repeat(2, 0)
        acc = (0.1 * rng.standard_normal((2, n))).astype(np.float32)
        audio.write_wav(d / "vocals.wav", vocals.astype(np.float32), 44100)
        audio.write_wav(d / "accompaniment.wav", acc, 44100)
        audio.write_wav(d / "mixture.wav", (vocals + acc).astype(np.float32), 44100)
    return ds.StemDataset(tmp_path, STEMS)


def test_dataset_crops_and_batches(tmp_path, rng):
    data = _make_dataset(tmp_path, rng)
    assert len(data.tracks) == 2
    crop = ds.crop_samples(CFG)
    mix, stems = data.sample_crop(rng, crop)
    assert mix.shape == (2, crop)
    assert stems.shape == (2, 2, crop)
    # mixture == sum of stems for these synthetic tracks
    np.testing.assert_allclose(mix, stems.sum(0), atol=2e-4)

    it = ds.batches(data, CFG, batch_size=3, steps=2)
    mix_mag, tgt = next(it)
    assert mix_mag.shape == (3, 64, 512, 2)
    assert tgt.shape == (2, 3, 64, 512, 2)
    assert np.all(np.isfinite(np.asarray(mix_mag)))


def test_train_on_dataset_reduces_loss(tmp_path, rng):
    data = _make_dataset(tmp_path, rng)
    stacked = weights.stack_params(
        [model.init_params(jax.random.PRNGKey(i)) for i in range(2)]
    )
    opt = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(1e-3))
    state = train.init_train_state(stacked, opt)
    step = jax.jit(train.make_train_step(opt, compute_dtype=jnp.float32))

    losses = []
    for mix_mag, tgt in ds.batches(data, CFG, batch_size=2, steps=8, seed=1):
        state, loss = step(state, mix_mag, tgt)
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_missing_mixture_synthesized(tmp_path, rng):
    d = tmp_path / "t0"
    d.mkdir()
    x1 = (0.2 * rng.standard_normal((2, 30000))).astype(np.float32)
    x2 = (0.2 * rng.standard_normal((2, 30000))).astype(np.float32)
    audio.write_wav(d / "vocals.wav", x1, 44100)
    audio.write_wav(d / "accompaniment.wav", x2, 44100)
    data = ds.StemDataset(tmp_path, STEMS)
    np.testing.assert_allclose(
        data.tracks[0].mixture, x1 + x2, atol=1e-6
    )
