"""Training data pipeline: stem datasets -> spectrogram-magnitude batches.

The reference ships no training (fixed weights only); this pipeline feeds
core/train.py. Layout follows the musdb convention the upstream Spleeter
models were trained on: one directory per track containing `mixture.wav`
plus one WAV per stem. Decode/resample run on the host (NumPy / native C++
paths from io/); the STFT-magnitude transform runs under jit on the
accelerator, batched over random crops.
"""

from __future__ import annotations

import functools
import os
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from spleeterrt_tpu.config import SeparatorConfig
from spleeterrt_tpu.core import transform
from spleeterrt_tpu.io import audio as audio_io, resample


@dataclass
class Track:
    mixture: np.ndarray  # (2, n) float32 at 44.1 kHz
    stems: dict[str, np.ndarray]


def load_track(
    track_dir: str | os.PathLike, stem_names: tuple[str, ...],
    sample_rate: int = 44100,
) -> Track:
    """Read mixture.wav + <stem>.wav files, resampling to `sample_rate`."""

    def read(name):
        data = audio_io.load_audio(os.path.join(track_dir, f"{name}.wav"))
        x = data.samples
        if data.sample_rate != sample_rate:
            x = resample.resample(x, data.sample_rate, sample_rate)
        if x.shape[0] == 1:
            x = np.repeat(x, 2, axis=0)
        return x[:2].astype(np.float32)

    stems = {s: read(s) for s in stem_names}
    mix_path = os.path.join(track_dir, "mixture.wav")
    if os.path.exists(mix_path):
        mixture = read("mixture")
    else:
        n = min(x.shape[1] for x in stems.values())
        mixture = np.sum([x[:, :n] for x in stems.values()], axis=0)
    return Track(mixture=mixture, stems=stems)


class StemDataset:
    """Directory of track dirs -> random (mixture, stems) crops."""

    def __init__(
        self, root: str | os.PathLike, stem_names: tuple[str, ...],
        sample_rate: int = 44100,
    ):
        self.stem_names = stem_names
        self.tracks = []
        for name in sorted(os.listdir(root)):
            d = os.path.join(root, name)
            if os.path.isdir(d):
                self.tracks.append(load_track(d, stem_names, sample_rate))
        if not self.tracks:
            raise ValueError(f"no track directories under {root}")

    def sample_crop(
        self, rng: np.random.Generator, crop_len: int
    ) -> tuple[np.ndarray, np.ndarray]:
        """Random track + random crop -> (mix (2, L), stems (S, 2, L))."""
        tr = self.tracks[rng.integers(len(self.tracks))]
        n = min(
            tr.mixture.shape[1], *(s.shape[1] for s in tr.stems.values())
        )
        start = int(rng.integers(max(1, n - crop_len + 1)))
        sl = slice(start, start + crop_len)
        mix = np.zeros((2, crop_len), np.float32)
        take = tr.mixture[:, sl]
        mix[:, : take.shape[1]] = take
        stems = np.zeros((len(self.stem_names), 2, crop_len), np.float32)
        for i, name in enumerate(self.stem_names):
            take = tr.stems[name][:, sl]
            stems[i, :, : take.shape[1]] = take
        return mix, stems


def crop_samples(cfg: SeparatorConfig) -> int:
    """Audio samples per training crop: one spectrogram tile plus the
    analysis frame tail."""
    return cfg.time_step * cfg.transform.hop + (
        cfg.transform.fft_size - cfg.transform.hop
    )


@functools.partial(jax.jit, static_argnames=("cfg",))
def to_magnitudes(
    mix: jax.Array,  # (B, 2, L)
    stems: jax.Array,  # (B, S, 2, L)
    cfg: SeparatorConfig,
):
    """Crops -> (mix_mag (B,T,F,2), target_mags (S,B,T,F,2)), normalized by
    fft_size into O(1) for stable from-scratch optimization."""
    t, bl = cfg.time_step, cfg.bin_limit
    n = mix.shape[-1]
    scale = 1.0 / cfg.transform.fft_size

    def mags(x):  # (..., 2, L) -> (..., T, F, 2)
        spec = transform.stft(x, cfg.transform, n)
        m = jnp.abs(spec[..., :t, :bl]) * scale
        return jnp.moveaxis(m, -3, -1)

    mix_mag = mags(mix)
    tgt = mags(jnp.moveaxis(stems, 1, 0))  # (S, B, T, F, 2)
    return mix_mag, tgt


def batches(
    dataset: StemDataset,
    cfg: SeparatorConfig,
    batch_size: int,
    seed: int = 0,
    steps: int | None = None,
):
    """Infinite (or `steps`-bounded) iterator of device-ready batches."""
    rng = np.random.default_rng(seed)
    crop = crop_samples(cfg)
    i = 0
    while steps is None or i < steps:
        mixes, stems = zip(
            *(dataset.sample_crop(rng, crop) for _ in range(batch_size))
        )
        yield to_magnitudes(
            jnp.asarray(np.stack(mixes)), jnp.asarray(np.stack(stems)), cfg
        )
        i += 1
