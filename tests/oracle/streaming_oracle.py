"""Hop-by-hop NumPy oracle of the VST streaming engine semantics.

Literal re-creation of VST/Source/Spleeter4Stems.c: input ring, asymmetric
windows with SAMPLESHIFT pre-shift, per-hop Hartley transform, synthesis from
the previous double-buffer's spectra x stale masks, overlap-add FIFO, and
the double-buffer swap + deferred mask handoff at each timeStep boundary
(the pthread async protocol emulated synchronously: masks "launched" at
boundary k are "joined" -- become visible -- at boundary k+1).
"""

from __future__ import annotations

import numpy as np

from tests.oracle.reference_oracle import _fht, unet

FFTSIZE = 4096
OVPSIZE = 1024
HOP = OVPSIZE
SAMPLESHIFT = FFTSIZE - 2 * OVPSIZE
HALFWNDLEN = FFTSIZE // 2 + 1


def asymmetric_windows(freq_temporal: float = 1.0):
    """Port of getAsymmetricWindow (Spleeter4Stems.c:383-401), incl. the
    freq_temporal exponent with its 2.0 clamp on the rising tail."""
    k, m = FFTSIZE, OVPSIZE
    wa = np.zeros(k)
    n = 2 * (k - m) + 2
    for i in range(k - m):
        wa[i] = (0.5 * (1.0 - np.cos(2.0 * np.pi * (i + 1.0) / n))) ** freq_temporal
    ft = min(freq_temporal, 2.0)
    n = 2 * m + 2
    for i in range(k - m, k):
        wa[i] = np.sqrt(
            0.5 * (1.0 - np.cos(2.0 * np.pi * ((m + i - (k - m)) + 1.0) / n))
        ) ** ft
    n = 2 * m
    ws = np.zeros(k)
    for i in range(k - 2 * m, k):
        ws[i] = (
            0.5 * (1.0 - np.cos(2.0 * np.pi * (i - (k - 2 * m)) / n))
        ) / wa[i]
    ws_shifted = np.zeros(k)
    ws_shifted[: k - SAMPLESHIFT] = ws[SAMPLESHIFT:]
    return wa, ws_shifted


def stream_oracle(
    fields_list: list[dict],
    audio: np.ndarray,  # (2, n), n multiple of HOP
    bin_limit: int,
    time_step: int,
    out_band: tuple[float, ...],
    freq_temporal: float = 1.0,
):
    """Returns (S, 2, n) streaming output, matching the C engine hop cadence."""
    n_stems = len(fields_list)
    wa, ws = asymmetric_windows(freq_temporal)
    wa_scaled = wa * (1.0 / FFTSIZE) * 0.5  # Spleeter4Stems.c:415-416

    n = audio.shape[-1]
    n_hops = n // HOP
    # complexSpectrogram[buf][plane][cursor][bin]; planes = LRe, LIm, RRe, RIm
    cspec = np.zeros((2, 4, time_step, HALFWNDLEN))
    magnitude = np.zeros((2, time_step, bin_limit))
    masks = np.ones((2, n_stems, 2, time_step, bin_limit))
    pending = None  # (target_buffer, masks) launched at the last boundary
    overlap = np.zeros((n_stems, 2, HOP))
    ring = np.zeros((2, FFTSIZE))
    pos = 0
    ptr = 0
    cursor = 0
    out = np.zeros((n_stems, 2, n))

    for h in range(n_hops):
        ring[:, pos : pos + HOP] = audio[:, h * HOP : (h + 1) * HOP]
        pos = (pos + HOP) % FFTSIZE
        idx = (np.arange(FFTSIZE) + pos) % FFTSIZE
        frame = ring[:, idx] * wa_scaled  # chronological window

        # --- synthesis from previous buffer (Spleeter4Stems.c:272-320) ----
        for s in range(n_stems):
            for ch in range(2):
                re = cspec[ptr, 2 * ch, cursor]
                im = cspec[ptr, 2 * ch + 1, cursor]
                m = np.full(HALFWNDLEN, out_band[s])
                m[:bin_limit] = masks[ptr, s, ch, cursor]
                b = np.zeros(FFTSIZE)
                b[0] = re[0] * m[0]
                j = np.arange(1, HALFWNDLEN)
                b[j] = (re[j] + im[j]) * m[j]
                b[FFTSIZE - j] = (re[j] - im[j]) * m[j]
                td = _fht(b)
                synth = td[SAMPLESHIFT:] * ws[: FFTSIZE - SAMPLESHIFT]
                out[s, ch, h * HOP : (h + 1) * HOP] = (
                    overlap[s, ch] + synth[:HOP]
                )
                overlap[s, ch] = synth[HOP : 2 * HOP]

        # --- analysis of the current frame (Spleeter4Stems.c:321-349) ----
        for ch in range(2):
            hh = _fht(frame[ch])
            lr = hh[0] * 2.0
            cspec[ptr, 2 * ch, cursor, 0] = lr
            cspec[ptr, 2 * ch + 1, cursor, 0] = 0.0
            magnitude[ch, cursor, 0] = abs(lr) * FFTSIZE
            j = np.arange(1, HALFWNDLEN)
            re = hh[j] + hh[FFTSIZE - j]
            im = hh[j] - hh[FFTSIZE - j]
            cspec[ptr, 2 * ch, cursor, 1:] = re
            cspec[ptr, 2 * ch + 1, cursor, 1:] = im
            magnitude[ch, cursor, 1:bin_limit] = (
                np.hypot(re, im)[: bin_limit - 1] * FFTSIZE
            )

        cursor += 1
        if cursor >= time_step:
            # join the NN "threads" launched at the previous boundary
            if pending is not None:
                tgt, mk = pending
                masks[tgt] = mk
            ptr = 1 - ptr  # buffer swap
            tmp = magnitude.copy()  # race-avoidance copy
            new_masks = np.stack(
                [unet(f, tmp, stem_mode=1) for f in fields_list]
            )  # (S, 2, T, binL) with unet input (2, T, binL)
            # reshape: unet returns (2ch, T, F) mask per stem
            pending = (1 - ptr, new_masks)
            cursor = 0

    return out
