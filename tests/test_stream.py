"""Streaming engine: oracle parity, latency, and chunked-push equivalence."""

import numpy as np
import jax.numpy as jnp

from spleeterrt_tpu.config import SeparatorConfig
from spleeterrt_tpu.core import model, weights
from spleeterrt_tpu.runtime import stream
from tests.oracle import reference_oracle, streaming_oracle

CFG = SeparatorConfig(
    bin_limit=512, time_step=64, num_stems=4, compute_dtype=jnp.float32
)
OUT_BAND = (0.25, 0.0)


def _setup(rng, n_stems=2):
    blobs = [weights.random_blob(rng, 0.02) for _ in range(n_stems)]
    stacked = weights.stack_params([weights.blob_to_params(b) for b in blobs])
    fields = [reference_oracle.unpack_blob(b) for b in blobs]
    return stacked, fields


def test_windows_match_oracle():
    wa_o, ws_o = streaming_oracle.asymmetric_windows()
    wa, ws = stream.asymmetric_windows()
    np.testing.assert_allclose(wa, wa_o, atol=1e-12)
    np.testing.assert_allclose(ws, ws_o[: stream.SYNTH_LEN], atol=1e-12)


def test_stream_matches_hop_oracle(rng):
    """Block-level scan == literal hop-by-hop VST engine semantics."""
    stacked, fields = _setup(rng)
    n = 3 * CFG.time_step * 1024  # 3 blocks
    t = np.arange(n) / 44100.0
    x = (
        0.3 * np.sin(2 * np.pi * 440 * t)
        + 0.1 * rng.standard_normal(n)
    ).astype(np.float32)
    audio = np.stack([x, 0.7 * x])

    got = np.asarray(
        stream.stream_scan(stacked, jnp.asarray(audio), CFG, 2, OUT_BAND)
    )
    ref = streaming_oracle.stream_oracle(
        fields, audio.astype(np.float64), CFG.bin_limit, CFG.time_step, OUT_BAND
    )
    assert got.shape == ref.shape == (2, 2, n)
    np.testing.assert_allclose(got, ref, atol=5e-4)


def test_stream_latency_reconstruction(rng):
    """With pass-through masks, output == input delayed (2T+1) hops."""
    # Final-layer bias +20 -> sigmoid saturates to 1 -> mask of ones.
    params = model.init_params(jnp.array([0, 1], jnp.uint32))
    params = {
        k: {f: jnp.zeros_like(v) for f, v in layer.items()}
        for k, layer in params.items()
    }
    params["up7"]["b"] = jnp.full((2,), 20.0)
    stacked = weights.stack_params([params])

    n = 4 * CFG.time_step * 1024
    t = np.arange(n) / 44100.0
    x = (0.4 * np.sin(2 * np.pi * 1000 * t)).astype(np.float32)  # in-band
    audio = np.stack([x, x])
    out = np.asarray(
        stream.stream_scan(stacked, jnp.asarray(audio), CFG, 1, (0.25,))
    )[0]

    delay = (2 * CFG.time_step + 1) * 1024
    lo, hi = delay + 4096, n - 4096
    np.testing.assert_allclose(
        out[0, lo:hi], x[lo - delay : hi - delay], atol=2e-3
    )


def test_streaming_separator_chunked_equals_scan(rng):
    """Arbitrary push chunk sizes produce the scan output sample-exactly."""
    stacked, _ = _setup(rng)
    n = 2 * CFG.time_step * 1024 + 5000
    audio = (rng.standard_normal((2, n)) * 0.3).astype(np.float32)

    n_scan = (n // (CFG.time_step * 1024)) * CFG.time_step * 1024
    ref = np.asarray(
        stream.stream_scan(stacked, jnp.asarray(audio[:, :n_scan]), CFG, 2, OUT_BAND)
    )

    sep = stream.StreamingSeparator(stacked, CFG, 2, OUT_BAND)
    outs = []
    pos = 0
    for size in [1, 333, 1024, 7777, 100000, n]:
        take = min(size, n - pos)
        if take <= 0:
            break
        outs.append(sep.process(audio[:, pos : pos + take]))
        pos += take
    got = np.concatenate(outs, axis=-1)
    assert got.shape[-1] == pos
    np.testing.assert_allclose(got[..., :n_scan], ref, atol=2e-5)


def test_stream_output_is_finite_and_delayed_silence(rng):
    """First two blocks of output are silence (zero spec1/spec2 carry)."""
    stacked, _ = _setup(rng)
    audio = (rng.standard_normal((2, 2 * CFG.time_step * 1024)) * 0.3).astype(
        np.float32
    )
    out = np.asarray(stream.stream_scan(stacked, jnp.asarray(audio), CFG, 2, OUT_BAND))
    np.testing.assert_array_equal(out, np.zeros_like(out))


def test_chunked_executor_matches_monolithic(rng):
    """Bounded-memory chunked offline path == the monolithic 4-stem graph."""
    from spleeterrt_tpu.core import separate as sep
    from spleeterrt_tpu.runtime import executor

    stacked, _ = _setup(rng, n_stems=4)
    n = 200000
    audio = (rng.standard_normal((2, n)) * 0.3).astype(np.float32)

    ref = sep.separate(audio, stacked_params=stacked, cfg=CFG)
    got = executor.separate_4stem_chunked(stacked, audio, CFG, chunk_tiles=2)
    assert got.shape == (4, 2, n)
    for i, stem in enumerate(CFG.stem_names):
        np.testing.assert_allclose(
            got[i], np.asarray(ref[stem]), atol=5e-5, err_msg=stem
        )


def test_block_step_streams_matches_independent(rng):
    """K batched streams are sample-exact vs running each stream alone."""
    stacked, _ = _setup(rng)
    k, t = 3, CFG.time_step
    blocks = jnp.asarray(
        rng.standard_normal((2, k, 2, t * 1024)), jnp.float32
    ) * 0.3  # two consecutive blocks per stream

    state_k = stream.init_state_streams(CFG, 2, k)
    outs_k = []
    for i in range(2):
        state_k, out = stream.block_step_streams(
            stacked, state_k, blocks[i], CFG, 2, OUT_BAND
        )
        outs_k.append(np.asarray(out))

    for s in range(k):
        state = stream.init_state(CFG, 2)
        for i in range(2):
            state, out = stream.block_step(
                stacked, state, blocks[i, s], CFG, 2, OUT_BAND
            )
            np.testing.assert_array_equal(outs_k[i][s], np.asarray(out))


def test_stream_low_latency_window_matches_oracle(rng):
    """freq_temporal != 1 (the reference's latency/resolution knob,
    Spleeter4Stems.c:383-401) stays hop-exact vs the oracle, including the
    2.0 clamp on the rising-tail exponent."""
    stacked, fields = _setup(rng)
    n = 2 * CFG.time_step * 1024
    t = np.arange(n) / 44100.0
    x = (
        0.3 * np.sin(2 * np.pi * 440 * t) + 0.1 * rng.standard_normal(n)
    ).astype(np.float32)
    audio = np.stack([x, 0.7 * x])
    for ft in (1.5, 3.0):  # 3.0 exercises the clamp
        got = np.asarray(
            stream.stream_scan(
                stacked, jnp.asarray(audio), CFG, 2, OUT_BAND,
                freq_temporal=ft,
            )
        )
        ref = streaming_oracle.stream_oracle(
            fields, audio.astype(np.float64), CFG.bin_limit, CFG.time_step,
            OUT_BAND, freq_temporal=ft,
        )
        np.testing.assert_allclose(got, ref, atol=5e-4)


def test_low_latency_window_cola():
    """Analysis x synthesis windows keep unity overlap-add at any exponent."""
    for ft in (0.5, 1.0, 1.7, 3.0):
        wa, ws = stream.asymmetric_windows(ft)
        prod = wa[stream.SAMPLE_SHIFT :] * ws  # active synthesis region
        # COLA over the 2 contributing hops of the 2*HOP active region.
        s = prod[: stream.HOP] + prod[stream.HOP :]
        np.testing.assert_allclose(s, np.ones(stream.HOP), atol=1e-9)
