"""CLI smoke tests (random weights, tiny audio, minimum tile config)."""

import numpy as np

from spleeterrt_tpu import cli
from spleeterrt_tpu.io import audio


def _make_input(tmp_path, rng, n=12000, sr=44100):
    x = (rng.standard_normal((2, n)) * 0.3).astype(np.float32)
    path = tmp_path / "song.wav"
    audio.write_wav(path, x, sr)
    return path, x


def test_cli_2stem(tmp_path, rng):
    path, x = _make_input(tmp_path, rng)
    rc = cli.main([
        str(path), "--stems", "2", "--time-step", "64", "--bin-limit", "512",
        "--random-weights", "--fp32", "--output-dir", str(tmp_path),
    ])
    assert rc == 0
    vocal = audio.read_wav(tmp_path / "song_Vocal.wav")
    acc = audio.read_wav(tmp_path / "song_Accompaniment.wav")
    assert vocal.samples.shape == x.shape
    # 2-stem graph: stems sum to the input.
    np.testing.assert_allclose(vocal.samples + acc.samples, x, atol=1e-4)


def test_cli_resamples_non_44k1(tmp_path, rng):
    path, x = _make_input(tmp_path, rng, n=16000, sr=32000)
    rc = cli.main([
        str(path), "--stems", "2", "--time-step", "64", "--bin-limit", "512",
        "--random-weights", "--fp32", "--output-dir", str(tmp_path),
    ])
    assert rc == 0
    vocal = audio.read_wav(tmp_path / "song_Vocal.wav")
    assert vocal.samples.shape[1] == int(np.ceil(16000 * 44100 / 32000))


def test_cli_4stem(tmp_path, rng):
    path, _ = _make_input(tmp_path, rng, n=8000)
    rc = cli.main([
        str(path), "--stems", "4", "--time-step", "64", "--bin-limit", "512",
        "--random-weights", "--fp32", "--output-dir", str(tmp_path),
    ])
    assert rc == 0
    for name in ("Drum", "Bass", "Accompaniment", "Vocal"):
        assert (tmp_path / f"song_{name}.wav").exists()


def test_cli_arg_clamping(tmp_path, rng):
    path, _ = _make_input(tmp_path, rng, n=6000)
    rc = cli.main([
        str(path), "--stems", "2", "--time-step", "7", "--bin-limit", "9000",
        "--random-weights", "--fp32", "--output-dir", str(tmp_path),
    ])
    assert rc == 0


def test_stream_cli(tmp_path, rng):
    from spleeterrt_tpu import cli_stream

    path, _ = _make_input(tmp_path, rng, n=70000)
    out = tmp_path / "stems"
    rc = cli_stream.main([
        str(path), "--random-weights", "--time-step", "64", "--bin-limit",
        "512", "--fp32", "--split", "--output", str(out),
        "--channel-order", "vocals",
    ])
    assert rc == 0
    for name in ("vocals", "drums", "bass", "accompaniment"):
        got = audio.read_wav(out / f"{name}.wav")
        assert got.samples.shape == (2, 70000)


def test_stream_cli_8ch(tmp_path, rng):
    from spleeterrt_tpu import cli_stream

    path, _ = _make_input(tmp_path, rng, n=66000)
    out = tmp_path / "eight.wav"
    rc = cli_stream.main([
        str(path), "--random-weights", "--time-step", "64", "--bin-limit",
        "512", "--fp32", "--output", str(out),
    ])
    assert rc == 0
    got = audio.read_wav(out)
    assert got.samples.shape == (8, 66000)


def test_cli_5stem_and_output_rate(tmp_path, rng):
    path, _ = _make_input(tmp_path, rng, n=16000, sr=32000)
    rc = cli.main([
        str(path), "--stems", "5", "--time-step", "64", "--bin-limit", "512",
        "--random-weights", "--fp32", "--output-dir", str(tmp_path),
        "--output-rate", "input",
    ])
    assert rc == 0
    for name in ("Vocal", "Drum", "Bass", "Piano", "Other"):
        got = audio.read_wav(tmp_path / f"song_{name}.wav")
        assert got.sample_rate == 32000
        # 32k in -> 44.1k processing -> back to 32k: ~original length
        assert abs(got.samples.shape[1] - 16000) < 50


def test_cli_quantized_model_path(tmp_path, rng):
    """End-to-end with a synthetic fp16 two-subnet model file (the exe's
    embedded model format, Executable/main.c:435-443)."""
    from spleeterrt_tpu.core import weights
    import numpy as np_

    flat = (rng.standard_normal(2 * weights.COEFF_BLOB_FLOATS) * 0.02).astype(
        np_.float32
    )
    model_path = tmp_path / "model.dat"
    model_path.write_bytes(weights.encode_fp16(flat).tobytes())

    path, x = _make_input(tmp_path, rng, n=10000)
    rc = cli.main([
        str(path), "--stems", "3", "--time-step", "64", "--bin-limit", "512",
        "--weights", str(model_path), "--fp32", "--output-dir", str(tmp_path),
    ])
    assert rc == 0
    for name in ("Drum", "Vocal", "Accompaniment"):
        assert (tmp_path / f"song_{name}.wav").exists()
    # 3-stem conservation: all stems sum to the input.
    total = sum(
        audio.read_wav(tmp_path / f"song_{n}.wav").samples
        for n in ("Drum", "Vocal", "Accompaniment")
    )
    np.testing.assert_allclose(total, x, atol=1e-4)


def test_cli_mp3_fails_fast_with_guidance(tmp_path):
    """A corrupt .mp3 must exit with an actionable message, never a raw
    decoder traceback, regardless of which MP3 readers are installed
    (VERDICT: the reference decodes MP3 via dr_mp3.h and prints guidance on
    failure, Executable/main.c:241-250). Every available reader (mpg123,
    soundfile, ffmpeg) rejects this garbage stream; load_audio must fall
    through all of them and end with UnsupportedFormatError-grade guidance."""
    import pytest

    path = tmp_path / "song.mp3"
    path.write_bytes(b"\xff\xfb\x90\x00" + b"\0" * 100)
    with pytest.raises(SystemExit) as ei:
        cli.main([str(path), "--stems", "2", "--random-weights",
                  "--output-dir", str(tmp_path)])
    msg = str(ei.value)
    assert "ffmpeg" in msg and "soundfile" in msg and "WAV" in msg


def test_http_server_separates(tmp_path, rng):
    import threading
    import urllib.request

    import io as _io
    import jax

    from spleeterrt_tpu.config import SeparatorConfig
    from spleeterrt_tpu.core import model, weights
    from spleeterrt_tpu.runtime import server as srv_mod
    import jax.numpy as jnp

    cfg = SeparatorConfig(
        bin_limit=512, time_step=64, num_stems=2, compute_dtype=jnp.float32
    )
    params = model.init_params(jax.random.PRNGKey(0))
    service = srv_mod.SeparationService(cfg, {"params": params})
    srv = srv_mod.make_server("127.0.0.1", 0, service)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz"
        ) as r:
            import json

            health = json.loads(r.read())
            assert health["status"] == "ok"

        x = (rng.standard_normal((2, 12000)) * 0.3).astype(np.float32)
        path = tmp_path / "in.wav"
        audio.write_wav(path, x, 44100)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/separate?format=npz",
            data=path.read_bytes(),
            method="POST",
        )
        with urllib.request.urlopen(req) as r:
            out = np.load(_io.BytesIO(r.read()))
        assert set(out.files) == {"vocals", "accompaniment"}
        np.testing.assert_allclose(
            out["vocals"] + out["accompaniment"], x, atol=1e-4
        )

        # wav8ch format: stem-major channel pairs
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/separate",
            data=path.read_bytes(),
            method="POST",
        )
        with urllib.request.urlopen(req) as r:
            order = r.headers["X-Stem-Order"]
            wav = audio.read_wav(r.read())
        assert order == "vocals,accompaniment"
        assert wav.samples.shape == (4, 12000)

        # --- robustness contract ---
        import urllib.error

        def post(path_q, data):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}{path_q}", data=data, method="POST"
            )
            try:
                with urllib.request.urlopen(req) as r:
                    return r.status, r.read()
            except urllib.error.HTTPError as e:
                return e.code, e.read()

        # garbage body -> 400 (client error), not 500
        code, _ = post("/separate", b"not a wav at all")
        assert code == 400
        # oversized body -> 413
        service.max_body_bytes = 1024
        code, _ = post("/separate", b"\0" * 2048)
        assert code == 413
        service.max_body_bytes = 1 << 28
        # batch endpoint on a non-stacked (2-stem) server -> 400
        code, _ = post("/separate_batch", b"PK\x03\x04junk")
        assert code == 400
    finally:
        srv.shutdown()


def test_http_server_batch(tmp_path, rng):
    import io as _io
    import threading
    import urllib.request

    import jax
    import jax.numpy as jnp

    from spleeterrt_tpu.config import SeparatorConfig
    from spleeterrt_tpu.core import model, separate, weights
    from spleeterrt_tpu.runtime import server as srv_mod

    cfg = SeparatorConfig(
        bin_limit=512, time_step=64, num_stems=4, compute_dtype=jnp.float32
    )
    stacked = weights.stack_params(
        [model.init_params(jax.random.PRNGKey(i)) for i in range(4)]
    )
    service = srv_mod.SeparationService(cfg, {"stacked_params": stacked})
    srv = srv_mod.make_server("127.0.0.1", 0, service)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        t0 = (rng.standard_normal((2, 9000)) * 0.3).astype(np.float32)
        t1 = (rng.standard_normal((2, 12000)) * 0.3).astype(np.float32)
        buf = _io.BytesIO()
        np.savez(buf, a=t0, b=t1)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/separate_batch",
            data=buf.getvalue(),
            method="POST",
        )
        with urllib.request.urlopen(req) as r:
            out = np.load(_io.BytesIO(r.read()))
        assert set(out.files) == {
            f"{t}/{s}" for t in ("a", "b") for s in cfg.stem_names
        }
        assert out["a/drums"].shape == (2, 9000)
        assert out["b/vocals"].shape == (2, 12000)
        # one batched dispatch == the single-track graph, per track
        solo = separate.separate(t1, stacked_params=stacked, cfg=cfg)
        np.testing.assert_allclose(
            out["b/vocals"], np.asarray(solo["vocals"]), atol=2e-4
        )
    finally:
        srv.shutdown()
