"""Minimal separation service: HTTP control plane over the jitted pipeline.

Production-deployment counterpart of the reference's two applications: POST
audio, receive separated stems. Compute runs through the same compiled
graphs as the CLI (compile once at startup, then every request reuses the
executable); the host side only decodes/encodes audio.

Endpoints:
- GET  /healthz            -> {"status": "ok", "devices": N}
- POST /separate           -> WAV body in; multichannel WAV out
                              (stem-major channel pairs, fs 44100)
  Query params: stems (2|3|4|5, default from server config),
                format (wav8ch | npz)

Run: python -m spleeterrt_tpu.runtime.server --port 8080 --random-weights
"""

from __future__ import annotations

import argparse
import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


class SeparationService:
    """Holds weights + config; thread-safe separate() over the jit cache."""

    def __init__(self, cfg, weight_kwargs: dict):
        self.cfg = cfg
        self.weight_kwargs = weight_kwargs
        self._lock = threading.Lock()

    def separate_wav(self, wav_bytes: bytes, num_stems: int | None = None):
        import dataclasses

        import jax.numpy as jnp

        from spleeterrt_tpu.core import separate
        from spleeterrt_tpu.io import audio as audio_io, resample

        cfg = self.cfg
        if num_stems and num_stems != cfg.num_stems:
            cfg = dataclasses.replace(cfg, num_stems=num_stems)
        data = audio_io.read_wav(wav_bytes)
        x = data.samples
        if data.sample_rate != 44100:
            x = resample.resample(x, data.sample_rate, 44100)
        if x.shape[0] == 1:
            x = np.repeat(x, 2, axis=0)
        # XLA compilation/execution is internally synchronized, but keep
        # request ordering deterministic for the single-chip case.
        with self._lock:
            stems = separate.separate(x[:2], cfg=cfg, **self.weight_kwargs)
        return {k: np.asarray(v) for k, v in stems.items()}


def _make_handler(service: SeparationService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet test runs
            pass

        def _send(self, code: int, body: bytes, ctype: str):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path.startswith("/healthz"):
                import jax

                body = json.dumps(
                    {"status": "ok", "devices": len(jax.devices())}
                ).encode()
                self._send(200, body, "application/json")
            else:
                self._send(404, b"not found", "text/plain")

        def do_POST(self):
            if not self.path.startswith("/separate"):
                self._send(404, b"not found", "text/plain")
                return
            from urllib.parse import parse_qs, urlparse

            q = parse_qs(urlparse(self.path).query)
            stems_n = int(q.get("stems", [0])[0]) or None
            fmt = q.get("format", ["wav8ch"])[0]
            length = int(self.headers.get("Content-Length", 0))
            try:
                stems = service.separate_wav(self.rfile.read(length), stems_n)
            except Exception as e:  # surface decode/shape errors as 400s
                self._send(400, str(e).encode(), "text/plain")
                return
            if fmt == "npz":
                buf = io.BytesIO()
                np.savez(buf, **stems)
                self._send(200, buf.getvalue(), "application/octet-stream")
                return
            from spleeterrt_tpu.io import audio as audio_io
            import tempfile, os

            multi = np.concatenate(list(stems.values()), axis=0)
            with tempfile.NamedTemporaryFile(suffix=".wav", delete=False) as f:
                path = f.name
            try:
                audio_io.write_wav(path, multi, 44100)
                with open(path, "rb") as f:
                    body = f.read()
            finally:
                os.unlink(path)
            self.send_response(200)
            self.send_header("Content-Type", "audio/wav")
            self.send_header("X-Stem-Order", ",".join(stems.keys()))
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    return Handler


def make_server(host: str, port: int, service: SeparationService):
    return ThreadingHTTPServer((host, port), _make_handler(service))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="spleeterrt-tpu-server")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--stems", type=int, default=4, choices=(2, 3, 4, 5))
    ap.add_argument("--time-step", type=int, default=256)
    ap.add_argument("--bin-limit", type=int, default=1536)
    ap.add_argument("--weights", default=None)
    ap.add_argument("--random-weights", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    import jax.numpy as jnp

    from spleeterrt_tpu import cli
    from spleeterrt_tpu.config import SeparatorConfig

    cfg = SeparatorConfig(
        bin_limit=args.bin_limit // 64 * 64,
        time_step=max(64, args.time_step // 64 * 64),
        num_stems=args.stems,
        compute_dtype=jnp.bfloat16,
    )
    weight_kwargs = cli._load_weights(args, cfg)
    service = SeparationService(cfg, weight_kwargs)
    srv = make_server(args.host, args.port, service)
    print(f"serving on http://{args.host}:{args.port}")
    srv.serve_forever()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
