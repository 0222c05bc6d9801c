"""Minimal HTTP TTS server on top of Qwen3TTSPipeline.

A production-shaped surface the reference lacks entirely (its only
entry point is a CLI example, main.swift:12-27): POST text, get a WAV.
Stdlib-only (http.server) so it runs anywhere the package does; generation
is serialized through a lock because a pipeline instance holds one set of
jit caches (the multi-request scaling path is ContinuousServer /
generate_many on the batch axis — docs/SERVING.md — with one server
process per chip behind a load balancer).

Endpoints:
  GET  /health            -> {"status": "ok", "speakers": [...]}
  POST /tts               -> audio/wav
        body JSON: {"text": str, "speaker": str (optional),
                    "temperature": float (optional),
                    "max_tokens": int (optional), "seed": int (optional)}

Run: python -m qwen3_tts_tpu.server <model-dir> [port]
"""

from __future__ import annotations

import json
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from .io.wav import wav_data
from .pipeline import Qwen3TTSError, Qwen3TTSPipeline

MAX_BODY_BYTES = 1 << 20  # 1 MiB of JSON is far beyond any sane request


def make_handler(pipeline: Qwen3TTSPipeline):
    lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, body: bytes, ctype: str) -> None:
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _send_json(self, code: int, obj) -> None:
            self._send(code, json.dumps(obj).encode(), "application/json")

        def do_GET(self):  # noqa: N802 (http.server API)
            if self.path == "/health":
                self._send_json(
                    200,
                    {"status": "ok", "speakers": pipeline.available_speakers},
                )
            else:
                self._send_json(404, {"error": "unknown path"})

        def do_POST(self):  # noqa: N802
            if self.path != "/tts":
                self._send_json(404, {"error": "unknown path"})
                return
            try:
                n = int(self.headers.get("Content-Length", "0"))
                if n > MAX_BODY_BYTES:
                    self._send_json(413, {"error": "body too large"})
                    return
                req = json.loads(self.rfile.read(n) or b"{}")
                text = req.get("text", "")
                if not isinstance(text, str) or not text.strip():
                    self._send_json(400, {"error": "missing 'text'"})
                    return
                kwargs = {}
                if "temperature" in req:
                    kwargs["temperature"] = float(req["temperature"])
                if "max_tokens" in req:
                    kwargs["max_tokens"] = int(req["max_tokens"])
                if "seed" in req:
                    kwargs["seed"] = int(req["seed"])
                with lock:
                    samples = pipeline.generate(
                        text, req.get("speaker", ""), **kwargs
                    )
                self._send(
                    200, wav_data(np.asarray(samples)), "audio/wav"
                )
            except (Qwen3TTSError, ValueError, TypeError,
                    json.JSONDecodeError) as e:
                self._send_json(400, {"error": f"{type(e).__name__}: {e}"})

        def log_message(self, fmt, *args):  # quiet by default
            pass

    return Handler


def serve(pipeline: Qwen3TTSPipeline, port: int = 8080,
          host: str = "127.0.0.1") -> ThreadingHTTPServer:
    """Start serving in a background thread; returns the server (call
    .shutdown() to stop). Binds localhost by default — front it with a real
    ingress for anything public."""
    httpd = ThreadingHTTPServer((host, port), make_handler(pipeline))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    return httpd


def main() -> None:
    if len(sys.argv) < 2:
        print("usage: python -m qwen3_tts_tpu.server <model-dir> [port]")
        raise SystemExit(2)
    port = int(sys.argv[2]) if len(sys.argv) > 2 else 8080
    pipeline = Qwen3TTSPipeline(sys.argv[1])
    print(f"loaded {sys.argv[1]}; serving on http://127.0.0.1:{port}", flush=True)
    httpd = ThreadingHTTPServer(("127.0.0.1", port), make_handler(pipeline))
    httpd.serve_forever()


if __name__ == "__main__":
    main()
