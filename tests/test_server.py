"""End-to-end test of the HTTP TTS server (qwen3_tts_tpu/server.py) against
a tiny pipeline: health check, synthesis to WAV, and error paths."""

import base64
import http.client
import json

import jax.numpy as jnp
import pytest

from qwen3_tts_tpu.io.wav import wav_to_float_samples
from qwen3_tts_tpu.pipeline import Qwen3TTSPipeline
from qwen3_tts_tpu.server import serve
from qwen3_tts_tpu.testing import write_tiny_model_dir

pytestmark = pytest.mark.slow


def test_http_server_round_trip(tmp_path):
    d = str(tmp_path / "m")
    write_tiny_model_dir(d)
    pipeline = Qwen3TTSPipeline(d, dtype=jnp.float32)
    httpd = serve(pipeline, port=0)  # ephemeral port
    port = httpd.server_address[1]
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=300)

        conn.request("GET", "/health")
        r = conn.getresponse()
        health = json.loads(r.read())
        assert r.status == 200 and health["status"] == "ok"
        assert isinstance(health["speakers"], list) and health["speakers"]

        body = json.dumps(
            {"text": "Server round trip.", "speaker": health["speakers"][0],
             "max_tokens": 8, "seed": 1}
        )
        conn.request("POST", "/tts", body=body,
                     headers={"Content-Type": "application/json"})
        r = conn.getresponse()
        wav = r.read()
        assert r.status == 200
        assert r.getheader("Content-Type") == "audio/wav"
        samples = wav_to_float_samples(wav)
        assert samples.size > 0

        conn.request("POST", "/tts", body=json.dumps({"text": "   "}),
                     headers={"Content-Type": "application/json"})
        r = conn.getresponse()
        assert r.status == 400
        assert "error" in json.loads(r.read())

        conn.request("POST", "/nope", body="{}")
        r = conn.getresponse()
        assert r.status == 404
        r.read()

        # streaming: chunked transfer, WAV header first, PCM appended per
        # vocoder chunk (http.client reassembles the chunked body)
        conn.request("POST", "/tts?stream=1", body=body,
                     headers={"Content-Type": "application/json"})
        r = conn.getresponse()
        assert r.status == 200
        assert r.getheader("Transfer-Encoding") == "chunked"
        assert r.getheader("Content-Type") == "audio/wav"
        wav_stream = r.read()
        assert wav_stream[:4] == b"RIFF"
        streamed = wav_to_float_samples(wav_stream)
        assert streamed.size > 0

        # continuous-batching endpoint: one WAV per text
        conn.request(
            "POST", "/tts_many",
            body=json.dumps({
                "texts": ["Batched one.", "Batched two, longer text."],
                "speaker": health["speakers"][0],
                "max_tokens": 6, "batch_size": 2, "seed": 2,
            }),
            headers={"Content-Type": "application/json"},
        )
        r = conn.getresponse()
        obj = json.loads(r.read())
        assert r.status == 200 and len(obj["wavs"]) == 2
        assert obj["sample_rate"] == 24000
        for w in obj["wavs"]:
            decoded = wav_to_float_samples(base64.b64decode(w))
            assert decoded.size > 0

        # malformed tts_many
        conn.request("POST", "/tts_many", body=json.dumps({"texts": []}),
                     headers={"Content-Type": "application/json"})
        r = conn.getresponse()
        assert r.status == 400
        r.read()
    finally:
        httpd.shutdown()
