"""End-to-end test of the HTTP TTS server (qwen3_tts_tpu/server.py) against
a tiny pipeline: health check, synthesis to WAV, and error paths."""

import base64
import http.client
import json

import jax.numpy as jnp
import numpy as np
import pytest

from qwen3_tts_tpu.io.wav import (
    streaming_wav_header,
    wav_data,
    wav_to_float_samples,
)
from qwen3_tts_tpu.pipeline import AudioChunk, Qwen3TTSError, Qwen3TTSPipeline
from qwen3_tts_tpu.server import serve
from qwen3_tts_tpu.testing import write_tiny_model_dir


@pytest.mark.slow
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

        # observability: one request completed through the service so far
        conn.request("GET", "/stats")
        r = conn.getresponse()
        stats = json.loads(r.read())
        assert r.status == 200 and stats["mode"] == "service"
        assert stats["requests_submitted"] >= 1
        assert stats["requests_completed"] >= 1
        assert stats["requests_failed"] == 0
        assert stats["batch_size"] == 8 and not stats["closed"]

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


@pytest.mark.slow
def test_concurrent_streams_share_one_batch(tmp_path):
    """N clients hit one server AT THE SAME TIME from separate connections;
    each must get back exactly the audio of its own canonical single-stream
    greedy run — served by the shared continuous batch (the old design
    serialized whole generations behind a global lock; VERDICT r3 item 2)."""
    import threading

    import jax.numpy as jnp2

    from qwen3_tts_tpu.io.wav import _pcm16
    from qwen3_tts_tpu.models import generate as G
    from qwen3_tts_tpu.models import prompt as P
    from qwen3_tts_tpu.models import vocoder as voc

    d = str(tmp_path / "m")
    write_tiny_model_dir(d)
    pipeline = Qwen3TTSPipeline(d, dtype=jnp.float32)
    DC, CTX = 6, 3
    httpd = serve(
        pipeline, port=0, batch_size=2, chunk_steps=5,
        decode_chunk=DC, left_context=CTX, trailing_bucket=128,
    )
    assert httpd.tts_service is not None  # real pipeline -> continuous mode
    port = httpd.server_address[1]
    speaker = pipeline.available_speakers[0]
    texts = [
        "Concurrent stream one, served in lockstep.",
        "The second independent connection arrives together.",
        "A third request waits for a slot, then decodes.",
    ]

    def expected_pcm(text: str, max_tokens: int) -> np.ndarray:
        """Greedy codes -> canonical buffer-and-batch stream decode (the
        semantics test_serving_audio proves) -> 16-bit PCM as sent."""
        # same bucket-padded assembly the TTSService submit path uses (its
        # jit-fused rows differ from the eager builder by ~1 ulp)
        pd = P.assemble_prompt_padded(
            pipeline.params, pipeline.config, pipeline.tokenizer, text,
            speaker=speaker, prompt_bucket=G.PROMPT_BUCKETS[2],
            trailing_bucket=128,
        )
        frames = G.filter_valid_frames(
            G.generate_codes(
                pipeline.params, pipeline.cp_params, pipeline.config, pd,
                temperature=0.0, max_tokens=max_tokens, chunk_steps=5,
                track_cp_penalty=False,
            )
        )
        dec = pipeline.speech_config.decoder_config
        spf = dec.total_upsample
        out, ctx, pos = [], None, 0
        while pos < len(frames):
            batch = frames[pos: pos + DC]
            pos += len(batch)
            inp = np.concatenate([ctx, batch]) if ctx is not None else batch
            drop = (len(inp) - len(batch)) * spf
            wav = np.asarray(
                voc.decode_frames_jit(
                    pipeline.vocoder_params, jnp2.asarray(inp.T[None]), dec
                )
            )[0]
            out.append(wav[drop:])
            ctx = inp[-CTX:]
        full = np.concatenate(out) if out else np.zeros(0, np.float32)
        return _pcm16(np.clip(np.where(np.isfinite(full), full, 0.0), -1, 1))

    results: dict[int, bytes] = {}
    errors: list = []

    def client(i: int, stream: bool):
        try:
            conn = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
            path = "/tts?stream=1" if stream else "/tts"
            conn.request(
                "POST", path,
                body=json.dumps({"text": texts[i], "speaker": speaker,
                                 "temperature": 0.0, "max_tokens": 10}),
                headers={"Content-Type": "application/json"},
            )
            r = conn.getresponse()
            assert r.status == 200, r.read()
            results[i] = r.read()
            conn.close()
        except Exception as e:
            errors.append((i, e))

    try:
        # 3 streaming clients at once through 2 slots (forces a backlog wait)
        threads = [
            threading.Thread(target=client, args=(i, True)) for i in range(3)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)
        assert not errors, errors
        for i, text in enumerate(texts):
            got = np.frombuffer(
                results[i][len(streaming_wav_header(24000)):], "<i2"
            )
            np.testing.assert_array_equal(
                got, expected_pcm(text, 10), err_msg=text
            )

        # concurrent ONE-SHOT requests ride the same batch
        results.clear()
        threads = [
            threading.Thread(target=client, args=(i, False)) for i in range(2)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)
        assert not errors, errors
        for i in range(2):
            got = np.frombuffer(results[i][44:], "<i2")  # one-shot WAV header
            np.testing.assert_array_equal(
                got, expected_pcm(texts[i], 10), err_msg=texts[i]
            )
    finally:
        httpd.shutdown()


class _FakePipeline:
    """Just enough surface for make_handler: streaming tests don't need a
    real model, so the error paths run in the smoke tier."""

    sample_rate = 24000
    available_speakers = ["fake"]

    def __init__(self, stream_fn):
        self.generate_stream = stream_fn


def _serve_fake(stream_fn):
    httpd = serve(_FakePipeline(stream_fn), port=0)
    return httpd, httpd.server_address[1]


def _post_stream(port):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
    conn.request(
        "POST", "/tts?stream=1", body=json.dumps({"text": "x"}),
        headers={"Content-Type": "application/json"},
    )
    return conn, conn.getresponse()


def test_stream_error_before_first_audio_is_json():
    """A failure before any audio chunk (bad request, prefill OOM) must
    produce a clean JSON error response, not a committed 200 stream."""

    def boom(text, speaker="", **kwargs):
        raise Qwen3TTSError("no such voice")
        yield  # pragma: no cover - makes this a generator function

    httpd, port = _serve_fake(boom)
    try:
        conn, r = _post_stream(port)
        assert r.status == 400
        assert "no such voice" in json.loads(r.read())["error"]
        conn.close()
    finally:
        httpd.shutdown()


def test_stream_error_before_first_audio_500_for_runtime():
    def boom(text, speaker="", **kwargs):
        raise RuntimeError("XLA ran out of memory")
        yield  # pragma: no cover

    httpd, port = _serve_fake(boom)
    try:
        conn, r = _post_stream(port)
        assert r.status == 500
        assert "RuntimeError" in json.loads(r.read())["error"]
        conn.close()
    finally:
        httpd.shutdown()


def test_stream_error_mid_stream_truncates_body():
    """Once the 200 + chunked header is on the wire, a producer failure must
    terminate the chunked body early (truncated audio) — never write a second
    status line into the stream."""
    frame = np.full(1920, 0.25, np.float32)

    def flaky(text, speaker="", **kwargs):
        yield AudioChunk(samples=frame, token_range=(0, 1), is_final=False)
        raise RuntimeError("device wedged mid-generation")

    httpd, port = _serve_fake(flaky)
    try:
        conn, r = _post_stream(port)
        assert r.status == 200
        assert r.getheader("Transfer-Encoding") == "chunked"
        body = r.read()  # server sent the terminal chunk, so this completes
        assert body[:4] == b"RIFF"
        # exactly the header + the one frame that made it out
        assert len(body) == len(streaming_wav_header(24000)) + frame.size * 2
        # the server closes the connection after a truncated stream
        assert r.will_close or r.isclosed()
        conn.close()
    finally:
        httpd.shutdown()


@pytest.mark.slow
def test_dead_service_degrades_to_lock_path(tmp_path):
    """When the continuous-batching worker is gone for good (restarts
    exhausted / shutdown), /tts must fall back to the serialized legacy
    path instead of 500ing every future request."""
    d = str(tmp_path / "m")
    write_tiny_model_dir(d)
    pipeline = Qwen3TTSPipeline(d, dtype=jnp.float32)
    httpd = serve(pipeline, port=0, batch_size=2, trailing_bucket=128)
    assert httpd.tts_service is not None
    port = httpd.server_address[1]
    try:
        # kill the service the way exhausted restarts do: stop accepting
        httpd.tts_service.close()
        body = json.dumps(
            {"text": "Degraded but served.", "max_tokens": 6, "seed": 3}
        )
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
        for stream in ("", "?stream=1"):
            conn.request("POST", f"/tts{stream}", body=body,
                         headers={"Content-Type": "application/json"})
            r = conn.getresponse()
            wav = r.read()
            assert r.status == 200, wav
            assert wav_to_float_samples(wav).size > 0
    finally:
        httpd.shutdown()


@pytest.mark.slow
def test_malformed_requests_are_400(tmp_path):
    """Edge validation: negative max_tokens, non-dict JSON bodies, and a
    negative Content-Length must all be client errors, not 500s or
    unbounded reads."""
    d = str(tmp_path / "m")
    write_tiny_model_dir(d)
    pipeline = Qwen3TTSPipeline(d, dtype=jnp.float32)
    httpd = serve(pipeline, port=0, batch_size=2, trailing_bucket=128)
    port = httpd.server_address[1]
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
        for body in (
            json.dumps({"text": "hi there", "max_tokens": -1}),
            "[]",
            '"hi"',
        ):
            conn.request("POST", "/tts", body=body,
                         headers={"Content-Type": "application/json"})
            r = conn.getresponse()
            payload = r.read()
            assert r.status == 400, (body, payload)
            assert "error" in json.loads(payload), (body, payload)
        # negative Content-Length: the server must refuse instead of
        # reading until EOF
        conn2 = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
        conn2.putrequest("POST", "/tts")
        conn2.putheader("Content-Type", "application/json")
        conn2.putheader("Content-Length", "-1")
        conn2.endheaders()
        r = conn2.getresponse()
        assert r.status == 400
        conn2.close()
        # max_tokens=0 is a valid request for zero audio
        conn.request(
            "POST", "/tts",
            body=json.dumps({"text": "Zero tokens please.", "max_tokens": 0}),
            headers={"Content-Type": "application/json"},
        )
        r = conn.getresponse()
        wav = r.read()
        assert r.status == 200
        assert wav_to_float_samples(wav).size == 0
    finally:
        httpd.shutdown()


@pytest.mark.slow
def test_http_voice_modes(tmp_path):
    """The HTTP surface carries every reference generation mode: instruct
    (VoiceDesign / CustomVoice), ICL cloning from base64 reference audio +
    transcript, and speaker-embedding cloning from audio alone — each
    greedy-parity with the corresponding pipeline mode method."""
    from qwen3_tts_tpu.io.wav import wav_data

    d = str(tmp_path / "m")
    write_tiny_model_dir(d, with_encoders=True)
    pipeline = Qwen3TTSPipeline(d, dtype=jnp.float32)
    # prompt_bucket 256: ICL prompts carry the reference codes (~230 tokens
    # here) and must fit the service's fixed bucket to be served by the
    # continuous batch rather than the lock fallback
    httpd = serve(pipeline, port=0, batch_size=2, trailing_bucket=128,
                  prompt_bucket=256)
    port = httpd.server_address[1]

    rng = np.random.default_rng(5)
    ref_audio = (rng.standard_normal(4800) * 0.1).astype(np.float32)
    ref_b64 = base64.b64encode(wav_data(ref_audio, 24000)).decode()

    def post(payload: dict):
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
        conn.request("POST", "/tts", body=json.dumps(payload),
                     headers={"Content-Type": "application/json"})
        r = conn.getresponse()
        body = r.read()
        conn.close()
        return r.status, r.getheader("Content-Type"), body

    def pcm_parity(wav_bytes: bytes, label: str, **stream_kwargs):
        """HTTP audio (served through the continuous batch) must match the
        canonical single-stream generate_stream decode of the same mode.
        The one-shot pipeline methods are NOT the comparison target: their
        chunked_decode re-decodes reference-parity fake zero-code left
        context on the first chunk, a deliberately different decode scheme."""
        got = wav_to_float_samples(wav_bytes)
        parts = [
            c.samples
            for c in pipeline.generate_stream(
                temperature=0.0, max_tokens=8, seed=2, **stream_kwargs
            )
            if len(c.samples)
        ]
        expected = (
            np.concatenate(parts) if parts else np.zeros(0, np.float32)
        )
        want = wav_to_float_samples(wav_data(expected, 24000))
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-4,
                                   err_msg=label)

    try:
        base = {"temperature": 0.0, "max_tokens": 8, "seed": 2}

        # VoiceDesign: instruct without a speaker
        st, ct, wav = post({**base, "text": "Voice design over the wire.",
                            "instruct": "A calm low voice."})
        assert (st, ct) == (200, "audio/wav")
        pcm_parity(wav, "voice_design",
                   text="Voice design over the wire.",
                   instruct="A calm low voice.")

        # CustomVoice: instruct + speaker
        st, ct, wav = post({**base, "text": "Custom voice over the wire.",
                            "speaker": "aiden", "instruct": "Whisper it."})
        assert (st, ct) == (200, "audio/wav")
        pcm_parity(wav, "custom_voice",
                   text="Custom voice over the wire.", speaker="aiden",
                   instruct="Whisper it.")

        # ICL cloning: reference audio + transcript
        st, ct, wav = post({**base, "text": "Clone this speaking style.",
                            "reference_audio_b64": ref_b64,
                            "reference_transcript": "reference words"})
        assert (st, ct) == (200, "audio/wav")
        codes = pipeline.encode_reference_audio(ref_audio)
        pcm_parity(wav, "icl", text="Clone this speaking style.",
                   reference_transcript="reference words",
                   reference_audio_codes=codes)

        # speaker-embedding cloning: reference audio alone
        st, ct, wav = post({**base, "text": "Embed my voice please.",
                            "reference_audio_b64": ref_b64})
        assert (st, ct) == (200, "audio/wav")
        emb = pipeline.extract_speaker_embedding(ref_audio)
        pcm_parity(wav, "embedding", text="Embed my voice please.",
                   speaker_embedding=emb)

        # edge validation: transcript without audio, bad base64, wrong
        # sample rate, instruct+reference combo (one prompt section only),
        # empty transcript
        st, _, body = post({**base, "text": "hello there world",
                            "reference_transcript": "words"})
        assert st == 400 and b"error" in body
        st, _, body = post({**base, "text": "hello there world",
                            "reference_audio_b64": "@@not-base64@@"})
        assert st == 400 and b"error" in body
        wrong_rate = base64.b64encode(wav_data(ref_audio, 16000)).decode()
        st, _, body = post({**base, "text": "hello there world",
                            "reference_audio_b64": wrong_rate})
        assert st == 400 and b"24000" in body
        st, _, body = post({**base, "text": "hello there world",
                            "instruct": "calm voice",
                            "reference_audio_b64": ref_b64,
                            "reference_transcript": "words"})
        assert st == 400 and b"cannot be combined" in body
        st, _, body = post({**base, "text": "hello there world",
                            "reference_audio_b64": ref_b64,
                            "reference_transcript": "  "})
        assert st == 400 and b"non-empty" in body
    finally:
        httpd.shutdown()

    # an ICL prompt that EXCEEDS the service bucket must fall through to the
    # single-stream lock path (server.py's 'exceeds service buckets'
    # fallthrough) and still return valid audio — parity with the one-shot
    # generate_icl, whose chunked_decode scheme that path uses
    httpd2 = serve(pipeline, port=0, batch_size=2, trailing_bucket=128)
    port = httpd2.server_address[1]
    try:
        st, ct, wav = post({"temperature": 0.0, "max_tokens": 8, "seed": 2,
                            "text": "Clone this speaking style.",
                            "reference_audio_b64": ref_b64,
                            "reference_transcript": "reference words"})
        assert (st, ct) == (200, "audio/wav")
        got = wav_to_float_samples(wav)
        expected = pipeline.generate_icl(
            "Clone this speaking style.", "reference words", codes,
            temperature=0.0, max_tokens=8, seed=2)
        want = wav_to_float_samples(wav_data(expected, 24000))
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-4,
                                   err_msg="icl lock fallback")
    finally:
        httpd2.shutdown()


@pytest.mark.slow
def test_backpressure_503(tmp_path):
    """A saturated service answers 503 + Retry-After (max_queue=0 rejects
    deterministically), never silently absorbing the request into the
    serialized lock path."""
    d = str(tmp_path / "m")
    write_tiny_model_dir(d)
    pipeline = Qwen3TTSPipeline(d, dtype=jnp.float32)
    httpd = serve(pipeline, port=0, batch_size=2, trailing_bucket=128,
                  max_queue=0)
    port = httpd.server_address[1]
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
        conn.request("POST", "/tts", body=json.dumps(
            {"text": "Too busy for this.", "max_tokens": 6}),
            headers={"Content-Type": "application/json"})
        r = conn.getresponse()
        body = r.read()
        assert r.status == 503
        assert r.getheader("Retry-After") == "1"
        assert b"error" in body
        # stats surface the rejection
        conn.request("GET", "/stats")
        stats = json.loads(conn.getresponse().read())
        assert stats["requests_rejected_busy"] == 1
        conn.close()
    finally:
        httpd.shutdown()


@pytest.mark.slow
def test_openai_compatible_endpoint(tmp_path):
    """POST /v1/audio/speech is a drop-in for the OpenAI audio.speech API:
    same audio as the native /tts for identical params, raw-PCM response
    format, chunked streaming via stream_format, the /v1 error envelope,
    and GET /v1/models."""
    d = str(tmp_path / "speech-model")
    write_tiny_model_dir(d)
    pipeline = Qwen3TTSPipeline(d, dtype=jnp.float32)
    httpd = serve(pipeline, port=0)
    port = httpd.server_address[1]
    hdrs = {"Content-Type": "application/json"}
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
        voice = pipeline.available_speakers[0]

        # model listing carries the served checkpoint's directory name
        conn.request("GET", "/v1/models")
        r = conn.getresponse()
        models = json.loads(r.read())
        assert r.status == 200 and models["object"] == "list"
        assert models["data"][0]["id"] == "speech-model"

        # one-shot WAV == the native endpoint's bytes for identical params
        params = {"temperature": 0.0, "max_tokens": 8, "seed": 5}
        conn.request("POST", "/v1/audio/speech", body=json.dumps(
            {"model": "ignored", "input": "Drop in compatibility.",
             "voice": voice, **params}), headers=hdrs)
        r = conn.getresponse()
        v1_wav = r.read()
        assert r.status == 200
        assert r.getheader("Content-Type") == "audio/wav"
        conn.request("POST", "/tts", body=json.dumps(
            {"text": "Drop in compatibility.", "speaker": voice, **params}),
            headers=hdrs)
        native_wav = conn.getresponse().read()
        assert v1_wav == native_wav

        # raw PCM one-shot, and chunked streaming reassembles to the same
        conn.request("POST", "/v1/audio/speech", body=json.dumps(
            {"input": "Drop in compatibility.", "voice": voice,
             "response_format": "pcm", **params}), headers=hdrs)
        r = conn.getresponse()
        pcm = r.read()
        assert r.status == 200
        assert r.getheader("Content-Type") == "audio/pcm"
        assert len(pcm) and len(pcm) % 2 == 0  # 16-bit mono frames
        conn.request("POST", "/v1/audio/speech", body=json.dumps(
            {"input": "Drop in compatibility.", "voice": voice,
             "response_format": "pcm", "stream_format": "audio", **params}),
            headers=hdrs)
        r = conn.getresponse()
        streamed = r.read()  # http.client reassembles the chunked body
        assert r.status == 200 and streamed == pcm

        # instructions -> the CustomVoice prompt path. Comparison target is
        # generate_stream (the service's decode scheme), as in
        # test_http_voice_modes — the one-shot methods use a deliberately
        # different chunked_decode left-context scheme.
        conn.request("POST", "/v1/audio/speech", body=json.dumps(
            {"input": "Follow the instruction.", "voice": voice,
             "instructions": "Speak slowly.", **params}), headers=hdrs)
        r = conn.getresponse()
        wav = r.read()
        assert r.status == 200
        parts = [c.samples for c in pipeline.generate_stream(
            "Follow the instruction.", voice, instruct="Speak slowly.",
            temperature=0.0, max_tokens=8, seed=5) if len(c.samples)]
        want = np.concatenate(parts)
        np.testing.assert_allclose(
            wav_to_float_samples(wav),
            wav_to_float_samples(wav_data(want, pipeline.sample_rate)),
            rtol=0, atol=1e-4)

        # rejected knobs + the OpenAI error envelope
        for bad in ({"voice": voice},  # missing input
                    {"input": "x", "voice": voice, "speed": 1.5},
                    {"input": "x", "voice": voice, "response_format": "mp3"},
                    {"input": "x", "voice": voice, "stream_format": "sse"}):
            conn.request("POST", "/v1/audio/speech", body=json.dumps(bad),
                         headers=hdrs)
            r = conn.getresponse()
            err = json.loads(r.read())
            assert r.status == 400, bad
            assert err["error"]["type"] == "invalid_request_error"
            assert isinstance(err["error"]["message"], str)
        conn.close()
    finally:
        httpd.shutdown()
