"""High-level TTS pipeline: load a model directory, expose every generation
mode (reference Qwen3TTSPipeline.swift:63-1021).

Model directory layout (same as the reference consumes,
Qwen3TTSPipeline.swift:106-232):
  config.json            — talker config (flat or nested talker_config)
  model.safetensors      — talker + code-predictor (+ optional speaker_encoder)
  tokenizer.json         — BPE tokenizer
  speech_tokenizer/      — vocoder config.json + model.safetensors
                           (+ optional encoder.* weights for ICL)

Generation modes: generate (built-in speaker / speaker embedding),
generate_voice_design, generate_custom_voice, generate_stream (buffer-and-
batch 18-frame decode chunks with 8-frame left context), generate_batch
(long text with 480-sample crossfade), generate_to_file (streaming WAV),
plus extract_speaker_embedding / encode_reference_audio for cloning.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Callable, Iterator

import jax
import jax.numpy as jnp
import numpy as np

from .config import Qwen3TTSConfig, SpeechTokenizerConfig
from .frontend.chunker import chunk as chunk_text
from .frontend.tokenizer import Qwen3Tokenizer
from .io import checkpoint as ckpt
from .io import safetensors_io
from .io.wav import StreamingWAVWriter
from .models import generate as gen_mod
from .models import prompt as prompt_mod
from .models import vocoder as voc
from .ops.quant import apply_mixed_quantization
from .utils.postprocess import sanitize_samples

SAMPLE_RATE = 24000
# Streaming consumer constants (reference Qwen3TTSPipeline.swift:520-522);
# samples-per-frame comes from the vocoder config (1920 for real checkpoints)
DECODE_CHUNK_SIZE = 18
LEFT_CONTEXT_SIZE = 8


@dataclass
class AudioChunk:
    """A chunk of generated audio for streaming playback
    (reference Qwen3TTSPipeline.swift:6-19)."""

    samples: np.ndarray
    token_range: tuple[int, int]
    is_final: bool


@dataclass(frozen=True)
class Qwen3TTSPipelineConfiguration:
    """Pipeline options (reference Qwen3TTSPipeline.swift:22-54).

    runtime_quantization_mode:
      "int8"      — TPU-native preset (default): linears + embeddings int8
                    affine; when the mega-kernels are on, prefill/serving
                    SHARE the kernels' rowwise-int8 buffers, so no dense or
                    duplicate copy of any layer weight stays resident
      "mixed_4_6" — the reference's scheme (6-bit qkv/heads, 4-bit rest,
                    group 64; Qwen3TTSPipeline.swift:961-980), for parity
                    work; slower on TPU (sub-byte unpack is VPU-bound)

    apply_runtime_quantization defaults True — reference parity
    (applyRuntimeQuantization = true, Qwen3TTSPipeline.swift:41): the
    resident model is quantized unless the caller opts out.
    """

    apply_runtime_quantization: bool = True
    runtime_quantization_mode: str = "int8"
    default_temperature: float = 0.85
    default_max_tokens: int = 2400
    default_streaming_chunk_size: int = 12
    crossfade_samples: int = 480
    # W8A8 mega-kernels (ops/pallas/cp_megakernel.py,
    # ops/pallas/talker_megakernel.py) for single-stream decode: None = auto
    # (on for the TPU backend), or force with True/False / env
    # QWEN3TTS_CP_KERNEL=0|1, QWEN3TTS_TALKER_KERNEL=0|1.
    use_cp_megakernel: bool | None = None
    use_talker_megakernel: bool | None = None
    # fused SEANet decoder-block kernels for the vocoder
    # (ops/pallas/vocoder_kernels.py): None = auto (on for the TPU backend),
    # or force with True/False / env QWEN3TTS_VOCODER_KERNEL=0|1.
    use_vocoder_kernels: bool | None = None


class Qwen3TTSError(Exception):
    """Load-time errors (reference Qwen3TTSPipeline.swift:985-1000)."""


# NaN/Inf scrub + clamp (reference Qwen3TTSPipeline.swift:565-570); shared
# with serving.vocode_rows — one implementation, utils/postprocess.py
_clean = sanitize_samples


class Qwen3TTSPipeline:
    sample_rate = SAMPLE_RATE

    def __init__(
        self,
        model_path: str | os.PathLike,
        configuration: Qwen3TTSPipelineConfiguration | None = None,
        *,
        dtype=jnp.bfloat16,
    ):
        self.pipeline_config = configuration or Qwen3TTSPipelineConfiguration()
        model_path = os.fspath(model_path)
        self.model_path = model_path
        self._dtype = dtype

        cfg_path = os.path.join(model_path, "config.json")
        weights_path = os.path.join(model_path, "model.safetensors")
        st_dir = os.path.join(model_path, "speech_tokenizer")
        for p in (cfg_path, weights_path):
            if not os.path.exists(p):
                raise Qwen3TTSError(f"Required file not found: {p}")

        with open(cfg_path, "r", encoding="utf-8") as f:
            self.config = Qwen3TTSConfig.from_json(f.read())
        self.tokenizer = Qwen3Tokenizer(model_path)

        weights = safetensors_io.load_file(weights_path)
        params, cp_params = ckpt.load_talker_checkpoint(
            weights, self.config, dtype=np.float32
        )

        # kernel builders need the pre-quantization trees
        cp_dense = cp_params
        talker_dense = params

        def _knob(cfg_value, env_name):
            env = os.environ.get(env_name)
            if env is not None:
                return env.strip().lower() not in ("0", "false", "no", "off", "")
            if cfg_value is None:
                return jax.default_backend() == "tpu"
            return cfg_value

        use_cp_k = _knob(self.pipeline_config.use_cp_megakernel, "QWEN3TTS_CP_KERNEL")
        use_talker_k = _knob(
            self.pipeline_config.use_talker_megakernel, "QWEN3TTS_TALKER_KERNEL"
        )
        rq = (
            self.pipeline_config.apply_runtime_quantization
            and self.config.quantization is None
        )
        # Buffer sharing (kernels on): the jnp prefill/serving paths read the
        # mega-kernels' own rowwise-int8 weights ("w8r" entries attached
        # after device_put), so those subtrees are neither quantized here nor
        # uploaded — the kernel copy is THE resident copy. Applies in int8
        # runtime-quantization mode AND for pre-quantized checkpoints (the
        # kernels re-quantize the dequantized packed weights rowwise-int8
        # anyway; sharing drops the packed wq/wq_kl copies, which would
        # otherwise triple the resident weight bytes, and makes prefill
        # numerics match the kernel decode path exactly).
        int8_mode = self.pipeline_config.runtime_quantization_mode == "int8"
        prequant = self.config.quantization is not None
        self._share_talker = use_talker_k and (prequant or (rq and int8_mode))
        self._share_cp = use_cp_k and (prequant or (rq and int8_mode))
        _TALKER_SHARED = ("layers", "codec_head")
        _CP_SHARED = ("layers", "lm_head", "codec_embedding")

        def _quantize(tree, shared):
            sub = {k: v for k, v in tree.items() if k not in shared}
            if int8_mode:
                from .ops.quant import apply_int8_quantization

                sub = apply_int8_quantization(sub)
            else:
                sub = apply_mixed_quantization(sub)
            return {**tree, **sub}

        if rq:
            params = _quantize(
                params, _TALKER_SHARED if self._share_talker else ()
            )
            cp_params = _quantize(cp_params, _CP_SHARED if self._share_cp else ())

        if use_cp_k:
            from .ops.pallas.cp_megakernel import build_cp_kernel_params

            cp_params = dict(cp_params)
            cp_params["kernel"] = build_cp_kernel_params(
                cp_dense, self.config.code_predictor_config
            )
        if use_talker_k:
            from .ops.pallas.talker_megakernel import build_talker_kernel_params

            params = dict(params)
            params["kernel"] = build_talker_kernel_params(
                talker_dense, self.config
            )
        del cp_dense, talker_dense

        # Drop the host copies of shared subtrees before upload. Entries with
        # a bias stay dense (the kernels carry no bias; none of the reference
        # checkpoints use linear biases, but correctness beats memory here).
        def _sharable(entry: dict) -> bool:
            return "b" not in entry

        if self._share_talker:
            lay = dict(params["layers"])
            for name in ("qkv_proj", "o_proj", "gateup_proj", "down_proj"):
                if _sharable(lay[name]):
                    lay.pop(name)
            params = dict(params, layers=lay)
            if _sharable(params["codec_head"]):
                params.pop("codec_head")
        if self._share_cp:
            lay = dict(cp_params["layers"])
            for name in ("qkv_proj", "o_proj", "gateup_proj", "down_proj"):
                if _sharable(lay[name]):
                    lay.pop(name)
            cp_params = dict(cp_params, layers=lay)
            for name in ("lm_head", "codec_embedding"):
                if _sharable(cp_params[name]):
                    cp_params.pop(name)

        # Cast on host (ml_dtypes handles bf16 in numpy), then one async
        # device_put of the whole tree — per-leaf jnp.asarray converts would
        # dispatch hundreds of tiny device ops and dominate load time.
        import ml_dtypes

        np_target = (
            ml_dtypes.bfloat16 if dtype == jnp.bfloat16 else np.dtype(dtype)
        )

        def cast_tree(tree):
            # Quantized scales/biases keep their checkpoint float precision
            # (fp16/fp32): casting them to bf16 drops ~3 mantissa bits vs the
            # reference's fp16 dequant math. Integer leaves pass through, and
            # the mega-kernel subtree is already in its exact on-device format.
            def walk(node):
                if isinstance(node, dict):
                    return {
                        k: (
                            jax.tree.map(np.asarray, v)
                            if k == "kernel"
                            else np.asarray(v)
                            if k in ("scales", "biases")
                            and np.asarray(v).dtype.kind == "f"
                            else walk(v)
                        )
                        for k, v in node.items()
                    }
                arr = np.asarray(node)
                return arr if arr.dtype.kind in "ui" else np.asarray(arr, np_target)

            return walk(tree)

        self.params = jax.device_put(cast_tree(params))
        self.cp_params = jax.device_put(cast_tree(cp_params))

        # Attach the shared views: the SAME device buffers appear both in the
        # kernel subtree (streamed by the Pallas decode kernels) and as "w8r"
        # linear/table entries (read by jnp prefill + serving) — zero extra HBM.
        from .ops.quant import KERNEL_SHARED_LINS as _LINS
        from .ops.quant import kernel_w8r_view as _view
        if self._share_talker:
            k = self.params["kernel"]
            lay = dict(self.params["layers"])
            for name, pre in _LINS:
                if name not in lay:
                    lay[name] = _view(k, pre)
            self.params = dict(self.params, layers=lay)
            if "codec_head" not in self.params:
                self.params["codec_head"] = _view(k, "ch")
        if self._share_cp:
            k = self.cp_params["kernel"]
            lay = dict(self.cp_params["layers"])
            for name, pre in _LINS:
                if name not in lay:
                    lay[name] = _view(k, pre)
            self.cp_params = dict(self.cp_params, layers=lay)
            if "lm_head" not in self.cp_params:
                self.cp_params["lm_head"] = _view(k, "head")
            if "codec_embedding" not in self.cp_params:
                # raw (un-projected) tables — the jnp path applies
                # small_to_mtp_projection itself
                self.cp_params["codec_embedding"] = _view(k, "embr")

        # Speaker encoder (optional; "speaker_encoder." keys in the main file,
        # reference Qwen3TTSPipeline.swift:156-170)
        self.speaker_encoder = None
        spk_keys = {k: v for k, v in weights.items() if k.startswith("speaker_encoder.")}
        if spk_keys:
            try:
                from .models import speaker_encoder as spk_mod

                self.speaker_encoder = spk_mod.SpeakerEncoder.from_weights(spk_keys)
            except ImportError:
                self.speaker_encoder = None
        del weights

        # Vocoder (required for audio output)
        st_cfg_path = os.path.join(st_dir, "config.json")
        st_weights_path = os.path.join(st_dir, "model.safetensors")
        if not (os.path.exists(st_cfg_path) and os.path.exists(st_weights_path)):
            raise Qwen3TTSError(f"Required file not found: {st_dir}")
        with open(st_cfg_path, "r", encoding="utf-8") as f:
            self.speech_config = SpeechTokenizerConfig.from_json(f.read())
        st_weights = safetensors_io.load_file(st_weights_path)
        vocoder_params = ckpt.load_vocoder_checkpoint(
            st_weights, self.speech_config.decoder_config, dtype=np.float32
        )
        if _knob(
            self.pipeline_config.use_vocoder_kernels, "QWEN3TTS_VOCODER_KERNEL"
        ):
            from .ops.pallas.vocoder_kernels import build_vocoder_kernel_params

            vocoder_params = dict(vocoder_params)
            vocoder_params["kernel"] = build_vocoder_kernel_params(
                vocoder_params, self.speech_config.decoder_config
            )
        self.vocoder_params = jax.device_put(vocoder_params)

        # Audio encoder for ICL (optional; encoder.* keys in the vocoder file,
        # reference Qwen3TTSPipeline.swift:211-218)
        self._samples_per_frame = self.speech_config.decoder_config.total_upsample

        self.audio_encoder = None
        enc_keys = {k: v for k, v in st_weights.items() if "encoder." in k}
        if enc_keys and self.speech_config.encoder_config is not None:
            try:
                from .models import audio_encoder as enc_mod

                self.audio_encoder = enc_mod.AudioEncoder.from_weights(
                    enc_keys, self.speech_config
                )
            except ImportError:
                self.audio_encoder = None
        del st_weights

    def model_resident_bytes(self) -> int:
        """Device bytes held by the resident model (talker + code predictor +
        vocoder + encoders), counting buffers shared between the kernel
        subtrees and the jnp "w8r" views once (utils/memory.py)."""
        from .utils.memory import resident_bytes

        trees = [self.params, self.cp_params, self.vocoder_params]
        if self.speaker_encoder is not None:
            trees.append(getattr(self.speaker_encoder, "params", None))
        if self.audio_encoder is not None:
            trees.append(getattr(self.audio_encoder, "params", None))
        return resident_bytes(*trees)

    def warmup(self, max_tokens: int = 24, max_vocoder_rows: int = 4) -> None:
        """Precompile the single-stream jit signatures before first real use
        (TTSService.warmup is the serving-path analogue): one blocking and
        one streaming dummy generation cover the short-prompt prefill
        bucket, the jitted decode chunk, the streaming vocoder chunk, and
        the 1-row blocking vocoder batch; zero-code chunked_decode calls
        then warm the power-of-two vocoder row buckets up to
        `max_vocoder_rows` (rows = ceil(frames/100), so the default 4
        covers outputs to ~16 s of audio — longer ones compile their
        bucket on first use, as do prompts in larger prefill-length
        buckets). On a cold compile cache each TPU signature takes
        60-300 s; without this the first user call absorbs them all."""
        text = "Warm up the blocking and streaming generation paths."
        if self.available_speakers:
            kwargs: dict = {"speaker": self.available_speakers[0]}
        elif self.supports_voice_design:
            kwargs = {"instruct": "A warm, neutral narrator voice."}
        else:
            kwargs = {}
        self.generate(text, max_tokens=max_tokens, seed=0, **kwargs)
        for _ in self.generate_stream(
            text, max_tokens=max_tokens, seed=0, **kwargs
        ):
            pass
        chunk = int(os.environ.get("QWEN3TTS_DECODE_CHUNK_SIZE", "100"))
        nq = self.speech_config.decoder_config.num_quantizers
        rows = 2
        while rows <= max_vocoder_rows:
            self._decode_to_audio(
                np.zeros(((rows - 1) * chunk + 1, nq), np.int32)
            )
            rows *= 2

    # -- capability surface (reference Qwen3TTSPipeline.swift:77-104) -------

    @property
    def available_speakers(self) -> list[str]:
        return sorted(self.config.spk_id.keys())

    @property
    def supports_voice_cloning(self) -> bool:
        return self.speaker_encoder is not None

    @property
    def supports_icl(self) -> bool:
        return self.audio_encoder is not None

    @property
    def model_type(self) -> str | None:
        return self.config.tts_model_type

    @property
    def supports_voice_design(self) -> bool:
        return self.config.tts_model_type == "voice_design"

    @property
    def supports_custom_voice(self) -> bool:
        return self.config.tts_model_type == "custom_voice"

    # -- core code generation ------------------------------------------------

    def _generate_codes(
        self,
        text: str,
        speaker: str = "",
        instruct: str | None = None,
        speaker_embedding: np.ndarray | None = None,
        reference_transcript: str | None = None,
        reference_audio_codes: list[list[int]] | None = None,
        temperature: float | None = None,
        max_tokens: int | None = None,
        seed: int = 0,
    ) -> np.ndarray:
        prompt_data = prompt_mod.assemble_prompt(
            self.params,
            self.config,
            self.tokenizer,
            text,
            speaker=speaker,
            instruct=instruct,
            speaker_embedding=speaker_embedding,
            reference_transcript=reference_transcript,
            reference_audio_codes=reference_audio_codes,
        )
        if prompt_data is None:
            return np.zeros(
                (0, self.config.code_predictor_config.num_code_groups), np.int32
            )
        frames = gen_mod.generate_codes(
            self.params,
            self.cp_params,
            self.config,
            prompt_data,
            temperature=(
                temperature
                if temperature is not None
                else self.pipeline_config.default_temperature
            ),
            max_tokens=(max_tokens if max_tokens is not None
                        else self.pipeline_config.default_max_tokens),
            seed=seed,
        )
        return gen_mod.filter_valid_frames(frames)

    def _decode_to_audio(self, frames: np.ndarray) -> np.ndarray:
        """codes [T, 16] -> cleaned float32 samples [T * samples_per_frame].

        Chunk size / left context honor the reference's env overrides
        QWEN3TTS_DECODE_CHUNK_SIZE / QWEN3TTS_DECODE_LEFT_CONTEXT
        (reference SpeechTokenizer.swift:1014-1015)."""
        if len(frames) == 0:
            return np.zeros(0, np.float32)
        chunk = int(os.environ.get("QWEN3TTS_DECODE_CHUNK_SIZE", "100"))
        ctx = int(os.environ.get("QWEN3TTS_DECODE_LEFT_CONTEXT", "10"))
        codes = frames.T[None]  # [1, nq, T]
        wav = voc.chunked_decode(
            self.vocoder_params, codes, self.speech_config.decoder_config,
            chunk_size=chunk, left_context=ctx,
        )
        return _clean(wav[0])

    # -- generation modes ----------------------------------------------------

    def generate(
        self,
        text: str,
        speaker: str = "",
        *,
        instruct: str | None = None,
        speaker_embedding: np.ndarray | None = None,
        reference_transcript: str | None = None,
        reference_audio_codes: list[list[int]] | None = None,
        temperature: float | None = None,
        max_tokens: int | None = None,
        seed: int = 0,
    ) -> np.ndarray:
        """Blocking synthesis with a built-in speaker or a speaker embedding
        (reference Qwen3TTSPipeline.swift:244-306). The full prompt kwarg
        set is accepted so one entry point can serve every mode (the
        dedicated generate_voice_design / generate_custom_voice /
        generate_icl wrappers remain the reference-parity surface)."""
        frames = self._generate_codes(
            text,
            speaker=speaker,
            instruct=instruct,
            speaker_embedding=speaker_embedding,
            reference_transcript=reference_transcript,
            reference_audio_codes=reference_audio_codes,
            temperature=temperature,
            max_tokens=max_tokens,
            seed=seed,
        )
        return self._decode_to_audio(frames)

    def generate_voice_design(
        self,
        text: str,
        voice_description: str,
        *,
        temperature: float | None = None,
        max_tokens: int | None = None,
        seed: int = 0,
    ) -> np.ndarray:
        """Synthesis from a natural-language voice description
        (reference Qwen3TTSPipeline.swift:355-408)."""
        frames = self._generate_codes(
            text,
            instruct=voice_description,
            temperature=temperature,
            max_tokens=max_tokens,
            seed=seed,
        )
        return self._decode_to_audio(frames)

    def generate_custom_voice(
        self,
        text: str,
        speaker: str,
        instruct: str,
        *,
        temperature: float | None = None,
        max_tokens: int | None = None,
        seed: int = 0,
    ) -> np.ndarray:
        """Named speaker + style instruct (reference
        Qwen3TTSPipeline.swift:424-480)."""
        frames = self._generate_codes(
            text,
            speaker=speaker,
            instruct=instruct,
            temperature=temperature,
            max_tokens=max_tokens,
            seed=seed,
        )
        return self._decode_to_audio(frames)

    def generate_icl(
        self,
        text: str,
        reference_transcript: str,
        reference_audio_codes: list[list[int]],
        *,
        speaker: str = "",
        temperature: float | None = None,
        max_tokens: int | None = None,
        seed: int = 0,
    ) -> np.ndarray:
        """In-context-learning voice cloning from reference audio codes."""
        frames = self._generate_codes(
            text,
            speaker=speaker,
            reference_transcript=reference_transcript,
            reference_audio_codes=reference_audio_codes,
            temperature=temperature,
            max_tokens=max_tokens,
            seed=seed,
        )
        return self._decode_to_audio(frames)

    def generate_many(
        self,
        texts: list[str],
        speakers: list[str] | str = "",
        *,
        temperature: float | None = None,
        max_tokens: int | None = None,
        seed: int = 0,
    ) -> list[np.ndarray]:
        """Serve several utterances concurrently on one chip (lockstep batched
        decode, models/serving.py — a capability the batch-1 reference lacks).
        Greedy output per stream is bitwise-identical to generate()."""
        from .models import serving as srv

        if isinstance(speakers, str):
            speakers = [speakers] * len(texts)
        pds = []
        keep: list[int] = []
        for i, (text, speaker) in enumerate(zip(texts, speakers)):
            pd = prompt_mod.assemble_prompt(
                self.params, self.config, self.tokenizer, text, speaker=speaker
            )
            if pd is not None:
                pds.append(pd)
                keep.append(i)
        outputs: list[np.ndarray] = [np.zeros(0, np.float32)] * len(texts)
        if not pds:
            return outputs
        frames_list = srv.generate_codes_batched(
            self.params, self.cp_params, self.config, pds,
            temperature=(
                temperature
                if temperature is not None
                else self.pipeline_config.default_temperature
            ),
            max_tokens=(max_tokens if max_tokens is not None
                        else self.pipeline_config.default_max_tokens),
            seed=seed,
        )
        # Batch the vocoder across streams too: pad every stream's codes to
        # the longest (code 0 rows are valid embeddings), decode in one
        # chunked call, trim per stream.
        valid_list = [gen_mod.filter_valid_frames(f) for f in frames_list]
        t_max = max((len(v) for v in valid_list), default=0)
        if t_max == 0:
            return outputs
        nq = self.config.code_predictor_config.num_code_groups
        codes = np.zeros((len(valid_list), nq, t_max), np.int32)
        for j, v in enumerate(valid_list):
            if len(v):
                codes[j, :, : len(v)] = v.T
        chunk = int(os.environ.get("QWEN3TTS_DECODE_CHUNK_SIZE", "100"))
        ctx = int(os.environ.get("QWEN3TTS_DECODE_LEFT_CONTEXT", "10"))
        wav = voc.chunked_decode(
            self.vocoder_params, codes, self.speech_config.decoder_config,
            chunk_size=chunk, left_context=ctx,
            lengths=[len(v) for v in valid_list],  # skip dead padded chunks
        )
        for i, j in zip(keep, range(len(valid_list))):
            n = len(valid_list[j]) * self._samples_per_frame
            outputs[i] = _clean(wav[j][:n])
        return outputs

    def generate_many_stream(
        self,
        texts: list[str],
        speakers: list[str] | str = "",
        *,
        temperature: float | None = None,
        max_tokens: int | None = None,
        batch_size: int = 8,
        chunk_steps: int = 18,
        first_decode_chunk: int | None = None,
        seed: int = 0,
    ) -> Iterator[tuple[int, AudioChunk]]:
        """Streaming continuous-batching synthesis: yields (text_index,
        AudioChunk) pairs AS AUDIO BECOMES READY while decoding continues —
        up to batch_size utterances decode in lockstep on one chip, finished
        slots admit queued texts mid-flight, and the vocoder runs batched
        across streams on ready 18-frame chunks (models/serving.py
        ContinuousServer.serve_audio). first_decode_chunk (with a finer
        chunk_steps) ships each stream's first audio after that many frames
        instead of a full 18-frame window — the TTFA knob, same semantics as
        generate_stream's parameter of the same name."""
        from .models import serving as srv

        if isinstance(speakers, str):
            speakers = [speakers] * len(texts)
        pds = []
        keep: list[int] = []
        for i, (text, speaker) in enumerate(zip(texts, speakers)):
            pd = prompt_mod.assemble_prompt(
                self.params, self.config, self.tokenizer, text, speaker=speaker
            )
            if pd is not None:
                pds.append(pd)
                keep.append(i)
        if not pds:
            return
        p_bucket = gen_mod.pick_bucket(
            max(int(pd.input_embeds.shape[1]) for pd in pds)
        )
        t_bucket = gen_mod.pick_bucket(
            max(int(pd.trailing_hidden.shape[1]) for pd in pds),
            gen_mod.TRAILING_BUCKETS,
        )
        server = srv.ContinuousServer(
            self.params, self.cp_params, self.config,
            batch_size=min(batch_size, max(1, len(pds))),
            prompt_bucket=p_bucket, trailing_bucket=t_bucket,
            chunk_steps=chunk_steps, seed=seed,
        )
        for chunk in server.serve_audio(
            pds, self.vocoder_params, self.speech_config.decoder_config,
            temperature=(
                temperature
                if temperature is not None
                else self.pipeline_config.default_temperature
            ),
            max_tokens=(max_tokens if max_tokens is not None
                        else self.pipeline_config.default_max_tokens),
            first_decode_chunk=first_decode_chunk,
        ):
            yield keep[chunk.request], AudioChunk(
                samples=_clean(chunk.samples),
                token_range=chunk.token_range,
                is_final=chunk.is_final,
            )

    # -- streaming -------------------------------------------------------

    def generate_stream(
        self,
        text: str,
        speaker: str = "",
        *,
        instruct: str | None = None,
        speaker_embedding: np.ndarray | None = None,
        reference_transcript: str | None = None,
        reference_audio_codes: list[list[int]] | None = None,
        temperature: float | None = None,
        max_tokens: int | None = None,
        chunk_size: int | None = None,
        first_decode_chunk: int | None = None,
        seed: int = 0,
    ) -> Iterator[AudioChunk]:
        """Buffer-and-batch streaming: accumulate valid frames, decode every
        18 with 8 frames of re-decoded left context, yield AudioChunks, flush
        the remainder, then an empty final sentinel (reference
        _generateStreamImpl, Qwen3TTSPipeline.swift:484-624).

        is_final means "no more audio follows", and consumers may see it
        TWICE: the reference marks both the flushed remainder and the empty
        sentinel final (Qwen3TTSPipeline.swift:599-607) and this stream
        mirrors it exactly. (TTSService streams, by contrast, emit exactly
        one final chunk.)

        first_decode_chunk (default 18 = reference parity) lowers only the
        FIRST vocoder batch — e.g. 9 frames halves time-to-first-audio
        (measured ~200 ms at 18 frames on v5e) at the cost of one extra
        vocoder call."""
        chunk = chunk_size or self.pipeline_config.default_streaming_chunk_size
        next_decode = first_decode_chunk or DECODE_CHUNK_SIZE
        prompt_data = prompt_mod.assemble_prompt(
            self.params, self.config, self.tokenizer, text,
            speaker=speaker, instruct=instruct, speaker_embedding=speaker_embedding,
            reference_transcript=reference_transcript,
            reference_audio_codes=reference_audio_codes,
        )
        total = 0
        if prompt_data is not None:
            code_stream = gen_mod.stream_codes(
                self.params, self.cp_params, self.config, prompt_data,
                temperature=(
                    temperature
                    if temperature is not None
                    else self.pipeline_config.default_temperature
                ),
                max_tokens=(max_tokens if max_tokens is not None
                        else self.pipeline_config.default_max_tokens),
                chunk_steps=chunk,
                track_cp_penalty=False,  # streaming skips cp repetition sets
                seed=seed,
            )

            buffer: list[np.ndarray] = []
            left_context: np.ndarray | None = None
            # Pipelined PCM delivery: window i's vocode is dispatched with an
            # async D2H copy and its pull deferred until window i+1 is
            # dispatched, so the transfer rides under the next decode chunk's
            # device time instead of blocking the loop for a host round trip
            # per window. The FIRST window is pulled immediately (TTFA
            # unchanged); chunk contents, order, and token ranges are
            # identical to the serial scheme.
            pending_item = None  # (device wav, drop, t0, t1)

            def pull(item) -> AudioChunk:
                wav_dev, drop, a, b = item
                return AudioChunk(
                    samples=_clean(np.asarray(wav_dev)[0][drop:]),
                    token_range=(a, b),
                    is_final=False,
                )

            for frames in code_stream:
                valid = gen_mod.filter_valid_frames(frames)
                if len(valid) == 0:
                    continue
                buffer.append(valid)
                buffered = np.concatenate(buffer)
                while len(buffered) >= next_decode:
                    batch = buffered[:next_decode]
                    buffered = buffered[next_decode:]
                    next_decode = DECODE_CHUNK_SIZE
                    wav_dev, drop, left_context = (
                        self._dispatch_decode_with_context(batch, left_context)
                    )
                    total += len(batch)
                    item = (wav_dev, drop, total - len(batch), total)
                    if total == len(batch):
                        yield pull(item)  # first audio ships immediately
                    else:
                        if pending_item is not None:
                            yield pull(pending_item)
                        pending_item = item
                buffer = [buffered] if len(buffered) else []

            if pending_item is not None:
                yield pull(pending_item)
                pending_item = None
            remainder = np.concatenate(buffer) if buffer else np.zeros((0, 16), np.int32)
            if len(remainder):
                samples, left_context = self._decode_with_context(
                    remainder, left_context
                )
                total += len(remainder)
                yield AudioChunk(
                    samples=_clean(samples),
                    token_range=(total - len(remainder), total),
                    is_final=True,
                )
        yield AudioChunk(
            samples=np.zeros(0, np.float32), token_range=(total, total), is_final=True
        )

    def generate_stream_voice_design(
        self, text: str, voice_description: str, **kwargs
    ) -> Iterator[AudioChunk]:
        """Streaming VoiceDesign (reference Qwen3TTSPipeline.swift:386-408)."""
        return self.generate_stream(text, instruct=voice_description, **kwargs)

    def generate_stream_custom_voice(
        self, text: str, speaker: str, instruct: str, **kwargs
    ) -> Iterator[AudioChunk]:
        """Streaming CustomVoice (reference Qwen3TTSPipeline.swift:458-480)."""
        return self.generate_stream(text, speaker, instruct=instruct, **kwargs)

    # -- long text -------------------------------------------------------

    def generate_batch(
        self,
        text: str,
        speaker: str = "",
        *,
        instruct: str | None = None,
        speaker_embedding: np.ndarray | None = None,
        reference_transcript: str | None = None,
        temperature: float | None = None,
        on_progress: Callable[[float], None] | None = None,
        seed: int = 0,
    ) -> np.ndarray:
        """Chunk long text, synthesize each chunk (max 600 frames), decode in
        24-frame batches with 8-frame left context, and stitch chunks with a
        480-sample linear crossfade (reference generateBatch,
        Qwen3TTSPipeline.swift:774-898)."""
        crossfade = self.pipeline_config.crossfade_samples
        text_chunks = chunk_text(text)
        if not text_chunks:
            return np.zeros(0, np.float32)
        if len(text_chunks) == 1:
            # single generation, but through _generate_codes so instruct /
            # reference_transcript are honored — the reference's
            # single-chunk shortcut DROPS them (generate(text:speaker:
            # temperature:) only, Qwen3TTSPipeline.swift:791-796), flipping
            # behavior on input length; deliberate fix, not parity
            if on_progress:
                on_progress(0.0)
            frames = self._generate_codes(
                text_chunks[0], speaker=speaker, instruct=instruct,
                speaker_embedding=speaker_embedding,
                reference_transcript=reference_transcript,
                temperature=temperature, seed=seed,
            )
            out = self._decode_to_audio(frames)
            if on_progress:
                on_progress(1.0)
            return out

        all_samples: list[np.ndarray] = []
        previous_tail = np.zeros(0, np.float32)
        for idx, text_chunk in enumerate(text_chunks):
            if on_progress:
                on_progress(idx / len(text_chunks))
            frames = self._generate_codes(
                text_chunk,
                speaker=speaker,
                instruct=instruct,
                speaker_embedding=speaker_embedding,
                reference_transcript=reference_transcript,
                temperature=temperature,
                max_tokens=600,
                seed=seed + idx,
            )
            if len(frames) == 0:
                continue
            chunk_samples = self._decode_chunked(frames, decode_chunk_size=24)
            if len(chunk_samples) == 0:
                continue

            is_last = idx == len(text_chunks) - 1
            if len(previous_tail) and crossfade > 0:
                fade = min(crossfade, len(previous_tail), len(chunk_samples))
                t = np.arange(fade, dtype=np.float32)
                fade_out = (fade - t) / fade
                fade_in = t / fade
                all_samples.append(
                    previous_tail[:fade] * fade_out + chunk_samples[:fade] * fade_in
                )
                chunk_samples = chunk_samples[fade:]
            if is_last:
                all_samples.append(chunk_samples)
                previous_tail = np.zeros(0, np.float32)
            elif len(chunk_samples) > crossfade:
                all_samples.append(chunk_samples[: len(chunk_samples) - crossfade])
                previous_tail = chunk_samples[len(chunk_samples) - crossfade:]
            else:
                previous_tail = chunk_samples
        if len(previous_tail):
            # every later chunk yielded no frames, so the held-back
            # crossfade tail was never consumed — flush it instead of
            # ending the utterance ~20 ms early with a hard cut (the
            # reference drops it, Qwen3TTSPipeline.swift:865 guard;
            # deliberate fix, not parity)
            all_samples.append(previous_tail)
        if on_progress:
            on_progress(1.0)
        return (
            np.concatenate(all_samples) if all_samples else np.zeros(0, np.float32)
        )

    def generate_to_file(
        self,
        text: str,
        output_path: str | os.PathLike,
        speaker: str = "",
        *,
        instruct: str | None = None,
        speaker_embedding: np.ndarray | None = None,
        reference_transcript: str | None = None,
        reference_audio_codes: list[list[int]] | None = None,
        temperature: float | None = None,
        on_progress: Callable[[float], None] | None = None,
        seed: int = 0,
    ) -> int:
        """Memory-efficient long-text synthesis straight to a WAV file
        (reference generateToFile, Qwen3TTSPipeline.swift:644-757). Returns
        the number of samples written."""
        text_chunks = chunk_text(text)
        if not text_chunks:
            return 0
        writer = StreamingWAVWriter(output_path, SAMPLE_RATE)
        try:
            for idx, text_chunk in enumerate(text_chunks):
                if on_progress:
                    on_progress(idx / len(text_chunks))
                frames = self._generate_codes(
                    text_chunk,
                    speaker=speaker,
                    instruct=instruct,
                    speaker_embedding=speaker_embedding,
                    reference_transcript=reference_transcript,
                    reference_audio_codes=reference_audio_codes,
                    temperature=temperature,
                    max_tokens=600,
                    seed=seed + idx,
                )
                if len(frames) == 0:
                    continue
                samples = self._decode_chunked(frames, decode_chunk_size=16)
                if len(samples):
                    writer.write(samples)
            if on_progress:
                on_progress(1.0)
        finally:
            count = writer.finalize()
        return count

    def _dispatch_decode_with_context(
        self, frames: np.ndarray, left_context: np.ndarray | None
    ):
        """Dispatch ONE vocoder call over `frames` with optional re-decoded
        left context (the reference's buffer-and-batch step,
        Qwen3TTSPipeline.swift:700-745) WITHOUT pulling the PCM: returns
        (device wav [1, S], samples to drop, next left context). The device
        array's D2H copy is started asynchronously so a caller that defers
        the pull (generate_stream's pipelined delivery) overlaps the PCM
        transfer with the next decode chunk instead of paying a serial
        host round trip per window."""
        if left_context is not None:
            decode_input = np.concatenate([left_context, frames])
            drop = len(left_context) * self._samples_per_frame
        else:
            decode_input = frames
            drop = 0
        wav = voc.decode_frames_jit(
            self.vocoder_params,
            jnp.asarray(decode_input.T[None]),
            self.speech_config.decoder_config,
        )
        copy_async = getattr(wav, "copy_to_host_async", None)
        if copy_async is not None:
            copy_async()
        return wav, drop, frames[-LEFT_CONTEXT_SIZE:]

    def _decode_with_context(
        self, frames: np.ndarray, left_context: np.ndarray | None
    ) -> tuple[np.ndarray, np.ndarray]:
        """Blocking form of _dispatch_decode_with_context: returns
        (raw samples, next left context) — the implementation behind
        _decode_chunked and generate_stream's flush path."""
        wav, drop, ctx = self._dispatch_decode_with_context(frames, left_context)
        return np.asarray(wav)[0][drop:], ctx

    def _decode_chunked(self, frames: np.ndarray, decode_chunk_size: int) -> np.ndarray:
        """Sequential batched vocoder decode with 8-frame left context
        (reference Qwen3TTSPipeline.swift:700-745, 830-860). Windows are
        independent given their context frames, so up to two are kept in
        flight (dispatch window i+1 before pulling window i's PCM) — the
        D2H transfer overlaps the next window's vocode instead of billing
        a serial host round trip per window; output is identical."""
        pieces: list[np.ndarray] = []
        in_flight: list[tuple] = []  # (device wav, drop)

        def pull_one() -> None:
            wav_dev, drop = in_flight.pop(0)
            pieces.append(_clean(np.asarray(wav_dev)[0][drop:]))

        pos = 0
        while pos < len(frames):
            end = min(pos + decode_chunk_size, len(frames))
            # context spans batch boundaries: the last 8 frames BEFORE pos,
            # even when decode_chunk_size < LEFT_CONTEXT_SIZE (the streaming
            # path's carried context is batch-local instead — there the
            # producer guarantees batches >= LEFT_CONTEXT_SIZE mid-stream)
            left = frames[max(0, pos - LEFT_CONTEXT_SIZE): pos] if pos else None
            wav_dev, drop, _ = self._dispatch_decode_with_context(
                frames[pos:end], left
            )
            in_flight.append((wav_dev, drop))
            if len(in_flight) > 2:
                pull_one()
            pos = end
        while in_flight:
            pull_one()
        return np.concatenate(pieces) if pieces else np.zeros(0, np.float32)

    # -- voice cloning inputs ----------------------------------------------

    def extract_speaker_embedding(self, audio_samples: np.ndarray) -> np.ndarray | None:
        """1024-dim x-vector from raw audio (reference
        Qwen3TTSPipeline.swift:906-918); None without a speaker encoder."""
        if self.speaker_encoder is None:
            return None
        return self.speaker_encoder.extract_embedding(np.asarray(audio_samples))

    def encode_reference_audio(self, audio_samples: np.ndarray) -> list[np.ndarray] | None:
        """16 x T codec codes from 24 kHz reference audio (reference
        Qwen3TTSPipeline.swift:924-945); None without an audio encoder."""
        if self.audio_encoder is None:
            return None
        codes = self.audio_encoder.encode(np.asarray(audio_samples))
        return [codes[q] for q in range(codes.shape[0])]
